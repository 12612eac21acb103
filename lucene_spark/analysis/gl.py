"""Galician minimal analysis chain: StandardTokenizer → lowercase → stop →
minimal (plural-only) stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
gl/GalicianMinimalStemmer.java (applies ONLY the "Plural" step of the
RSLP descriptor resources/org/apache/lucene/analysis/gl/galician.rslp) via
the RSLPStemmerBase engine (pt/RSLPStemmerBase.java:96-230): the step
applies to words of length ≥ 3 ending in 's'; rules run in order, the
first whose suffix matches with stem length ≥ the rule minimum and whose
whole word is not in the rule's exception set fires (strip + replace) and
the step ends. The RSLP algorithm itself is published (Orengo & Huyck,
"A stemming algorithm for the Portuguese language", SPIRE 2001).

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the function-word core of the Lucene galician stopword
list (public); pass your own frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "galician_minimal_stem",
    "galician_term",
    "galician_analyze",
    "galician_terms_positions",
    "GALICIAN_STOP_WORDS",
]

# function-word core of the Lucene galician stopword list (public)
GALICIAN_STOP_WORDS = frozenset(
    """a aínda alí aquel aquela aquelas aqueles aquilo aquí ao aos as así
    á ben cando che co coa comigo con connosco contigo convosco coas cos
    cun cuns cunha cunhas da dalgunha dalgunhas dalgún dalgúns das de del
    dela delas deles desde deste do dos dun duns dunha dunhas e el ela
    elas eles en era eran esa esas ese eses esta estar estaba está están
    este estes estiven estou eu é facer foi foron fun había hai iso isto
    la las lle lles lo los mais me meu meus min miña miñas moi na nas
    neste nin no non nos nosa nosas noso nosos nós nun nunha nuns nunhas
    o os ou ó ós para pero pode pois pola polas polo polos por que se
    senón ser seu seus sexa sido sobre súa súas tamén tan te ten teñen
    teño ter teu teus ti tido tiña tiven túa túas un unha unhas uns vos
    vosa vosas voso vosos vós""".split()
)

# galician.rslp "Plural" step: (suffix, min stem len, replacement,
# whole-word exceptions) in rule order
_GL_PLURAL_RULES = (
    ("ns", 1, "n", {"luns", "furatapóns", "furatapons"}),
    ("ós", 3, "ón", ()),
    ("ões", 3, "ón", ()),
    ("ães", 1, "ão", {"mães", "magalhães"}),
    ("ais", 2, "al", {"cais", "tais", "mais", "pais", "ademais"}),
    ("áis", 2, "al", {"cáis", "táis", "máis", "páis", "ademáis"}),
    ("éis", 2, "el", ()),
    ("eis", 2, "el", ()),
    ("óis", 2, "ol", {"escornabóis"}),
    ("ois", 2, "ol", {"escornabois"}),
    ("ís", 2, "il", {"país"}),
    ("is", 2, "il", {"menfis", "pais", "kinguis"}),
    ("les", 2, "l", {"ingles", "marselles", "montreales", "senegales",
                     "manizales", "móstoles", "nápoles"}),
    ("res", 3, "r", {"petres", "henares", "cáceres", "baleares", "linares",
                     "londres", "mieres", "miraflores", "mércores",
                     "venres", "pires"}),
    ("ces", 2, "z", ()),
    ("zes", 2, "z", ()),
    ("ises", 3, "z", ()),
    ("ás", 1, "al", {"más"}),
    ("ses", 2, "s", ()),
    ("s", 2, "", {"barbadés", "barcelonés", "cantonés", "gabonés", "llanés",
                  "medinés", "escocés", "escocês", "francês", "barcelonês",
                  "cantonês", "macramés", "reves", "barcelones", "cantones",
                  "gabones", "llanes", "magallanes", "medines", "escoces",
                  "frances", "xoves", "martes", "aliás", "pires", "lápis",
                  "cais", "mais", "mas", "menos", "férias", "pêsames",
                  "crúcis", "país", "cangas", "atenas", "asturias",
                  "canarias", "filipinas", "honduras", "molucas", "caldas",
                  "mascareñas", "micenas", "covarrubias", "psoas", "óculos",
                  "nupcias"}),
)


def galician_minimal_stem(term: str) -> str:
    """RSLP Plural step: first matching rule fires, then the step ends."""
    if len(term) < 3 or not term.endswith("s"):
        return term
    for suffix, min_stem, repl, exceptions in _GL_PLURAL_RULES:
        if not term.endswith(suffix):
            continue
        if len(term) - len(suffix) < min_stem:
            continue
        if term in exceptions:
            continue
        return term[: -len(suffix)] + repl
    return term


def galician_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form — StopFilter
    precedes the stemmer), minimal stem."""
    if stopwords and term in stopwords:
        return None
    return galician_minimal_stem(term)


def galician_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
    rslp_steps=None,
) -> list[Token]:
    """``rslp_steps`` (from ``rslp.load_rslp`` over a mounted
    galician.rslp) switches the stemmer to the FULL RSLP
    GalicianStemFilter — GalicianAnalyzer's actual default; the rule
    file is Lucene resource data this repo loads but does not ship.
    Without it the chain uses GalicianMinimalStemFilter (the plural-only
    public variant, the gate row's documented subject)."""
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        if rslp_steps is not None:
            if stopwords and tok.term in stopwords:
                continue
            from .rslp import galician_stem

            t = galician_stem(tok.term, rslp_steps)
        else:
            t = galician_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def galician_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = galician_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
