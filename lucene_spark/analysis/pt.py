"""Portuguese analysis chain: StandardTokenizer → lowercase → stop → light
stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
pt/PortugueseAnalyzer.java:113 (createComponents order: LowerCase, Stop,
PortugueseLightStemFilter) and pt/PortugueseLightStemmer.java — the "UniNE"
light Portuguese stemmer from Jacques Savoy, "Light Stemming Approaches for
the French, Portuguese, German and Hungarian Languages" (ACM SAC 2006).
Reimplemented from the published algorithm, preserving the reference's
rule ORDER: plural-suffix rewrite (-es after r/s/l/z; -ns→m; -eis/-ais/
-óis→l-forms; -is→il; -ões/-ães→ão; -mente; bare -s), then feminine
normalization when the result ends in -a (-inha/-osa/-ica/…→o; -ona→ão;
-esa→ês), then a final -e/-a/-o strip, and ONLY THEN the accent fold
(ã/õ/ç included) — unlike the Spanish/Italian stemmers, folding runs last,
and terms shorter than 4 chars pass through entirely untouched.

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the function-word core of the snowball portuguese_stop.txt
list (PortugueseAnalyzer.getDefaultStopSet); pass your own frozenset to
override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "portuguese_light_stem",
    "portuguese_term",
    "portuguese_analyze",
    "portuguese_terms_positions",
    "PORTUGUESE_STOP_WORDS",
]

# function-word core of snowball's portuguese_stop.txt (public list)
PORTUGUESE_STOP_WORDS = frozenset(
    """de a o que e do da em um para é com não uma os no se na por mais as
    dos como mas foi ao ele das tem à seu sua ou ser quando muito há nos
    já está eu também só pelo pela até isso ela entre era depois sem mesmo
    aos ter seus quem nas me esse eles estão você tinha foram essa num nem
    suas meu às minha têm numa pelos elas havia seja qual será nós tenho
    lhe deles essas esses pelas este fosse dele tu te vocês vos lhes meus
    minhas teu tua teus tuas nosso nossa nossos nossas dela delas esta
    estes estas aquele aquela aqueles aquelas isto aquilo estou estamos
    esteja estejamos estejam estive esteve estivemos estiveram fui somos
    são éramos eram sou seja sejamos sejam fomos for fora tém tinham hei
    hão haja houve""".split()
)

_PT_FOLD = str.maketrans(
    {
        "à": "a", "á": "a", "â": "a", "ä": "a", "ã": "a",
        "ò": "o", "ó": "o", "ô": "o", "ö": "o", "õ": "o",
        "è": "e", "é": "e", "ê": "e", "ë": "e",
        "ù": "u", "ú": "u", "û": "u", "ü": "u",
        "ì": "i", "í": "i", "î": "i", "ï": "i",
        "ç": "c",
    }
)


def _remove_suffix(s: str) -> str:
    """PortugueseLightStemmer.removeSuffix: plural/adverb rewrites, first
    match wins."""
    n = len(s)
    if n > 4 and s.endswith("es") and s[-3] in "rslz":
        return s[:-2]
    if n > 3 and s.endswith("ns"):
        return s[:-2] + "m"  # bons -> bom
    if n > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:-3] + "el"  # papéis -> papel
    if n > 4 and s.endswith("ais"):
        return s[:-3] + "al"  # animais -> animal
    if n > 4 and s.endswith("óis"):
        return s[:-3] + "ol"  # lençóis -> lençol
    if n > 4 and s.endswith("is"):
        return s[:-2] + "il"  # barris -> barril
    if n > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:-3] + "ão"  # canções -> canção
    if n > 6 and s.endswith("mente"):
        return s[:-5]
    if n > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _norm_feminine(s: str) -> str:
    """PortugueseLightStemmer.normFeminine: applied when the suffix-removed
    term still ends in -a."""
    n = len(s)
    if n > 7 and (
        s.endswith("inha") or s.endswith("iaca") or s.endswith("eira")
    ):
        return s[:-1] + "o"
    if n > 6:
        if (
            s.endswith("osa") or s.endswith("ica") or s.endswith("ida")
            or s.endswith("ada") or s.endswith("iva") or s.endswith("ama")
        ):
            return s[:-1] + "o"
        if s.endswith("ona"):
            return s[:-3] + "ão"  # grandona -> grandão
        if s.endswith("ora"):
            return s[:-1]
        if s.endswith("esa"):
            return s[:-3] + "ês"  # portuguesa -> português
        if s.endswith("na"):
            return s[:-1] + "o"
    return s


def portuguese_light_stem(term: str) -> str:
    """PortugueseLightStemmer.stem (Savoy SAC 2006): rule order suffix →
    feminine → final-vowel strip → accent fold; len<4 passthrough."""
    if len(term) < 4:
        return term
    s = _remove_suffix(term)
    if len(s) > 3 and s[-1] == "a":
        s = _norm_feminine(s)
    if len(s) > 4 and s[-1] in ("e", "a", "o"):
        s = s[:-1]
    return s.translate(_PT_FOLD)


def portuguese_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form — StopFilter
    precedes the stemmer), light stem."""
    if stopwords and term in stopwords:
        return None
    return portuguese_light_stem(term)


def portuguese_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
    rslp_steps=None,
) -> list[Token]:
    """Default: PortugueseLightStemFilter (the PortugueseAnalyzer
    default). ``rslp_steps`` (from ``rslp.load_rslp`` over a mounted
    portuguese.rslp) switches to the full RSLP PortugueseStemFilter —
    verified stem-for-stem against the reference's own 32,016-entry
    ptrslptestdata vocabulary (tests/test_rslp_real.py)."""
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        if rslp_steps is not None:
            if stopwords and tok.term in stopwords:
                continue
            from .rslp import portuguese_stem

            t = portuguese_stem(tok.term, rslp_steps)
        else:
            t = portuguese_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def portuguese_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = portuguese_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
