"""Italian analysis chain: StandardTokenizer → elision → lowercase → stop →
light stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
it/ItalianAnalyzer.java:113 (createComponents order: ElisionFilter with the
Italian DEFAULT_ARTICLES, LowerCase, Stop, ItalianLightStemFilter) and
it/ItalianLightStemmer.java — Jacques Savoy's light Italian stemmer
("Report on CLEF-2001 Experiments"). Reimplemented from the published
algorithm: terms shorter than 6 chars pass through untouched (no folding
either); otherwise accents fold, then the final vowel strips — taking a
preceding 'i' with it ("storia" → "stor"), and final -e/-i also absorb a
preceding 'h' ("amiche" → "amic", keeping the hard-c stem).

Elision is a pure per-term transform (the tokenizer keeps apostrophe-joined
words whole), so the whole chain runs once per DISTINCT vocabulary term via
the vectorized remap lane (analysis/vectorized.py).

The stop set is the high-frequency function-word core of the snowball
italian_stop.txt list (ItalianAnalyzer.getDefaultStopSet); pass your own
frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .fr import elide
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "italian_elide",
    "italian_light_stem",
    "italian_term",
    "italian_analyze",
    "italian_terms_positions",
    "ITALIAN_STOP_WORDS",
    "ITALIAN_ARTICLES",
]

# ItalianAnalyzer.DEFAULT_ARTICLES (public constant list)
ITALIAN_ARTICLES = frozenset(
    """c l all dall dell nell sull coll pell gl agl dagl degl negl sugl un
    m t s v d""".split()
)

# function-word core of snowball's italian_stop.txt (public list)
ITALIAN_STOP_WORDS = frozenset(
    """ad al allo ai agli all agl alla alle con col coi da dal dallo dai
    dagli dall dagl dalla dalle di del dello dei degli dell degl della
    delle in nel nello nei negli nell negl nella nelle su sul sullo sui
    sugli sull sugl sulla sulle per tra contro io tu lui lei noi voi loro
    mio mia miei mie tuo tua tuoi tue suo sua suoi sue nostro nostra
    nostri nostre vostro vostra vostri vostre mi ti ci vi lo la li le gli
    ne il un uno una ma ed se perché anche come dov dove che chi cui non
    più quale quanto quanti quanta quante quello quelli quella quelle
    questo questi questa queste si tutto tutti a c e i l o ha ho hai hanno
    abbiamo avete è sono sei siamo siete era erano sarà sia fu essere""".split()
)

# ItalianLightStemmer's accent fold (applied only when len >= 6 — the
# reference returns short terms before touching the buffer)
_IT_FOLD = str.maketrans(
    {
        "à": "a", "á": "a", "â": "a", "ä": "a",
        "ò": "o", "ó": "o", "ô": "o", "ö": "o",
        "è": "e", "é": "e", "ê": "e", "ë": "e",
        "ù": "u", "ú": "u", "û": "u", "ü": "u",
        "ì": "i", "í": "i", "î": "i", "ï": "i",
    }
)


def italian_elide(term: str) -> str:
    """ElisionFilter with ItalianAnalyzer.DEFAULT_ARTICLES ("l'aereo" →
    "aereo", "dell'arte" → "arte")."""
    return elide(term, ITALIAN_ARTICLES)


def italian_light_stem(term: str) -> str:
    """ItalianLightStemmer.stem (Savoy CLEF-2001): fold accents, strip the
    final vowel (with a preceding i, or h before e/i) — len guard first,
    like the reference."""
    if len(term) < 6:
        return term
    s = term.translate(_IT_FOLD)
    last = s[-1]
    if last == "e":
        return s[:-2] if s[-2] in ("i", "h") else s[:-1]
    if last == "i":
        return s[:-2] if s[-2] in ("h", "i") else s[:-1]
    if last == "a":
        return s[:-2] if s[-2] == "i" else s[:-1]
    if last == "o":
        return s[:-2] if s[-2] == "i" else s[:-1]
    return s


def italian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: elide, stop (on the elided surface
    form — StopFilter follows ElisionFilter in the reference chain), light
    stem."""
    t = italian_elide(term)
    if not t or (stopwords and t in stopwords):
        return None
    return italian_light_stem(t)


def italian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = italian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def italian_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = italian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
