"""Telugu analysis chain: StandardTokenizer → decimal-digit fold →
Telugu normalization → stop → stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
te/TeluguAnalyzer.java:120-131 (createComponents order — StopFilter runs
AFTER normalization), te/TeluguNormalizer.java (candrabindu→bindu, visarga
delete, long→short vowels and matras, decomposed diphthong/oo/au
composition, zwj/zwnj delete) and te/TeluguStemmer.java (longest-of
suffix strip, 4/2/1 chars, length-guarded). The script-generic
IndicNormalizationFilter step is scoped out like the Hindi/Bengali lanes.

All Telugu strings are codepoint escapes (combining-mark round-trip
safety). Pure per-term transform → the vectorized vocabulary-remap lane.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "telugu_normalize",
    "telugu_stem",
    "telugu_term",
    "telugu_analyze",
    "telugu_terms_positions",
    "TELUGU_STOP_WORDS",
]

# Telugu digits -> ASCII (DecimalDigitFilter subset)
_TE_DIGITS = str.maketrans({chr(0x0C66 + i): str(i) for i in range(10)})

# context-free single-char folds
_TE_MAP = {
    "\u0c00": "\u0c02",  # candrabindu -> bindu
    "\u0c01": "\u0c02",
    "\u0c14": "\u0c13",  # au -> oo
    "\u0c10": "\u0c0f",  # ai -> ee
    "\u0c06": "\u0c05",  # aa -> a
    "\u0c08": "\u0c07",  # ii -> i
    "\u0c0a": "\u0c09",  # uu -> u
    "\u0c40": "\u0c3f",  # long -> short matras
    "\u0c42": "\u0c41",
    "\u0c47": "\u0c46",
    "\u0c4b": "\u0c4a",
}
_TE_DELETE = frozenset(("\u0c03", "\u200c", "\u200d"))


def telugu_normalize(term: str) -> str:
    """TeluguNormalizer.normalize."""
    s = list(term.translate(_TE_DIGITS))
    i = 0
    while i < len(s):
        ch = s[i]
        if ch in _TE_DELETE:
            del s[i]
            continue
        if ch == "\u0c46" and i + 1 < len(s) and s[i + 1] == "\u0c56":
            # decomposed diphthong (e-matra + ai-length mark) -> ai matra
            s[i] = "\u0c48"
            del s[i + 1]
            i += 1
            continue
        if ch == "\u0c12" and i + 1 < len(s):
            if s[i + 1] == "\u0c55":   # o + length mark -> oo
                s[i] = "\u0c13"
                del s[i + 1]
                i += 1
                continue
            if s[i + 1] == "\u0c4c":   # o + au-length mark -> au
                s[i] = "\u0c14"
                del s[i + 1]
                i += 1
                continue
        if ch in _TE_MAP:
            s[i] = _TE_MAP[ch]
        i += 1
    return "".join(s)


# TeluguStemmer.java suffix groups; strip len(suffix), guard len > strip+1
_TE_GROUPS = (
    (4, ("\u0c33\u0c4d\u0c33\u0c41", "\u0c21\u0c4d\u0c32\u0c41")),
    (2, ("\u0c21\u0c41", "\u0c2e\u0c41", "\u0c35\u0c41", "\u0c32\u0c41", "\u0c28\u0c3f", "\u0c28\u0c41", "\u0c1a\u0c47", "\u0c15\u0c48", "\u0c32\u0c4b", "\u0c26\u0c3f", "\u0c15\u0c3f", "\u0c38\u0c41", "\u0c35\u0c48", "\u0c2a\u0c48")),
    (1, ("\u0c3f", "\u0c40", "\u0c41", "\u0c42", "\u0c46", "\u0c47", "\u0c4a", "\u0c4b", "\u0c3e")),
)


def telugu_stem(term: str) -> str:
    """TeluguStemmer.stem: the first (longest-group) matching suffix wins."""
    n = len(term)
    for strip, sufs in _TE_GROUPS:
        if n > strip + 1 and term.endswith(sufs):
            return term[:-strip]
    return term


# function-word core of the Lucene telugu stopword list (public), stored
# normalized (StopFilter follows normalization in the reference chain)
TELUGU_STOP_WORDS = frozenset(
    telugu_normalize(w)
    for w in (
        "\u0c05\u0c02\u0c26\u0c41",            # andu
        "\u0c05\u0c28\u0c3f",                   # ani
        "\u0c08",                                 # ii
        "\u0c0f\u0c26\u0c3f",                   # edi
        "\u0c12\u0c15",                          # oka
        "\u0c15\u0c42\u0c21\u0c3e",            # kuudaa
        "\u0c15\u0c3e\u0c28\u0c3f",            # kaani
        "\u0c2e\u0c30\u0c3f\u0c2f\u0c41",     # mariyu (and)
        "\u0c08\u0c2f\u0c28",                   # iiyana
        "\u0c05\u0c02\u0c26\u0c41\u0c32\u0c4b",  # andulo
    )
)


def telugu_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: normalize, stop on the NORMALIZED
    form (TeluguAnalyzer.java:128), stem."""
    t = telugu_normalize(term)
    if not t:
        return None
    if stopwords and t in stopwords:
        return None
    return telugu_stem(t)


def telugu_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = telugu_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def telugu_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = telugu_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
