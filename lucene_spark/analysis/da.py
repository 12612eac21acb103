"""Danish analysis chain: StandardTokenizer → lowercase → stop → snowball
Danish stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
da/DanishAnalyzer.java (createComponents: StandardTokenizer, LowerCase,
Stop, SnowballFilter(DanishStemmer)) and the published snowball Danish
stemmer (https://snowballstem.org/algorithms/danish/stemmer.html;
generated form org/tartarus/snowball/ext/DanishStemmer.java).
Reimplemented from the published algorithm:

- R1 = after the first non-vowel following the first vowel, clamped to
  start no earlier than position 3 (the Scandinavian 3-letter minimum);
- main suffix pass: the longest of the 32 -e/-en/-er/-et/-hed/... forms
  that FITS inside R1 deletes; a bare -s deletes only after one of the
  ``s_ending`` letters;
- consonant-pair pass: a word now ending gd/dt/gt/kt (pair inside R1)
  drops its final letter;
- other-suffix pass: -igst drops its -st unconditionally, then
  -ig/-lig/-elig/-els in R1 delete (re-running the consonant-pair rule),
  and -løst rewrites to -løs;
- undouble: a final double consonant inside R1 loses one letter.

Pure per-term transform → the vectorized vocabulary-remap lane applies.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "danish_stem",
    "danish_term",
    "danish_analyze",
    "danish_terms_positions",
    "DANISH_STOP_WORDS",
]

# function-word core of snowball's danish_stop.txt (public list)
DANISH_STOP_WORDS = frozenset(
    """og i jeg det at en den til er som på de med han af for ikke der var
    mig sig men et har om vi min havde ham hun nu over da fra du ud sin dem
    os op man hans hvor eller hvad skal selv her alle vil blev kunne ind
    når være dog noget ville jo deres efter ned skulle denne end dette mit
    også under have dig anden hende mine alt meget sit sine vor mod disse
    hvis din nogle hos blive mange ad bliver hendes været thi jer
    sådan""".split()
)

_VOWELS = frozenset("aeiouyåæø")
_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")
_CONSONANTS = frozenset("bcdfghjklmnpqrstvwxz")

# main-suffix among (delete when inside R1), longest first
_MAIN_SFX = tuple(sorted((
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
    "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
    "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
    "ers", "ets", "erets", "et", "eret",
), key=len, reverse=True))

_PAIRS = ("gd", "dt", "gt", "kt")

# other-suffix among, longest first: (suffix, action)
_OTHER_SFX = (("elig", "del"), ("løst", "løs"), ("lig", "del"),
              ("els", "del"), ("ig", "del"))


def _r1(w: str) -> int:
    n = len(w)
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    if i >= n:
        return n
    while i < n and w[i] in _VOWELS:
        i += 1
    if i >= n:
        return n
    p1 = i + 1
    return max(p1, 3) if n >= 3 else n


def _consonant_pair(w: str, p1: int) -> str:
    if len(w) >= 2 and w[-2:] in _PAIRS and len(w) - 2 >= p1:
        return w[:-1]
    return w


def danish_stem(term: str) -> str:
    """Snowball Danish stemmer on a lowercased token."""
    w = term
    p1 = _r1(w)
    # main suffix: longest form fitting inside R1
    n = len(w)
    for sfx in _MAIN_SFX:
        if w.endswith(sfx) and n - len(sfx) >= p1:
            w = w[: n - len(sfx)]
            break
    else:
        if w.endswith("s") and n - 1 >= p1 and n >= 2 and w[-2] in _S_ENDING:
            w = w[:-1]
    w = _consonant_pair(w, p1)
    # other suffix
    if w.endswith("igst"):
        w = w[:-2]
    n = len(w)
    for sfx, act in _OTHER_SFX:
        if w.endswith(sfx) and n - len(sfx) >= p1:
            if act == "del":
                w = w[: n - len(sfx)]
                w = _consonant_pair(w, p1)
            else:
                w = w[: n - len(sfx)] + "løs"
            break
    # undouble
    if (
        len(w) >= 2
        and w[-1] in _CONSONANTS
        and len(w) - 1 >= p1
        and w[-2] == w[-1]
    ):
        w = w[:-1]
    return w


def danish_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    if stopwords and term in stopwords:
        return None
    return danish_stem(term)


def danish_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = danish_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def danish_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = danish_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
