"""Dutch analysis chain: StandardTokenizer → lowercase → stop → stem
override dict → snowball Dutch stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
nl/DutchAnalyzer.java:150-158 (createComponents order, incl. the 4-entry
DEFAULT_STEM_DICT StemmerOverrideFilter: fiets/bromfiets keep themselves,
ei→eier, kind→kinder) and the published snowball Dutch stemmer
(https://snowballstem.org/algorithms/dutch/stemmer.html; generated form
org/tartarus/snowball/ext/DutchStemmer.java). Reimplemented from the
published algorithm:

- prelude: fold the umlaut/acute vowels to their plain forms, mark an
  initial y and every post-vocalic y as consonantal ``Y``, and an i
  BETWEEN vowels as ``I`` (postlude folds them back);
- R1 (clamped to start ≥ 3) / R2 per the standard construction, vowels =
  a e i o u y è;
- standard-suffix pass: -heden→-heid in R1; -en(e) deletes in R1 after a
  non-vowel that isn't the "gem" prefix-tail, with dd/kk/tt undoubling;
  -s(e) deletes in R1 after a non-vowel that isn't j; then an -e after a
  non-vowel in R1 deletes (setting e_found); -heid deletes in R2 unless
  after c, cascading into -en; -end/-ing delete in R2 (a preceding -ig in
  R2 not after e also goes, else undouble); -ig (not after e), -lijk
  (then the -e rule again), -baar, and -bar (only when e_found) delete in
  R2; finally a long vowel aa/ee/oo/uu undoubles before a final
  consonant.

Pure per-term transform → the vectorized vocabulary-remap lane applies.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "dutch_stem",
    "dutch_term",
    "dutch_analyze",
    "dutch_terms_positions",
    "DUTCH_STOP_WORDS",
    "DUTCH_STEM_OVERRIDES",
]

# function-word core of snowball's dutch_stop.txt (public list)
DUTCH_STOP_WORDS = frozenset(
    """de en van ik te dat die in een hij het niet zijn is was op aan met
    als voor had er maar om hem dan zou of wat mijn men dit zo door over ze
    zich bij ook tot je mij uit der daar haar naar heb hoe heeft hebben
    deze u want nog zal me zij nu ge geen omdat iets worden toch al waren
    veel meer doen toen moet ben zonder kan hun dus alles onder ja eens
    hier wie werd altijd doch wordt wezen kunnen ons zelf tegen na reeds
    wil kon niets uw iemand geweest andere""".split()
)

# DutchAnalyzer.DEFAULT_STEM_DICT (StemmerOverrideFilter entries)
DUTCH_STEM_OVERRIDES = {
    "fiets": "fiets",
    "bromfiets": "bromfiets",
    "ei": "eier",
    "kind": "kinder",
}

_V = frozenset("aeiouyè")
_V_J = _V | {"j"}

_FOLD = str.maketrans({
    "á": "a", "ä": "a", "é": "e", "ë": "e", "í": "i", "ï": "i",
    "ó": "o", "ö": "o", "ú": "u", "ü": "u",
})


def _prelude(w: str) -> str:
    w = w.translate(_FOLD)
    s = list(w)
    if s and s[0] == "y":
        s[0] = "Y"
    n = len(s)
    for i in range(n - 1):
        if s[i] in _V:
            if s[i + 1] == "i" and i + 2 < n and s[i + 2] in _V:
                s[i + 1] = "I"
            elif s[i + 1] == "y":
                s[i + 1] = "Y"
    return "".join(s)


def _mark(w: str) -> tuple[int, int]:
    n = len(w)
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    while i < n and w[i] in _V:
        i += 1
    if i >= n:
        return n, n
    p1 = max(i + 1, 3)
    i += 1
    while i < n and w[i] not in _V:
        i += 1
    while i < n and w[i] in _V:
        i += 1
    if i >= n:
        return p1, n
    return p1, i + 1


def _undouble(w: str) -> str:
    if w.endswith(("dd", "kk", "tt")):
        return w[:-1]
    return w


def dutch_stem(term: str) -> str:
    """Snowball Dutch stemmer on a lowercased token."""
    w = _prelude(term)
    p1, p2 = _mark(w)
    e_found = False

    def e_ending(s: str) -> str:
        nonlocal e_found
        if (
            s.endswith("e")
            and len(s) - 1 >= p1
            and len(s) >= 2
            and s[-2] not in _V
        ):
            e_found = True
            return _undouble(s[:-1])
        return s

    def en_ending(s: str, strip: int) -> tuple[str, bool]:
        start = len(s) - strip
        if start < p1:
            return s, False
        rest = s[:start]
        if not rest or rest[-1] in _V or rest.endswith("gem"):
            return s, False
        return _undouble(rest), True

    # --- step 1: plural / genitive suffixes -------------------------------
    n = len(w)
    if w.endswith("heden"):
        if n - 5 >= p1:
            w = w[: n - 5] + "heid"
    elif w.endswith("ene"):
        w, _ = en_ending(w, 3)
    elif w.endswith("en"):
        w, _ = en_ending(w, 2)
    elif w.endswith("se"):
        if n - 2 >= p1 and n >= 3 and w[-3] not in _V_J:
            w = w[:-2]
    elif w.endswith("s"):
        if n - 1 >= p1 and n >= 2 and w[-2] not in _V_J:
            w = w[:-1]

    # --- step 2: the -e rule ----------------------------------------------
    w = e_ending(w)

    # --- step 3: -heid (R2, not after c), cascading into -en --------------
    if w.endswith("heid") and len(w) - 4 >= p2 and (
        len(w) < 5 or w[-5] != "c"
    ):
        w = w[:-4]
        if w.endswith("en"):
            w, _ = en_ending(w, 2)

    # --- step 4: derivational suffixes (longest match, no fallback) -------
    n = len(w)
    if w.endswith("lijk"):
        if n - 4 >= p2:
            w = e_ending(w[:-4])
    elif w.endswith("baar"):
        if n - 4 >= p2:
            w = w[:-4]
    elif w.endswith(("end", "ing")):
        if n - 3 >= p2:
            w = w[:-3]
            if (
                w.endswith("ig")
                and len(w) - 2 >= p2
                and (len(w) < 3 or w[-3] != "e")
            ):
                w = w[:-2]
            else:
                w = _undouble(w)
    elif w.endswith("bar"):
        if n - 3 >= p2 and e_found:
            w = w[:-3]
    elif w.endswith("ig"):
        if n - 2 >= p2 and (n < 3 or w[-3] != "e"):
            w = w[:-2]

    # --- step 5: undouble a long vowel before a final consonant -----------
    if (
        len(w) >= 4
        and w[-1] not in _V
        and w[-1] != "I"
        and w[-3:-1] in ("aa", "ee", "oo", "uu")
        and w[-4] not in _V
    ):
        w = w[:-2] + w[-1]

    # postlude
    return w.translate({ord("Y"): "y", ord("I"): "i"})


def dutch_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop, override dict (keyword-marks
    the token — it skips the stemmer entirely), snowball stem."""
    if stopwords and term in stopwords:
        return None
    ov = DUTCH_STEM_OVERRIDES.get(term)
    if ov is not None:
        return ov
    return dutch_stem(term)


def dutch_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = dutch_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def dutch_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = dutch_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
