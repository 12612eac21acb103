"""Irish analysis chain: StandardTokenizer → hyphenation-part stop →
elision → Irish lowercase → stop → snowball Irish stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
ga/IrishAnalyzer.java:127 (createComponents order — note the FIRST stop
filter runs BEFORE lowercasing and drops the bare "h"/"n"/"t" fragments
StandardTokenizer splits off "n-athair"-style hyphenations, case-insensitive,
so phrase positions line up with the unhyphenated "nAthair" spelling),
ga/IrishLowerCaseFilter.java:33 (n/t + uppercase-vowel prothesis: insert a
'-' after the initial consonant, lowercase the rest) and the published
snowball Irish stemmer (https://snowballstem.org/algorithms/irish/stemmer.html;
generated form org/tartarus/snowball/ext/IrishStemmer.java). Reimplemented
here from the published algorithm as data-driven rule tables:

- initial mutation strip (forward, longest match): lenition/eclipsis
  prefixes (bh→b, mb→b, gc→c, fh→f, …) and the d'/m'/b'/h-/n-/t- particles;
- regions pV/p1/p2 marked AFTER the prefix rewrite (pV = past the first
  vowel, p1 = past the following consonant, p2 = one vowel-consonant pair
  further — the standard R1/R2 construction);
- three independent backward passes on the running result: noun suffixes
  (-íocht(a)/-(e)abh/-(a)ibh/-(e)amh/-(a)imh in R1; -(a)ire/-(a)irí in R2),
  derivational suffixes (-(e)acht(a)(úil) in R2; arc-/gin-/graf-/paite-/óid-
  rewrites unconditionally), verb suffixes (-(a)imid/-(a)ímid/-f(a)idh in
  RV; -(e)adh/-áil/-ain/-t(e)ar in R1). Longest suffix wins its pass; a
  failed region condition does NOT fall back to a shorter suffix.

This chain is case-SENSITIVE before the lowercase step (prothesis detection
reads the original capitals), so it runs on the per-document original-case
lane of analysis/vectorized.py, not the vocabulary-remap lane.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, _lowercase, tokenize

__all__ = [
    "irish_lowercase",
    "irish_stem",
    "irish_analyze",
    "irish_terms_positions",
    "IRISH_STOP_WORDS",
    "IRISH_ARTICLES",
    "HYPHENATION_PARTS",
]

# IrishAnalyzer.DEFAULT_ARTICLES / HYPHENATIONS (public constants)
IRISH_ARTICLES = frozenset(("d", "m", "b"))
HYPHENATION_PARTS = frozenset(("h", "n", "t"))

# function-word core of snowball's irish_stop.txt (public list)
IRISH_STOP_WORDS = frozenset(
    """a ach ag agus an aon ar arna as ba beirt bhúr chomh chuig chun cois
    céad dar de den dhá do don dtí dá dár dó faoi faoin faoina faoinár fara
    gach gan go gur i iad idir in ina ins inár is le leis lena lenár mar mo
    mé na nach ná ní níor nó ocht os roimh sa seacht siad sibh sinn sna sé
    sí tar thar thú trí trína trínár tú um ár é éis í ó ón óna ónár""".split()
)

_VOWELS = frozenset("aeiouáéíóú")
_UPPER_VOWELS = frozenset("AEIOUÁÉÍÓÚ")

# initial-mutation table, longest match first (snowball irish `initial_morph`)
_PREFIX_RULES: tuple[tuple[str, str], ...] = (
    ("d'fh", "f"),
    ("bhf", "f"),
    ("b'", ""), ("bh", "b"), ("bp", "p"), ("ch", "c"), ("d'", ""),
    ("dh", "d"), ("dt", "t"), ("fh", "f"), ("gc", "c"), ("gh", "g"),
    ("h-", ""), ("m'", ""), ("mb", "b"), ("mh", "m"), ("n-", ""),
    ("nd", "d"), ("ng", "g"), ("ph", "p"), ("sh", "s"), ("t-", ""),
    ("th", "t"), ("ts", "s"),
)

# backward passes: (suffix, region, replacement); region '1'/'2'/'V'/None.
# Each tuple list is scanned longest-suffix-first within its pass.
def _by_len(rules):
    return tuple(sorted(rules, key=lambda r: -len(r[0])))


_NOUN_SFX = _by_len(
    [(s, "1", "") for s in (
        "íochta", "aíochta", "abh", "eabh", "ibh", "aibh",
        "amh", "eamh", "imh", "aimh", "íocht", "aíocht",
    )]
    + [(s, "2", "") for s in ("ire", "aire", "irí", "airí")]
)

_DERIV_SFX = _by_len(
    [(s, "2", "") for s in (
        "achta", "eachta", "ach", "each", "achtúil", "eachtúil",
        "acht", "eacht",
    )]
    + [(s, None, "arc") for s in ("arcachta", "arcacht", "arcachtaí")]
    + [(s, None, "gin") for s in ("gineach", "gineas", "ginis")]
    + [(s, None, "graf") for s in (
        "grafaíochta", "grafaíoch", "grafaíocht", "grafaíochtaí",
    )]
    + [(s, None, "paite") for s in ("patacha", "paite", "patach", "pataigh")]
    + [(s, None, "óid") for s in ("óideacha", "óideach", "óidigh")]
)

_VERB_SFX = _by_len(
    [(s, "V", "") for s in ("imid", "aimid", "ímid", "aímid", "faidh", "fidh")]
    + [(s, "1", "") for s in ("adh", "eadh", "áil", "ain", "tear", "tar")]
)


def irish_lowercase(term: str) -> str:
    """IrishLowerCaseFilter.incrementToken: an initial lowercase 'n' or 't'
    followed by an UPPERCASE vowel is prothesis/eclipsis on a proper noun —
    keep it, restore the written hyphen ('nAthair' → 'n-athair'), lowercase
    the remainder per-codepoint."""
    if len(term) > 1 and term[0] in "nt" and term[1] in _UPPER_VOWELS:
        return term[0] + "-" + _lowercase(term[1:])
    return _lowercase(term)


def _regions(s: str) -> tuple[int, int, int]:
    """(pV, p1, p2) — each the index just PAST the marking character, or
    len(s) when the pattern runs off the end."""
    n = len(s)
    pV = p1 = p2 = n
    i = 0
    while i < n and s[i] not in _VOWELS:
        i += 1
    if i >= n:
        return pV, p1, p2
    pV = i + 1
    i += 1
    while i < n and s[i] in _VOWELS:
        i += 1
    if i >= n:
        return pV, p1, p2
    p1 = i + 1
    i += 1
    while i < n and s[i] not in _VOWELS:
        i += 1
    if i >= n:
        return pV, p1, p2
    i += 1  # past the vowel
    while i < n and s[i] in _VOWELS:
        i += 1
    if i >= n:
        return pV, p1, p2
    p2 = i + 1
    return pV, p1, p2


def _apply_backward(s: str, rules, pV: int, p1: int, p2: int) -> str:
    """One snowball backward pass: longest matching suffix wins; its region
    condition either fires the rewrite or kills the whole pass."""
    for sfx, region, repl in rules:
        if not s.endswith(sfx):
            continue
        start = len(s) - len(sfx)
        if region == "1" and start < p1:
            return s
        if region == "2" and start < p2:
            return s
        if region == "V" and start < pV:
            return s
        return s[:start] + repl
    return s


def irish_stem(term: str) -> str:
    """Snowball Irish stemmer on a lowercased token."""
    s = term
    for pfx, repl in _PREFIX_RULES:
        if s.startswith(pfx):
            s = repl + s[len(pfx):]
            break
    pV, p1, p2 = _regions(s)
    s = _apply_backward(s, _NOUN_SFX, pV, p1, p2)
    s = _apply_backward(s, _DERIV_SFX, pV, p1, p2)
    s = _apply_backward(s, _VERB_SFX, pV, p1, p2)
    return s


def _elide_ci(term: str) -> str:
    """ElisionFilter with IrishAnalyzer.DEFAULT_ARTICLES (d/m/b), case-
    insensitive like the reference CharArraySet: strip through the FIRST
    apostrophe (' or U+2019) when the prefix is an article."""
    i = min(
        (j for j in (term.find("'"), term.find("’")) if j >= 0),
        default=-1,
    )
    if i < 0:
        return term
    return term[i + 1:] if term[:i].lower() in IRISH_ARTICLES else term


def irish_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in tokenize(text, max_token_length):
        raw = tok.term
        # pre-lowercase stop on the h/n/t fragments of written hyphenations
        # (IrishAnalyzer.HYPHENATIONS, ignoreCase=true) — keeps the position
        # increment so phrases match the solid 'nAthair' spelling
        if raw.lower() in HYPHENATION_PARTS:
            continue
        t = _elide_ci(raw)
        if not t:
            continue
        t = irish_lowercase(t)
        if stopwords and t in stopwords:
            continue
        t = irish_stem(t)
        if not t:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def irish_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = irish_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
