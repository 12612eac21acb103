"""Serbian analysis chain: StandardTokenizer → lowercase → stop → snowball
Serbian stem → Serbian normalization (Latin ASCII folding).

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
sr/SerbianAnalyzer.java:112-120 (createComponents: StandardTokenizer,
LowerCase, Stop, SetKeywordMarker, SnowballFilter(SerbianStemmer),
SerbianNormalizationFilter — note the stop filter runs BEFORE stemming and
its public list carries Cyrillic, Latin-diacritic and bald-Latin variants),
sr/SerbianNormalizationFilter.java (Cyrillic→Latin + diacritic folding:
ђ/đ→dj, љ→lj, њ→nj, џ→dz, ж/з/ž→z, ћ/ц/ч/č/ć→c, ш/š→s) and the published
snowball Serbian stemmer (https://snowballstem.org/algorithms/serbian/
stemmer.html; generated form org/tartarus/snowball/ext/SerbianStemmer.java
— suffix/replacement tables extracted into sr_tables.py with
tools/gen_serbian_tables.py, control flow reimplemented here). Vectors
replayed from TestSerbianAnalyzer.java and
TestSerbianNormalizationFilter.java.

Stemmer steps:
- cyr_to_lat: per-character Cyrillic→Latin (ђ→đ, љ→lj, њ→nj, џ→dž, ...);
- prelude: C'ije'C→CeC, C'je'C→CeC (C = consonant incl. č/ć/đ/š/ž),
  dj→đ, each rule swept over the whole word;
- mark_regions: no_diacritics = word has none of ć č đ š ž; p1 = one past
  the first vowel, or (when that is < 2) one past the first following
  non-vowel; a first 'r' whose end is ≥ 2 (or one past the first non-r run
  after it) takes over when it precedes p1 by > 1 (syllabic r);
- Step_1 (ungated suffix map), then Step_2 (R1-gated map) else Step_3
  (R1-gated delete). A `needs_no_diacritics` entry fails its whole step
  when the word carries a diacritic — with NO fallback to shorter
  suffixes (snowball find_among_b semantics).

Pure per-term transform → the vectorized vocabulary-remap lane applies.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .sr_tables import CYR_TO_LAT, STEP1, STEP2, STEP3
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "serbian_stem",
    "serbian_normalize",
    "serbian_term",
    "serbian_analyze",
    "serbian_terms_positions",
    "SERBIAN_STOP_WORDS",
]

# Lucene sr/stopwords.txt (public list; stop runs BEFORE stemming)
SERBIAN_STOP_WORDS = frozenset(
    """i ili a ali pa biti ne jesam sam jesi si je jesmo smo jeste ste jesu
    su nijesam nisam nijesi nisi nije nijesmo nismo nijeste niste nijesu
    nisu budem budeš bude budemo budete budu budes bih bi bismo biste biše
    bise bio bili budimo budite bila bilo bile ću ćeš će ćemo ćete neću
    nećeš neće nećemo nećete cu ces ce cemo cete necu neces nece necemo
    necete mogu možeš može možemo možete mozes moze mozemo mozete и или а
    али па бити не јесам сам јеси си је јесмо смо јесте сте јесу су нијесам
    нисам нијеси ниси није нијесмо нисмо нијесте нисте нијесу нису будем
    будеш буде будемо будете буду будес бих би бисмо бисте бише бисе био
    били будимо будите била било биле ћу ћеш ће ћемо ћете нећу нећеш неће
    нећемо нећете цу цес це цемо цете нецу нецес неце нецемо нецете могу
    можеш може можемо можете мозес мозе моземо мозете""".split()
)

_V = frozenset("aeiou")
_DIACRITICS = frozenset("ćčđšž")
# g_ca: consonants that frame the ije/je contractions
_CONS = frozenset("bcdfghjklmnprstvzćčđšž")

_CYR_MAP = str.maketrans(CYR_TO_LAT)

# SerbianNormalizationFilter.java folds (applied AFTER stemming)
_NORM_MAP = str.maketrans(
    {
        "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "dj",
        "đ": "dj", "е": "e", "ж": "z", "з": "z", "ž": "z", "и": "i",
        "ј": "j", "к": "k", "л": "l", "љ": "lj", "м": "m", "н": "n",
        "њ": "nj", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t",
        "ћ": "c", "ц": "c", "ч": "c", "č": "c", "ć": "c", "у": "u",
        "ф": "f", "х": "h", "џ": "dz", "ш": "s", "š": "s",
    }
)

# descending length buckets for longest-suffix matching
_S1_LENS = sorted({len(s) for s in STEP1}, reverse=True)
_S2_LENS = sorted({len(s) for s in STEP2}, reverse=True)
_S3_LENS = sorted({len(s) for s in STEP3}, reverse=True)


def serbian_normalize(term: str) -> str:
    """SerbianNormalizationFilter: Cyrillic→bald Latin + diacritic folds."""
    return term.translate(_NORM_MAP)


def _prelude(w: str) -> str:
    # C ije C -> C e C (sweep left-to-right; a replacement's 'e' cannot
    # seed a new match, so one pass per rule is exact)
    for pat in ("ije", "je"):
        i = 0
        while True:
            i = w.find(pat, i)
            if i < 0:
                break
            if (
                i > 0
                and w[i - 1] in _CONS
                and i + len(pat) < len(w)
                and w[i + len(pat)] in _CONS
            ):
                w = w[:i] + "e" + w[i + len(pat):]
                i += 1
            else:
                i += 1
    return w.replace("dj", "đ")


def _mark_p1(w: str) -> int:
    n = len(w)
    p1 = n
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    if i < n:
        p1 = i + 1
        if p1 < 2:
            j = p1
            while j < n and w[j] in _V:
                j += 1
            if j < n:
                p1 = j + 1
            # else: the whole tail is vowels — p1 keeps i + 1
            # (SerbianStemmer.java golab6 breaks lab3 without assigning)
    # syllabic r: a first 'r' ending at ≥ 2 (else one past the first
    # non-r after it) wins when it precedes p1 by more than 1
    ri = w.find("r")
    if ri >= 0:
        c = ri + 1
        if c < 2:
            j = c
            while j < n and w[j] == "r":
                j += 1
            c = j + 1 if j < n else None
        if c is not None and p1 - c > 1:
            p1 = c
    return p1


def _longest_sfx(w: str, table, lens):
    for L in lens:
        if L <= len(w) and w[-L:] in table:
            return w[-L:]
    return None


def serbian_stem(term: str) -> str:
    """SerbianStemmer.stem on a lowercased token."""
    w = term.translate(_CYR_MAP)
    w = _prelude(w)
    no_diacritics = not (_DIACRITICS & set(w))
    p1 = _mark_p1(w)

    sfx = _longest_sfx(w, STEP1, _S1_LENS)
    if sfx is not None:
        repl, nd = STEP1[sfx]
        if not nd or no_diacritics:
            w = w[: len(w) - len(sfx)] + repl
            # Step_1 is ungated and changes length; regions were frozen
            # before it in the reference (mark_regions runs first), so p1
            # keeps its absolute character offset
    sfx = _longest_sfx(w, STEP2, _S2_LENS)
    fired = False
    if sfx is not None and len(w) - len(sfx) >= p1:
        repl, nd = STEP2[sfx]
        if not nd or no_diacritics:
            w = w[: len(w) - len(sfx)] + repl
            fired = True
    if not fired:
        sfx = _longest_sfx(w, STEP3, _S3_LENS)
        if sfx is not None and len(w) - len(sfx) >= p1:
            w = w[: len(w) - len(sfx)]
    return w


def serbian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    if stopwords and term in stopwords:
        return None
    return serbian_normalize(serbian_stem(term))


def serbian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = serbian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def serbian_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = serbian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
