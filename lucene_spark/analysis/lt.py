"""Lithuanian analysis chain: StandardTokenizer → lowercase → stop →
snowball Lithuanian stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
lt/LithuanianAnalyzer.java (createComponents: StandardTokenizer, LowerCase,
Stop, SetKeywordMarker, SnowballFilter(LithuanianStemmer)) and the published
snowball Lithuanian stemmer (https://snowballstem.org/algorithms/lithuanian/
stemmer.html; generated form org/tartarus/snowball/ext/
LithuanianStemmer.java). Test vectors replayed from analysis/common/src/
test/org/apache/lucene/analysis/lt/TestLithuanianStemming.java (noun
declensions I–V, adjective declensions I–III, high-frequency corpus terms).
Reimplemented from the published algorithm:

- vowels = a e i o u y ą ė ę į ū ų (the nasal/macron vowels count; č š ž
  do not);
- R1 = after the first non-vowel following the first vowel — except that a
  word starting with ``a`` of length ≥ 7 starts the scan at position 1
  (the "abejoti" rule);
- fix_conflicts (whole word): rewrite the colliding noun/verb forms —
  -aite(s)→-aitė, -uote(s)→-uotė, -ėjime→-ėjimas, -esiu→-esys,
  -asius→-asys, -avime→-avimas, -ojime→-ojimas, -okate(s)→-okatė;
- step1 (once): delete the longest of the ~200 inflectional endings that
  lies entirely inside R1;
- fix_chdz: final č→t, final dž→d (runs after step1 AND after step2);
- step2 (repeat until no match): delete derivational endings inside R1
  (-ing, -iausi..., -ėl, -yl, -ok, -išk, -yb, -dav, ykšt/ykšč, ...);
- fix_gd: final gd→g.

Pure per-term transform → the vectorized vocabulary-remap lane applies.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "lithuanian_stem",
    "lithuanian_term",
    "lithuanian_analyze",
    "lithuanian_terms_positions",
    "LITHUANIAN_STOP_WORDS",
]

# snowball/Lucene Lithuanian stopword list (public list)
LITHUANIAN_STOP_WORDS = frozenset(
    """ant apie ar arba aš be bei bet bus būti būtų buvo dėl gali į iki ir
    iš ja ją jai jais jam jame jas jei ji jį jie jiedu jiedvi jiedviem
    jiedviese jiems jis jo jodviem jog joje jomis joms jos jose jų judu
    judvi judviejų jųdviejų judviem judviese jumis jums jumyse juo juodu
    juodviese juos juose jus jūs jūsų ką kad kai kaip kas kiek kol kur
    kurie kuris man mane manęs manimi mano manyje mes metu mudu mudvi
    mudviejų mudviem mudviese mumis mums mumyse mus mūsų nei nes net nors
    nuo o pat per po prie prieš sau save savęs savimi savo savyje su
    tačiau tada tai taip tas tau tave tavęs tavimi tavyje ten to todėl tu
    tuo už visi yra""".split()
)

_VOWELS = frozenset("aeiouyąėęįūų")

# step-1 inflectional endings (delete inside R1), longest-first
_STEP1 = tuple(sorted((
    "a", "ia", "eria", "osna", "iosna", "uosna", "iuosna", "ysna", "ėsna",
    "e", "ie", "enie", "erie", "oje", "ioje", "uje", "iuje", "yje",
    "enyje", "eryje", "ėje", "ame", "iame", "sime", "ome", "ėme",
    "tumėme", "ose", "iose", "uose", "iuose", "yse", "enyse", "eryse",
    "ėse", "ate", "iate", "ite", "kite", "site", "ote", "tute", "ėte",
    "tumėte", "i", "ai", "iai", "eriai", "ei", "tumei", "ki", "imi",
    "erimi", "umi", "iumi", "si", "asi", "iasi", "esi", "iesi", "siesi",
    "isi", "aisi", "eisi", "tumeisi", "uisi", "osi", "ėjosi", "uosi",
    "iuosi", "siuosi", "usi", "ausi", "čiausi", "ąsi", "ėsi", "ųsi",
    "tųsi", "ti", "enti", "inti", "oti", "ioti", "uoti", "iuoti", "auti",
    "iauti", "yti", "ėti", "telėti", "inėti", "terėti", "ui", "iui",
    "eniui", "oj", "ėj", "k", "am", "iam", "iem", "im", "sim", "om",
    "tum", "ėm", "tumėm", "an", "on", "ion", "un", "iun", "ėn", "o",
    "io", "enio", "ėjo", "uo", "s", "as", "ias", "es", "ies", "is",
    "ais", "iais", "tumeis", "imis", "enimis", "omis", "iomis", "umis",
    "ėmis", "enis", "asis", "ysis", "ams", "iams", "iems", "ims",
    "enims", "erims", "oms", "ioms", "ums", "ėms", "ens", "os", "ios",
    "uos", "iuos", "ers", "us", "aus", "iaus", "ius", "ys", "enys",
    "erys", "ąs", "iąs", "ės", "amės", "iamės", "imės", "kimės", "simės",
    "omės", "ėmės", "tumėmės", "atės", "iatės", "sitės", "otės", "ėtės",
    "tumėtės", "įs", "ūs", "tųs", "at", "iat", "it", "sit", "ot", "ėt",
    "tumėt", "u", "au", "iau", "čiau", "iu", "eniu", "siu", "y", "ą",
    "ią", "ė", "ę", "į", "enį", "erį", "ų", "ių", "erų",
), key=len, reverse=True))

# step-2 derivational endings (delete inside R1, repeated), longest-first
_STEP2 = tuple(sorted((
    "ing", "aj", "iaj", "iej", "oj", "ioj", "uoj", "iuoj", "auj", "ąj",
    "iąj", "ėj", "ųj", "iųj", "ok", "iok", "iuk", "uliuk", "učiuk",
    "išk", "iul", "yl", "ėl", "am", "dam", "jam", "zgan", "ain", "esn",
    "op", "iop", "ias", "ies", "ais", "iais", "os", "ios", "uos",
    "iuos", "aus", "iaus", "ąs", "iąs", "ęs", "utėait", "ant", "iant",
    "siant", "int", "ot", "uot", "iuot", "yt", "ėt", "ykšt", "iau",
    "dav", "sv", "šv", "ykšč", "ę", "ėję",
), key=len, reverse=True))

# whole-word conflict rewrites (suffix → replacement), longest-first
_CONFLICTS = tuple(sorted((
    ("ojime", "ojimas"), ("ėjime", "ėjimas"), ("avime", "avimas"),
    ("okate", "okatė"), ("aite", "aitė"), ("uote", "uotė"),
    ("asius", "asys"), ("okatės", "okatė"), ("aitės", "aitė"),
    ("uotės", "uotė"), ("esiu", "esys"),
), key=lambda p: len(p[0]), reverse=True))


def _r1(w: str) -> int:
    n = len(w)
    i = 1 if (n >= 7 and w[0] == "a") else 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    if i >= n:
        return n
    i += 1  # past the first vowel
    while i < n and w[i] in _VOWELS:
        i += 1
    if i >= n:
        return n
    return i + 1  # past the first non-vowel after it


def _fix_chdz(w: str) -> str:
    if w.endswith("dž"):
        return w[:-2] + "d"
    if w.endswith("č"):
        return w[:-1] + "t"
    return w


def lithuanian_stem(term: str) -> str:
    """Snowball Lithuanian stemmer on a lowercased token."""
    w = term
    p1 = _r1(w)
    # fix_conflicts (whole word, longest match)
    for sfx, rep in _CONFLICTS:
        if w.endswith(sfx):
            w = w[: len(w) - len(sfx)] + rep
            break
    # step 1: one inflectional ending inside R1
    for sfx in _STEP1:
        if w.endswith(sfx) and len(w) - len(sfx) >= p1:
            w = w[: len(w) - len(sfx)]
            break
    w = _fix_chdz(w)
    # step 2: derivational endings inside R1, repeated
    changed = True
    while changed:
        changed = False
        for sfx in _STEP2:
            if w.endswith(sfx) and len(w) - len(sfx) >= p1:
                w = w[: len(w) - len(sfx)]
                changed = True
                break
    w = _fix_chdz(w)
    if w.endswith("gd"):
        w = w[:-1]
    return w


def lithuanian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    if stopwords and term in stopwords:
        return None
    return lithuanian_stem(term)


def lithuanian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = lithuanian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def lithuanian_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = lithuanian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
