"""Latvian analysis chain: StandardTokenizer → lowercase → stop → light
stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
lv/LatvianAnalyzer.java (LowerCase, Stop, LatvianStemFilter) and
lv/LatvianStemmer.java — the light Latvian stemmer ("A stemming algorithm
for Latvian", Karlis Kreslins) with the reference's exact affix order,
vowel-count guards (numVowels(word) > affix.vc, stem keeps ≥ 3 chars) and
un-palatalization fixups (kš→kst / ņņ→nn only for removed -u; labial +j
drop; šņ→sn, žņ→zn, šļ→sl, žļ→zl, ļņ→ln, ļļ→ll; final č→c, ļ→l, ņ→n).

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the function-word core of the Lucene latvian stopword
list (public); pass your own frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "latvian_light_stem",
    "latvian_term",
    "latvian_analyze",
    "latvian_terms_positions",
    "LATVIAN_STOP_WORDS",
]

# function-word core of the Lucene latvian stopword list (public)
LATVIAN_STOP_WORDS = frozenset(
    """aiz ap ar apakš ārpus augšpus bez caur dēļ gar iekš iz kopš labad
    lejpus līdz no otrpus pa par pār pēc pie pirms pret priekš starp
    šaipus uz viņpus virs virspus zem apakšpus un bet jo ja ka lai tomēr
    tikko turpretī arī kaut gan tādēļ tā ne tikvien vien kā ir te vai
    kamēr ar diezin droši diemžēl nebūt ik it taču nu pat tiklab
    iekšpus nedz tik nevis turpretim jeb iekam iekām iekāms kolīdz
    līdzko tiklīdz jebšu tālab tāpēc nekā itin jā jau jel nē nezin tad
    tikai vis tak iekams vien būt biju biji bija bijām bijāt esmu esi
    esam esat būšu būsi būs būsim būsiet tikt tiku tiki tika tikām tikāt
    tieku tiec tiek tiekam tiekat tikšu tiks tiksim tiksiet tapt tapi
    tapāt topat tapšu tapsi taps tapsim tapsiet kļūt kļuvu kļuvi kļuva
    kļuvām kļuvāt kļūstu kļūsti kļūst kļūstam kļūstat kļūšu kļūsi kļūs
    kļūsim kļūsiet varēt varēju varējām varēšu varēsim var varēji
    varējāt varēsi varēsiet varat varēja varēs""".split()
)

# (affix, vc, palatalizes) in the reference's order
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False),
    ("ajam", 2, False), ("ajām", 2, False),
    ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False),
    ("ais", 2, False), ("ai", 2, False),
    ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False),
    ("īm", 1, False), ("im", 1, False),
    ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False),
    ("es", 1, False), ("os", 1, True),
    ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False),
    ("ie", 1, False), ("u", 1, True),
    ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False),
    ("ē", 1, False), ("ī", 1, False),
    ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
)

_LV_VOWELS = frozenset("aeiouāīēū")


def _unpalatalize(s: str, removed: str) -> str:
    if removed == "u":
        if s.endswith("kš"):
            return s[:-2] + "kst"
        if s.endswith("ņņ"):
            return s[:-2] + "nn"
    if s.endswith(("pj", "bj", "mj", "vj")):
        return s[:-1]
    if s.endswith("šņ"):
        return s[:-2] + "sn"
    if s.endswith("žņ"):
        return s[:-2] + "zn"
    if s.endswith("šļ"):
        return s[:-2] + "sl"
    if s.endswith("žļ"):
        return s[:-2] + "zl"
    if s.endswith("ļņ"):
        return s[:-2] + "ln"
    if s.endswith("ļļ"):
        return s[:-2] + "ll"
    if s.endswith("č"):
        return s[:-1] + "c"
    if s.endswith("ļ"):
        return s[:-1] + "l"
    if s.endswith("ņ"):
        return s[:-1] + "n"
    return s


def latvian_light_stem(term: str) -> str:
    """LatvianStemmer.stem: first affix in order whose vowel-count and
    length guards pass; palatalizing affixes run the fixups against the
    first REMOVED character."""
    n_vowels = sum(1 for c in term if c in _LV_VOWELS)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if (
            n_vowels > vc
            and len(term) >= len(affix) + 3
            and term.endswith(affix)
        ):
            stem = term[: -len(affix)]
            if palatalizes:
                return _unpalatalize(stem, term[len(stem)])
            return stem
    return term


def latvian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form — StopFilter
    precedes the stemmer), light stem."""
    if stopwords and term in stopwords:
        return None
    return latvian_light_stem(term)


def latvian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = latvian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def latvian_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = latvian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
