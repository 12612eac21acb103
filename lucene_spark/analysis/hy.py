"""Armenian analysis chain: StandardTokenizer → lowercase → stop →
snowball Armenian stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
hy/ArmenianAnalyzer.java (createComponents: StandardTokenizer, LowerCase,
Stop, SetKeywordMarker, SnowballFilter(ArmenianStemmer)) and the published
snowball Armenian stemmer (https://snowballstem.org/algorithms/armenian/
stemmer.html; generated form org/tartarus/snowball/ext/
ArmenianStemmer.java — suffix tables extracted with
tools/extract_among.py). Vectors replayed from TestArmenianAnalyzer.java.
Reimplemented from the published algorithm:

- vowels = ա ե է ը ի ո ւ օ; pV = just after the first vowel; R2 = after
  the first non-vowel following the second vowel group;
- four independent passes on the evolving word, each deleting the longest
  matching suffix that starts no earlier than pV:
  1. case endings (only when the suffix starts inside R2),
  2. verb endings, 3. adjective endings, 4. noun endings.

Pure per-term transform → the vectorized vocabulary-remap lane applies.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "armenian_stem",
    "armenian_term",
    "armenian_analyze",
    "armenian_terms_positions",
    "ARMENIAN_STOP_WORDS",
]

# Lucene hy/stopwords.txt (public snowball list)
ARMENIAN_STOP_WORDS = frozenset(
    """այդ այլ այն այս դու դուք եմ են ենք ես եք է էի էին էինք էիր էիք էր
    ըստ թ ի ին իսկ իր կամ համար հետ հետո մենք մեջ մի ն նա նաև նրա նրանք
    որ որը որոնք որպես ու ում պիտի վրա և""".split()
)

_V = frozenset("աեէըիուօ")

_ADJECTIVE = tuple(sorted((
    "րորդ", "երորդ", "ալի", "ակի", "որակ", "եղ", "ական", "արան", "են",
    "եկեն", "երեն", "որէն", "ին", "գին", "ովին", "լայն", "վուն", "պես",
    "իվ", "ատ", "ավետ", "կոտ", "բար",
), key=len, reverse=True))

_VERB = tuple(sorted((
    "ա", "ացա", "եցա", "վե", "ացրի", "ացի", "եցի", "վեցի", "ալ", "ըալ",
    "անալ", "ենալ", "ացնալ", "ել", "ըել", "նել", "ցնել", "եցնել", "չել",
    "վել", "ացվել", "եցվել", "տել", "ատել", "ոտել", "կոտել", "ված",
    "ում", "վում", "ան", "ցան", "ացան", "ացրին", "ացին", "եցին",
    "վեցին", "ալիս", "ելիս", "ավ", "ացավ", "եցավ", "ալով", "ելով",
    "ար", "ացար", "եցար", "ացրիր", "ացիր", "եցիր", "վեցիր", "աց", "եց",
    "ացրեց", "ալուց", "ելուց", "ալու", "ելու", "աք", "ցաք", "ացաք",
    "ացրիք", "ացիք", "եցիք", "վեցիք", "անք", "ցանք", "ացանք", "ացրինք",
    "ացինք", "եցինք", "վեցինք",
), key=len, reverse=True))

_NOUN = tuple(sorted((
    "որդ", "ույթ", "ուհի", "ցի", "իլ", "ակ", "յակ", "անակ", "իկ", "ուկ",
    "ան", "պան", "ստան", "արան", "եղէն", "յուն", "ություն", "ածո", "իչ",
    "ուս", "ուստ", "գար", "վոր", "ավոր", "ոց", "անօց", "ու", "ք", "չեք",
    "իք", "ալիք", "անիք", "վածք", "ույք", "ենք", "ոնք", "ունք", "մունք",
    "իչք", "արք",
), key=len, reverse=True))

_ENDING = tuple(sorted((
    "սա", "վա", "ամբ", "դ", "անդ", "ությանդ", "վանդ", "ոջդ", "երդ",
    "ներդ", "ուդ", "ը", "անը", "ությանը", "վանը", "ոջը", "երը", "ները",
    "ի", "վի", "երի", "ների", "անում", "երում", "ներում", "ն", "ան",
    "ության", "վան", "ին", "երին", "ներին", "ությանն", "երն", "ներն",
    "ուն", "ոջ", "ությանս", "վանս", "ոջս", "ով", "անով", "վով", "երով",
    "ներով", "եր", "ներ", "ց", "ից", "վանից", "ոջից", "վից", "երից",
    "ներից", "ցից", "ոց", "ուց",
), key=len, reverse=True))


def _regions(w: str) -> tuple[int, int]:
    n = len(w)
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    if i >= n:
        return n, n
    pv = i + 1
    i = pv
    while i < n and w[i] in _V:
        i += 1
    if i >= n:
        return pv, n
    i += 1  # past the first non-vowel after the first vowel group
    while i < n and w[i] not in _V:
        i += 1
    while i < n and w[i] in _V:
        i += 1
    if i >= n:
        return pv, n
    return pv, i + 1


def armenian_stem(term: str) -> str:
    """Snowball Armenian stemmer on a lowercased token."""
    w = term
    pv, p2 = _regions(w)
    if pv >= len(w):
        return w  # no vowel: untouched

    def strip(word: str, table: tuple, floor: int) -> str:
        for sfx in table:
            start = len(word) - len(sfx)
            if start >= floor and word.endswith(sfx):
                return word[:start]
        return word

    w = strip(w, _ENDING, max(pv, p2))
    w = strip(w, _VERB, pv)
    w = strip(w, _ADJECTIVE, pv)
    w = strip(w, _NOUN, pv)
    return w


def armenian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    if stopwords and term in stopwords:
        return None
    return armenian_stem(term)


def armenian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = armenian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def armenian_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = armenian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
