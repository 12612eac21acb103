"""Nepali analysis chain: StandardTokenizer → lowercase → decimal-digit
fold → stop → snowball Nepali stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
ne/NepaliAnalyzer.java:122-131 (createComponents: StandardTokenizer,
LowerCase, DecimalDigit, SetKeywordMarker, IndicNormalizationFilter, Stop,
SnowballFilter(NepaliStemmer)) and the published snowball Nepali stemmer
(https://snowballstem.org/algorithms/nepali/stemmer.html; generated form
org/tartarus/snowball/ext/NepaliStemmer.java — suffix tables extracted with
tools/extract_among.py, control flow reimplemented from the published
algorithm). Vectors replayed from TestNepaliAnalyzer.java. The
script-generic IndicNormalizationFilter step is scoped out (same documented
posture as the Hindi chain, hi.py — its Devanagari compositions do not
alter any replayed vector).

Algorithm (all suffix tests longest-match at the word end):
- remove_category_1: postposition suffixes (a_0); case-2 suffixes
  (का/कि/की/कै/को) survive when preceded by ए or े, else delete;
- loop: [if the word ends in ँ/ं/ै, remove_category_2: ँ/ं delete only
  after यौ/छौ/नौ/थे, ै only after त्र]; then remove_category_3 deletes one
  verb/plural suffix (a_3) — the loop continues only while category_3
  keeps firing.

The stop set is Lucene ne/stopwords.txt (public; the Java chain stops
AFTER normalization — a no-op here since the normalizer is scoped out).

Pure per-term transform → the vectorized vocabulary-remap lane applies.
"""

from __future__ import annotations

import unicodedata

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "nepali_stem",
    "nepali_term",
    "nepali_analyze",
    "nepali_terms_positions",
    "NEPALI_STOP_WORDS",
]

# Lucene ne/stopwords.txt (public list)
NEPALI_STOP_WORDS = frozenset(
    """छ र पनि छन् लागि भएको गरेको भने गर्न गर्ने हो तथा यो रहेको उनले थियो
    हुने गरेका थिए गर्दै तर नै को मा हुन् भन्ने हुन गरी त हुन्छ अब के रहेका
    गरेर छैन दिए भए यस ले गर्नु औं सो त्यो कि जुन यी का गरि ती न छु छौं लाई
    नि उप अक्सर आदि कसरी क्रमशः चाले अगाडी अझै अनुसार अन्तर्गत अन्य अन्यत्र
    अन्यथा अरु अरुलाई अर्को अर्थात अर्थात् अलग आए आजको ओठ आत्म आफू आफूलाई
    आफ्नै आफ्नो आयो उदाहरण उनको उहालाई एउटै एक एकदम कतै कम से कसै कसैले
    कहाँबाट कहिलेकाहीं किन किनभने कुनै कुरा कृपया केही कोही गए गरौं गर्छ
    गर्छु गर्नुपर्छ गयौ गैर चार चाहनुहुन्छ चाहन्छु चाहिए छू जताततै जब जबकि
    जसको जसबाट जसमा जसलाई जसले जस्तै जस्तो जस्तोसुकै जहाँ जान जाहिर जे जो
    ठीक तत्काल तदनुसार तपाईको तपाई पर्याप्त पहिले पहिलो पहिल्यै पाँच पाँचौं
    तल तापनी तिनी तिनीहरू तिनीहरुको तिनिहरुलाई तिमी तिर तीन तुरुन्तै तेस्रो
    तेस्कारण पूर्व प्रति प्रतेक प्लस फेरी बने त्सपछि त्सैले त्यहाँ थिएन
    दिनुभएको दिनुहुन्छ दुई देखि बरु बारे बाहिर देखिन्छ देखियो देखे देखेको
    देखेर दोस्रो धेरै नजिकै नत्र नयाँ निम्ति बाहेक बीच बीचमा भन निम्न
    निम्नानुसार निर्दिष्ट नौ पक्का पक्कै पछि पछिल्लो पटक पर्छ पर्थ्यो
    भन्छन् भन् भन्छु भन्दा भन्नुभयो भर भित्र भित्री म मलाई मात्र माथि मुख्य
    मेरो यति यथोचित यदि यद्यपि यसको यसपछि यसबाहेक यसरी यसो यस्तो यहाँ
    यहाँसम्म या रही राखे राख्छ राम्रो रूप लगभग वरीपरी वास्तवमा बिरुद्ध
    बिशेष सायद शायद संग संगै सक्छ सट्टा सधै सबै सबैलाई समय सम्भव सम्म सही
    साँच्चै सात साथ साथै सारा सोही स्पष्ट हरे हरेक""".split()
)

# snowball NepaliStemmer.java among tables (data only; checked
# longest-match first)
_CAT1 = (
    ("मार्फत", 1), ("द्वारा", 1), ("सँगै", 1), ("लाइ", 1), ("लाई", 1),
    ("सँग", 1), ("संग", 1), ("पछि", 1), ("रत", 1), ("का", 2), ("मा", 1),
    ("कि", 2), ("की", 2), ("ले", 1), ("कै", 2), ("मै", 1), ("को", 2),
)

_CAT2_MARKERS = ("ँ", "ं", "ै")

_CAT3 = tuple(
    sorted(
        [
            "थिए", "छ", "इछ", "एछ", "िछ", "ेछ", "नेछ", "हुनेछ", "इन्छ",
            "िन्छ", "हुन्छ", "एका", "इएका", "िएका", "ेका", "नेका", "दा",
            "इदा", "िदा", "देखि", "माथि", "एकी", "इएकी", "िएकी", "ेकी",
            "देखी", "थी", "दी", "छु", "एछु", "ेछु", "नेछु", "नु", "हरु",
            "हरू", "छे", "थे", "ने", "एकै", "ेकै", "नेकै", "दै", "इदै",
            "िदै", "एको", "इएको", "िएको", "ेको", "नेको", "दो", "इदो",
            "िदो", "यो", "इयो", "भयो", "ियो", "थियो", "दियो", "थ्यो",
            "छौ", "इछौ", "एछौ", "िछौ", "ेछौ", "नेछौ", "यौ", "थियौ",
            "छ्यौ", "थ्यौ", "छन्", "इछन्", "एछन्", "िछन्", "ेछन्",
            "नेछन्", "लान्", "छिन्", "थिन्", "पर्", "इस्", "थिइस्", "छस्",
            "इछस्", "एछस्", "िछस्", "ेछस्", "नेछस्", "िस्", "थिस्",
            "छेस्", "होस्",
        ],
        key=len,
        reverse=True,
    )
)


def _remove_category_1(w: str) -> str:
    for sfx, case in _CAT1:
        if not w.endswith(sfx):
            continue
        if case == 2 and (
            w.endswith("ए" + sfx) or w.endswith("े" + sfx)
        ):
            return w  # preceded by ए/े: keep (NepaliStemmer case 2 lab0)
        return w[: len(w) - len(sfx)]
    return w


def _remove_category_2(w: str) -> str:
    """Delete a trailing ँ/ं (after यौ/छौ/नौ/थे) or ै (after त्र); returns
    w unchanged when the guard fails (the Java routine returns false)."""
    if w.endswith(("ँ", "ं")):
        body = w[:-1]
        if body.endswith(("यौ", "छौ", "नौ", "थे")):
            return body
    elif w.endswith("ै"):
        body = w[:-1]
        if body.endswith("त्र"):
            return body
    return w


def _remove_category_3(w: str) -> str | None:
    """Delete the longest a_3 suffix; None when nothing matched."""
    for sfx in _CAT3:
        if w.endswith(sfx):
            return w[: len(w) - len(sfx)]
    return None


def nepali_stem(term: str) -> str:
    """NepaliStemmer.stem: category 1 once, then the category-2/3 loop
    (category-2 removal is attempted only when the word currently ends in
    one of its markers; the loop continues only while category 3 fires)."""
    w = _remove_category_1(term)
    while True:
        if w.endswith(_CAT2_MARKERS):
            w = _remove_category_2(w)
        nxt = _remove_category_3(w)
        if nxt is None:
            break
        w = nxt
    return w


# any Unicode decimal digit -> ASCII (DecimalDigitFilter.java)
def _fold_digits(term: str) -> str:
    if term.isascii():
        return term
    out = []
    for ch in term:
        d = unicodedata.decimal(ch, None)
        out.append(str(d) if d is not None else ch)
    return "".join(out)


def nepali_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    t = _fold_digits(term)
    if stopwords and t in stopwords:
        return None
    return nepali_stem(t)


def nepali_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = nepali_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def nepali_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = nepali_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
