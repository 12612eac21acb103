"""Hindi analysis chain: StandardTokenizer → lowercase → decimal-digit
fold → Hindi normalization → stop → light stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
hi/HindiAnalyzer.java:121-131 (createComponents order — the stop filter
runs AFTER normalization, so the stop set is stored normalized),
hi/HindiNormalizer.java (Devanagari orthographic normalization per
Ljiljana Dolamic & Jacques Savoy, "Indexing and Searching Strategies for
the Russian and Czech Languages" / their Hindi UniNE work) and
hi/HindiStemmer.java (the UniNE light Hindi stemmer — longest-of
suffix strip, 5→1 chars, length-guarded). The script-generic
IndicNormalizationFilter step is scoped out (its Devanagari effects
overlap the HindiNormalizer rules for the common cases); this mirrors the
engine-wide "UAX#29 subset" tokenizer posture.

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the function-word core of the Lucene hindi stopword list
(public), stored NORMALIZED like the reference applies it.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "hindi_normalize",
    "hindi_light_stem",
    "hindi_term",
    "hindi_analyze",
    "hindi_terms_positions",
    "HINDI_STOP_WORDS",
]

# HindiNormalizer.java single-char rewrites
_HI_MAP = str.maketrans(
    {
        "ँ": "ं",  # candrabindu -> bindu
        "ऩ": "न",
        "ऱ": "र",
        "ऴ": "ळ",
        "क़": "क",
        "ख़": "ख",
        "ग़": "ग",
        "ज़": "ज",
        "ड़": "ड",
        "ढ़": "ढ",
        "फ़": "फ",
        "य़": "य",
        "़": None,  # nukta deleted
        "‍": None,  # zwj
        "‌": None,  # zwnj
        "ॅ": "े",  # chandra/short e forms -> e
        "ॆ": "े",
        "ॉ": "ो",  # chandra/short o forms -> o
        "ॊ": "ो",
        "ऍ": "ए",
        "ऎ": "ए",
        "ऑ": "ओ",
        "ऒ": "ओ",
        "ॲ": "अ",
        "आ": "अ",  # long -> short independent vowels
        "ई": "इ",
        "ऊ": "उ",
        "ॠ": "ऋ",
        "ॡ": "ऌ",
        "ऐ": "ए",
        "औ": "ओ",
        "ी": "ि",  # long -> short dependent vowels
        "ू": "ु",
        "ॄ": "ृ",
        "ॣ": "ॢ",
        "ै": "े",
        "ौ": "ो",
    }
)

# Devanagari digits -> ASCII (DecimalDigitFilter subset)
_HI_DIGITS = str.maketrans({chr(0x0966 + i): str(i) for i in range(10)})


def hindi_normalize(term: str) -> str:
    """HindiNormalizer.normalize: the dead-n rule (न ् → ं), then the
    single-char folds; virama is deleted LAST so the dead-n context is
    still visible (the reference scans left-to-right, handling न्
    before reaching the virama's own delete case)."""
    term = term.translate(_HI_DIGITS)
    # dead n -> bindu: न followed by virama collapses to anusvara
    term = term.replace("न्", "ं")
    term = term.translate(_HI_MAP)
    return term.replace("्", "")  # remaining viramas deleted


# HindiStemmer.java suffix groups: (min len exclusive, strip, suffixes)
_HI_GROUPS = (
    (6, 5, ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")),
    (5, 4, ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
            "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
            "ियों", "ियां")),
    (4, 3, ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
            "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
            "ुआं")),
    (3, 2, ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
            "ती", "ता", "ाँ", "ां", "ों", "ें")),
    (2, 1, ("ो", "े", "ू", "ु", "ी", "ि", "ा")),
)


def hindi_light_stem(term: str) -> str:
    """HindiStemmer.stem: the first (longest-group) matching suffix wins."""
    n = len(term)
    for min_len, strip, sufs in _HI_GROUPS:
        if n > min_len and term.endswith(sufs):
            return term[:-strip]
    return term


# function-word core of the Lucene hindi stopword list (public), stored
# normalized (HindiAnalyzer applies StopFilter after normalization)
HINDI_STOP_WORDS = frozenset(
    hindi_normalize(w)
    for w in """के का एक में की है यह और से हैं को पर इस होता कि जो कर मे
    गया करने किया लिये अपने ने बनी नहीं तो ही या एवं दिया हो इसका था द्वारा
    हुआ तक साथ करना वाले बाद लिए आप कुछ सकते किसी ये इसके सबसे इसमें थे दो
    होने वह वे करते बहुत कहा वर्ग कई करें होती अपनी उनके थी यदि हुई जा ना
    इसे कहते जब होते कोई हुए व जैसे सभी करता उनकी तरह उस आदि इसकी उनका इसी
    पे तथा भी परंतु इन कम दूर पूरे गये तुम मै यहां हुये कभी अभी अगर""".split()
)


def hindi_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: normalize, stop on the NORMALIZED
    form (HindiAnalyzer.java:128), stem."""
    t = hindi_normalize(term)
    if stopwords and t in stopwords:
        return None
    return hindi_light_stem(t)


def hindi_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = hindi_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def hindi_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = hindi_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
