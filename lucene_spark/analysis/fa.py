"""Persian analysis chain: (ZWNJ→space) → StandardTokenizer → lowercase →
decimal-digit fold → Arabic normalization → Persian normalization → stop.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
fa/PersianAnalyzer.java:128-141 (createComponents order — note the stop
filter runs AFTER normalization, unlike the other language chains, because
the stopword list is stored normalized) and fa/PersianNormalizer.java
(farsi yeh / yeh barree → yeh, keheh → kaf, heh-yeh / heh-goal → heh,
hamza-above deleted). "Stemming" is accomplished via stopwords — Persian
has no stem filter in the reference. PersianCharFilter (ZWNJ U+200C →
space) is applied as a pre-tokenize text substitution; DecimalDigitFilter
folds Arabic-Indic and Extended-Arabic-Indic digits to ASCII.

Pure per-term transform after the ZWNJ split → the vectorized
vocabulary-remap lane applies (ZWNJ handling happens in the tokenizer
input, which the standard tokenizer's non-letter split already performs:
U+200C is not a word character).

The stop set is the function-word core of the public UniNE (Savoy) CLEF
Persian list used by the reference; pass your own frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .ar import arabic_normalize
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "persian_normalize",
    "persian_term",
    "persian_analyze",
    "persian_terms_positions",
    "PERSIAN_STOP_WORDS",
]

# PersianNormalizer.java: farsi yeh (U+06CC) / yeh barree (U+06D2) -> yeh
# (U+064A); keheh (U+06A9) -> kaf (U+0643); heh yeh (U+06C0) / heh goal
# (U+06C1) -> heh (U+0647); hamza above (U+0654) deleted
_FA_FOLD = str.maketrans(
    {
        "ی": "ي",
        "ے": "ي",
        "ک": "ك",
        "ۀ": "ه",
        "ہ": "ه",
        "ٔ": None,
    }
)

# DecimalDigitFilter subset: Arabic-Indic (U+0660..) and Extended
# Arabic-Indic (U+06F0..) digits -> ASCII
_FA_DIGITS = str.maketrans(
    {chr(0x0660 + i): str(i) for i in range(10)}
    | {chr(0x06F0 + i): str(i) for i in range(10)}
)

# function-word core of the public UniNE/Savoy CLEF Persian stopword list
# (PersianAnalyzer.DEFAULT_STOPWORD_FILE provenance), stored NORMALIZED
# like the reference loads it
PERSIAN_STOP_WORDS = frozenset(
    arabic_normalize(w.translate(_FA_FOLD))
    for w in """و در به از که این را با است برای آن یک خود تا کرد بر هم
    نیز گفت می‌شود وی شد دارد ما اما یا شده باید هر آنها بود او دیگر دو
    مورد می‌کند شود کند بین پیش شده‌است اگر همه نه
    هستند بی من دهد هزار نیست استفاده داد داشته راه داشت چه همچنین
    کردند داده بوده دارند همین میلیون سوی شوند بیشتر بسیار روی گرفته
    هایی تواند اول نام هیچ چند جدید بیش شدن کردن کنیم نشان حتی اینکه
    ولی توسط چنین برخی نخستین چون چرا همان""".split()
)


def persian_normalize(term: str) -> str:
    """Digit fold + ArabicNormalizer + PersianNormalizer for one
    lowercased term."""
    return arabic_normalize(term.translate(_FA_DIGITS)).translate(_FA_FOLD)


def persian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: normalize FIRST, then stop on the
    normalized form (PersianAnalyzer.java:136-139 — 'the stopword list is
    normalized with the above')."""
    t = persian_normalize(term)
    if stopwords and t in stopwords:
        return None
    return t


def persian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = persian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def persian_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = persian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
