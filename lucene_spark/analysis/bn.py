"""Bengali analysis chain: StandardTokenizer → lowercase → decimal-digit
fold → Bengali normalization → stop → stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
bn/BengaliAnalyzer.java:119-130 (createComponents order — StopFilter runs
AFTER normalization, so the stop set is stored normalized),
bn/BengaliNormalizer.java (orthographic normalization per Md. Aminul
Islam, Md. Zahurul Islam & Mumit Khan, "A Light Weight Stemmer for
Bengali and Its Use in Spelling Checker", 2007/BRAC work) and
bn/BengaliStemmer.java (the longest-of suffix strip, 8→1 chars,
length-guarded — every suffix group strips its own length with the guard
``len > strip+1``). The script-generic IndicNormalizationFilter step is
scoped out like the Hindi lane (analysis/hi.py) — its Bengali-block
effects overlap these rules for the common cases.

Pure per-term transform → the vectorized vocabulary-remap lane applies.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "bengali_normalize",
    "bengali_stem",
    "bengali_term",
    "bengali_analyze",
    "bengali_terms_positions",
    "BENGALI_STOP_WORDS",
]

# Bengali digits -> ASCII (DecimalDigitFilter subset)
_BN_DIGITS = str.maketrans({chr(0x09E6 + i): str(i) for i in range(10)})

_CHANDRABINDU = "ঁ"
_VIRAMA = "্"


def bengali_normalize(term: str) -> str:
    """BengaliNormalizer.normalize — positional rewrites: chandrabindu
    delete, long→short i/u kars, khio composition, nga→anusvara, ja/ba
    phala conflations, visarga assimilation, sh→s, retroflex n→n,
    rra→ra."""
    s = list(term.translate(_BN_DIGITS))
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == _CHANDRABINDU:
            del s[i]
            i -= 1
        elif ch == "ী":  # dirgho-i kar -> rossho-i kar
            s[i] = "ি"
        elif ch == "ূ":  # dirgho-u kar -> rossho-u kar
            s[i] = "ু"
        elif ch == "ক":  # khio
            if i + 2 < len(s) and s[i + 1] == _VIRAMA and s[i + 2] == "ি":
                if i == 0:
                    s[i] = "খ"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "খ"
                    del s[i + 2]
        elif ch == "ঙ":  # nga -> anusvara
            s[i] = "ং"
        elif ch == "য":  # ja phala
            if i - 2 == 0 and s[i - 1] == _VIRAMA:
                s[i - 1] = "ে"
                if i + 1 < len(s) and s[i + 1] == "া":
                    del s[i + 1]
                del s[i]
                i -= 1
            elif i - 1 >= 0 and s[i - 1] == _VIRAMA:
                del s[i]
                del s[i - 1]
                i -= 2
        elif ch == "ব":  # ba phala
            if i == 0 or s[i - 1] != _VIRAMA:
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                i -= 2
            elif i - 5 >= 0 and s[i - 3] == _VIRAMA:
                del s[i]
                del s[i - 1]
                i -= 2
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                i -= 1
        elif ch == "ঃ":  # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "হ"
                else:
                    del s[i]
            else:
                s[i] = s[i + 1]
        elif ch in ("শ", "ষ"):  # sh forms -> s
            s[i] = "স"
        elif ch == "ণ":  # retroflex n -> n
            s[i] = "ন"
        elif ch in ("ড়", "ঢ়"):  # rra forms -> ra
            s[i] = "র"
        elif ch == "ৎ":  # khanda-ta -> ta
            s[i] = "ত"
        i += 1
    return "".join(s)


# BengaliStemmer.java suffix groups; every group strips len(suffix) with
# guard ``word len > strip + 1``; first (longest-group) match wins
_BN_GROUPS = (
    (8, ('িয়াছিলাম', 'িতেছিলাম', 'িতেছিলেন', 'ইতেছিলেন', 'িয়াছিলেন',
         'ইয়াছিলেন')),
    (7, ('িতেছিলি', 'িতেছিলে', 'িয়াছিলা', 'িয়াছিলে', 'িতেছিলা', 'িয়াছিলি',
         'য়েদেরকে')),
    (6, ('িতেছিস', 'িতেছেন', 'িয়াছিস', 'িয়াছেন', 'েছিলাম', 'েছিলেন',
         'েদেরকে')),
    (5, ('িতেছি', 'িতেছা', 'িতেছে', 'ছিলাম', 'ছিলেন', 'িয়াছি', 'িয়াছা',
         'িয়াছে', 'েছিলে', 'েছিলা', 'য়েদের', 'দেরকে')),
    (4, ('িলাম', 'িলেন', 'িতাম', 'িতেন', 'িবেন', 'ছিলি', 'ছিলে', 'ছিলা',
         'তেছে', 'িতেছ', 'খানা', 'খানি', 'গুলো', 'গুলি', 'য়েরা', 'েদের')),
    (3, ('লাম', 'িলি', 'ইলি', 'িলে', 'ইলে', 'লেন', 'িলা', 'ইলা', 'তাম',
         'িতি', 'ইতি', 'িতে', 'ইতে', 'তেন', 'িতা', 'িবা', 'ইবা', 'িবি',
         'ইবি', 'বেন', 'িবে', 'ইবে', 'ছেন', 'য়োন', 'য়ের', 'েরা', 'দের')),
    (2, ('িস', 'েন', 'লি', 'লে', 'লা', 'তি', 'তে', 'তা', 'বি', 'বে', 'বা',
         'ছি', 'ছা', 'ছে', 'ুন', 'ুক', 'টা', 'টি', 'নি', 'ের', 'রা', 'কে')),
    (1, ('ি', 'ী', 'া', 'ো', 'ে', 'ব', 'ত')),
)


def bengali_stem(term: str) -> str:
    """BengaliStemmer.stem: the first (longest-group) matching suffix wins."""
    n = len(term)
    for strip, sufs in _BN_GROUPS:
        if n > strip + 1 and term.endswith(sufs):
            return term[:-strip]
    return term


# function-word core of the Lucene bengali stopword list (public), stored
# normalized (BengaliAnalyzer applies StopFilter after normalization)
BENGALI_STOP_WORDS = frozenset(
    bengali_normalize(w)
    for w in """এই ও থেকে করে এ না ওই এক্ নিয়ে করা বলেন সঙ্গে যে এব তা আর
    কোনো বলে সেই দিন হয় কি দু পরে সব দেওয়া যেতে ছিল আমরা তার সে কোন এবং
    এর জন্য এটি হতে এমন হবে যা তাদের তিনি আমি কিন্তু আপনি এখন আবার কেন
    যদি ছিলেন মধ্যে নতুন কাজ অনেক তবে পর আগে উপর মনে এসে বছর একটি নয় কয়েক
    তখন আজ বেশ আমাদের হচ্ছে হয়ে প্রতি দিকে যখন দুই শুধু সময় বা হল হয়েছে
    এত প্রথম আগামী আমাকে এস এসব দিয়ে অন্য হাজার যার সেখানে গিয়ে""".split()
)


def bengali_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: normalize, stop on the NORMALIZED
    form (BengaliAnalyzer.java:128), stem."""
    t = bengali_normalize(term)
    if not t:
        return None
    if stopwords and t in stopwords:
        return None
    return bengali_stem(t)


def bengali_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = bengali_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def bengali_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = bengali_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
