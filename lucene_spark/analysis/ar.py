"""Arabic analysis chain: StandardTokenizer → lowercase → stop →
normalization → light stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
ar/ArabicAnalyzer.java (createComponents order: LowerCase, Stop,
ArabicNormalizationFilter, ArabicStemFilter), ar/ArabicNormalizer.java
(hamza-form alef fold, dotless yeh → yeh, teh marbuta → heh, tatweel and
harakat deleted) and ar/ArabicStemmer.java — the "light10" algorithm of
Larkey, Ballesteros and Connell ("Light Stemming for Arabic Information
Retrieval", 2007): ONE attached definite-article/conjunction prefix strips
(ال / وال / بال / كال / فال / لل / و, first match wins, the bare و only on
words of 4+ chars, others leaving 2+ chars), then EVERY matching suffix
strips iteratively in list order (ها ان ات ون ين يه ية ه ة ي, each leaving
2+ chars). Reimplemented from the published algorithm.

Arabic text is entirely non-ASCII, so documents take the exact
per-document tokenizer path; the term chain runs once per DISTINCT term
via the vectorized remap lane (same shape as Russian).

The stop set is a function-word core of the analyzer's Arabic stop list
(surface forms — StopFilter precedes normalization in the chain); pass
your own frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "arabic_normalize",
    "arabic_light_stem",
    "arabic_term",
    "arabic_analyze",
    "arabic_terms_positions",
    "ARABIC_STOP_WORDS",
]

# function-word core of the Arabic stopword list shipped with the analyzer
ARABIC_STOP_WORDS = frozenset(
    """من في على أن إلى عن إن كان مع هذا هذه ذلك التي الذي ما لا لم لن هو
    هي هم أو ثم قد كل بعد قبل عند غير بين يكون وكان حتى إذا كما لها له لهم
    منه منها فيه فيها عليه عليها الى اذا او انه أنه كانت ولا وهو وهي هناك
    وقد لقد ايضا أيضا ان بها به هذا نحن أنا انت أنت""".split()
)

# ArabicNormalizer: fold hamza alef forms, dotless yeh, teh marbuta; the
# second map DELETES tatweel + harakat (translate to None)
_AR_FOLD = str.maketrans(
    {
        "آ": "ا",  # alef madda -> alef
        "أ": "ا",  # alef hamza above -> alef
        "إ": "ا",  # alef hamza below -> alef
        "ى": "ي",  # dotless yeh -> yeh
        "ة": "ه",  # teh marbuta -> heh
    }
)
_AR_DELETE = {ord(c): None for c in "ـًٌٍَُِّْ"}

# ArabicStemmer.prefixes, in the reference's match order
_AR_PREFIXES = ("ال", "وال", "بال",
                "كال", "فال", "لل",
                "و")
# ArabicStemmer.suffixes, in the reference's strip order
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_normalize(term: str) -> str:
    return term.translate(_AR_FOLD).translate(_AR_DELETE)


def arabic_light_stem(term: str) -> str:
    """ArabicStemmer.stem: one prefix (first match, length-guarded), then
    every matching suffix iteratively (each leaving >= 2 chars)."""
    s = term
    for p in _AR_PREFIXES:
        if len(p) == 1:
            if len(s) < 4:  # the bare waw needs 3+ chars after it
                continue
        elif len(s) < len(p) + 2:
            continue
        if s.startswith(p):
            s = s[len(p):]
            break
    for suf in _AR_SUFFIXES:
        if len(s) >= len(suf) + 2 and s.endswith(suf):
            s = s[: -len(suf)]
    return s


def arabic_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (SURFACE form — StopFilter
    precedes normalization in ArabicAnalyzer), normalize, light stem."""
    if stopwords and term in stopwords:
        return None
    return arabic_light_stem(arabic_normalize(term))


def arabic_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = arabic_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def arabic_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = arabic_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
