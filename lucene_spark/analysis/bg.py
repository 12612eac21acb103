"""Bulgarian analysis chain: StandardTokenizer → lowercase → stop → stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
bg/BulgarianAnalyzer.java (LowerCase, Stop, BulgarianStemFilter) and
bg/BulgarianStemmer.java — the light Bulgarian stemmer (Nakov et al.,
"BulStem: design and evaluation of inflectional stemmer for Bulgarian",
with the reference's perl-fixed ен→н rule). Reimplemented from the
published algorithm in the reference's pass order:

- len < 4 passthrough; ища @len>5 → −3
- removeArticle: ият @len>6; ът/то/те/та/ия @len>5; ят @len>4
- removePlural: овци→о / ове− / еве→й @len>6; ища/та/ци→к/зи→г and the
  е…и→я rewrite @len>5; си→х / и @len>4
- final я strip, then final а/о/е strip (both can fire) @len>3
- ен→н @len>4; ъN→N squeeze @len>5

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the function-word core of the Lucene bulgarian stopword
list (public); pass your own frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "bulgarian_stem",
    "bulgarian_term",
    "bulgarian_analyze",
    "bulgarian_terms_positions",
    "BULGARIAN_STOP_WORDS",
]

# function-word core of the Lucene bulgarian stopword list (public)
BULGARIAN_STOP_WORDS = frozenset(
    """а автентичен аз ако ала бе без беше би бил била били било близо
    бъдат бъде бяха в вас ваш ваша вероятно вече взема ви вие винаги
    все всеки всички всичко всяка във въпреки върху г ги главен главна
    главно глас го д да дали до докато докога дори досега доста е едва
    един ето за зад заедно заради засега затова защо защото и из или им
    има имат иска й каза как каква какво както какъв като кога когато
    което които кой който колко която къде където към ли м ме между мен
    ми мнозина мога могат може моля момента му н на над назад най
    направи напред например нас не него нещо нея ни ние никой нито но
    някои някой няма обаче около освен особено от отгоре отново още пак
    по повече повечето под поне поради после почти прави пред преди през
    при пък първо с са само се сега си скоро след сме според сред срещу
    сте съм със също т тази така такива такъв там твой те тези ти то
    това тогава този той толкова точно трябва тук тъй тя тях у харесва
    ч че често чрез ще щом я""".split()
)


def _remove_article(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("ият"):
        return s[:-3]
    if n > 5 and s.endswith(("ът", "то", "те", "та", "ия")):
        return s[:-2]
    if n > 4 and s.endswith("ят"):
        return s[:-2]
    return s


def _remove_plural(s: str) -> str:
    n = len(s)
    if n > 6:
        if s.endswith("овци"):
            return s[:-3]
        if s.endswith("ове"):
            return s[:-3]
        if s.endswith("еве"):
            return s[:-3] + "й"
    if n > 5:
        if s.endswith("ища"):
            return s[:-3]
        if s.endswith("та"):
            return s[:-2]
        if s.endswith("ци"):
            return s[:-2] + "к"
        if s.endswith("зи"):
            return s[:-2] + "г"
        if s[-3] == "е" and s[-1] == "и":
            return s[:-3] + "я" + s[-2]  # е…и -> я…, drop the и
    if n > 4:
        if s.endswith("си"):
            return s[:-2] + "х"
        if s.endswith("и"):
            return s[:-1]
    return s


def bulgarian_stem(term: str) -> str:
    """BulgarianStemmer.stem (with the perl-fixed ен→н rule)."""
    if len(term) < 4:
        return term
    s = term
    if len(s) > 5 and s.endswith("ища"):
        return s[:-3]
    s = _remove_article(s)
    s = _remove_plural(s)
    if len(s) > 3:
        # both strips can fire; the guard is checked once at block entry
        # (BulgarianStemmer.java:44-51)
        if s.endswith("я"):
            s = s[:-1]
        if s and s[-1] in "аое":
            s = s[:-1]
    if len(s) > 4 and s.endswith("ен"):
        s = s[:-2] + "н"
    if len(s) > 5 and s[-2] == "ъ":
        s = s[:-2] + s[-1]
    return s


def bulgarian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form — StopFilter
    precedes the stemmer), stem."""
    if stopwords and term in stopwords:
        return None
    return bulgarian_stem(term)


def bulgarian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = bulgarian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def bulgarian_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = bulgarian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
