"""Russian analysis chain: StandardTokenizer → lowercase → stop → light
stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
ru/RussianAnalyzer.java (createComponents order: LowerCase, Stop,
RussianLightStemFilter) and ru/RussianLightStemmer.java — the light Russian
stemmer from Ljiljana Dolamic and Jacques Savoy, "Indexing and Searching
Strategies for the Russian Language" (JASIST 2009). Reimplemented from the
published algorithm: one case-ending removal (longest-first: 4-char -иями/
-оями; 3-char -ами/-ого/-ому/…; 2-char -ая/-ий/-ов/…; single final vowel/
-й/-ь), then a normalization strip (final -ь/-и, or -нн → -н).

Russian text is entirely non-ASCII, so documents take the exact
per-document tokenizer path (tokenizer.analyze handles the Cyrillic
alphabetic runs) and the term chain still runs once per DISTINCT
vocabulary term via the vectorized remap lane.

The stop set is the function-word core of the snowball russian_stop.txt
list (RussianAnalyzer.getDefaultStopSet); pass your own frozenset to
override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "russian_light_stem",
    "russian_term",
    "russian_analyze",
    "russian_terms_positions",
    "RUSSIAN_STOP_WORDS",
]

# function-word core of snowball's russian_stop.txt (public list)
RUSSIAN_STOP_WORDS = frozenset(
    """и в во не что он на я с со как а то все она так его но да ты к у же
    вы за бы по только ее мне было вот от меня еще нет о из ему теперь
    когда даже ну вдруг ли если уже или ни быть был него до вас нибудь
    опять уж вам ведь там потом себя ничего ей может они тут где есть надо
    ней для мы тебя их чем была сам чтоб без будто чего раз тоже себе под
    будет ж тогда кто этот того потому этого какой совсем ним здесь этом
    один почти мой тем чтобы нее сейчас были куда зачем всех никогда можно
    при об хотя после над больше тот через эти нас про всего них какая
    много разве три эту моя впрочем хорошо свою этой перед иногда лучше
    чуть том нельзя такой им более всегда конечно всю между это эта""".split()
)

# 4-char, 3-char and 2-char case endings (RussianLightStemmer.removeCase),
# checked longest-first like the reference's guard order
_CASE4 = ("иями", "оями")
_CASE3 = (
    "иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему", "ери",
    "ими", "ого", "ому", "ыми", "оев",
)
_CASE2 = (
    "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв", "ою", "ую",
    "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им", "ое", "ой",
    "ом", "ов", "ые", "ый", "ым", "ми",
)
_CASE1 = frozenset("аеиоуйыяь")


def _remove_case(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith(_CASE4):
        return s[:-4]
    if n > 5 and s.endswith(_CASE3):
        return s[:-3]
    if n > 4 and s.endswith(_CASE2):
        return s[:-2]
    if n > 3 and s[-1] in _CASE1:
        return s[:-1]
    return s


def russian_light_stem(term: str) -> str:
    """RussianLightStemmer.stem (Dolamic & Savoy): case-ending removal,
    then normalize (final -ь/-и strip, -нн collapse)."""
    s = _remove_case(term)
    if len(s) > 3:
        if s[-1] in ("ь", "и"):
            return s[:-1]
        if s[-1] == "н" and s[-2] == "н":
            return s[:-1]
    return s


def russian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form — StopFilter
    precedes the stemmer), light stem."""
    if stopwords and term in stopwords:
        return None
    return russian_light_stem(term)


def russian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = russian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def russian_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = russian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
