"""Hungarian analysis chain: StandardTokenizer → lowercase → stop → light
stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
hu/HungarianAnalyzer.java (createComponents order: LowerCase, Stop,
HungarianLightStemFilter) and hu/HungarianLightStemmer.java — the "UniNE"
light Hungarian stemmer from Jacques Savoy, "Light Stemming Approaches for
the French, Portuguese, German and Hungarian Languages" (ACM SAC 2006).
Reimplemented from the published algorithm: accent fold (always, unlike the
length-gated Romance stemmers), then FOUR passes in the reference's order —
case-ending removal (-ként; -nak/-ban/-hoz/…; doubled-consonant -al/-el;
-at/-ra/-ig/…; -on/-en after consonant; bare -t/-n; -a/-e after a doubled
consonant), possessive removal (-atok/-itek; -unk/-juk/-ink; -am/-uk/-ja/…;
bare -a/-e/-m/-d/-i with vowel guards), plural removal (-ak/-ok/-ek → both
chars when long enough, else just the -k), and a final vowel normalize.

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the function-word core of the snowball hungarian_stop.txt
list (HungarianAnalyzer.getDefaultStopSet); pass your own frozenset to
override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "hungarian_light_stem",
    "hungarian_term",
    "hungarian_analyze",
    "hungarian_terms_positions",
    "HUNGARIAN_STOP_WORDS",
]

# function-word core of snowball's hungarian_stop.txt (public list)
HUNGARIAN_STOP_WORDS = frozenset(
    """a ahogy ahol aki akik akkor alatt által általában amely amelyek
    amelyekben amelyeket amelyet amelynek ami amit amolyan amíg amikor át
    abban ahhoz annak arra arról az azok azon azt azzal azért aztán
    azután azonban bár be belül benne cikk cikkek cikkeket csak de e
    eddig egész egy egyes egyetlen egyéb egyik egyre ekkor el elég ellen
    elő először előtt első én éppen ebben ehhez emilyen ennek erre ez
    ezt ezek ezen ezzel ezért és fel felé hanem hiszen hogy hogyan igen
    így illetve ill ilyen ilyenkor ison ismét itt jó jól jobban kell
    kellett keresztül keressünk ki kívül között közül legalább lehet
    lehetett legyen lenne lenni lesz lett maga magát majd már más másik
    meg még mellett mert mely melyek mi mit míg miért milyen mikor minden
    mindent mindenki mindig mint mintha mivel most nagy nagyobb nagyon ne
    néha nekem neki nem néhány nélkül nincs olyan ott össze ő ők őket
    pedig persze rá s saját sem semmi sok sokat sokkal számára szemben
    szerint szinte talán tehát teljes tovább továbbá több úgy ugyanis új
    újabb újra után utána utolsó vagy vagyis valaki valami valamint való
    vagyok van vannak volt voltam voltak voltunk vissza vele viszont
    volna""".split()
)

_HU_FOLD = str.maketrans(
    {
        "á": "a",
        "ë": "e", "é": "e",
        "í": "i",
        "ó": "o", "ő": "o", "õ": "o", "ö": "o",
        "ú": "u", "ű": "u", "ũ": "u", "û": "u", "ü": "u",
    }
)

_VOWELS = frozenset("aeiouy")  # HungarianLightStemmer.isVowel (y included)

_CASE3 = (
    "nak", "nek", "val", "vel", "ert", "rol", "ban", "ben", "bol", "nal",
    "nel", "hoz", "hez", "tol",
)
_CASE2 = ("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be", "ul", "ig")


def _remove_case(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("kent"):
        return s[:-4]
    if n > 5:
        if s.endswith(_CASE3):
            return s[:-3]
        if (
            s.endswith(("al", "el"))
            and s[-3] not in _VOWELS
            and s[-3] == s[-4]
        ):
            return s[:-3]
    if n > 4:
        if s.endswith(_CASE2):
            return s[:-2]
        if s.endswith(("on", "en")) and s[-3] not in _VOWELS:
            return s[:-2]
        if s[-1] in ("t", "n"):
            return s[:-1]
        if s[-1] in ("a", "e") and s[-2] == s[-3] and s[-2] not in _VOWELS:
            return s[:-2]
    return s


def _remove_possessive(s: str) -> str:
    n = len(s)
    if n > 6:
        if s[-5] not in _VOWELS and s.endswith(("atok", "otok", "etek")):
            return s[:-4]
        if s.endswith(("itek", "itok")):
            return s[:-4]
    if n > 5:
        if s[-4] not in _VOWELS and s.endswith(("unk", "tok", "tek")):
            return s[:-3]
        if s[-4] in _VOWELS and s.endswith("juk"):
            return s[:-3]
        if s.endswith("ink"):
            return s[:-3]
    if n > 4:
        if s[-3] not in _VOWELS and s.endswith(
            ("am", "em", "om", "ad", "ed", "od", "uk")
        ):
            return s[:-2]
        if s[-3] in _VOWELS and s.endswith(("nk", "ja", "je")):
            return s[:-2]
        if s.endswith(("im", "id", "ik")):
            return s[:-2]
    if n > 3:
        c = s[-1]
        if c in ("a", "e") and s[-2] not in _VOWELS:
            return s[:-1]
        if c in ("m", "d") and s[-2] in _VOWELS:
            return s[:-1]
        if c == "i":
            return s[:-1]
    return s


def _remove_plural(s: str) -> str:
    # the reference's intentional fallthrough: vowel+k strips both chars
    # only when len > 4, otherwise just the k
    if len(s) > 3 and s[-1] == "k":
        if s[-2] in ("a", "o", "e") and len(s) > 4:
            return s[:-2]
        return s[:-1]
    return s


def _normalize(s: str) -> str:
    if len(s) > 3 and s[-1] in ("a", "e", "i", "o"):
        return s[:-1]
    return s


def hungarian_light_stem(term: str) -> str:
    """HungarianLightStemmer.stem (Savoy SAC 2006): fold, then case →
    possessive → plural → normalize."""
    s = term.translate(_HU_FOLD)
    return _normalize(_remove_plural(_remove_possessive(_remove_case(s))))


def hungarian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form — StopFilter
    precedes the stemmer), light stem."""
    if stopwords and term in stopwords:
        return None
    return hungarian_light_stem(term)


def hungarian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = hungarian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def hungarian_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = hungarian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
