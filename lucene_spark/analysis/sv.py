"""Swedish analysis chain: StandardTokenizer → lowercase → stop → light
stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
sv/SwedishLightStemFilter.java (filter contract) and
sv/SwedishLightStemmer.java — the UniNE light Swedish stemmer from Jacques
Savoy's published "report and CLEF experiments" rule set. Reimplemented
from the published algorithm, preserving the reference's rule ORDER:
possessive -s strip first (always, then CONTINUE), then longest-suffix
groups by guarded length (elser/heten @len>7; arne/erna/ande/else/aste/
orna/aren @len>6; are/ast/het @len>5; ar/er/or/en/at/te/et @len>4), then
a final single t/a/e/n strip @len>3. First match in a group wins and the
groups are mutually exclusive after the first hit — unlike the Finnish
chain there is no normalization pass, and å/ä/ö are NOT folded.

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the function-word core of the snowball swedish_stop.txt
list; pass your own frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "swedish_light_stem",
    "swedish_term",
    "swedish_analyze",
    "swedish_terms_positions",
    "SWEDISH_STOP_WORDS",
]

# function-word core of snowball's swedish_stop.txt (public list)
SWEDISH_STOP_WORDS = frozenset(
    """och det att i en jag hon som han på den med var sig för så till är
    men ett om hade de av icke mig du henne då sin nu har inte hans honom
    skulle hennes där min man ej vid kunde något från ut när efter upp vi
    dem vara vad över än dig kan sina här ha mot alla under någon eller
    allt mycket sedan ju denna själv detta åt utan varit hur ingen mitt
    ni bli blev oss din dessa några deras blir mina samma vilken er sådan
    vår blivit dess inom mellan sådant varför varje vilka ditt vem vilket
    sitta sådana vart dina vars vårt våra ert era vilkas""".split()
)

_G1 = ("elser", "heten")                                      # len > 7
_G2 = ("arne", "erna", "ande", "else", "aste", "orna", "aren")  # len > 6
_G3 = ("are", "ast", "het")                                   # len > 5
_G4 = ("ar", "er", "or", "en", "at", "te", "et")              # len > 4


def swedish_light_stem(term: str) -> str:
    """SwedishLightStemmer.stem: possessive -s, then one longest-suffix
    group hit, then a final t/a/e/n strip."""
    s = term
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and s.endswith(_G1):
        return s[:-5]
    if n > 6 and s.endswith(_G2):
        return s[:-4]
    if n > 5 and s.endswith(_G3):
        return s[:-3]
    if n > 4 and s.endswith(_G4):
        return s[:-2]
    if n > 3 and s[-1] in "taen":
        return s[:-1]
    return s


def swedish_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form — StopFilter
    precedes the stemmer), light stem."""
    if stopwords and term in stopwords:
        return None
    return swedish_light_stem(term)


def swedish_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = swedish_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def swedish_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = swedish_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
