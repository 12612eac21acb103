"""Czech analysis chain: StandardTokenizer → lowercase → stop → stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
cz/CzechAnalyzer.java (LowerCase, Stop, CzechStemFilter) and
cz/CzechStemmer.java — the light Czech stemmer (Dolamic & Savoy,
"Indexing and stemming approaches for the Czech language", IP&M 2009).
Reimplemented from the published algorithm in the reference's pass order:

- removeCase: atech @len>7; ětem/etem/atům @len>6; the 25-suffix −3 group
  @len>5; the 12-suffix −2 group @len>4; final-vowel strip (incl. á é í ý
  ě ů) @len>3
- removePossessives: ov/in/ův @len>5 → −2
- normalize (palatalization fixups): čt→ck, št→sk, final c/č→k, final
  z/ž→h, e-insertion squeeze (…eX→…X), …ůX→…oX

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the function-word core of the Lucene czech stopword list
(public); pass your own frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "czech_stem",
    "czech_term",
    "czech_analyze",
    "czech_terms_positions",
    "CZECH_STOP_WORDS",
]

# function-word core of the Lucene czech stopword list (public)
CZECH_STOP_WORDS = frozenset(
    """a s k o i u v z dnes cz tímto budeš budem byli jseš můj svým ta
    tomto tohle tuto tyto jej zda proč máte tato kam tohoto kdo kteří mi
    nám tom tomuto mít nic proto kterou byla toho protože asi ho naši
    napište re což tím takže svých její svými jste aj tu tedy teto bylo
    kde ke pravé ji nad nejsou či pod téma mezi přes ty pak vám ani když
    však neg jsem tento článku články aby my on ona ono oni ony vy jen
    jak dále ale se ve to jako za zpět ze do pro je na atd atp jakmile
    přičemž já ho ona ono jsme jsou jsi bude budou být byl byly co nebo
    že tak má při od po jsou jeho""".split()
)

_CASE_M3 = (
    "ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete", "ěti",
    "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata", "aty", "ých",
    "ama", "ami", "ové", "ovi", "ými",
)
_CASE_M2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým", "mi", "ou")
_FINAL_VOWELS = frozenset("aeiouůyáéíýě")


def _remove_case(s: str) -> str:
    n = len(s)
    if n > 7 and s.endswith("atech"):
        return s[:-5]
    if n > 6 and s.endswith(("ětem", "etem", "atům")):
        return s[:-4]
    if n > 5 and s.endswith(_CASE_M3):
        return s[:-3]
    if n > 4 and s.endswith(_CASE_M2):
        return s[:-2]
    if n > 3 and s[-1] in _FINAL_VOWELS:
        return s[:-1]
    return s


def _normalize(s: str) -> str:
    if s.endswith("čt"):
        return s[:-2] + "ck"
    if s.endswith("št"):
        return s[:-2] + "sk"
    if s[-1] in "cč":
        return s[:-1] + "k"
    if s[-1] in "zž":
        return s[:-1] + "h"
    if len(s) > 1 and s[-2] == "e":
        return s[:-2] + s[-1]  # e-insertion squeeze: …eX -> …X
    if len(s) > 2 and s[-2] == "ů":
        return s[:-2] + "o" + s[-1]
    return s


def czech_stem(term: str) -> str:
    """CzechStemmer.stem: removeCase → removePossessives → normalize."""
    s = _remove_case(term)
    if len(s) > 5 and s.endswith(("ov", "in", "ův")):
        s = s[:-2]
    if s:
        s = _normalize(s)
    return s


def czech_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form — StopFilter
    precedes the stemmer), stem."""
    if stopwords and term in stopwords:
        return None
    return czech_stem(term)


def czech_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = czech_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def czech_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = czech_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
