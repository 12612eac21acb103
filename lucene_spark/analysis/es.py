"""Spanish analysis chain: StandardTokenizer → lowercase → stop → light stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
es/SpanishAnalyzer.java:113 (createComponents order: LowerCase, Stop,
SpanishLightStemFilter) and es/SpanishLightStemmer.java — Jacques Savoy's
light Spanish stemmer ("Report on CLEF-2001 Experiments"). Reimplemented
here from the published algorithm: terms shorter than 5 chars pass through
untouched (no folding either); otherwise accents fold, then ONE suffix rule
applies — final o/a/e strips, final -s strips with its preceding vowel
("-eses" keeps one 'es'; "-ces" rewrites to "z": veces → vez).

Pure per-term transform, so the vectorized vocabulary-remap lane applies
(analysis/vectorized.py): the chain runs once per DISTINCT term.

The stop set is the high-frequency function-word core of the snowball
spanish_stop.txt list (SpanishAnalyzer.getDefaultStopSet); pass your own
frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "spanish_light_stem",
    "spanish_term",
    "spanish_analyze",
    "spanish_terms_positions",
    "SPANISH_STOP_WORDS",
]

# function-word core of snowball's spanish_stop.txt (public list)
SPANISH_STOP_WORDS = frozenset(
    """de la que el en y a los del se las por un para con no una su al lo
    como más pero sus le ya o este sí porque esta entre cuando muy sin
    sobre también me hasta hay donde quien desde todo nos durante todos uno
    les ni contra otros ese eso ante ellos e esto mí antes algunos qué unos
    yo otro otras otra él tanto esa estos mucho quienes nada muchos cual
    poco ella estar estas algunas algo nosotros mi mis tú te ti tu tus
    ellas nosotras vosotros vosotras os mío mía míos mías tuyo tuya tuyos
    tuyas suyo suya suyos suyas nuestro nuestra nuestros nuestras vuestro
    vuestra vuestros vuestras esos esas es soy eres somos sois están estoy
    estás está estamos estáis fue fueron era eran sea ha he has hemos han
    haya sido tiene tienen tengo tenido""".split()
)

# SpanishLightStemmer's accent fold (applied only when len >= 5 — the
# reference returns short terms before touching the buffer)
_ES_FOLD = str.maketrans(
    {
        "à": "a", "á": "a", "â": "a", "ä": "a",
        "ò": "o", "ó": "o", "ô": "o", "ö": "o",
        "è": "e", "é": "e", "ê": "e", "ë": "e",
        "ù": "u", "ú": "u", "û": "u", "ü": "u",
        "ì": "i", "í": "i", "î": "i", "ï": "i",
    }
)


def spanish_light_stem(term: str) -> str:
    """SpanishLightStemmer.stem (Savoy CLEF-2001): fold accents, then one
    suffix rule — len guard first, like the reference."""
    if len(term) < 5:
        return term
    s = term.translate(_ES_FOLD)
    last = s[-1]
    if last in ("o", "a", "e"):
        return s[:-1]
    if last == "s":
        if s[-2] == "e" and s[-3] == "s" and s[-4] == "e":
            return s[:-2]  # meses -> mes
        if s[-2] == "e" and s[-3] == "c":
            return s[:-3] + "z"  # veces -> vez
        if s[-2] in ("o", "a", "e"):
            return s[:-2]  # libros -> libr
    return s


def spanish_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form — StopFilter
    precedes the stemmer in SpanishAnalyzer), light stem."""
    if stopwords and term in stopwords:
        return None
    return spanish_light_stem(term)


def spanish_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = spanish_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def spanish_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = spanish_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
