"""Norwegian analysis chain: StandardTokenizer → lowercase → stop → light
stem (Bokmål).

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
no/NorwegianLightStemFilter.java (default flags = BOKMAAL) and
no/NorwegianLightStemmer.java — the UniNE-style light Norwegian stemmer.
Reimplemented from the published algorithm with ``flags=BOKMAAL`` (the
filter's default), preserving the reference's rule ORDER: possessive -s
strip first (always, then CONTINUE), then the guarded suffix groups in
source order — heter/heten @len>7 → −5; dom/het @len>5 → −3; elser/elsen
@len>7 → −5; ende/else/este/eren @len>6 → −4; ere/est/ene @len>5 → −3;
er/en/et/st/te @len>4 → −2; final a/e/n strip @len>3. Nynorsk-only
suffixes (heita, leiken, ande, aste, ane, ar, …) are compiled out exactly
as ``useNynorsk=false`` skips them. No folding pass (å/æ/ø kept).

Module is named ``no_`` (not ``no``) only to dodge the python keyword-ish
ambiguity of ``import no`` shadowing; the analyzer registry name is
"norwegian".

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the function-word core of the snowball norwegian_stop.txt
list; pass your own frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "norwegian_light_stem",
    "norwegian_term",
    "norwegian_analyze",
    "norwegian_terms_positions",
    "NORWEGIAN_STOP_WORDS",
]

# function-word core of snowball's norwegian_stop.txt (public list)
NORWEGIAN_STOP_WORDS = frozenset(
    """og i jeg det at en et den til er som på de med han av ikke ikkje
    der så var meg seg men ett har om vi min mitt ha hadde hun nå over da
    ved fra du ut sin dem oss opp man kan hans hvor eller hva skal selv
    sjøl her alle vil bli ble blei bare enn etter ned skulle denne for
    deg si sine sitt mot å meget hvorfor dette disse uten hvordan ingen
    din ditt blir samme hvilken hvilke sånn inni mellom vår hver hvem
    vors hvis både båe begge siden dykk dykkar dei deira deires deim di
    då eg ein eit eitt elles honom hjå ho hoe henne hennar hennes hoss
    hossen ikkje ingi inkje korleis korso kva kvar kvarhelst kven kvi
    kvifor me medan mi mine mykje no nokon noka nokor noko nokre si sia
    sidan so somt somme um upp vere vore verte vort varte vart""".split()
)


def norwegian_light_stem(term: str) -> str:
    """NorwegianLightStemmer.stem with flags=BOKMAAL: possessive -s, then
    the first matching guarded suffix group, then a final a/e/n strip."""
    s = term
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and (s.endswith("heter") or s.endswith("heten")):
        return s[:-5]
    if n > 5 and (s.endswith("dom") or s.endswith("het")):
        return s[:-3]
    if n > 7 and (s.endswith("elser") or s.endswith("elsen")):
        return s[:-5]
    if n > 6 and (
        s.endswith("ende")
        or s.endswith("else")
        or s.endswith("este")
        or s.endswith("eren")
    ):
        return s[:-4]
    if n > 5 and (s.endswith("ere") or s.endswith("est") or s.endswith("ene")):
        return s[:-3]
    if n > 4 and (
        s.endswith("er")
        or s.endswith("en")
        or s.endswith("et")
        or s.endswith("st")
        or s.endswith("te")
    ):
        return s[:-2]
    if n > 3 and s[-1] in "aen":
        return s[:-1]
    return s


def norwegian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form — StopFilter
    precedes the stemmer), light stem."""
    if stopwords and term in stopwords:
        return None
    return norwegian_light_stem(term)


def norwegian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = norwegian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def norwegian_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = norwegian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
