"""Finnish analysis chain: StandardTokenizer → lowercase → stop → light
stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
fi/FinnishLightStemFilter.java and fi/FinnishLightStemmer.java — the UniNE
light Finnish stemmer (Jacques Savoy). Reimplemented from the published
algorithm, preserving the reference's exact pass order and guards:

- len < 4 → passthrough UNFOLDED (the ä/å→a, ö→o fold only runs on
  stemmable terms, inside stem())
- step1: recursive -kin (len>8) / -ko (len>8) clitic strip, then
  dellinen/dellisuus @len>11
- step2: lla/tse/sti → −3, ni → −2, aa → −1 (all @len>5)
- step3: case endings — nnen→s+−3 and ntena→s+−4 rewrites, tten/eiden,
  the neen/niin/seen/teen/inen group, the h+vowel+n rule, den→s,
  ksen→s, the ssa/sta/lla/lta/tta/ksi/lle group, na/ne/nei, ja/ta,
  final -a, vowel+n → −2 else n → −1 (guards as in the source)
- norm1: hde→ksi in-place rewrite @len>5, ei/at @len>4, final
  t/s/j/e/a/i strip @len>3
- norm2: trailing e/o/u @len>8, trailing i @len>4, then the k/p/t
  double-consonant squeeze

Pure per-term transform → the vectorized vocabulary-remap lane applies.

The stop set is the function-word core of the snowball finnish_stop.txt
list; pass your own frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "finnish_light_stem",
    "finnish_term",
    "finnish_analyze",
    "finnish_terms_positions",
    "FINNISH_STOP_WORDS",
]

# function-word core of snowball's finnish_stop.txt (public list)
FINNISH_STOP_WORDS = frozenset(
    """olla olen olet on olemme olette ovat ole oli olisi olisit olisin
    olisimme olisitte olisivat olit olin olimme olitte olivat ollut
    olleet en et ei emme ette eivät minä minun minut minua minussa
    minusta minuun minulla minulta minulle sinä sinun sinut sinua
    sinussa sinusta sinuun sinulla sinulta sinulle hän hänen hänet häntä
    hänessä hänestä häneen hänellä häneltä hänelle me meidän meidät
    meitä meissä meistä meihin meillä meiltä meille te teidän teidät
    teitä teissä teistä teihin teillä teiltä teille he heidän heidät
    heitä heissä heistä heihin heillä heiltä heille tämä tämän tätä
    tässä tästä tähän tällä tältä tälle tänä täksi tuo tuon tuota tuossa
    tuosta tuohon tuolla tuolta tuolle tuona tuoksi se sen sitä siinä
    siitä siihen sillä siltä sille sinä siksi nämä näiden näitä näissä
    näistä näihin näillä näiltä näille näinä näiksi nuo noiden noita
    noissa noista noihin noilla noilta noille noina noiksi ne niiden
    niitä niissä niistä niihin niillä niiltä niille niinä niiksi kuka
    kenen kenet ketä kenessä kenestä keneen kenellä keneltä kenelle
    kenenä keneksi ketkä keiden ketkä keitä keissä keistä keihin keillä
    keiltä keille keinä keiksi mikä minkä minkä mitä missä mistä mihin
    millä miltä mille minä miksi mitkä joka jonka jota jossa josta johon
    jolla jolta jolle jona joksi jotka joiden joita joissa joista joihin
    joilla joilta joille joina joiksi että ja jos koska kuin mutta niin
    sekä sillä tai vaan vai vaikka kanssa mukaan noin poikki yli kun
    niin nyt itse""".split()
)

_VOWELS = frozenset("aeiouy")


def _step1(s: str) -> str:
    if len(s) > 8:
        if s.endswith("kin"):
            return _step1(s[:-3])
        if s.endswith("ko"):
            return _step1(s[:-2])
    if len(s) > 11:
        if s.endswith("dellinen"):
            return s[:-8]
        if s.endswith("dellisuus"):
            return s[:-9]
    return s


def _step2(s: str) -> str:
    if len(s) > 5:
        if s.endswith(("lla", "tse", "sti")):
            return s[:-3]
        if s.endswith("ni"):
            return s[:-2]
        if s.endswith("aa"):
            return s[:-1]
    return s


def _step3(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("nnen"):
            return s[:-4] + "s"
        if s.endswith("ntena"):
            return s[:-5] + "s"
        if s.endswith("tten"):
            return s[:-4]
        if s.endswith("eiden"):
            return s[:-5]
    if n > 6:
        if s.endswith(("neen", "niin", "seen", "teen", "inen")):
            return s[:-4]
        if s[-3] == "h" and s[-2] in _VOWELS and s[-1] == "n":
            return s[:-3]
        if s.endswith("den"):
            return s[:-3] + "s"
        if s.endswith("ksen"):
            return s[:-4] + "s"
        if s.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            return s[:-3]
    if n > 5:
        if s.endswith(("na", "ne")):
            return s[:-2]
        if s.endswith("nei"):
            return s[:-3]
    if n > 4:
        if s.endswith(("ja", "ta")):
            return s[:-2]
        if s[-1] == "a":
            return s[:-1]
        if s[-1] == "n" and s[-2] in _VOWELS:
            return s[:-2]
        if s[-1] == "n":
            return s[:-1]
    return s


def _norm1(s: str) -> str:
    if len(s) > 5 and s.endswith("hde"):
        s = s[:-3] + "ksi"
    if len(s) > 4 and s.endswith(("ei", "at")):
        return s[:-2]
    if len(s) > 3 and s[-1] in "tsjeai":
        return s[:-1]
    return s


def _norm2(s: str) -> str:
    if len(s) > 8 and s[-1] in "eou":
        s = s[:-1]
    if len(s) > 4:
        if s[-1] == "i":
            s = s[:-1]
        if len(s) > 4:
            # squeeze doubled k/p/t (the reference's in-place delete loop)
            out = [s[0]]
            for ch in s[1:]:
                if ch == out[-1] and ch in "kpt":
                    continue
                out.append(ch)
            s = "".join(out)
    return s


def finnish_light_stem(term: str) -> str:
    """FinnishLightStemmer.stem: fold ä/å→a ö→o, then step1→step2→step3→
    norm1→norm2; terms shorter than 4 chars pass through unfolded."""
    if len(term) < 4:
        return term
    s = term.replace("ä", "a").replace("å", "a").replace("ö", "o")
    return _norm2(_norm1(_step3(_step2(_step1(s)))))


def finnish_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (surface form — StopFilter
    precedes the stemmer), light stem."""
    if stopwords and term in stopwords:
        return None
    return finnish_light_stem(term)


def finnish_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = finnish_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def finnish_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = finnish_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
