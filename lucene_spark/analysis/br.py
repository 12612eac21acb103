"""Brazilian Portuguese analysis chain: StandardTokenizer → lowercase →
stop → Brazilian stemmer.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
br/BrazilianAnalyzer.java (createComponents: StandardTokenizer, LowerCase,
Stop, SetKeywordMarker, BrazilianStemFilter) and br/BrazilianStemmer.java —
Lucene's own Orengo/RSLP-style Brazilian stemmer (distinct from snowball
Portuguese: it FOLDS DIACRITICS first). Reimplemented here table-driven
from the published rule inventory; vectors replayed from
TestBrazilianAnalyzer.java/TestBrazilianStemmer.java. Semantics preserved
exactly, including two reference quirks:

- the "logias" rule fires (marking the word altered) but never assigns the
  replacement back, so the term is unchanged yet step3 runs instead of
  step4 (BrazilianStemmer.java:399);
- step2's first "ira" rule removes "ava" — a no-op on a word ending in
  "ira" — but still reports the word altered (BrazilianStemmer.java:964).

Steps: fold (lowercase, strip accents/ç/ñ, trim one leading/trailing
punctuation char); words of length <3 or >=30 are returned unstemmed; R1 =
after the first non-vowel following the first vowel, both strictly before
the last char (else null); R2 = R1 of R1; RV per the Portuguese scheme
(second-letter-consonant / two-vowel / consonant-vowel cases, null if not
found). step1 (standard suffixes, region-gated, first match wins) else
step2 (verb suffixes in RV); if either fired → step3 (-i after c in RV)
else step4 (residual -os/-a/-i/-o in RV); then step5 (-e in RV, undoubling
-gue/-cie).

Pure per-term transform → the vectorized vocabulary-remap lane applies.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "brazilian_stem",
    "brazilian_term",
    "brazilian_analyze",
    "brazilian_terms_positions",
    "BRAZILIAN_STOP_WORDS",
]

# Lucene br/stopwords.txt (public list)
BRAZILIAN_STOP_WORDS = frozenset(
    """a ainda alem ambas ambos antes ao aonde aos apos aquele aqueles as assim com como contra contudo cuja cujas cujo cujos da das de dela dele deles demais depois desde desta deste dispoe dispoem diversa diversas diversos do dos durante e ela elas ele eles em entao entre essa essas esse esses esta estas este estes ha isso isto logo mais mas mediante menos mesma mesmas mesmo mesmos na no nao nas nem nesse neste nos o os ou outra outras outro outros pelas pelas pelo pelos perante pois por porque portanto proprio propios quais qual qualquer quando quanto que quem quer se seja sem sendo seu seus sob sobre sua suas tal tambem teu teus toda todas todo todos tua tuas tudo um uma umas uns""".split()
)

_V = frozenset("aeiou")

_FOLD = str.maketrans({
    "á": "a", "â": "a", "ã": "a", "é": "e", "ê": "e", "í": "i",
    "ó": "o", "ô": "o", "õ": "o", "ú": "u", "ü": "u", "ç": "c", "ñ": "n",
})
_PUNCT = set("\"'-,;.?!")

# step1 rules in reference order: (suffix, region, preceded_by, action)
# action: "" = delete, str = replacement, None = the no-assign quirk
_STEP1 = (
    ('uciones', 'r2', '', 'u'), ('imentos', 'r2', '', ''),
    ('amentos', 'r2', '', ''), ('adores', 'r2', '', ''),
    ('adoras', 'r2', '', ''), ('logias', 'r2', '', None),
    ('encias', 'r2', '', 'ente'), ('amente', 'r1', '', ''),
    ('idades', 'r2', '', ''), ('acoes', 'r2', '', ''),
    ('imento', 'r2', '', ''), ('amento', 'r2', '', ''),
    ('adora', 'r2', '', ''), ('ismos', 'r2', '', ''), ('istas', 'r2', '', ''),
    ('logia', 'r2', '', 'log'), ('ucion', 'r2', '', 'u'),
    ('encia', 'r2', '', 'ente'), ('mente', 'r2', '', ''),
    ('idade', 'r2', '', ''), ('acao', 'r2', '', ''), ('ezas', 'r2', '', ''),
    ('icos', 'r2', '', ''), ('icas', 'r2', '', ''), ('ismo', 'r2', '', ''),
    ('avel', 'r2', '', ''), ('ivel', 'r2', '', ''), ('ista', 'r2', '', ''),
    ('osos', 'r2', '', ''), ('osas', 'r2', '', ''), ('ador', 'r2', '', ''),
    ('ivas', 'r2', '', ''), ('ivos', 'r2', '', ''), ('iras', 'rv', 'e', 'ir'),
    ('eza', 'r2', '', ''), ('ico', 'r2', '', ''), ('ica', 'r2', '', ''),
    ('oso', 'r2', '', ''), ('osa', 'r2', '', ''), ('iva', 'r2', '', ''),
    ('ivo', 'r2', '', ''), ('ira', 'rv', 'e', 'ir'),
)

# step2 verb rules in reference order: (check_suffix, remove_suffix)
_STEP2 = (
    ('issemos', 'issemos'), ('essemos', 'essemos'), ('assemos', 'assemos'),
    ('ariamos', 'ariamos'), ('eriamos', 'eriamos'), ('iriamos', 'iriamos'),
    ('iremos', 'iremos'), ('eremos', 'eremos'), ('aremos', 'aremos'),
    ('avamos', 'avamos'), ('iramos', 'iramos'), ('eramos', 'eramos'),
    ('aramos', 'aramos'), ('asseis', 'asseis'), ('esseis', 'esseis'),
    ('isseis', 'isseis'), ('arieis', 'arieis'), ('erieis', 'erieis'),
    ('irieis', 'irieis'), ('irmos', 'irmos'), ('iamos', 'iamos'),
    ('armos', 'armos'), ('ermos', 'ermos'), ('areis', 'areis'),
    ('ereis', 'ereis'), ('ireis', 'ireis'), ('asses', 'asses'),
    ('esses', 'esses'), ('isses', 'isses'), ('astes', 'astes'),
    ('assem', 'assem'), ('essem', 'essem'), ('issem', 'issem'),
    ('ardes', 'ardes'), ('erdes', 'erdes'), ('irdes', 'irdes'),
    ('ariam', 'ariam'), ('eriam', 'eriam'), ('iriam', 'iriam'),
    ('arias', 'arias'), ('erias', 'erias'), ('irias', 'irias'),
    ('estes', 'estes'), ('istes', 'istes'), ('areis', 'areis'),
    ('aveis', 'aveis'), ('aria', 'aria'), ('eria', 'eria'), ('iria', 'iria'),
    ('asse', 'asse'), ('esse', 'esse'), ('isse', 'isse'), ('aste', 'aste'),
    ('este', 'este'), ('iste', 'iste'), ('arei', 'arei'), ('erei', 'erei'),
    ('irei', 'irei'), ('aram', 'aram'), ('eram', 'eram'), ('iram', 'iram'),
    ('avam', 'avam'), ('arem', 'arem'), ('erem', 'erem'), ('irem', 'irem'),
    ('ando', 'ando'), ('endo', 'endo'), ('indo', 'indo'), ('arao', 'arao'),
    ('erao', 'erao'), ('irao', 'irao'), ('adas', 'adas'), ('idas', 'idas'),
    ('aras', 'aras'), ('eras', 'eras'), ('iras', 'iras'), ('avas', 'avas'),
    ('ares', 'ares'), ('eres', 'eres'), ('ires', 'ires'), ('ados', 'ados'),
    ('idos', 'idos'), ('amos', 'amos'), ('emos', 'emos'), ('imos', 'imos'),
    ('iras', 'iras'), ('ieis', 'ieis'), ('ada', 'ada'), ('ida', 'ida'),
    ('ara', 'ara'), ('era', 'era'), ('ira', 'ava'), ('iam', 'iam'),
    ('ado', 'ado'), ('ido', 'ido'), ('ias', 'ias'), ('ais', 'ais'),
    ('eis', 'eis'), ('ira', 'ira'), ('ear', 'ear'), ('ia', 'ia'),
    ('ei', 'ei'), ('am', 'am'), ('em', 'em'), ('ar', 'ar'), ('er', 'er'),
    ('ir', 'ir'), ('as', 'as'), ('es', 'es'), ('is', 'is'), ('eu', 'eu'),
    ('iu', 'iu'), ('iu', 'iu'), ('ou', 'ou'),
)


def _r1_len(w: str, start: int = 0) -> int | None:
    """Length of R1 of w[start:] per BrazilianStemmer.getR1 (both scans
    stop strictly before the LAST index; null when not found)."""
    n = len(w)
    i = n - 1
    j = start
    while j < i and w[j] not in _V:
        j += 1
    if j >= i:
        return None
    while j < i and w[j] in _V:
        j += 1
    if j >= i:
        return None
    return n - (j + 1)


def _rv_len(w: str) -> int | None:
    """Length of RV per BrazilianStemmer.getRV."""
    n = len(w)
    i = n - 1
    if i > 0 and w[1] not in _V:
        j = 2
        while j < i and w[j] not in _V:
            j += 1
        if j < i:
            return n - (j + 1)
    if i > 1 and w[0] in _V and w[1] in _V:
        j = 2
        while j < i and w[j] in _V:
            j += 1
        if j < i:
            return n - (j + 1)
    if i > 2:
        return n - 3
    return None


def _fold(term: str) -> str:
    w = term.lower().translate(_FOLD)
    if len(w) >= 2 and w[0] in _PUNCT:
        w = w[1:]
    if len(w) >= 2 and w[-1] in _PUNCT:
        w = w[:-1]
    return w


def brazilian_stem(term: str) -> str | None:
    """BrazilianStemmer.stem on a raw token: None when not indexable
    (caller keeps the original term, matching BrazilianStemFilter)."""
    w = _fold(term)
    if not (2 < len(w) < 30):
        return None
    if not w.isalpha():
        return w

    # regions are STRINGS frozen at the start (Java keeps R1/R2/RV as the
    # original substrings; later steps test the ORIGINAL region but remove
    # from the CURRENT word, where removeSuffix silently no-ops)
    r1l = _r1_len(w)
    r1 = w[len(w) - r1l:] if r1l is not None else None
    r2l = _r1_len(r1) if r1 is not None else None
    r2 = r1[len(r1) - r2l:] if r2l is not None else None
    rvl = _rv_len(w)
    rv = w[len(w) - rvl:] if rvl is not None else None
    regions = {"r1": r1, "r2": r2, "rv": rv}

    def chop(word: str, sfx: str) -> str:
        return word[: len(word) - len(sfx)] if word.endswith(sfx) else word

    altered = False
    for sfx, region, prec, action in _STEP1:
        reg = regions[region]
        if not w.endswith(sfx) or reg is None or not reg.endswith(sfx):
            continue
        if prec and not w.endswith(prec + sfx):
            continue
        if action is not None:
            w = w[: len(w) - len(sfx)] + action
        altered = True
        break

    if not altered and rv is not None:
        for chk, rem in _STEP2:
            if rv.endswith(chk):
                w = chop(w, rem)
                altered = True
                break

    if rv is not None:
        if altered:
            # step3: -i preceded by c, both inside the original RV
            if rv.endswith("ci"):
                w = chop(w, "i")
        else:
            # step4: residual suffix
            for sfx in ("os", "a", "i", "o"):
                if rv.endswith(sfx):
                    w = chop(w, sfx)
                    break
        # step5
        if rv.endswith("e"):
            if rv.endswith("gue"):
                w = chop(w, "e")
                w = chop(w, "u")
            elif rv.endswith("cie"):
                w = chop(w, "e")
                w = chop(w, "i")
            else:
                w = chop(w, "e")

    return w


def brazilian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    if stopwords and term in stopwords:
        return None
    s = brazilian_stem(term)
    return term if s is None else s


def brazilian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = brazilian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def brazilian_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = brazilian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
