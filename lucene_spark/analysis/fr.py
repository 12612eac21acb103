"""French analysis chain: StandardTokenizer → elision → lowercase → stop →
light stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
fr/FrenchAnalyzer.java:129 (createComponents order: ElisionFilter with
DEFAULT_ARTICLES, then LowerCase, Stop, FrenchLightStemFilter),
util/ElisionFilter.java:49 (strip through the FIRST apostrophe — ' or
U+2019 — when the prefix is an article, case-insensitive) and
fr/FrenchLightStemmer.java — the "UniNE" light French stemmer from Jacques
Savoy, "Light Stemming Approaches for the French, Portuguese, German and
Hungarian Languages" (ACM SAC 2006). Reimplemented here from the published
algorithm (suffix rewrites, then a normalization pass: accent fold,
repeated-letter collapse, -ie/-r/-e/-e tail strip).

The repo's standard tokenizer keeps apostrophe-joined words as single
tokens (UAX#29 MidLetter), so elision is a pure per-term transform and the
whole chain runs once per DISTINCT vocabulary term (the same
vocabulary-remap trick as the English/German lanes in
analysis/vectorized.py).

The stop set is the high-frequency function-word core of the snowball
french_stop.txt list (FrenchAnalyzer.getDefaultStopSet); pass your own
frozenset to override. NOTE: stopping happens AFTER elision, so "l'avion"
stops on "avion" only if "avion" is a stopword (it is not) — matching the
reference chain order.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "french_elide",
    "french_light_stem",
    "french_term",
    "french_analyze",
    "french_terms_positions",
    "FRENCH_STOP_WORDS",
    "ELISION_ARTICLES",
]

# FrenchAnalyzer.DEFAULT_ARTICLES (public constant list)
ELISION_ARTICLES = frozenset(
    "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split()
)

# function-word core of snowball's french_stop.txt (public list)
FRENCH_STOP_WORDS = frozenset(
    """au aux avec ce ces dans de des du elle en et eux il ils je la le les
    leur lui ma mais me même mes moi mon ne nos notre nous on ou par pas
    pour qu que qui sa se ses son sur ta te tes toi ton tu un une vos votre
    vous c d j l à m n s t y été étée étées étés étant suis es est sommes
    êtes sont serai seras sera serons serez seront serais serait serions
    seriez seraient étais était étions étiez étaient fus fut fûmes fûtes
    furent sois soit soyons soyez soient ai as avons avez ont aurai auras
    aura aurons aurez auront avais avait avions aviez avaient eut eûmes
    eûtes eurent""".split()
)

_APOSTROPHES = ("'", "’")

# norm()'s accent fold (FrenchLightStemmer.norm switch — a French-specific
# subset, NOT full ASCII folding: ë/ï/ü etc. are deliberately untouched)
_FR_FOLD = str.maketrans(
    {
        "à": "a", "á": "a", "â": "a",
        "ô": "o",
        "è": "e", "é": "e", "ê": "e",
        "ù": "u", "û": "u",
        "î": "i",
        "ç": "c",
    }
)


def elide(term: str, articles: frozenset[str]) -> str:
    """ElisionFilter (util/ElisionFilter.java:49), language-neutral core:
    find the FIRST apostrophe (' or U+2019); if the prefix before it is one
    of the articles, strip prefix + apostrophe."""
    for ap in _APOSTROPHES:
        i = term.find(ap)
        if i >= 0:
            break
    else:
        return term
    # first apostrophe of either kind
    j = term.find(_APOSTROPHES[1] if ap == _APOSTROPHES[0] else _APOSTROPHES[0])
    if 0 <= j < i:
        i = j
    return term[i + 1 :] if term[:i] in articles else term


def french_elide(term: str) -> str:
    """ElisionFilter with FrenchAnalyzer.DEFAULT_ARTICLES."""
    return elide(term, ELISION_ARTICLES)


def _norm(s: str) -> str:
    """FrenchLightStemmer.norm: accent fold + repeated-letter collapse
    (only when longer than 4), then -ie, and the -r/-e/-e + double-letter
    tail strip (each gated on len > 4 at its step)."""
    if len(s) > 4:
        s = s.translate(_FR_FOLD)
        out = [s[0]]
        for ch in s[1:]:
            if ch != out[-1] or not ch.isalpha():
                out.append(ch)
        s = "".join(out)
    if len(s) > 4 and s.endswith("ie"):
        s = s[:-2]
    if len(s) > 4:
        if s.endswith("r"):
            s = s[:-1]
        if s.endswith("e"):
            s = s[:-1]
        if s.endswith("e"):
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return s


def french_light_stem(term: str) -> str:
    """Savoy's UniNE light French stemmer (SAC 2006), the
    FrenchLightStemmer.stem rule order: plural -x/-s strip, then the
    derivational-suffix rewrite ladder (each rule returns through norm),
    finally norm on whatever matched nothing."""
    s = term
    if len(s) > 5 and s[-1] == "x":
        if s.endswith("aux") and s[-4] != "e":
            s = s[:-3] + "al"  # chevaux -> cheval (via 'au'->'al', drop x)
        else:
            s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]

    n = len(s)
    if n > 9 and s.endswith("issement"):
        return _norm(s[:-8] + "ir")  # investissement -> investir
    if n > 8 and s.endswith("issant"):
        return _norm(s[:-6] + "ir")
    if n > 6 and s.endswith("ement"):
        s = s[:-4]  # strip "ment", keep the 'e' (doucement -> douce)
        if len(s) > 3 and s.endswith("ive"):
            s = s[:-3] + "if"
        return _norm(s)
    if n > 11 and s.endswith("ficatrice"):
        return _norm(s[:-9] + "fier")
    if n > 10 and s.endswith("ficateur"):
        return _norm(s[:-8] + "fier")
    if n > 9 and s.endswith("catrice"):
        return _norm(s[:-7] + "quer")
    if n > 8 and s.endswith("cateur"):
        return _norm(s[:-6] + "quer")
    if n > 8 and s.endswith("atrice"):
        return _norm(s[:-6] + "er")
    if n > 7 and s.endswith("ateur"):
        return _norm(s[:-5] + "er")
    if n > 6 and s.endswith("trice"):
        s = s[:-5] + "teur"  # then fall through (no norm return in ref)
        n = len(s)
    if n > 5 and s.endswith("ième"):
        return _norm(s[:-4])
    if n > 7 and s.endswith("teuse"):
        return _norm(s[:-5] + "ter")  # chanteuse -> chanter
    if n > 6 and s.endswith("teur"):
        return _norm(s[:-4] + "ter")  # chanteur -> chanter
    if n > 5 and s.endswith("euse"):
        return _norm(s[:-4] + "eu")
    if n > 8 and s.endswith("ère"):
        return _norm(s[:-3] + "er")
    if n > 7 and s.endswith("ive"):
        return _norm(s[:-3] + "if")
    if n > 4 and (s.endswith("folle") or s.endswith("molle")):
        return _norm(s[:-5] + s[-5] + "ou")  # folle -> fou, molle -> mou
    if n > 9 and s.endswith("nnelle"):
        return _norm(s[:-6] + "n")
    if n > 9 and s.endswith("nnel"):
        return _norm(s[:-4] + "n")
    if n > 4 and s.endswith("ète"):
        s = s[:-3] + "et"  # fall through (no norm return in ref)
        n = len(s)
    if n > 8 and s.endswith("ique"):
        s = s[:-4]
        n = len(s)
    if n > 8 and s.endswith("esse"):
        return _norm(s[:-4] + "e")
    if n > 7 and s.endswith("inage"):
        return _norm(s[:-5] + "in")
    if n > 9 and s.endswith("isation"):
        s = s[:-7]
        if len(s) > 5 and s.endswith("ual"):
            s = s[:-3] + "uel"  # -ualisation -> -uel
        return _norm(s)
    if n > 9 and s.endswith("isateur"):
        return _norm(s[:-7])
    if n > 8 and s.endswith("ation"):
        return _norm(s[:-5])
    if n > 8 and s.endswith("ition"):
        return _norm(s[:-5])
    return _norm(s)


def french_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: elide, stop (on the elided surface
    form — StopFilter follows ElisionFilter in the reference chain), light
    stem."""
    t = french_elide(term)
    if not t or (stopwords and t in stopwords):
        return None
    return french_light_stem(t)


def french_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = french_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def french_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = french_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
