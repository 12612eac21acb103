"""German analysis chain: StandardTokenizer → lowercase → stop →
normalization → light stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
de/GermanAnalyzer.java:1 (createComponents order),
de/GermanNormalizationFilter.java (umlaut/ß/digraph normalization) and
de/GermanLightStemmer.java — Jacques Savoy's light German stemmer ("Light
stemming approaches for the French, Portuguese, German and Hungarian
languages", ACM SAC 2006): two suffix-stripping passes over the normalized
term. Reimplemented here from the published algorithm.

Normalization rules (GermanNormalizationFilter semantics):
- ä/à/á/â → a, ö/ò/ó/ô → o, ü/ù/ú/û → u, ï/ì/í/î → i, è/é/ê/ë → e, ß → ss
- the umlaut digraphs ae → a, oe → o, ue → u — EXCEPT 'ue' directly after
  q (quelle keeps its e), matching the reference's state machine.

Light-stem passes (GermanLightStemmer.step1/step2):
- step1: strip "-ern" (len>5); "-em/-en/-er/-es" (len>4); "-e" (len>3);
  "-s" after one of bdfghklmnt (len>3)
- step2: strip "-est" (len>5); "-er"/"-en" (len>4)

The stop set is the high-frequency German function-word core of the
snowball list (GermanAnalyzer.getDefaultStopSet loads
snowball german_stop.txt); pass your own frozenset to override.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "german_normalize",
    "german_light_stem",
    "german_term",
    "german_analyze",
    "german_terms_positions",
    "GERMAN_STOP_WORDS",
]

# the function-word core of snowball's german_stop.txt (public list)
GERMAN_STOP_WORDS = frozenset(
    """aber alle allem allen aller alles als also am an ander andere anderem
    anderen anderer anderes auch auf aus bei bin bis bist da damit dann das
    dass dein deine dem den der des dessen die dies diese diesem diesen
    dieser dieses doch dort du durch ein eine einem einen einer eines er es
    etwas euer eure für gegen gewesen hab habe haben hat hatte hatten hier
    hin hinter ich ihr ihre im in indem ins ist ja jede jedem jeden jeder
    jedes jene jenem jenen jener jenes jetzt kann kein keine keinem keinen
    keiner keines können könnte machen man manche manchem manchen mancher
    manches mein meine mit muss musste nach nicht nichts noch nun nur ob
    oder ohne sehr sein seine selbst sich sie sind so solche solchem
    solchen solcher solches soll sollte sondern sonst über um und uns unser
    unter viel vom von vor während war waren warst was weg weil weiter
    welche welchem welchen welcher welches wenn werde werden wie wieder
    will wir wird wirst wo wollen wollte würde würden zu zum zur zwar
    zwischen""".split()
)

_SINGLE = str.maketrans(
    {
        "ä": "a", "à": "a", "á": "a", "â": "a",
        "ö": "o", "ò": "o", "ó": "o", "ô": "o",
        "ü": "u", "ù": "u", "ú": "u", "û": "u",
        "ï": "i", "ì": "i", "í": "i", "î": "i",
        "è": "e", "é": "e", "ê": "e", "ë": "e",
    }
)

_ST_ENDING = frozenset("bdfghklmnt")


def german_normalize(term: str) -> str:
    """GermanNormalizationFilter: fold umlauts/accents, ß→ss, and the
    ae/oe/ue digraphs (ue kept after q)."""
    t = term.translate(_SINGLE).replace("ß", "ss")
    out = []
    i = 0
    n = len(t)
    while i < n:
        ch = t[i]
        if i + 1 < n and t[i + 1] == "e" and ch in "aou":
            if ch == "u" and i > 0 and t[i - 1] == "q":
                out.append("ue")
            else:
                out.append(ch)
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def german_light_stem(term: str) -> str:
    """GermanLightStemmer (Savoy 2006): two suffix passes on the
    NORMALIZED term."""
    s = term
    n = len(s)
    # step 1
    if n > 5 and s.endswith("ern"):
        s, n = s[:-3], n - 3
    elif n > 4 and n >= 2 and s[-2] == "e" and s[-1] in "mnrs":
        s, n = s[:-2], n - 2
    elif n > 3 and s[-1] == "e":
        s, n = s[:-1], n - 1
    elif n > 3 and s[-1] == "s" and s[-2] in _ST_ENDING:
        s, n = s[:-1], n - 1
    # step 2
    if n > 5 and s.endswith("est"):
        s = s[:-3]
    elif n > 4 and s[-2] == "e" and s[-1] in "nr":
        s = s[:-2]
    return s


def german_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    """Chain for one lowercased term: stop (on the SURFACE form, as the
    StopFilter precedes normalization in GermanAnalyzer), normalize,
    light-stem."""
    if stopwords and term in stopwords:
        return None
    return german_light_stem(german_normalize(term))


def german_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = german_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def german_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = german_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
