"""Catalan analysis chain: StandardTokenizer → elision → lowercase → stop →
snowball Catalan stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
ca/CatalanAnalyzer.java (createComponents: StandardTokenizer, ElisionFilter
with DEFAULT_ARTICLES {d,l,m,n,s,t}, LowerCase, Stop, SetKeywordMarker,
SnowballFilter(CatalanStemmer)) and the published snowball Catalan stemmer
(https://snowballstem.org/algorithms/catalan/stemmer.html; generated form
org/tartarus/snowball/ext/CatalanStemmer.java — suffix tables extracted
with tools/extract_among.py). Vectors replayed from TestCatalanAnalyzer.java.
Reimplemented from the published algorithm:

- vowels = a e i o u à á è é í ï ò ó ú ü; R1/R2 standard construction;
- attached pronoun (a_1): longest suffix deletes when it starts in R1;
- standard suffix (a_2): delete in R1/R2, -lógica→log, -ica→ic,
  -quíssima→c per case; if no standard suffix fired, verb suffix (a_3):
  delete in R1/R2 per case; then residual (a_4): -os/-a/-o... delete in
  R1, -iqu→ic;
- cleaning pass: accent fold à/á→a è/é→e ì/í/ï→i ò/ó→o ú/ü→u, '·'→'.'.

A failed region check on the LONGEST match ends that rule (snowball
find_among_b semantics — no fallback to a shorter suffix).

Pure per-term transform → the vectorized vocabulary-remap lane applies.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .fr import elide
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "catalan_stem",
    "catalan_term",
    "catalan_analyze",
    "catalan_terms_positions",
    "CATALAN_STOP_WORDS",
    "CATALAN_ARTICLES",
]

# CatalanAnalyzer.DEFAULT_ARTICLES (public constant list)
CATALAN_ARTICLES = frozenset("d l m n s t".split())

# Lucene ca/stopwords.txt (public list, cue.language)
CATALAN_STOP_WORDS = frozenset(
    """a abans ací ah així això al als aleshores algun alguna algunes alguns alhora allà allí allò altra altre altres amb ambdós ambdues apa aquell aquella aquelles aquells aquest aquesta aquestes aquests aquí baix cada cadascú cadascuna cadascunes cadascuns com contra d'un d'una d'unes d'uns dalt de del dels des després dins dintre donat doncs durant e eh el els em en encara ens entre érem eren éreu es és esta està estàvem estaven estàveu esteu et etc ets fins fora gairebé ha han has havia he hem heu hi ho i igual iguals ja l'hi la les li li'n llavors m'he ma mal malgrat mateix mateixa mateixes mateixos me mentre més meu meus meva meves molt molta moltes molts mon mons n'he n'hi ne ni no nogensmenys només nosaltres nostra nostre nostres o oh oi on pas pel pels per però perquè poc poca pocs poques potser propi qual quals quan quant que què quelcom qui quin quina quines quins s'ha s'han sa semblant semblants ses seu seus seva seva seves si sobre sobretot sóc solament sols son són sons sota sou t'ha t'han t'he ta tal també tampoc tan tant tanta tantes teu teus teva teves ton tons tot tota totes tots un una unes uns us va vaig vam van vas veu vosaltres vostra vostre vostres""".split()
)

_V = frozenset("aeiouàáèéíïòóúü")


# snowball CatalanStemmer.java among tables (data only; longest-first)
_PRONOUN = (
    ('selas', 1), ('selos', 1), ('sela', 1), ('selo', 1), ('-les', 1),
    ('-nos', 1), ('-la', 1), ('-me', 1), ('-te', 1), ("'hi", 1), ('-li', 1),
    ("'ho", 1), ('las', 1), ('les', 1), ("'ls", 1), ('-ls', 1), ("'ns", 1),
    ('-ns', 1), ('ens', 1), ('los', 1), ('nos', 1), ('vos', 1), ('-us', 1),
    ('la', 1), ('le', 1), ('me', 1), ('se', 1), ('hi', 1), ('li', 1),
    ("'l", 1), ("'m", 1), ('-m', 1), ("'n", 1), ('-n', 1), ('ho', 1),
    ('lo', 1), ("'s", 1), ('us', 1), ("'t", 1),
)

_STANDARD = (
    ('quíssimes', 5), ('allengües', 1), ('ativitats', 1), ('quíssima', 5),
    ('ialismes', 1), ('ialistes', 1), ('ionistes', 1), ('lógiques', 3),
    ('quíssims', 5), ('bilitats', 1), ('ativitat', 1), ('ialista', 1),
    ('ionista', 1), ('ialisme', 1), ('ionisme', 1), ('quíssim', 5),
    ('atòries', 1), ('íssimes', 1), ('ivitats', 1), ('bilitat', 1),
    ('isament', 1), ('lógica', 3), ('atòria', 1), ('íssima', 1),
    ('ivisme', 1), ('ificar', 1), ('lógics', 3), ('ancies', 1), ('encies', 1),
    ('ències', 1), ('logies', 3), ('formes', 1), ('idores', 1), ('atives', 1),
    ('logíes', 3), ('íssims', 1), ('acions', 2), ('aments', 1), ('ivitat', 1),
    ('ancia', 1), ('encia', 1), ('ència', 1), ('logia', 3), ('íinia', 1),
    ('ívola', 1), ('sfera', 1), ('adora', 1), ('adura', 1), ('ativa', 1),
    ('logía', 3), ('ístic', 1), ('issem', 1), ('ìssem', 1), ('íssem', 1),
    ('íssim', 1), ('ìssin', 1), ('itzar', 1), ('doras', 1), ('ícies', 1),
    ('inies', 1), ('ínies', 1), ('eries', 1), ('àries', 1), ('ables', 1),
    ('ibles', 1), ('ismes', 1), ('dores', 1), ('dures', 1), ('asses', 1),
    ('ictes', 1), ('istes', 1), ('iques', 4), ('logis', 3), ('toris', 1),
    ('cions', 1), ('assos', 1), ('issos', 1), ('adors', 1), ('idors', 1),
    ('itats', 1), ('ïtats', 1), ('ments', 1), ('trius', 1), ('atius', 1),
    ('ament', 1), ('isseu', 1), ('ìsseu', 1), ('ísseu', 1), ('íssiu', 1),
    ('enca', 1), ('ícia', 1), ('inia', 1), ('eria', 1), ('ària', 1),
    ('alla', 1), ('ella', 1), ('dora', 1), ('assa', 1), ('essa', 1),
    ('issa', 1), ('ista', 1), ('atge', 1), ('able', 1), ('ible', 1),
    ('isme', 1), ('aire', 1), ('icte', 1), ('iste', 1), ('logi', 3),
    ('tori', 1), ('ívol', 1), ('isam', 1), ('amen', 1), ('egar', 1),
    ('ejar', 1), ('itar', 1), ('nces', 1), ('ades', 2), ('bles', 1),
    ('imes', 1), ('ines', 1), ('eres', 1), ('ores', 1), ('eses', 1),
    ('oses', 1), ('ites', 1), ('otes', 1), ('ives', 1), ('icis', 1),
    ('ícis', 1), ('aris', 1), ('ells', 1), ('ions', 1), ('esos', 1),
    ('osos', 1), ('dors', 1), ('ants', 1), ('ents', 1), ('itat', 1),
    ('ïtat', 1), ('ient', 1), ('ment', 1), ('triu', 1), ('atiu', 1),
    ('ació', 1), ('ica', 4), ('ada', 2), ('ima', 1), ('ana', 1), ('ina', 1),
    ('era', 1), ('ora', 1), ('esa', 1), ('osa', 1), ('eta', 1), ('ita', 1),
    ('ota', 1), ('iva', 1), ('nça', 1), ('enc', 1), ('esc', 1), ('ble', 1),
    ('ici', 1), ('íci', 1), ('ari', 1), ('all', 1), ('ell', 1), ('fer', 1),
    ('dor', 1), ('dur', 1), ('ics', 4), ('uds', 1), ('als', 1), ('ims', 1),
    ('ers', 1), ('ors', 1), ('ats', 1), ('ets', 1), ('ots', 1), ('uts', 1),
    ('ius', 1), ('dís', 1), ('ant', 1), ('ent', 1), ('ció', 1), ('ic', 4),
    ('ud', 1), ('al', 1), ('il', 1), ('ar', 1), ('or', 1), ('ls', 1),
    ('ès', 1), ('és', 1), ('ís', 1), ('ós', 1), ('et', 1), ('ot', 1),
    ('ió', 1), ('ó', 1),
)

_VERB = (
    ('iéramos', 1), ('aríamos', 1), ('eríamos', 1), ('iríamos', 1),
    ('iésemos', 1), ('eresseu', 1), ('esquen', 1), ('isquen', 1),
    ('ïsquen', 1), ('esquin', 1), ('adores', 1), ('esques', 1), ('ïsques', 1),
    ('ierais', 1), ('aríais', 1), ('eríais', 1), ('iríais', 1), ('ieseis', 1),
    ('asteis', 1), ('isteis', 1), ('esquis', 1), ('ábamos', 1), ('áramos', 1),
    ('aremos', 1), ('eremos', 1), ('iremos', 1), ('ásemos', 1), ('adora', 1),
    ('esqui', 1), ('àssem', 1), ('éssem', 1), ('iguem', 1), ('ïguem', 1),
    ('irìem', 1), ('aríem', 1), ('iríem', 1), ('assim', 1), ('essim', 1),
    ('issim', 1), ('àssim', 1), ('èssim', 1), ('éssim', 1), ('íssim', 1),
    ('arian', 1), ('ieran', 1), ('arían', 1), ('erían', 1), ('irían', 1),
    ('arien', 1), ('irien', 1), ('iesen', 1), ('assen', 1), ('essen', 1),
    ('issen', 1), ('éssen', 1), ('ïssen', 1), ('eixen', 1), ('assin', 1),
    ('essin', 1), ('issin', 1), ('ïssin', 1), ('eixin', 1), ('ieron', 1),
    ('iendo', 1), ('eixer', 1), ('ieras', 1), ('arías', 1), ('erías', 1),
    ('irías', 1), ('atges', 1), ('aries', 1), ('iries', 1), ('ieses', 1),
    ('asses', 1), ('esses', 1), ('isses', 1), ('ïsses', 1), ('eixes', 1),
    ('abais', 1), ('arais', 1), ('aseis', 1), ('assis', 1), ('essis', 1),
    ('issis', 1), ('ïssis', 1), ('eixis', 1), ('itzis', 1), ('aréis', 1),
    ('eréis', 1), ('iréis', 1), ('íamos', 1), ('adors', 1), ('erass', 1),
    ('asseu', 1), ('esseu', 1), ('àsseu', 1), ('ésseu', 1), ('igueu', 1),
    ('ïgueu', 1), ('itzeu', 1), ('irìeu', 1), ('aríeu', 1), ('iríeu', 1),
    ('assiu', 1), ('issiu', 1), ('àssiu', 1), ('èssiu', 1), ('éssiu', 1),
    ('íssiu', 1), ('esca', 1), ('isca', 1), ('ïsca', 1), ('aria', 1),
    ('iria', 1), ('iera', 1), ('itza', 1), ('aría', 1), ('ería', 1),
    ('iría', 1), ('iese', 1), ('aste', 1), ('iste', 1), ('eixi', 1),
    ('itzi', 1), ('arem', 1), ('irem', 1), ('àrem', 1), ('írem', 1),
    ('avem', 1), ('àvem', 1), ('ávem', 1), ('aban', 1), ('aran', 1),
    ('iran', 1), ('aren', 1), ('eren', 1), ('iren', 1), ('àren', 1),
    ('ïren', 1), ('asen', 1), ('aven', 1), ('ixen', 1), ('ïxen', 1),
    ('inin', 1), ('isin', 1), ('aron', 1), ('arán', 1), ('erán', 1),
    ('irán', 1), ('ando', 2), ('eixo', 1), ('itzo', 1), ('tzar', 1),
    ('ador', 1), ('abas', 1), ('adas', 1), ('idas', 1), ('aras', 1),
    ('ades', 1), ('ides', 1), ('udes', 1), ('ïdes', 1), ('ares', 1),
    ('ires', 1), ('ïres', 1), ('ases', 1), ('ques', 1), ('aves', 1),
    ('ixes', 1), ('ïxes', 1), ('íais', 1), ('inis', 1), ('isis', 1),
    ('ados', 1), ('idos', 1), ('amos', 1), ('imos', 1), ('ents', 1),
    ('aràs', 1), ('iràs', 1), ('arás', 1), ('erás', 1), ('irás', 1),
    ('arés', 1), ('erau', 1), ('ineu', 1), ('areu', 1), ('ireu', 1),
    ('àreu', 1), ('íreu', 1), ('àveu', 1), ('áveu', 1), ('itzà', 1),
    ('aba', 1), ('ada', 1), ('ida', 1), ('uda', 1), ('ïda', 1), ('ara', 1),
    ('ira', 1), ('ïra', 1), ('ava', 1), ('ixa', 1), ('isc', 1), ('ïsc', 1),
    ('dre', 1), ('ase', 1), ('ini', 1), ('íem', 1), ('ían', 1), ('ien', 1),
    ('ïen', 1), ('sin', 1), ('iïn', 1), ('ado', 1), ('ido', 1), ('ixo', 1),
    ('ïxo', 1), ('ías', 1), ('ids', 1), ('ies', 1), ('ïes', 1), ('sis', 1),
    ('áis', 1), ('ams', 1), ('ass', 1), ('ess', 1), ('ats', 1), ('its', 1),
    ('iïs', 1), ('ant', 1), ('ent', 1), ('int', 1), ('ieu', 1), ('ìeu', 1),
    ('íeu', 1), ('eix', 1), ('itz', 1), ('arà', 1), ('irà', 1), ('ará', 1),
    ('erá', 1), ('irá', 1), ('irè', 1), ('aré', 1), ('eré', 1), ('iré', 1),
    ('ia', 1), ('ía', 1), ('ïa', 1), ('ad', 1), ('ed', 1), ('id', 1),
    ('ie', 1), ('re', 1), ('ii', 1), ('am', 1), ('em', 1), ('ïm', 1),
    ('an', 1), ('en', 1), ('in', 1), ('io', 1), ('ar', 1), ('er', 1),
    ('ir', 1), ('as', 1), ('es', 1), ('às', 1), ('és', 1), ('ís', 1),
    ('at', 1), ('it', 1), ('ut', 1), ('ït', 1), ('au', 1), ('ïu', 1),
    ('ix', 1), ('ïx', 1), ('ià', 1), ('iï', 1), ('ió', 1), ('í', 1),
)

_RESIDUAL = (
    ('iqu', 2), ('itz', 1), ('ïn', 1), ('ir', 1), ('is', 1), ('os', 1),
    ('ïs', 1), ('it', 1), ('eu', 1), ('iu', 1), ('a', 1), ('e', 1), ('i', 1),
    ('o', 1), ('s', 1), ('à', 1), ('á', 1), ('é', 1), ('ì', 1), ('í', 1),
    ('ï', 1), ('ó', 1),
)


_CLEAN = str.maketrans({
    "à": "a", "á": "a", "è": "e", "é": "e", "ì": "i", "í": "i", "ï": "i",
    "ò": "o", "ó": "o", "ú": "u", "ü": "u", "·": ".",
})


def _regions(w: str) -> tuple[int, int]:
    """Standard snowball R1/R2 over the Catalan vowel group."""
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    while i < n and w[i] in _V:
        i += 1
    if i < n:
        p1 = i + 1
    i = p1
    while i < n and w[i] not in _V:
        i += 1
    while i < n and w[i] in _V:
        i += 1
    if i < n:
        p2 = i + 1
    return p1, p2


def _longest(w: str, table: tuple):
    for sfx, case in table:
        if w.endswith(sfx):
            return sfx, case
    return None, 0


def catalan_stem(term: str) -> str:
    """Snowball Catalan stemmer on a lowercased, elision-stripped token."""
    w = term
    p1, p2 = _regions(w)

    # attached pronoun: delete when the suffix starts in R1
    sfx, case = _longest(w, _PRONOUN)
    if sfx is not None and len(w) - len(sfx) >= p1:
        w = w[: len(w) - len(sfx)]

    # standard suffix, else verb suffix
    fired = False
    sfx, case = _longest(w, _STANDARD)
    if sfx is not None:
        start = len(w) - len(sfx)
        if case == 1 and start >= p1:
            w, fired = w[:start], True
        elif case == 2 and start >= p2:
            w, fired = w[:start], True
        elif case == 3 and start >= p2:
            w, fired = w[:start] + "log", True
        elif case == 4 and start >= p2:
            w, fired = w[:start] + "ic", True
        elif case == 5 and start >= p1:
            w, fired = w[:start] + "c", True
    if not fired:
        sfx, case = _longest(w, _VERB)
        if sfx is not None:
            start = len(w) - len(sfx)
            if case == 1 and start >= p1:
                w = w[:start]
            elif case == 2 and start >= p2:
                w = w[:start]

    # residual suffix
    sfx, case = _longest(w, _RESIDUAL)
    if sfx is not None:
        start = len(w) - len(sfx)
        if case == 1 and start >= p1:
            w = w[:start]
        elif case == 2 and start >= p1:
            w = w[:start] + "ic"

    return w.translate(_CLEAN)


def catalan_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    t = elide(term, CATALAN_ARTICLES)
    if stopwords and t in stopwords:
        return None
    return catalan_stem(t)


def catalan_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = catalan_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def catalan_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = catalan_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
