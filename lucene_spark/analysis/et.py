"""Estonian analysis chain: StandardTokenizer → lowercase → stop →
snowball Estonian stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
et/EstonianAnalyzer.java (createComponents: StandardTokenizer, LowerCase,
Stop, SetKeywordMarker, SnowballFilter(EstonianStemmer)) and the published
snowball Estonian stemmer (https://snowballstem.org/algorithms/estonian/
stemmer.html; generated form org/tartarus/snowball/ext/
EstonianStemmer.java — tables extracted with tools/extract_among.py).
Vectors replayed from TestEstonianAnalyzer.java (the full teadaoleva*
paradigm). Reimplemented from the published algorithm:

- V1 vowels = a e i o u ä õ ö ü; RV vowels = a e i o u; p1 = after the
  first non-vowel following the first vowel;
- verb exceptions: ~280 whole-word irregular verb forms map straight to
  their stem (jääb→jääma, sõi→söö, …) and bypass everything else;
- emphasis: -gi after a GI letter (not after a long vowel), -ki after a
  KI consonant, both only with ≥4 chars before the suffix;
- verb endings in p1 (-mata/-takse/… delete, -akse→a, -b/-da/-me/-n
  delete only after a V1 vowel); when a verb ending fires the
  substantive block is skipped;
- substantive block (each sub-rule once, on the evolving word):
  special noun endings (laste→lase …), case endings (-ga/-ta/-le/-sse/
  -l/-s/-ks/-lt/-st after a vowel or long vowel; -t with ≥4 before),
  plural/first-three-cases (-ikkude→iku, -sid not after long vowel,
  -te→(e|del|t) by left context, -d/-de after vowel or long vowel),
  degrees (-m/-mai after RV vowel, -ma), i-plural (-i after RV vowel),
  nu-participles (-nu/-tu/-va/-du);
- undouble: kk/pp/tt before a final V1 vowel lose a letter.

Pure per-term transform → the vectorized vocabulary-remap lane applies.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "estonian_stem",
    "estonian_term",
    "estonian_analyze",
    "estonian_terms_positions",
    "ESTONIAN_STOP_WORDS",
]

# function-word core of Lucene et/stopwords.txt (public list)
ESTONIAN_STOP_WORDS = frozenset(
    """all alla allapoole allpool alt altpoolt eel eespool enne hoolimata
    ilma kaudu keset kesk kohe koos kuni kõige ligi läbi mööda paitsi
    peale pealt piki pärast risti taga taha tänu vastu õhtupoole ühes üle
    ümber ümbert ees eest ette heaks hulgas hulgast hulka jaoks jooksul
    juurde juures juurest järel järele järelt järgi kaasas kallal kallale
    kallalt kaupa keskel keskele keskelt kestel kohal kohale kohalt
    kohaselt kohta korral kõrval kõrvale kõrvalt käes käest kätte külge
    küljes küljest olen oled on oleme olete olid oli olin olime olite ma
    sa ta me te nad mind sind teda meid teid neid minu sinu tema meie
    teie nende ja ning ega ehk või aga kuid vaid ka ei mitte juba veel
    siis kui et see selle seda need nende siin seal nii oma""".split()
)

_V1 = frozenset("aeiouäõöü")
_RV = frozenset("aeiou")
_KI = frozenset("bdfghkpstzšž")
_GI = frozenset("aceijlmnoqruvwxäõöü")
_LONGV = ("aa", "ee", "ii", "oo", "uu", "ää", "õõ", "öö", "üü")

# whole-word irregular verb forms → stem (snowball a_11)
_EXC_STEMS = {
    1: "joo", 2: "saa", 3: "viima", 4: "keesi", 5: "löö", 6: "lõi",
    7: "loo", 8: "käisi", 9: "söö", 10: "too", 11: "võisi", 12: "jääma",
    13: "müüsi", 14: "luge", 15: "põde", 16: "ladu", 17: "tegi",
    18: "nägi",
}
_EXC_FORMS = {
    1: """joob jood joodakse jooma joomata joome joon joote joovad juua
       juuakse jõi jõid jõime jõin jõite""",
    2: """saab saad saada saadakse saadi saaks saaksid saaksime saaksin
       saaksite saama saamata saame saan saate saavad sai said saime
       sain saite""",
    3: """viia viiakse viib viid viidi viiks viiksid viiksime viiksin
       viiksite viima viimata viime viin viisime viisin viisite viite
       viivad""",
    4: """keeb keed keedakse keeks keeksid keeksime keeksin keeksite
       keema keemata keeme keen kees keeta keete keevad""",
    5: """lööb lööd löödakse löödi lööks lööksid lööksime lööksin
       lööksite lööma löömata lööme löön lööte löövad lüüa lüüakse""",
    6: "lõi lõid lõime lõin lõite",
    7: """loob lood loodi looks looksid looksime looksin looksite looma
       loomata loome loon loote loovad luua luuakse""",
    8: """käia käiakse käib käid käidi käiks käiksid käiksime käiksin
       käiksite käima käimata käime käin käis käite käivad""",
    9: """sõi sõid sõime sõin sõite sööb sööd söödakse söödi sööks
       sööksid sööksime sööksin sööksite sööma söömata sööme söön sööte
       söövad süüa süüakse""",
    10: """toob tood toodi tooks tooksid tooksime tooksin tooksite tooma
        toomata toome toon toote toovad tuua tuuakse tõi tõid tõime tõin
        tõite""",
    11: """võib võid võida võidakse võidi võiks võiksid võiksime võiksin
        võiksite võima võimata võime võin võis võite võivad""",
    12: """jäi jäid jäime jäin jäite jääb jääd jääda jäädakse jäädi jääks
        jääksid jääksime jääksin jääksite jääma jäämata jääme jään jääte
        jäävad""",
    13: """müüa müüakse müüb müüd müüdi müüks müüksid müüksime müüksin
        müüksite müüma müümata müüme müün müüs müüte müüvad""",
    14: """loeb loed loeks loeksid loeksime loeksin loeksite loeme loen
        loete loevad""",
    15: """põeb põed põeks põeksid põeksime põeksin põeksite põeme põen
        põete põevad""",
    16: """laob laod laoks laoksid laoksime laoksin laoksite laome laon
        laote laovad""",
    17: """teeb teed teeks teeksid teeksime teeksin teeksite teeme teen
        teete teevad tegema tegemata teha tehakse tehti""",
    18: """näeb näed näeks näeksid näeksime näeksin näeksite näeme näen
        näete näevad nägema nägemata näha nähakse nähti""",
}
_VERB_EXCEPTIONS = {
    form: _EXC_STEMS[case]
    for case, forms in _EXC_FORMS.items()
    for form in forms.split()
}

# verb endings (p1): case 1 delete, 2 → "a", 3 delete after V1 vowel
_VERB = tuple(sorted((
    ("da", 3), ("mata", 1), ("b", 3), ("ksid", 1), ("nuksid", 1),
    ("me", 3), ("sime", 1), ("ksime", 1), ("nuksime", 1), ("akse", 2),
    ("dakse", 1), ("takse", 1), ("site", 1), ("ksite", 1),
    ("nuksite", 1), ("n", 3), ("sin", 1), ("ksin", 1), ("nuksin", 1),
    ("daks", 1), ("taks", 1),
), key=lambda p: len(p[0]), reverse=True))

_SPECIAL_NOUN = tuple(sorted((
    ("lane", "lase"), ("line", "lise"), ("mine", "mise"),
    ("lasse", "lase"), ("lisse", "lise"), ("misse", "mise"),
    ("lasi", "lase"), ("lisi", "lise"), ("misi", "mise"),
    ("last", "lase"), ("list", "lise"), ("mist", "mise"),
), key=lambda p: len(p[0]), reverse=True))

# case endings (p1): case 1 = after RV vowel or long vowel, 2 = ≥4 before
_CASE = tuple(sorted((
    ("ga", 1), ("ta", 1), ("le", 1), ("sse", 1), ("l", 1), ("s", 1),
    ("ks", 1), ("t", 2), ("lt", 1), ("st", 1),
), key=lambda p: len(p[0]), reverse=True))

# plural / three first cases (p1)
_PLURAL = tuple(sorted((
    ("d", 4), ("sid", 2), ("de", 4), ("ikkude", 1), ("ike", 1),
    ("ikke", 1), ("te", 3),
), key=lambda p: len(p[0]), reverse=True))

_DEGREES = tuple(sorted((
    ("ma", 2), ("mai", 1), ("m", 1),
), key=lambda p: len(p[0]), reverse=True))

_NU = ("va", "du", "nu", "tu")


def _p1(w: str) -> int:
    n = len(w)
    i = 0
    while i < n and w[i] not in _V1:
        i += 1
    if i >= n:
        return n
    while i < n and w[i] in _V1:
        i += 1
    if i >= n:
        return n
    return i + 1


def _long_v(w: str, end: int) -> bool:
    return end >= 2 and w[end - 2:end] in _LONGV


def estonian_stem(term: str) -> str:
    """Snowball Estonian stemmer on a lowercased token."""
    w = _VERB_EXCEPTIONS.get(term)
    if w is not None:
        return w
    w = term
    p1 = _p1(w)

    # emphasis: -gi / -ki with ≥4 chars before the suffix
    n = len(w)
    if n - 2 >= p1 and n - 2 >= 4:
        if w.endswith("gi"):
            if w[n - 3] in _GI and not _long_v(w, n - 2):
                w = w[:-2]
        elif w.endswith("ki"):
            if w[n - 3] in _KI:
                w = w[:-2]

    # verb endings, else the substantive cascade
    verb_fired = False
    for sfx, case in _VERB:
        start = len(w) - len(sfx)
        if start >= p1 and w.endswith(sfx):
            if case == 1:
                w = w[:start]
            elif case == 2:
                w = w[:start] + "a"
            else:
                if start < 1 or w[start - 1] not in _V1:
                    break  # longest match fails its condition: no fallback
                w = w[:start]
            verb_fired = True
            break

    if not verb_fired:
        # special noun endings
        for sfx, rep in _SPECIAL_NOUN:
            start = len(w) - len(sfx)
            if start >= p1 and w.endswith(sfx):
                w = w[:start] + rep
                break
        # case endings
        for sfx, case in _CASE:
            start = len(w) - len(sfx)
            if start >= p1 and w.endswith(sfx):
                if case == 1:
                    if start >= 1 and (
                        w[start - 1] in _RV or _long_v(w, start)
                    ):
                        w = w[:start]
                elif start >= 4:
                    w = w[:start]
                break
        # plural and three first cases
        for sfx, case in _PLURAL:
            start = len(w) - len(sfx)
            if start >= p1 and w.endswith(sfx):
                if case == 1:
                    w = w[:start] + "iku"
                elif case == 2:
                    if not _long_v(w, start):
                        w = w[:start]
                elif case == 3:
                    if start >= 4:
                        left = w[:start]
                        if left.endswith(("las", "lis", "mis")):
                            w = left + "e"
                        elif not left.endswith("t"):
                            w = left
                    else:
                        w = w[:start] + "t"
                else:
                    if start >= 1 and (
                        w[start - 1] in _RV or _long_v(w, start)
                    ):
                        w = w[:start]
                break
        # degrees
        for sfx, case in _DEGREES:
            start = len(w) - len(sfx)
            if start >= p1 and w.endswith(sfx):
                if case == 1:
                    if start >= 1 and w[start - 1] in _RV:
                        w = w[:start]
                else:
                    w = w[:start]
                break
        # i-plural
        if w.endswith("i") and len(w) - 1 >= p1:
            if len(w) >= 2 and w[-2] in _RV:
                w = w[:-1]
        # nu-participles
        for sfx in _NU:
            if w.endswith(sfx) and len(w) - 2 >= p1:
                w = w[:-2]
                break

    # undouble kk/pp/tt before a final vowel
    if (
        len(w) >= 4
        and w[-1] in _V1
        and len(w) - 1 >= p1
        and w[-3:-1] in ("kk", "pp", "tt")
    ):
        w = w[:-2] + w[-1]
    return w


def estonian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    if stopwords and term in stopwords:
        return None
    return estonian_stem(term)


def estonian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = estonian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def estonian_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = estonian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
