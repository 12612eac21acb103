"""Romanian analysis chain: StandardTokenizer → lowercase → stop →
cedilla→comma normalization → snowball Romanian stem.

Behavioral reference: analysis/common/src/java/org/apache/lucene/analysis/
ro/RomanianAnalyzer.java:118-126 (createComponents order — note the stop
filter runs BEFORE normalization, so the stopword list carries both
cedilla and comma-below spellings), ro/RomanianNormalizer.java (ş→ș, ţ→ț
in both cases) and the published snowball Romanian stemmer
(https://snowballstem.org/algorithms/romanian/stemmer.html; generated form
org/tartarus/snowball/ext/RomanianStemmer.java). Reimplemented from the
published algorithm:

- norm: cedilla forms fold to comma-below forms (the stemmer itself also
  folds, so pre-normalized and raw inputs stem identically);
- prelude: u/i between vowels mark as consonantal U/I (postlude folds
  back); vowels = a e i o u â î ă;
- RV/R1/R2 per the standard Spanish-style construction;
- step_0 (R1): article/plural endings — ul/ului delete; aua→a;
  ea/ele/elor→e; ii/iua/iei/iile/ilor/iilor→i; ile→i unless after ab;
  atei→at; ația/ație→ați;
- combo_suffix (R1, repeated): -abilitate*→abil, -ibilitate→ibil,
  -ivitate*→iv, ical/iciv/icit*→ic, ativ/ațiune/ătoare/ator-family→at,
  itiv/ițiune/itoare/itor-family→it;
- standard_suffix (R2): the -ic/-abil/-oas/-at/-ist... family deletes;
  țiune/țiuni→t; ism/ist forms→ist;
- verb_suffix (RV; only when no standard suffix fired): past/imperfect/
  conditional endings delete — the -are/-ea/-ez... group only after a
  non-vowel or u (both inside RV), the -se/-ați/-em... group always;
- vowel_suffix: final a/e/ie/i/ă in RV deletes.

Pure per-term transform → the vectorized vocabulary-remap lane applies.
"""

from __future__ import annotations

from ..constants import MAX_TOKEN_LENGTH
from .tokenizer import Token, analyze as _standard_analyze

__all__ = [
    "romanian_normalize",
    "romanian_stem",
    "romanian_term",
    "romanian_analyze",
    "romanian_terms_positions",
    "ROMANIAN_STOP_WORDS",
]

# Lucene ro/stopwords.txt (public list; cedilla AND comma-below spellings,
# because stop runs before normalization)
ROMANIAN_STOP_WORDS = frozenset(
    """acea aceasta această aceea acei aceia acel acela acele acelea acest
    acesta aceste acestea acești aceşti aceștia aceştia acolo acum ai aia
    aibă aici al ăla ale alea ălea altceva altcineva am ar are aș aş așadar
    aşadar asemenea asta ăsta astăzi astea ăstea ăștia ăştia asupra ați aţi
    au avea avem aveți aveţi azi bine bucur bună ca că căci când care cărei
    căror cărui cât câte câți câţi către câtva ce cel ceva chiar cînd cine
    cineva cît cîte cîți cîţi cîtva contra cu cum cumva curând curînd da dă
    dacă dar datorită de deci deja deoarece departe deși deşi din dinaintea
    dintr dintre drept după ea ei el ele eram este ești eşti eu face fără
    fi fie fiecare fii fim fiți fiţi iar ieri îi îl îmi împotriva în
    înainte înaintea încât încît încotro între întrucât întrucît îți îţi la
    lângă le li lîngă lor lui mă mâine mea mei mele mereu meu mi mine mult
    multă mulți mulţi ne nicăieri nici nimeni niște nişte noastră noastre
    noi noștri noştri nostru nu ori oricând oricare oricât orice oricînd
    oricine oricît oricum oriunde până pe pentru peste pînă poate pot prea
    prima primul prin printr sa să săi sale sau său se și şi sînt sîntem
    sînteți sînteţi spre sub sunt suntem sunteți sunteţi ta tăi tale tău te
    ți ţi ție ţie tine toată toate tot toți toţi totuși totuşi tu un una
    unde undeva unei unele uneori unor vă vi voastră voastre voi voștri
    voştri vostru vouă vreo vreun""".split()
)

_V = frozenset("aeiouâîă")

_NORM = str.maketrans({"ş": "ș", "ţ": "ț", "Ş": "Ș", "Ţ": "Ț"})

# step_0 (R1): suffix → replacement ("" = delete; None = special ile rule)
_STEP0 = tuple(sorted((
    ("ul", ""), ("ului", ""), ("aua", "a"), ("ea", "e"), ("ele", "e"),
    ("elor", "e"), ("ii", "i"), ("iua", "i"), ("iei", "i"), ("iile", "i"),
    ("ilor", "i"), ("iilor", "i"), ("ile", None), ("atei", "at"),
    ("ația", "ați"), ("ație", "ați"),
), key=lambda p: len(p[0]), reverse=True))

# combo suffixes (R1, repeated): suffix → replacement
_COMBO = tuple(sorted((
    ("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
    ("abilități", "abil"), ("ibilitate", "ibil"),
    ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
    ("ivități", "iv"),
    ("icala", "ic"), ("iciva", "ic"), ("icale", "ic"), ("icive", "ic"),
    ("icali", "ic"), ("icatori", "ic"), ("icitati", "ic"), ("icivi", "ic"),
    ("icităi", "ic"), ("icități", "ic"), ("ical", "ic"), ("icator", "ic"),
    ("iciv", "ic"), ("icală", "ic"), ("icivă", "ic"), ("icitate", "ic"),
    ("ativa", "at"), ("ațiune", "at"), ("atoare", "at"), ("ătoare", "at"),
    ("ative", "at"), ("atori", "at"), ("ători", "at"), ("ativi", "at"),
    ("ator", "at"), ("ător", "at"), ("ativ", "at"), ("ativă", "at"),
    ("itiva", "it"), ("ițiune", "it"), ("itoare", "it"), ("itive", "it"),
    ("itori", "it"), ("itivi", "it"), ("itor", "it"), ("itiv", "it"),
    ("itivă", "it"),
), key=lambda p: len(p[0]), reverse=True))

# standard suffixes (R2): suffix → action ("del", "t", "ist")
_STD = tuple(sorted((
    ("ica", "del"), ("abila", "del"), ("ibila", "del"), ("oasa", "del"),
    ("ata", "del"), ("ita", "del"), ("anta", "del"), ("ista", "ist"),
    ("uta", "del"), ("iva", "del"), ("ic", "del"), ("ice", "del"),
    ("abile", "del"), ("ibile", "del"), ("isme", "ist"), ("iune", "t"),
    ("oase", "del"), ("ate", "del"), ("itate", "del"), ("ite", "del"),
    ("ante", "del"), ("iste", "ist"), ("ute", "del"), ("ive", "del"),
    ("ici", "del"), ("abili", "del"), ("ibili", "del"), ("iuni", "t"),
    ("atori", "del"), ("osi", "del"), ("ati", "del"), ("itati", "del"),
    ("iti", "del"), ("anti", "del"), ("isti", "ist"), ("uti", "del"),
    ("iști", "ist"), ("ivi", "del"), ("ităi", "del"), ("oși", "del"),
    ("ități", "del"), ("abil", "del"), ("ibil", "del"), ("ism", "ist"),
    ("ator", "del"), ("os", "del"), ("at", "del"), ("it", "del"),
    ("ant", "del"), ("ist", "ist"), ("ut", "del"), ("iv", "del"),
    ("ică", "del"), ("abilă", "del"), ("ibilă", "del"), ("oasă", "del"),
    ("ată", "del"), ("ită", "del"), ("antă", "del"), ("istă", "ist"),
    ("ută", "del"), ("ivă", "del"),
), key=lambda p: len(p[0]), reverse=True))

# verb suffixes (RV): group 1 needs a preceding non-vowel or u (inside RV)
_VERB1 = tuple(sorted((
    "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire", "âre",
    "ase", "ise", "use", "âse", "ește", "ăște", "eze", "ai",
    "eai", "iai", "ești", "ăști", "ui", "ezi", "âi", "ași", "aseși",
    "iseși", "useși", "âseși", "iși", "uși", "âși", "eați", "iați",
    "arăți", "aserăți", "iserăți", "userăți", "âserăți", "irăți",
    "urăți", "ârăți", "am", "eam", "iam", "asem", "isem", "usem", "âsem",
    "arăm", "aserăm", "iserăm", "userăm", "âserăm", "irăm", "urăm",
    "ârăm", "au", "eau", "iau", "indu", "ându", "ez", "ească", "ară",
    "aseră", "iseră", "useră", "âseră", "iră", "ură", "âră", "ează",
), key=len, reverse=True))

_VERB2 = tuple(sorted((
    "se", "sese", "sei", "seși", "seseși", "ați", "eți", "iți", "âți",
    "serăți", "seserăți", "em", "sesem", "im", "âm", "ăm", "serăm",
    "seserăm", "seră", "seseră",
), key=len, reverse=True))

# merged, longest-match-first across both groups (snowball picks the
# longest among a_5 regardless of group)
_VERB = tuple(sorted(
    [(s, 1) for s in _VERB1] + [(s, 2) for s in _VERB2],
    key=lambda p: len(p[0]), reverse=True,
))

_VOWEL_SFX = ("ie", "a", "e", "i", "ă")


def romanian_normalize(term: str) -> str:
    """Cedilla ş/ţ → comma-below ș/ț (both cases)."""
    return term.translate(_NORM)


def _prelude(w: str) -> str:
    s = list(w)
    n = len(s)
    for i in range(1, n - 1):
        if s[i] in ("u", "i") and s[i - 1] in _V and s[i + 1] in _V:
            s[i] = s[i].upper()
    return "".join(s)


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    # RV
    rv = n
    if n >= 2:
        if w[0] in _V:
            if w[1] not in _V:
                i = 2
                while i < n and w[i] not in _V:
                    i += 1
                if i < n:
                    rv = i + 1
            else:
                i = 2
                while i < n and w[i] in _V:
                    i += 1
                if i < n:
                    rv = i + 1
        else:
            if w[1] not in _V:
                i = 2
                while i < n and w[i] not in _V:
                    i += 1
                if i < n:
                    rv = i + 1
            else:
                if n >= 3:
                    rv = 3
    # standard R1: after first non-vowel following a vowel
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    while i < n and w[i] in _V:
        i += 1
    r1 = i + 1 if i < n else n
    i = r1
    while i < n and w[i] not in _V:
        i += 1
    while i < n and w[i] in _V:
        i += 1
    r2 = i + 1 if i < n else n
    return rv, r1, r2


def romanian_stem(term: str) -> str:
    """Snowball Romanian stemmer on a lowercased token."""
    w = romanian_normalize(term)
    w = _prelude(w)
    # regions computed on the marked word, with U/I as non-vowels
    rv, r1, r2 = _regions(w)

    # step 0: articles / plural endings in R1
    for sfx, rep in _STEP0:
        if w.endswith(sfx) and len(w) - len(sfx) >= r1:
            if rep is None:  # ile → i, unless preceded by ab
                if w.endswith("abile"):
                    break
                w = w[: len(w) - 3] + "i"
            else:
                w = w[: len(w) - len(sfx)] + rep
            break

    # standard suffix: combo loop then R2 family
    std_removed = False
    changed = True
    while changed:
        changed = False
        for sfx, rep in _COMBO:
            if w.endswith(sfx) and len(w) - len(sfx) >= r1:
                w = w[: len(w) - len(sfx)] + rep
                std_removed = True
                changed = True
                break
    for sfx, act in _STD:
        if w.endswith(sfx):
            if len(w) - len(sfx) < r2:
                break  # longest match found but outside R2: no fallback
            if act == "del":
                w = w[: len(w) - len(sfx)]
            elif act == "t":  # (ț)iune/(ț)iuni → t
                if not w[: len(w) - len(sfx)].endswith("ț"):
                    break
                w = w[: len(w) - len(sfx) - 1] + "t"
            else:
                w = w[: len(w) - len(sfx)] + "ist"
            std_removed = True
            break

    # verb suffix in RV, only when nothing standard fired
    if not std_removed:
        for sfx, grp in _VERB:
            start = len(w) - len(sfx)
            if w.endswith(sfx) and start >= rv:
                if grp == 1:
                    # preceded (inside RV) by a non-vowel or by u
                    if start - 1 < rv:
                        break
                    prev = w[start - 1]
                    if prev in _V and prev != "u":
                        break
                    w = w[:start]
                else:
                    w = w[:start]
                break

    # final vowel in RV
    for sfx in _VOWEL_SFX:
        if w.endswith(sfx) and len(w) - len(sfx) >= rv:
            w = w[: len(w) - len(sfx)]
            break

    return w.translate({ord("U"): "u", ord("I"): "i"})


def romanian_term(term: str, stopwords: frozenset[str] | None) -> str | None:
    if stopwords and term in stopwords:
        return None
    return romanian_stem(term)


def romanian_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[Token]:
    out: list[Token] = []
    for tok in _standard_analyze(
        text, stopwords=None, max_token_length=max_token_length
    ):
        t = romanian_term(tok.term, stopwords)
        if t is None:
            continue
        out.append(Token(t, tok.position, tok.start, tok.end, tok.type))
    return out


def romanian_terms_positions(
    text: str, stopwords: frozenset[str] | None = None
):
    toks = romanian_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
