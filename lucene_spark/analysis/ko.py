"""Korean morphological analysis (nori analog).

Behavioral reference: analysis/nori/src/java/org/apache/lucene/analysis/
ko/KoreanAnalyzer.java (createComponents: KoreanTokenizer(decompound
DISCARD) → KoreanPartOfSpeechStopFilter → KoreanReadingFormFilter →
LowerCaseFilter), ko/KoreanTokenizer.java:61-93 (DecompoundMode
NONE/DISCARD/MIXED, DEFAULT_DECOMPOUND = DISCARD — compound dictionary
entries carry a morpheme segmentation; DISCARD emits only the parts,
MIXED additionally emits the compound stacked at the first part's
position), ko/KoreanPartOfSpeechStopFilter.java:36-68 (DEFAULT_STOP_TAGS:
the E*/IC/J*/MAG/MAJ/MM/SP/SS*/SC/SE/XPN/XS*/UNA/NA/VSV tag set),
ko/KoreanReadingFormFilter.java (replace a Hanja surface with its Hangul
reading), ko/POS.java (mecab-ko-dic tagset).

The bundled mecab-ko-dic is DATA, not algorithm — not shipped. A small
built-in demo lexicon (common Korean words, hand-assigned costs) feeds
the shared Viterbi lattice (`lattice.py`); real deployments extend via
``extra_entries`` / ``user_dict`` (same CSV surface as kuromoji's,
``surface,seg1 seg2 ...,reading,pos``).

Documented simplification: conjugated verb forms are whole-form VV
entries (the reference's sub-syllable morpheme split into stem +
EP/EF/EC endings needs the full mecab-ko lexicon); unknown non-grouped
classes emit single-char candidates.
"""

from __future__ import annotations

import unicodedata

from .lattice import (
    CharClass,
    DictEntry,
    MorphDict,
    USER_LEFT_ID,
    USER_RIGHT_ID,
    USER_WORD_COST,
    viterbi_segment,
)
from .tokenizer import Token

__all__ = [
    "korean_analyze",
    "korean_terms_positions",
    "parse_user_dict_ko",
    "DEFAULT_STOP_TAGS",
    "build_ko_dict",
]

# ko/KoreanPartOfSpeechStopFilter.java:36 DEFAULT_STOP_TAGS
DEFAULT_STOP_TAGS = frozenset(
    {
        "EP", "EF", "EC", "ETN", "ETM", "IC",
        "JKS", "JKC", "JKG", "JKO", "JKB", "JKV", "JKQ", "JX", "JC",
        "MAG", "MAJ", "MM", "SP", "SSC", "SSO", "SC", "SE",
        "XPN", "XSA", "XSN", "XSV", "UNA", "NA", "VSV",
    }
)

_ID_BOS = 0
_ID_NOUN = 1
_ID_JOSA = 2
_ID_VERB = 3
_ID_USER = USER_LEFT_ID
_ID_UNK = 8


def _n(surface: str, cost: int = 3000, pos: str = "NNG",
       reading: str | None = None) -> DictEntry:
    attrs = {"pos": pos}
    if reading is not None:
        attrs["reading"] = reading
    return DictEntry(surface, _ID_NOUN, _ID_NOUN, cost, attrs)


def _j(surface: str, pos: str) -> DictEntry:
    return DictEntry(surface, _ID_JOSA, _ID_JOSA, 200, {"pos": pos})


def _v(surface: str, cost: int = 3500) -> DictEntry:
    return DictEntry(surface, _ID_VERB, _ID_VERB, cost, {"pos": "VV"})


def _compound(surface: str, parts: tuple[str, ...], cost: int = 5000) -> DictEntry:
    seg = tuple((p, {"pos": "NNG"}) for p in parts)
    return DictEntry(surface, _ID_NOUN, _ID_NOUN, cost, {"pos": "NNG"}, seg)


_DEMO_ENTRIES: list[DictEntry] = [
    _n("학교"), _n("나라"), _n("사람"), _n("시간"), _n("문제"), _n("경제"),
    _n("신문"), _n("회사"), _n("언어"), _n("검색"), _n("국제"), _n("공항"),
    _n("한국", pos="NNP"), _n("서울", pos="NNP"), _n("컴퓨터"), _n("책"),
    _n("물"), _n("기술"), _n("분석"), _n("세계"),
    _compound("국제공항", ("국제", "공항")),
    _compound("언어분석", ("언어", "분석")),
    # Hanja with Hangul reading (KoreanReadingFormFilter input)
    _n("漢字", reading="한자"), _n("世界", reading="세계"),
    # josa particles
    _j("가", "JKS"), _j("이", "JKS"), _j("를", "JKO"), _j("을", "JKO"),
    _j("은", "JX"), _j("는", "JX"), _j("의", "JKG"), _j("에", "JKB"),
    _j("에서", "JKB"), _j("와", "JC"), _j("과", "JC"), _j("도", "JX"),
    _j("로", "JKB"), _j("으로", "JKB"),
    # whole-form conjugated verbs (see module docstring)
    _v("하다"), _v("했다"), _v("한다"), _v("가다"), _v("갔다"), _v("간다"),
    _v("읽다"), _v("읽었다"), _v("보다"), _v("봤다"),
]

_CONN: dict[tuple[int, int], int] = {}
for _r in range(9):
    _CONN[(_r, _ID_UNK)] = 2000
    _CONN[(_ID_UNK, _r)] = 2000
_CONN.update(
    {
        (_ID_BOS, _ID_NOUN): 0,
        (_ID_BOS, _ID_VERB): 400,
        (_ID_BOS, _ID_JOSA): 3000,
        (_ID_NOUN, _ID_JOSA): 0,
        (_ID_NOUN, _ID_NOUN): 1800,
        (_ID_NOUN, _ID_VERB): 800,
        (_ID_NOUN, _ID_BOS): 0,
        (_ID_JOSA, _ID_NOUN): 0,
        (_ID_JOSA, _ID_VERB): 200,
        (_ID_JOSA, _ID_BOS): 500,
        (_ID_VERB, _ID_BOS): 100,
        (_ID_VERB, _ID_JOSA): 400,
        (_ID_VERB, _ID_NOUN): 1200,
        (_ID_BOS, _ID_USER): 0,
        (_ID_USER, _ID_BOS): 0,
    }
)
for _r in (_ID_NOUN, _ID_JOSA, _ID_VERB):
    _CONN[(_r, _ID_USER)] = 0
    _CONN[(_ID_USER, _r)] = 0

_CLASSES = [
    CharClass("HANGUL", False, True, 512, _ID_UNK, _ID_UNK, 11000, "UNKNOWN"),
    CharClass("HANJA", False, False, 2, _ID_UNK, _ID_UNK, 11000, "SH"),
    CharClass("ALPHA", True, True, 512, _ID_UNK, _ID_UNK, 9000, "SL"),
    CharClass("NUMERIC", True, True, 512, _ID_UNK, _ID_UNK, 9000, "SN"),
    CharClass("DEFAULT", False, True, 512, _ID_UNK, _ID_UNK, 12000, "UNKNOWN"),
]


def _classify(ch: str) -> str:
    o = ord(ch)
    if 0xAC00 <= o <= 0xD7A3 or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F:
        return "HANGUL"
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
        return "HANJA"
    if ch.isascii() and ch.isalpha():
        return "ALPHA"
    if ch.isdigit():
        return "NUMERIC"
    return "DEFAULT"


def build_ko_dict(extra_entries: list[DictEntry] | None = None) -> MorphDict:
    entries = list(_DEMO_ENTRIES)
    if extra_entries:
        entries.extend(extra_entries)
    return MorphDict(entries, _CONN, _CLASSES, _classify, default_conn=1000)


_DEMO_DICT = build_ko_dict()


def parse_user_dict_ko(lines) -> MorphDict:
    entries = []
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = [p.strip() for p in line.split(",")]
        surface = parts[0]
        segs = parts[1].split() if len(parts) > 1 and parts[1] else [surface]
        pos = parts[3] if len(parts) > 3 else "NNG"
        if "".join(segs) != surface:
            raise ValueError(f"user entry segmentation mismatch: {line!r}")
        seg = tuple((s, {"pos": pos}) for s in segs) if len(segs) > 1 else None
        entries.append(
            DictEntry(surface, USER_LEFT_ID, USER_RIGHT_ID, USER_WORD_COST,
                      {"pos": pos}, seg)
        )
    return MorphDict(entries, {}, _CLASSES, _classify, default_conn=0)


def _is_separator(ch: str) -> bool:
    if ch.isspace():
        return True
    cat = unicodedata.category(ch)
    return cat.startswith("P") or cat in ("So", "Sm", "Sc", "Sk")


def korean_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    decompound: str = "discard",
    user_dict: MorphDict | None = None,
    stop_tags: frozenset[str] = DEFAULT_STOP_TAGS,
    mdict: MorphDict | None = None,
    max_token_length: int = 255,
) -> list[Token]:
    """Full KoreanAnalyzer chain over one document. ``decompound`` is
    ``"none"`` / ``"discard"`` / ``"mixed"`` (DecompoundMode); in MIXED
    the compound stacks at the first part's position (posIncrement 0 —
    this package's Token has no posLength attribute). Dropped tokens
    advance the position (StopFilter gap semantics)."""
    if decompound not in ("none", "discard", "mixed"):
        raise ValueError(f"unknown decompound mode {decompound!r}")
    if not text:
        return []
    d = mdict or _DEMO_DICT
    out: list[Token] = []
    pos = 0
    i = 0
    n = len(text)

    def _emit(term: str, pos_tag: str, start: int, end: int,
              reading: str | None, advance: bool) -> None:
        nonlocal pos
        if pos_tag in stop_tags:
            if advance:
                pos += 1
            return
        if reading is not None:  # KoreanReadingFormFilter
            term = reading
        term = term.lower()
        if stopwords and term in stopwords:
            if advance:
                pos += 1
            return
        if len(term) <= max_token_length:
            out.append(Token(term, pos, start, end, pos_tag))
        if advance:
            pos += 1

    while i < n:
        if _is_separator(text[i]):
            i += 1
            continue
        j = i
        while j < n and not _is_separator(text[j]):
            j += 1
        chunk = text[i:j]
        segs = viterbi_segment(chunk, d, user=user_dict)
        for s in segs:
            seg_parts = s.entry.segmentation if s.entry is not None else None
            if seg_parts is not None and decompound != "none":
                if decompound == "mixed":
                    # compound stacked at the first part's position
                    _emit(s.surface, s.pos, i + s.start, i + s.end,
                          s.entry.attrs.get("reading"), advance=False)
                off = s.start
                for surf, attrs in seg_parts:
                    _emit(surf, attrs.get("pos", s.pos), i + off,
                          i + off + len(surf), attrs.get("reading"),
                          advance=True)
                    off += len(surf)
            else:
                reading = s.entry.attrs.get("reading") if s.entry is not None else None
                _emit(s.surface, s.pos, i + s.start, i + s.end, reading,
                      advance=True)
        i = j
    return out


def korean_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = korean_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]
