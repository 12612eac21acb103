"""Chinese analysis — SmartChineseAnalyzer analog (HHMM segmenter).

Behavioral reference: analysis/smartcn/src/java/org/apache/lucene/
analysis/cn/smart/SmartChineseAnalyzer.java:124-135 (HMMChineseTokenizer
→ PorterStemFilter → StopFilter), hhmm/HHMMSegmenter.java (the word
graph: every single hanzi plus every dictionary match by prefix
extension, letter/digit runs as sentinel tokens, delimiters at max
frequency, BEGIN/END sentinels), hhmm/BiSegGraph.java:50-118 (bigram
edge weight −log(smooth·(1+f₁)/MAX + (1−smooth)·((1−tiny)·f₁₂/(1+f₁) +
tiny)), smooth = 0.1, tiny = 1/MAX, MAX = 2079997+80000 —
Utility.java:47) and :170-218 (index-ordered shortest-path DP),
WordSegmenter.java:44-55 (drop BEGIN/END, restore sentinel token text
from the sentence span), hhmm/SegTokenFilter.java:39-63 (fullwidth →
halfwidth, lowercase Basic Latin, every delimiter → ',').

The bundled ``coredict.mem`` / ``bigramdict.mem`` are Java-serialized
DATA (not copied, not parsed). What IS parsed — the same move as the
MeCab and stempel loaders — is the PUBLIC RAW FORMAT those .mem files
are compiled from and which the reference itself reads
(WordDictionary.loadMainDataFromFile:185-244 /
BigramDictionary.loadFromFile:145-201): the ICTCLAS ``coredict.dct`` /
``bigramdict.dct`` little-endian layout — per GB2312 slot (6768 slots,
id → char via cc/94+161, cc%94+161 — AbstractDictionary.java:79-94) a
count then count × (freq:int32, length:int32, handle:int32,
GB2312-encoded bytes). ``load_word_dct`` / ``load_bigram_dct`` let a
user mount the real dictionaries; the built-in demo dictionaries
(hand-picked common words with made-up frequencies) are the test
fixture.

Documented simplifications: bigram frequencies live in a plain dict
keyed by the "w1@w2" string (the reference packs them into an FNV
double-hash table — same lookups, different container);
expandDelimiterData's per-punctuation frequency copy is skipped (the
segmenter assigns delimiters MAX_FREQUENCE regardless); the bundled
stopword FILE is data, so the default chain instead drops the ','
DELIMITER tokens it normalizes to (pass ``stopwords=`` for the rest).
"""

from __future__ import annotations

import math
import os
import struct

from .porter import porter_stem
from .tokenizer import Token

__all__ = [
    "load_word_dct",
    "load_bigram_dct",
    "hhmm_segment",
    "smart_chinese_analyze",
    "smartcn_terms_positions",
    "build_demo_dicts",
    "MAX_FREQUENCE",
]

MAX_FREQUENCE = 2079997 + 80000  # Utility.java:47
_SMOOTH = 0.1
_TINY = 1.0 / MAX_FREQUENCE

# char types (Utility.getCharType, :140-159)
_SPACE, _HANZI, _LETTER, _DIGIT, _DELIM = 0, 1, 2, 3, 4
_FW_LETTER, _FW_DIGIT, _SURROGATE, _OTHER = 5, 6, 7, 8

# word types (WordType.java)
_W_CHINESE, _W_STRING, _W_NUMBER = 0, 1, 2
_W_FW_STRING, _W_FW_NUMBER, _W_DELIMITER = 3, 4, 5
_W_BEGIN, _W_END = 6, 7

# ICTCLAS sentinel entries (Utility.java:30-39 — dictionary conventions)
_SENT_STRING = "未##串"
_SENT_NUMBER = "未##数"
_SENT_START = "始##始"
_SENT_END = "末##末"
_COMMON_DELIMITER = ","


def _char_type(ch: str) -> int:
    o = ord(ch)
    if 0xD800 <= o <= 0xDFFF or o > 0xFFFF:
        return _SURROGATE
    if 0x4E00 <= o <= 0x9FA5:
        return _HANZI
    if 0x41 <= o <= 0x5A or 0x61 <= o <= 0x7A:
        return _LETTER
    if 0x30 <= o <= 0x39:
        return _DIGIT
    if ch in (" ", "\t", "\r", "\n", "　"):
        return _SPACE
    if 0x21 <= o <= 0xBB or 0x2010 <= o <= 0x2642 or 0x3001 <= o <= 0x301E:
        return _DELIM
    if 0xFF21 <= o <= 0xFF3A or 0xFF41 <= o <= 0xFF5A:
        return _FW_LETTER
    if 0xFF10 <= o <= 0xFF19:
        return _FW_DIGIT
    if 0xFE30 <= o <= 0xFF63:
        return _DELIM
    return _OTHER


# --- .dct loaders (little-endian C layout) --------------------------------

_GB2312_FIRST_CHAR = 1410  # AbstractDictionary.java:33
_CHAR_NUM_IN_FILE = 6768  # :42
_HEADER_SLOT = 3755 + _GB2312_FIRST_CHAR  # reserved slot (no char prefix)


def _cc_by_gb2312_id(ccid: int) -> str:
    cc1 = ccid // 94 + 161
    cc2 = ccid % 94 + 161
    try:
        return bytes((cc1, cc2)).decode("gb2312")
    except UnicodeDecodeError:
        return ""


def _iter_dct(path: str):
    """Yield (slot_id, freq, word_suffix) rows from a .dct file."""
    with open(path, "rb") as fh:
        data = fh.read()
    pos = 0

    def _i32() -> int:
        nonlocal pos
        v = struct.unpack_from("<i", data, pos)[0]
        pos += 4
        return v

    for i in range(_GB2312_FIRST_CHAR, _GB2312_FIRST_CHAR + _CHAR_NUM_IN_FILE):
        cnt = _i32()
        if cnt <= 0:
            continue
        for _ in range(cnt):
            freq = _i32()
            length = _i32()
            _handle = _i32()
            if length > 0:
                raw = data[pos: pos + length]
                pos += length
                yield i, freq, raw.decode("gb2312", errors="replace")
            else:
                yield i, freq, ""


def load_word_dct(path: str) -> dict[str, int]:
    """coredict.dct → {word: frequency}. Stored entries EXCLUDE their
    first hanzi (the GB2312 slot supplies it —
    WordDictionary.loadMainDataFromFile; empty suffix = the single
    char itself)."""
    out: dict[str, int] = {}
    for slot, freq, suffix in _iter_dct(path):
        head = _cc_by_gb2312_id(slot)
        word = head + suffix if slot != _HEADER_SLOT else suffix
        if word:
            out[word] = out.get(word, 0) + freq
    return out


def load_bigram_dct(path: str) -> dict[str, int]:
    """bigramdict.dct → {"w1@w2": frequency} (entries are prefixed with
    the slot char except the reserved header slot —
    BigramDictionary.loadFromFile:180-194; duplicate keys sum)."""
    out: dict[str, int] = {}
    for slot, freq, suffix in _iter_dct(path):
        if not suffix:
            continue
        word = suffix if slot == _HEADER_SLOT else _cc_by_gb2312_id(slot) + suffix
        out[word] = out.get(word, 0) + freq
    return out


def save_word_dct(words: dict[str, int], path: str) -> None:
    """Serialize {word: freq} in the raw .dct layout (fixture building /
    format round-trips). Words must start with a GB2312-encodable hanzi."""
    slots: dict[int, list[tuple[int, str]]] = {}
    for word, freq in words.items():
        gb = word[0].encode("gb2312")
        slot = (gb[0] - 161) * 94 + (gb[1] - 161)
        slots.setdefault(slot, []).append((freq, word[1:]))
    with open(path, "wb") as fh:
        for i in range(_GB2312_FIRST_CHAR, _GB2312_FIRST_CHAR + _CHAR_NUM_IN_FILE):
            items = slots.get(i, [])
            fh.write(struct.pack("<i", len(items)))
            for freq, suffix in items:
                raw = suffix.encode("gb2312")
                fh.write(struct.pack("<iii", freq, len(raw), 0))
                fh.write(raw)


def save_bigram_dct(bigrams: dict[str, int], path: str) -> None:
    slots: dict[int, list[tuple[int, str]]] = {}
    for key, freq in bigrams.items():
        gb = key[0].encode("gb2312")
        slot = (gb[0] - 161) * 94 + (gb[1] - 161)
        slots.setdefault(slot, []).append((freq, key[1:]))
    with open(path, "wb") as fh:
        for i in range(_GB2312_FIRST_CHAR, _GB2312_FIRST_CHAR + _CHAR_NUM_IN_FILE):
            items = slots.get(i, [])
            fh.write(struct.pack("<i", len(items)))
            for freq, suffix in items:
                raw = suffix.encode("gb2312")
                fh.write(struct.pack("<iii", freq, len(raw), 0))
                fh.write(raw)


# --- demo dictionaries (test fixture; made-up frequencies) ----------------

_DEMO_WORDS: dict[str, int] = {
    "中国": 60000, "人民": 50000, "共和国": 30000,
    "中华": 20000, "中华人民共和国": 15000,
    "北京": 40000, "大学": 45000, "学生": 30000, "生活": 25000,
    "经济": 50000, "新闻": 45000, "机场": 30000, "技术": 40000,
    "工作": 50000, "我们": 60000, "发展": 35000, "世界": 40000,
    "语言": 30000, "分析": 25000, "搜索": 20000, "引擎": 15000,
    # single-char entries (every hanzi also enters the graph alone)
    "中": 8000, "国": 6000, "人": 12000, "大": 9000, "学": 7000,
    # sentinel entries (ICTCLAS conventions)
    _SENT_STRING: 500, _SENT_NUMBER: 500,
    _SENT_START: MAX_FREQUENCE // 100, _SENT_END: MAX_FREQUENCE // 100,
}

_DEMO_BIGRAMS: dict[str, int] = {
    f"{_SENT_START}@中国": 2000,
    f"{_SENT_START}@北京": 1500,
    "中国@人民": 3000,
    "人民@共和国": 1000,
    "北京@大学": 2500,
    f"大学@{_SENT_END}": 800,
    f"中国@{_SENT_END}": 900,
    "经济@新闻": 600,
    "搜索@引擎": 1200,
}


def build_demo_dicts() -> tuple[dict[str, int], dict[str, int]]:
    return dict(_DEMO_WORDS), dict(_DEMO_BIGRAMS)


class _Dicts:
    """Word dict + derived prefix set + bigram dict (query helpers)."""

    def __init__(self, words: dict[str, int], bigrams: dict[str, int]):
        self.words = words
        self.bigrams = bigrams
        self.prefixes: set[str] = set()
        for w in words:
            for k in range(1, len(w)):
                self.prefixes.add(w[:k])

    def freq(self, w: str) -> int:
        return self.words.get(w, 0)

    def pair_freq(self, w1: str, w2: str) -> int:
        return self.bigrams.get(f"{w1}@{w2}", 0)


_DEMO = _Dicts(_DEMO_WORDS, _DEMO_BIGRAMS)


# --- HHMM segmentation ----------------------------------------------------


class _Tok:
    __slots__ = ("text", "start", "end", "wtype", "freq", "index")

    def __init__(self, text, start, end, wtype, freq):
        self.text = text
        self.start = start
        self.end = end
        self.wtype = wtype
        self.freq = freq
        self.index = -1


def _create_seg_graph(sentence: str, d: _Dicts) -> list[_Tok]:
    """HHMMSegmenter.createSegGraph:60-185 — the token lattice, keyed by
    start: every hanzi alone, every dictionary match grown by prefix
    extension (space-like chars are skipped inside a growing match),
    letter/digit runs as sentinel tokens, delimiters at MAX_FREQUENCE,
    plus BEGIN/END sentinels."""
    n = len(sentence)
    types = [_char_type(c) for c in sentence]
    toks: list[_Tok] = []
    i = 0
    while i < n:
        t = types[i]
        if t == _SPACE:
            i += 1
            continue
        if t == _SURROGATE:
            # one code point (astral chars arrive as single python chars)
            toks.append(_Tok(sentence[i], i, i + 1, _W_CHINESE, 0))
            i += 1
            continue
        if t == _HANZI:
            j = i + 1
            word = sentence[i]
            toks.append(_Tok(word, i, j, _W_CHINESE, d.freq(word)))
            # prefix extension (skips interior space-like chars)
            while j <= n and (word in d.prefixes or word in d.words):
                if word in d.words and len(word) > 1:
                    toks.append(_Tok(word, i, j, _W_CHINESE, d.freq(word)))
                if word not in d.prefixes:
                    break
                while j < n and types[j] == _SPACE:
                    j += 1
                if j < n and types[j] == _HANZI:
                    word += sentence[j]
                    j += 1
                else:
                    break
            i += 1
            continue
        if t in (_LETTER, _FW_LETTER):
            j = i + 1
            has_fw = t == _FW_LETTER
            while j < n and types[j] in (_LETTER, _FW_LETTER):
                has_fw = has_fw or types[j] == _FW_LETTER
                j += 1
            toks.append(_Tok(
                _SENT_STRING, i, j,
                _W_FW_STRING if has_fw else _W_STRING, d.freq(_SENT_STRING),
            ))
            i = j
            continue
        if t in (_DIGIT, _FW_DIGIT):
            j = i + 1
            has_fw = t == _FW_DIGIT
            while j < n and types[j] in (_DIGIT, _FW_DIGIT):
                has_fw = has_fw or types[j] == _FW_DIGIT
                j += 1
            toks.append(_Tok(
                _SENT_NUMBER, i, j,
                _W_FW_NUMBER if has_fw else _W_NUMBER, d.freq(_SENT_NUMBER),
            ))
            i = j
            continue
        if t == _DELIM:
            toks.append(_Tok(sentence[i], i, i + 1, _W_DELIMITER, MAX_FREQUENCE))
            i += 1
            continue
        # OTHER: unknown symbol as sentinel string (:160-168)
        toks.append(_Tok(_SENT_STRING, i, i + 1, _W_STRING, d.freq(_SENT_STRING)))
        i += 1
    toks.append(_Tok(_SENT_START, -1, 0, _W_BEGIN, d.freq(_SENT_START)))
    toks.append(_Tok(_SENT_END, n, n + 1, _W_END, d.freq(_SENT_END)))
    # index order = (start, insertion) — SegGraph.makeIndex walks starts
    # ascending, preserving per-start insertion order
    toks.sort(key=lambda tk: tk.start)
    for idx, tk in enumerate(toks):
        tk.index = idx
    return toks


def _edge_weight(f1: int, pair: int) -> float:
    # BiSegGraph.java:102-108
    return -math.log(
        _SMOOTH * (1.0 + f1) / MAX_FREQUENCE
        + (1.0 - _SMOOTH) * ((1.0 - _TINY) * pair / (1.0 + f1) + _TINY)
    )


def hhmm_segment(
    sentence: str, dicts: _Dicts | tuple | None = None
) -> list[tuple[str, int, int, int]]:
    """Best HHMM segmentation of one sentence: (text, start, end,
    word_type) per token, BEGIN/END dropped and sentinel tokens restored
    to their sentence span (WordSegmenter.segmentSentence). ``dicts``:
    a (word_freq, bigram_freq) pair or None (demo)."""
    if isinstance(dicts, tuple):
        d = _Dicts(dicts[0], dicts[1])
    else:
        d = dicts if dicts is not None else _DEMO
    if not sentence:
        return []
    toks = _create_seg_graph(sentence, d)
    m = len(toks)
    # edges: t1 -> every token at the next EXISTING start >= t1.end
    # (BiSegGraph.generateBiSegGraph:78-89)
    starts: dict[int, list[_Tok]] = {}
    for tk in toks:
        starts.setdefault(tk.start, [])
        starts[tk.start].append(tk)
    max_start = max(tk.start for tk in toks)
    in_edges: list[list[tuple[int, float]]] = [[] for _ in range(m)]
    for t1 in toks:
        if t1.wtype == _W_END:
            continue
        nxt = t1.end
        targets = None
        while nxt <= max_start:
            if nxt in starts:
                targets = starts[nxt]
                break
            nxt += 1
        if targets is None:
            continue
        for t2 in targets:
            w = _edge_weight(t1.freq, d.pair_freq(t1.text, t2.text))
            in_edges[t2.index].append((t1.index, w))
    # index-ordered shortest path (BiSegGraph.getShortPath:170-218)
    INF = float("inf")
    best = [0.0] + [INF] * (m - 1)
    prev = [0] * m
    for cur in range(1, m):
        for (frm, w) in in_edges[cur]:
            if best[frm] + w < best[cur]:
                best[cur] = best[frm] + w
                prev[cur] = frm
    path = [m - 1]
    while path[-1] != 0:
        path.append(prev[path[-1]])
    path.reverse()
    out: list[tuple[str, int, int, int]] = []
    for idx in path[1:-1]:  # drop BEGIN/END (WordSegmenter:49-51)
        tk = toks[idx]
        text = tk.text
        if tk.wtype in (_W_STRING, _W_NUMBER, _W_FW_STRING, _W_FW_NUMBER):
            text = sentence[tk.start: tk.end]  # restore the real span
        out.append((text, tk.start, tk.end, tk.wtype))
    return out


# --- analyzer chain -------------------------------------------------------

_SENTENCE_ENDERS = frozenset("。！？!?;；\n")


def smart_chinese_analyze(
    text: str,
    stopwords: frozenset[str] | None = None,
    dicts: tuple[dict, dict] | None = None,
    keep_delimiters: bool = False,
    max_token_length: int = 255,
) -> list[Token]:
    """Full SmartChineseAnalyzer chain: sentence split → HHMM segment →
    SegTokenFilter normalization (fullwidth→halfwidth, lowercase Basic
    Latin, delimiter → ',') → Porter stem on latin tokens (the chain's
    PorterStemFilter, SmartChineseAnalyzer.java:130) → stop. Normalized
    ',' delimiter tokens are dropped unless ``keep_delimiters`` (the
    bundled default stopword file is data — see module docstring).
    Dropped tokens advance the position (StopFilter gap semantics)."""
    if not text:
        return []
    d = _Dicts(dicts[0], dicts[1]) if dicts is not None else _DEMO
    out: list[Token] = []
    pos = 0
    sent_start = 0
    i = 0
    n = len(text)
    while sent_start < n:
        i = sent_start
        while i < n and text[i] not in _SENTENCE_ENDERS:
            i += 1
        sent_end = min(i + 1, n)
        sentence = text[sent_start:sent_end]
        for (tok_text, s, e, wtype) in hhmm_segment(sentence, d):
            # SegTokenFilter (:39-63)
            if wtype in (_W_FW_STRING, _W_FW_NUMBER):
                tok_text = "".join(
                    chr(ord(c) - 0xFEE0) if ord(c) >= 0xFF10 else c
                    for c in tok_text
                )
            if wtype == _W_DELIMITER:
                tok_text = _COMMON_DELIMITER
                if not keep_delimiters:
                    pos += 1
                    continue
            tok_text = "".join(
                chr(ord(c) + 0x20) if 0x41 <= ord(c) <= 0x5A else c
                for c in tok_text
            )
            if wtype in (_W_STRING, _W_FW_STRING) and tok_text.isascii():
                tok_text = porter_stem(tok_text)  # PorterStemFilter
            if stopwords and tok_text in stopwords:
                pos += 1
                continue
            if len(tok_text) <= max_token_length:
                out.append(Token(
                    tok_text, pos, sent_start + s, sent_start + e, "<SMARTCN>"
                ))
            pos += 1
        sent_start = sent_end
    return out


def smartcn_terms_positions(text: str, stopwords: frozenset[str] | None = None):
    toks = smart_chinese_analyze(text, stopwords)
    return [t.term for t in toks], [t.position for t in toks]


def load_dicts_dir(path: str) -> tuple[dict[str, int], dict[str, int]]:
    """Load a user-mounted ICTCLAS dictionary directory
    (coredict.dct + bigramdict.dct — the AnalyzerProfile layout the
    reference's load(dctFileRoot) reads)."""
    core = os.path.join(path, "coredict.dct")
    bigram = os.path.join(path, "bigramdict.dct")
    for p in (core, bigram):
        if not os.path.exists(p):
            raise FileNotFoundError(f"smartcn dictionary dir missing {p}")
    return load_word_dct(core), load_bigram_dct(bigram)


def load_mem_dir(path: str):
    """Mount the Lucene-PACKAGED compiled smartcn dictionaries (the
    Java-serialized ``coredict.mem`` / ``bigramdict.mem`` inside the
    smartcn jar — closing the round-4 'compiled .mem stays unparsed'
    gap via analysis/javadict.py's serialization-subset reader).

    ``coredict.mem`` is required. ``bigramdict.mem`` is optional (the
    jar ships only coredict.mem): it stores only bigram HASHES, so it
    mounts as a probe-on-lookup adapter rather than a dict; when absent
    the bigram frequencies are 0 and the HHMM smoothing still segments
    (the reference's own Viterbi does the same for unseen bigrams).
    Returns (words, bigrams) for ``smart_chinese_analyze(dicts=...)``."""
    from .javadict import load_smartcn_bigram_mem, load_smartcn_coredict_mem

    core = os.path.join(path, "coredict.mem")
    if not os.path.exists(core):
        raise FileNotFoundError(f"smartcn .mem dir missing {core}")
    words = load_smartcn_coredict_mem(core)
    bigram = os.path.join(path, "bigramdict.mem")
    bigrams = (
        load_smartcn_bigram_mem(bigram) if os.path.exists(bigram) else {}
    )
    return words, bigrams
