"""Readers for Lucene's PACKAGED binary dictionary files.

`analysis/mecab.py` mounts dictionaries from their public SOURCE formats
(MeCab CSV / matrix.def / char.def / unk.def). But a user who has only
the Lucene kuromoji jar has the COMPILED resources —
``TokenInfoDictionary$fst.dat`` / ``$targetMap.dat`` / ``$posDict.dat``
/ ``$buffer.dat``, ``UnknownDictionary$*.dat``, ``ConnectionCosts.dat``,
``CharacterDefinition.dat`` — and (round-4 verdict item #8) could not
mount them. This module reads those byte formats directly into a
``MorphDict``.

Every format here is transcribed from the reference's own readers (the
formats are defined by their code, there is no separate spec):

- CodecUtil header: BE magic 0x3fd76c17, VInt-length UTF-8 codec name,
  BE version (codecs/CodecUtil.java writeHeader/checkHeader).
- targetMap: VInt counts then delta-coded wordIds, LSB flags a new
  sourceId (morph/BinaryDictionary.java populateTargetMap,
  BinaryDictionaryWriter.java writeTargetMap).
- posDict: VInt count then (pos, inflType, inflForm) readString triples
  (ja/dict/TokenInfoMorphData.java populatePosDict).
- buffer: VInt byte size then raw big-endian entries — flags short
  ``leftId << 3 | HAS_*``, cost short, then prefix-shared baseform /
  optionally-katakana-packed reading and pronunciation
  (TokenInfoMorphData.java getters + TokenInfoDictionaryEntryWriter.java
  putEntry; a wordId IS the entry's byte offset).
- ConnectionCosts: forward/backward VInt sizes then zig-zag VInt deltas
  in backward-major order (morph/ConnectionCosts.java).
- CharacterDefinition: 65536 category bytes then per-class
  invoke|group<<1 flag bytes (morph/CharacterDefinition.java); class
  ordinals are the ja CharacterClass enum order
  (ja/dict/CharacterDefinition.java:30-43). NOTE the binary format does
  not carry MeCab's per-class LENGTH — non-group classes fall back to
  1-char unknown candidates here (kuromoji's own runtime has the same
  information loss).
- FST: util/fst/FST.java readMetadata (versions 6..9) + the arc formats
  (linear list / ARCS_FOR_BINARY_SEARCH / ARCS_FOR_DIRECT_ADDRESSING /
  ARCS_FOR_CONTINUOUS) over a REVERSED byte reader
  (ReverseBytesReader.java), labels BYTE2, outputs PositiveIntOutputs
  VLongs. Enumeration is a DFS yielding (surface, ord).

The ``write_*`` twins implement the same public formats so the tests can
pin the reader against byte fixtures (and so a round trip is checkable
without Java); they write the LINEAR arc encoding plus hand-constructed
fixed-array nodes in tests — a real kuromoji FST exercises the same
readArc code paths.

Cluster-scale note: a real IPADIC-sized MorphDict is tens of MB of
Python objects. Load it ONCE on the driver and ship it to executors via
``spark.sparkContext.broadcast(mdict)``, dereferencing ``bc.value``
inside the mapInPandas/applyInPandas function — capturing it in the UDF
closure instead re-serializes it into every task binary.
"""

from __future__ import annotations

import os
import struct

from .lattice import CharClass, DictEntry, MorphDict

__all__ = [
    "check_header",
    "write_header",
    "read_target_map",
    "read_pos_dict",
    "read_conn_costs",
    "read_char_def",
    "read_fst",
    "fst_enumerate",
    "decode_ja_entry",
    "load_lucene_kuromoji",
    "JA_CHARACTER_CLASSES",
    "MatrixConn",
]

CODEC_MAGIC = 0x3FD76C17

# ja/dict/CharacterDefinition.java CharacterClass enum order = the class
# ordinal bytes in CharacterDefinition.dat
JA_CHARACTER_CLASSES = (
    "NGRAM", "DEFAULT", "SPACE", "SYMBOL", "NUMERIC", "ALPHA",
    "CYRILLIC", "GREEK", "HIRAGANA", "KATAKANA", "KANJI", "KANJINUMERIC",
)

HAS_BASEFORM = 1
HAS_READING = 2
HAS_PRONUNCIATION = 4


class _Din:
    """Forward DataInput over bytes (store/DataInput.java semantics)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read_byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def read_bytes(self, n: int) -> bytes:
        out = self.data[self.pos: self.pos + n]
        if len(out) != n:
            raise EOFError("truncated stream")
        self.pos += n
        return out

    def read_vint(self) -> int:
        b = self.read_byte()
        v = b & 0x7F
        shift = 7
        while b & 0x80:
            b = self.read_byte()
            v |= (b & 0x7F) << shift
            shift += 7
        return v

    def read_zint(self) -> int:
        v = self.read_vint()
        return (v >> 1) ^ -(v & 1)  # BitUtil.zigZagDecode

    read_vlong = read_vint  # same wire format, python ints are unbounded

    def read_string(self) -> str:
        n = self.read_vint()
        return self.read_bytes(n).decode("utf-8")

    def read_be_int(self) -> int:
        v = struct.unpack_from(">i", self.data, self.pos)[0]
        self.pos += 4
        return v


def check_header(din: _Din, codec: str, min_v: int, max_v: int) -> int:
    magic = din.read_be_int()
    if magic != CODEC_MAGIC:
        raise ValueError(f"codec header mismatch: {magic:#x}")
    actual = din.read_string()
    if actual != codec:
        raise ValueError(f"codec mismatch: {actual!r} != {codec!r}")
    version = din.read_be_int()
    if not (min_v <= version <= max_v):
        raise ValueError(f"unsupported {codec} version {version}")
    return version


def write_header(out: bytearray, codec: str, version: int) -> None:
    out += struct.pack(">i", CODEC_MAGIC)
    enc = codec.encode("utf-8")
    _write_vint(out, len(enc))
    out += enc
    out += struct.pack(">i", version)


def _write_vint(out: bytearray, v: int) -> None:
    if v < 0:
        # Java's writer asserts this too (writeTargetMap delta >= 0); a
        # negative python int would loop forever under >>=
        raise ValueError(f"VInt value must be non-negative, got {v}")
    while v & ~0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


# --- targetMap -------------------------------------------------------------


def read_target_map(data: bytes, codec: str, version: int = 1):
    """sourceId -> tuple of wordIds (BinaryDictionary.populateTargetMap)."""
    din = _Din(data)
    check_header(din, codec, version, version)
    n_map = din.read_vint()
    n_offsets = din.read_vint()
    target_map = [0] * n_map
    offsets = [0] * n_offsets
    accum = 0
    source_id = 0
    for ofs in range(n_map):
        val = din.read_vint()
        if val & 1:
            offsets[source_id] = ofs
            source_id += 1
        accum += val >> 1
        target_map[ofs] = accum
    if source_id + 1 != n_offsets:
        raise ValueError("targetMap file format broken")
    offsets[source_id] = n_map
    return [
        tuple(target_map[offsets[i]: offsets[i + 1]])
        for i in range(n_offsets - 1)
    ]


def write_target_map(mappings: list[tuple[int, ...]], codec: str,
                     version: int = 1) -> bytes:
    """BinaryDictionaryWriter.writeTargetMap: mappings[sourceId] = sorted
    strictly-increasing wordIds (globally increasing across sourceIds)."""
    out = bytearray()
    write_header(out, codec, version)
    flat: list[tuple[int, bool]] = []
    for wids in mappings:
        for j, w in enumerate(wids):
            flat.append((w, j == 0))
    _write_vint(out, len(flat))
    _write_vint(out, len(mappings) + 1)
    prev = 0
    for w, first in flat:
        delta = w - prev
        _write_vint(out, (delta << 1) | (1 if first else 0))
        prev = w
    return bytes(out)


# --- posDict ---------------------------------------------------------------


def read_pos_dict(data: bytes, codec: str, version: int = 1):
    """[(pos, inflType|None, inflForm|None)] per leftId."""
    din = _Din(data)
    check_header(din, codec, version, version)
    n = din.read_vint()
    out = []
    for _ in range(n):
        pos = din.read_string()
        infl_type = din.read_string() or None
        infl_form = din.read_string() or None
        out.append((pos, infl_type, infl_form))
    return out


def write_pos_dict(rows, codec: str, version: int = 1) -> bytes:
    out = bytearray()
    write_header(out, codec, version)
    _write_vint(out, len(rows))
    for (pos, infl_type, infl_form) in rows:
        for s in (pos, infl_type or "", infl_form or ""):
            enc = s.encode("utf-8")
            _write_vint(out, len(enc))
            out += enc
    return bytes(out)


# --- ConnectionCosts -------------------------------------------------------


class MatrixConn:
    """Full connection matrix with the dict.get((right, left), default)
    interface MorphDict expects. ConnectionCosts.get(forward, backward) =
    matrix[backward * forwardSize + forward]; the tokenizer calls it as
    (prev.rightId, next.leftId)."""

    def __init__(self, forward_size: int, costs: list[int]):
        self.forward_size = forward_size
        self.costs = costs

    def get(self, key, default=None):
        fwd, bwd = key
        i = bwd * self.forward_size + fwd
        if 0 <= fwd < self.forward_size and 0 <= i < len(self.costs):
            return self.costs[i]
        return default


def read_conn_costs(data: bytes, codec: str, version: int = 1) -> MatrixConn:
    din = _Din(data)
    check_header(din, codec, version, version)
    forward_size = din.read_vint()
    backward_size = din.read_vint()
    costs = [0] * (forward_size * backward_size)
    accum = 0
    i = 0
    for _ in range(backward_size):
        for _ in range(forward_size):
            accum += din.read_zint()
            costs[i] = accum
            i += 1
    return MatrixConn(forward_size, costs)


def write_conn_costs(forward_size: int, backward_size: int,
                     get_cost, codec: str, version: int = 1) -> bytes:
    out = bytearray()
    write_header(out, codec, version)
    _write_vint(out, forward_size)
    _write_vint(out, backward_size)
    accum = 0
    for b in range(backward_size):
        for f in range(forward_size):
            c = get_cost(f, b)
            delta = c - accum
            _write_vint(out, (delta << 1) ^ (delta >> 63) if delta >= 0
                        else ((-delta) << 1) - 1)
            accum = c
    return bytes(out)


# --- CharacterDefinition ---------------------------------------------------


def read_char_def(data: bytes, codec: str, class_count: int,
                  version: int = 1):
    """(category_map: bytes[65536], [(invoke, group)] per class)."""
    din = _Din(data)
    check_header(din, codec, version, version)
    category_map = din.read_bytes(0x10000)
    flags = []
    for _ in range(class_count):
        b = din.read_byte()
        flags.append((bool(b & 0x01), bool(b & 0x02)))
    return category_map, flags


def write_char_def(category_map: bytes, flags, codec: str,
                   version: int = 1) -> bytes:
    assert len(category_map) == 0x10000
    out = bytearray()
    write_header(out, codec, version)
    out += category_map
    for (invoke, group) in flags:
        out.append((1 if invoke else 0) | (2 if group else 0))
    return bytes(out)


# --- FST -------------------------------------------------------------------

_FST_BIT_FINAL_ARC = 1 << 0
_FST_BIT_LAST_ARC = 1 << 1
_FST_BIT_TARGET_NEXT = 1 << 2
_FST_BIT_STOP_NODE = 1 << 3
_FST_BIT_ARC_HAS_OUTPUT = 1 << 4
_FST_BIT_ARC_HAS_FINAL_OUTPUT = 1 << 5
_ARCS_FOR_BINARY_SEARCH = _FST_BIT_ARC_HAS_FINAL_OUTPUT  # 0x20
_ARCS_FOR_DIRECT_ADDRESSING = 1 << 6  # 0x40
_ARCS_FOR_CONTINUOUS = _ARCS_FOR_DIRECT_ADDRESSING + _ARCS_FOR_BINARY_SEARCH
_FST_VERSION_START = 6
_FST_VERSION_LITTLE_ENDIAN = 8
_FST_VERSION_CURRENT = 9


class _Rev:
    """ReverseBytesReader.java: reads toward LOWER addresses."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read_byte(self) -> int:
        b = self.data[self.pos]
        self.pos -= 1
        return b

    def skip(self, n: int) -> None:
        self.pos -= n

    def read_vint(self) -> int:
        b = self.read_byte()
        v = b & 0x7F
        shift = 7
        while b & 0x80:
            b = self.read_byte()
            v |= (b & 0x7F) << shift
            shift += 7
        return v

    read_vlong = read_vint

    def read_short_le(self) -> int:
        b1 = self.read_byte()
        b2 = self.read_byte()
        return (b2 << 8) | b1


class FstMeta:
    __slots__ = ("version", "input_type", "empty_output", "start_node",
                 "num_bytes", "fst_bytes")


def read_fst(data: bytes) -> FstMeta:
    """fst.dat = CodecUtil header 'FST' + metadata + fst byte array
    (FST.readMetadata + the FST(metadata, in) data read)."""
    din = _Din(data)
    m = FstMeta()
    m.version = check_header(din, "FST", _FST_VERSION_START,
                             _FST_VERSION_CURRENT)
    if din.read_byte() == 1:
        n = din.read_vint()
        empty_bytes = din.read_bytes(n)
        # empty output is read via the REVERSE reader from the tail
        r = _Rev(empty_bytes)
        r.pos = n - 1 if n > 0 else 0
        m.empty_output = r.read_vlong() if n > 0 else 0
    else:
        m.empty_output = None
    t = din.read_byte()
    if t not in (0, 1, 2):
        raise ValueError(f"invalid FST input type {t}")
    m.input_type = t  # 0=BYTE1, 1=BYTE2, 2=BYTE4
    m.start_node = din.read_vlong()
    m.num_bytes = din.read_vlong()
    m.fst_bytes = din.read_bytes(m.num_bytes)
    return m


def _read_label(r: _Rev, meta: FstMeta) -> int:
    if meta.input_type == 0:
        return r.read_byte()
    if meta.input_type == 1:
        v = r.read_short_le()
        if meta.version < _FST_VERSION_LITTLE_ENDIAN:
            v = ((v & 0xFF) << 8) | (v >> 8)  # Short.reverseBytes branch
        return v
    return r.read_vint()  # BYTE4


def _num_presence_bytes(label_range: int) -> int:
    return (label_range + 7) >> 3


def _read_arc_body(r: _Rev, meta: FstMeta, flags: int, label: int):
    """Decode one arc after its flags byte (FST.readArc:936-984).
    Returns (label, output, final_output, is_final, target) with target
    being the node address, 0/-1 for end nodes, or the sentinel "next"
    (BIT_TARGET_NEXT: the target is the position just past this node's
    arc block — resolved by the caller, which knows the block bounds)."""
    output = r.read_vlong() if flags & _FST_BIT_ARC_HAS_OUTPUT else 0
    final_out = (
        r.read_vlong() if flags & _FST_BIT_ARC_HAS_FINAL_OUTPUT else 0
    )
    is_final = bool(flags & _FST_BIT_FINAL_ARC)
    if flags & _FST_BIT_STOP_NODE:
        target = -1 if is_final else 0
    elif flags & _FST_BIT_TARGET_NEXT:
        target = "next"
    else:
        target = r.read_vlong()
    return (label, output, final_out, is_final, target)


def _read_node_arcs(data: bytes, addr: int, meta: FstMeta):
    """All arcs of the node at ``addr`` with resolved targets, mirroring
    readFirstArcInfo + readNextRealArc for the four node encodings."""
    r = _Rev(data)
    r.pos = addr
    flags0 = r.read_byte()
    arcs = []
    if flags0 in (_ARCS_FOR_BINARY_SEARCH, _ARCS_FOR_DIRECT_ADDRESSING,
                  _ARCS_FOR_CONTINUOUS):
        num_arcs = r.read_vint()
        bytes_per_arc = r.read_vint()
        if flags0 == _ARCS_FOR_DIRECT_ADDRESSING:
            bit_table_start = r.pos
            r.skip(_num_presence_bytes(num_arcs))
            first_label = _read_label(r, meta)
            pos_arcs_start = r.pos
            presence_index = 0
            for range_idx in range(num_arcs):
                bit = (data[bit_table_start - (range_idx >> 3)]
                       >> (range_idx & 7)) & 1
                if not bit:
                    continue
                r.pos = pos_arcs_start - presence_index * bytes_per_arc
                flags = r.read_byte()
                arcs.append(_read_arc_body(
                    r, meta, flags, first_label + range_idx))
                presence_index += 1
            node_end = pos_arcs_start - bytes_per_arc * presence_index
        elif flags0 == _ARCS_FOR_CONTINUOUS:
            first_label = _read_label(r, meta)
            pos_arcs_start = r.pos
            for idx in range(num_arcs):
                r.pos = pos_arcs_start - idx * bytes_per_arc
                flags = r.read_byte()
                arcs.append(_read_arc_body(
                    r, meta, flags, first_label + idx))
            node_end = pos_arcs_start - bytes_per_arc * num_arcs
        else:  # ARCS_FOR_BINARY_SEARCH: fixed-width arcs with labels
            pos_arcs_start = r.pos
            for idx in range(num_arcs):
                r.pos = pos_arcs_start - idx * bytes_per_arc
                flags = r.read_byte()
                label = _read_label(r, meta)
                arcs.append(_read_arc_body(r, meta, flags, label))
            node_end = pos_arcs_start - bytes_per_arc * num_arcs
    else:
        # linear list: consecutive variable-length arcs, BIT_LAST_ARC ends
        r.pos = addr
        while True:
            flags = r.read_byte()
            label = _read_label(r, meta)
            arcs.append(_read_arc_body(r, meta, flags, label))
            if flags & _FST_BIT_LAST_ARC:
                break
        node_end = r.pos
    # BIT_TARGET_NEXT: "the target node is written right before this one"
    # — its address is the position just past this node's arc block
    # (FST.readArc:962-978 seeks there via seekToNextNode / the fixed
    # array jump; both land on node_end)
    return [
        (lab, out, fout, fin, node_end if tgt == "next" else tgt)
        for (lab, out, fout, fin, tgt) in arcs
    ]


def fst_enumerate(meta: FstMeta):
    """DFS over all accepted inputs: yields (labels tuple, output long).
    PositiveIntOutputs: path output = sum of arc outputs + the accepting
    arc's final output."""
    if meta.empty_output is not None:
        yield ((), meta.empty_output)
    if meta.start_node <= 0:
        return
    data = meta.fst_bytes
    stack = [(meta.start_node, (), 0)]
    while stack:
        addr, prefix, acc = stack.pop()
        for (label, output, final_out, is_final, target) in _read_node_arcs(
            data, addr, meta
        ):
            path = prefix + (label,)
            out = acc + output
            if is_final:
                yield (path, out + final_out)
            if isinstance(target, int) and target > 0:
                stack.append((target, path, out))


def write_fst_linear(entries: list[tuple[str, int]]) -> bytes:
    """A minimal fst.dat writer: BYTE2 labels, PositiveIntOutputs, every
    node in the LINEAR arc encoding with explicit targets (always valid —
    fixed-length arrays and TARGET_NEXT are writer optimizations the
    reader must also accept, exercised separately on hand-built nodes).
    ``entries`` must be sorted by surface; outputs are positive longs.
    Returns the full file bytes (header + metadata + fst byte array)."""
    if not entries:
        raise ValueError("empty FST")
    # trie construction
    root: dict = {}
    for surface, out in entries:
        if out <= 0:
            raise ValueError("PositiveIntOutputs requires outputs > 0")
        node = root
        for ch in surface:
            node = node.setdefault(ch, {})
        node["\0final"] = out
    # minimal-prefix output pushing is an OPTIMIZATION (smaller vlongs);
    # putting the whole output on the accepting arc is equally valid
    buf = bytearray([0])  # address 0 pad: NON_FINAL_END_NODE sentinel

    def emit(node: dict) -> int:
        """Write children of ``node``; return its address (0 if leaf)."""
        labels = sorted(k for k in node if k != "\0final")
        if not labels:
            return 0
        child_addr = {}
        for ch in labels:
            child_addr[ch] = emit(node[ch])
        stream = bytearray()
        for i, ch in enumerate(labels):
            child = node[ch]
            final_out = child.get("\0final")
            flags = 0
            if i == len(labels) - 1:
                flags |= _FST_BIT_LAST_ARC
            target = child_addr[ch]
            if final_out is not None:
                # the accepted value rides the FINAL output (applies only
                # when the path stops here), never the arc output (which
                # would also propagate into continuations of this prefix).
                # flags 0x21 != the 0x20 node-header sentinel, so a first
                # arc can never be misread as a fixed-array header.
                flags |= _FST_BIT_FINAL_ARC | _FST_BIT_ARC_HAS_FINAL_OUTPUT
            if target == 0:
                flags |= _FST_BIT_STOP_NODE
            arc = bytearray([flags])
            arc += struct.pack("<H", ord(ch))  # BYTE2 label, LE
            if final_out is not None:
                _write_vint(arc, final_out)
            if target != 0:
                _write_vint(arc, target)
            stream += arc
        buf.extend(reversed(stream))
        return len(buf) - 1

    start = emit(root)
    out = bytearray()
    write_header(out, "FST", _FST_VERSION_CURRENT)
    out.append(0)  # no empty output
    out.append(1)  # BYTE2
    _write_vint(out, start)
    _write_vint(out, len(buf))
    out += buf
    return bytes(out)


# --- ja buffer (TokenInfoMorphData) ---------------------------------------


def decode_ja_entry(buf: bytes, word_id: int, pos_dict):
    """(left_id, pos, infl_type, infl_form, word_cost, base_suffix,
    reading) for the entry at byte offset ``word_id``
    (TokenInfoMorphData.java getters; buffer is BIG-endian).
    ``base_suffix`` is (shared_prefix_len, suffix string) or None;
    the baseform is surface[:shared] + suffix."""
    flags_short = struct.unpack_from(">H", buf, word_id)[0]
    left_id = flags_short >> 3
    word_cost = struct.unpack_from(">h", buf, word_id + 2)[0]
    off = word_id + 4
    base = None
    if flags_short & HAS_BASEFORM:
        data = buf[off]
        off += 1
        prefix, suffix_len = data >> 4, data & 0xF
        chars = struct.unpack_from(f">{suffix_len}H", buf, off)
        off += suffix_len * 2
        base = (prefix, "".join(chr(c) for c in chars))
    reading = None
    if flags_short & HAS_READING:
        rd = buf[off]
        off += 1
        if rd & 1:  # katakana-packed: one byte per char, 0x30A0 base
            n = rd >> 1
            reading = "".join(chr(0x30A0 + b) for b in buf[off: off + n])
            off += n
        else:
            n = rd >> 1
            chars = struct.unpack_from(f">{n}H", buf, off)
            reading = "".join(chr(c) for c in chars)
            off += n * 2
    pos, infl_type, infl_form = pos_dict[left_id]
    return (left_id, pos, infl_type, infl_form, word_cost, base, reading)


def _read_dat(path: str) -> bytes:
    with open(path, "rb") as fh:
        return fh.read()


def read_buffer(data: bytes, codec: str, version: int = 1) -> bytes:
    """$buffer.dat → the raw entry ByteBuffer (BinaryDictionary ctor:
    header, VInt size, then exactly ``size`` bytes)."""
    din = _Din(data)
    check_header(din, codec, version, version)
    size = din.read_vint()
    return din.read_bytes(size)


def write_buffer(entry_bytes: bytes, codec: str, version: int = 1) -> bytes:
    out = bytearray()
    write_header(out, codec, version)
    _write_vint(out, len(entry_bytes))
    out += entry_bytes
    return bytes(out)


def encode_ja_entry(surface: str, left_id: int, word_cost: int,
                    baseform: str | None = None,
                    reading: str | None = None) -> bytes:
    """TokenInfoDictionaryEntryWriter.putEntry byte layout for fixtures."""
    flags = 0
    if baseform is not None and baseform != surface:
        flags |= HAS_BASEFORM
    if reading is not None:
        flags |= HAS_READING
    out = bytearray()
    out += struct.pack(">H", (left_id << 3) | flags)
    out += struct.pack(">h", word_cost)
    if flags & HAS_BASEFORM:
        shared = 0
        while (shared < len(surface) and shared < len(baseform)
               and surface[shared] == baseform[shared]):
            shared += 1
        shared = min(shared, 15)
        suffix = baseform[shared:]
        out.append((shared << 4) | len(suffix))
        for ch in suffix:
            out += struct.pack(">H", ord(ch))
    if flags & HAS_READING:
        if all(0x30A0 <= ord(c) <= 0x30FF for c in reading):
            out.append((len(reading) << 1) | 1)
            out += bytes(ord(c) - 0x30A0 for c in reading)
        else:
            out.append(len(reading) << 1)
            for ch in reading:
                out += struct.pack(">H", ord(ch))
    return bytes(out)


# --- top-level loader ------------------------------------------------------


def load_lucene_kuromoji(path: str, default_conn: int = 10000) -> MorphDict:
    """Mount a directory of Lucene kuromoji binary resources (the files
    inside the jar's org/apache/lucene/analysis/ja/dict/) as a MorphDict
    usable with ``japanese_analyze(text, mdict=...)``.

    Expects: TokenInfoDictionary$fst.dat / $targetMap.dat / $posDict.dat
    / $buffer.dat, UnknownDictionary$buffer.dat / $posDict.dat /
    $targetMap.dat, ConnectionCosts.dat, CharacterDefinition.dat."""
    def p(name: str) -> str:
        f = os.path.join(path, name)
        if not os.path.exists(f):
            raise FileNotFoundError(
                f"kuromoji binary dir {path!r} is missing {name}")
        return f

    fst = read_fst(_read_dat(p("TokenInfoDictionary$fst.dat")))
    tmap = read_target_map(
        _read_dat(p("TokenInfoDictionary$targetMap.dat")),
        "kuromoji_dict_map")
    pos_dict = read_pos_dict(
        _read_dat(p("TokenInfoDictionary$posDict.dat")), "kuromoji_dict_pos")
    buf = read_buffer(
        _read_dat(p("TokenInfoDictionary$buffer.dat")), "kuromoji_dict")
    conn = read_conn_costs(_read_dat(p("ConnectionCosts.dat")), "kuromoji_cc")
    cat_map, class_flags = read_char_def(
        _read_dat(p("CharacterDefinition.dat")), "kuromoji_cd",
        len(JA_CHARACTER_CLASSES))

    entries: list[DictEntry] = []
    for labels, ord_ in fst_enumerate(fst):
        surface = "".join(chr(c) for c in labels)
        for wid in tmap[ord_]:
            (left, pos, _it, _if, cost, base, reading) = decode_ja_entry(
                buf, wid, pos_dict)
            attrs: dict = {"pos": pos}
            if base is not None:
                shared, suffix = base
                bform = surface[:shared] + suffix
                if bform != surface:
                    attrs["base"] = bform
            if reading is not None and reading != surface:
                attrs["reading"] = reading
            entries.append(DictEntry(surface, left, left, cost, attrs))

    # unknown dictionary: targetMap[class ordinal] → template wordIds
    unk_tmap = read_target_map(
        _read_dat(p("UnknownDictionary$targetMap.dat")), "kuromoji_dict_map")
    unk_pos = read_pos_dict(
        _read_dat(p("UnknownDictionary$posDict.dat")), "kuromoji_dict_pos")
    unk_buf = read_buffer(
        _read_dat(p("UnknownDictionary$buffer.dat")), "kuromoji_dict")
    classes = []
    for ci, name in enumerate(JA_CHARACTER_CLASSES):
        invoke, group = class_flags[ci]
        rows = []
        if ci < len(unk_tmap):
            for wid in unk_tmap[ci]:
                (left, pos, _it, _if, cost, _b, _r) = decode_ja_entry(
                    unk_buf, wid, unk_pos)
                rows.append((left, left, cost, pos))
        if not rows:
            rows = [(0, 0, 32000, name)]
        left, right, cost, pos = rows[0]
        # the binary format drops MeCab's per-class LENGTH: kuromoji's own
        # runtime groups runs (1024 cap) or emits 1-char candidates
        classes.append(CharClass(
            name, invoke, group, 1024 if group else 1,
            left, right, cost, pos, templates=tuple(rows),
        ))

    def classify(ch: str) -> str:
        o = ord(ch)
        if o > 0xFFFF:
            return "DEFAULT"
        return JA_CHARACTER_CLASSES[cat_map[o]]

    return MorphDict(entries, conn, classes, classify,
                     default_conn=default_conn)


# --- nori (ko) -------------------------------------------------------------

# ko/POS.java Tag enum declaration order == the posDict byte ordinals
# (POS.resolveTag(byte) indexes Tag.values())
KO_POS_TAGS = (
    "EP", "EF", "EC", "ETN", "ETM", "IC", "JKS", "JKC", "JKG", "JKO",
    "JKB", "JKV", "JKQ", "JX", "JC", "MAG", "MAJ", "MM", "NNG", "NNP",
    "NNB", "NNBC", "NP", "NR", "SF", "SH", "SL", "SN", "SP", "SSC",
    "SSO", "SC", "SY", "SE", "VA", "VCN", "VCP", "VV", "VX", "XPN",
    "XR", "XSA", "XSN", "XSV", "UNKNOWN", "UNA", "NA", "VSV",
)

# ko/dict/CharacterDefinition.java CharacterClass enum order
KO_CHARACTER_CLASSES = (
    "NGRAM", "DEFAULT", "SPACE", "SYMBOL", "NUMERIC", "ALPHA",
    "CYRILLIC", "GREEK", "HIRAGANA", "KATAKANA", "KANJI", "HANGUL",
    "HANJA", "HANJANUMERIC",
)

KO_HAS_SINGLE_POS = 1
KO_HAS_READING = 2

_KO_TYPE_MORPHEME = 0
_KO_TYPE_COMPOUND = 1
_KO_TYPE_INFLECT = 2
_KO_TYPE_PREANALYSIS = 3


def read_ko_pos_dict(data: bytes, version: int = 1):
    """ko posDict: VInt count then one POS.Tag ORDINAL byte per leftId
    (ko/dict/TokenInfoMorphData.java:44-48)."""
    din = _Din(data)
    check_header(din, "ko_dict_pos", version, version)
    n = din.read_vint()
    return [KO_POS_TAGS[din.read_byte()] for _ in range(n)]


def write_ko_pos_dict(tags, version: int = 1) -> bytes:
    out = bytearray()
    write_header(out, "ko_dict_pos", version)
    _write_vint(out, len(tags))
    for t in tags:
        out.append(KO_POS_TAGS.index(t))
    return bytes(out)


def decode_ko_entry(buf: bytes, word_id: int, pos_tags, surface: str):
    """(left_id, right_id, word_cost, pos_tag, reading, segmentation)
    for the ko entry at byte offset ``word_id``
    (ko/dict/TokenInfoMorphData.java getters). ``segmentation`` is the
    decompound tuple ((form, {"pos": tag}), ...) or None for plain
    morphemes — the shape ko.py's DictEntry already consumes."""
    s0 = struct.unpack_from(">H", buf, word_id)[0]
    left_id = s0 >> 2
    pos_type = s0 & 3
    s1 = struct.unpack_from(">H", buf, word_id + 2)[0]
    right_id = s1 >> 2
    has_single_pos = bool(s1 & KO_HAS_SINGLE_POS)
    has_reading = bool(s1 & KO_HAS_READING)
    word_cost = struct.unpack_from(">h", buf, word_id + 4)[0]
    pos_tag = pos_tags[left_id]
    off = word_id + 6
    reading = None
    segmentation = None
    if pos_type == _KO_TYPE_MORPHEME:
        if has_reading:
            n = buf[off]
            chars = struct.unpack_from(f">{n}H", buf, off + 1)
            reading = "".join(chr(c) for c in chars)
    else:
        if not has_single_pos:
            off += 1  # rightPOS byte (surfaced via per-morpheme tags)
        n_morph = buf[off]
        off += 1
        if n_morph:
            parts = []
            surface_off = 0
            for _ in range(n_morph):
                tag = pos_tag if has_single_pos else KO_POS_TAGS[buf[off]]
                if not has_single_pos:
                    off += 1
                if pos_type == _KO_TYPE_INFLECT:
                    ln = buf[off]
                    chars = struct.unpack_from(f">{ln}H", buf, off + 1)
                    form = "".join(chr(c) for c in chars)
                    off += ln * 2 + 1
                else:
                    ln = buf[off]
                    off += 1
                    form = surface[surface_off: surface_off + ln]
                    surface_off += ln
                parts.append((form, {"pos": tag}))
            segmentation = tuple(parts)
    return (left_id, right_id, word_cost, pos_tag, reading, segmentation)


def encode_ko_entry(left_id: int, right_id: int, word_cost: int,
                    pos_type: int = 0, reading: str | None = None,
                    morphemes=None, single_pos: bool = True) -> bytes:
    """ko TokenInfoDictionaryEntryWriter byte layout for fixtures.
    ``morphemes``: [(form, tag)] for COMPOUND (forms are surface slices,
    lengths stored) or INFLECT (forms stored inline)."""
    flags = (KO_HAS_SINGLE_POS if single_pos else 0) | (
        KO_HAS_READING if reading is not None else 0)
    out = bytearray()
    out += struct.pack(">H", (left_id << 2) | pos_type)
    out += struct.pack(">H", (right_id << 2) | flags)
    out += struct.pack(">h", word_cost)
    if pos_type == _KO_TYPE_MORPHEME:
        if reading is not None:
            out.append(len(reading))
            for ch in reading:
                out += struct.pack(">H", ord(ch))
        return bytes(out)
    if not single_pos:
        out.append(KO_POS_TAGS.index(morphemes[0][1]))  # rightPOS
    out.append(len(morphemes or ()))
    for (form, tag) in morphemes or ():
        if not single_pos:
            out.append(KO_POS_TAGS.index(tag))
        if pos_type == _KO_TYPE_INFLECT:
            out.append(len(form))
            for ch in form:
                out += struct.pack(">H", ord(ch))
        else:
            out.append(len(form))
    return bytes(out)


def load_lucene_nori(path: str, default_conn: int = 10000) -> MorphDict:
    """Mount a directory of Lucene nori binary resources (the files in
    the jar's org/apache/lucene/analysis/ko/dict/) as a MorphDict for
    ``korean_analyze(text, mdict=...)``."""
    def p(name: str) -> str:
        f = os.path.join(path, name)
        if not os.path.exists(f):
            raise FileNotFoundError(
                f"nori binary dir {path!r} is missing {name}")
        return f

    fst = read_fst(_read_dat(p("TokenInfoDictionary$fst.dat")))
    tmap = read_target_map(
        _read_dat(p("TokenInfoDictionary$targetMap.dat")), "ko_dict_map")
    pos_tags = read_ko_pos_dict(
        _read_dat(p("TokenInfoDictionary$posDict.dat")))
    buf = read_buffer(
        _read_dat(p("TokenInfoDictionary$buffer.dat")), "ko_dict")
    conn = read_conn_costs(_read_dat(p("ConnectionCosts.dat")), "ko_cc")
    cat_map, class_flags = read_char_def(
        _read_dat(p("CharacterDefinition.dat")), "ko_cd",
        len(KO_CHARACTER_CLASSES))

    entries: list[DictEntry] = []
    for labels, ord_ in fst_enumerate(fst):
        surface = "".join(chr(c) for c in labels)
        for wid in tmap[ord_]:
            (left, right, cost, pos, reading, seg) = decode_ko_entry(
                buf, wid, pos_tags, surface)
            attrs: dict = {"pos": pos}
            if reading is not None and reading != surface:
                attrs["reading"] = reading
            entries.append(
                DictEntry(surface, left, right, cost, attrs, seg))

    unk_tmap = read_target_map(
        _read_dat(p("UnknownDictionary$targetMap.dat")), "ko_dict_map")
    unk_pos = read_ko_pos_dict(
        _read_dat(p("UnknownDictionary$posDict.dat")))
    unk_buf = read_buffer(
        _read_dat(p("UnknownDictionary$buffer.dat")), "ko_dict")
    classes = []
    for ci, name in enumerate(KO_CHARACTER_CLASSES):
        invoke, group = class_flags[ci]
        rows = []
        if ci < len(unk_tmap):
            for wid in unk_tmap[ci]:
                (left, right, cost, pos, _r, _s) = decode_ko_entry(
                    unk_buf, wid, unk_pos, "")
                rows.append((left, right, cost, pos))
        if not rows:
            rows = [(0, 0, 32000, "UNKNOWN")]
        left, right, cost, pos = rows[0]
        classes.append(CharClass(
            name, invoke, group, 1024 if group else 1,
            left, right, cost, pos, templates=tuple(rows),
        ))

    def classify(ch: str) -> str:
        o = ord(ch)
        if o > 0xFFFF:
            return "DEFAULT"
        return KO_CHARACTER_CLASSES[cat_map[o]]

    return MorphDict(entries, conn, classes, classify,
                     default_conn=default_conn)


# --- smartcn .mem (Java serialization) -------------------------------------

_JS_MAGIC = 0xACED
_TC_NULL = 0x70
_TC_REFERENCE = 0x71
_TC_CLASSDESC = 0x72
_TC_ARRAY = 0x75
_TC_ENDBLOCKDATA = 0x78
_JS_BASE_HANDLE = 0x7E0000

_PRIM_ARRAY_FMT = {
    "S": "h", "C": "H", "I": "i", "J": "q",
    "B": "b", "Z": "?", "F": "f", "D": "d",
}


def read_java_serialized(data: bytes) -> list:
    """Subset Java Object Serialization reader for the array-only
    streams smartcn's compiled dictionaries use (the format is the
    public Java Object Serialization Stream Protocol; the smartcn
    readers are hhmm/WordDictionary.java:151-160 — short[], char[],
    char[][][], int[][] — and hhmm/BigramDictionary.java:91-98 —
    long[], int[]). Supports TC_ARRAY / TC_CLASSDESC / TC_REFERENCE /
    TC_NULL with primitive and nested arrays; returns the top-level
    objects in stream order. char[] decodes to str."""
    din = _Din(data)

    def u2() -> int:
        return (din.read_byte() << 8) | din.read_byte()

    def u4() -> int:
        v = 0
        for _ in range(4):
            v = (v << 8) | din.read_byte()
        return v

    if u2() != _JS_MAGIC or u2() != 0x0005:
        raise ValueError("not a Java serialization stream")
    handles: list = []

    def read_class_desc():
        tc = din.read_byte()
        if tc == _TC_REFERENCE:
            return handles[u4() - _JS_BASE_HANDLE]
        if tc == _TC_NULL:
            return None
        if tc != _TC_CLASSDESC:
            raise ValueError(f"unsupported classDesc tag {tc:#x}")
        name_len = u2()
        name = din.read_bytes(name_len).decode("utf-8")
        din.read_bytes(8)  # serialVersionUID
        desc = {"name": name}
        handles.append(desc)
        din.read_byte()  # flags (SC_SERIALIZABLE)
        n_fields = u2()
        if n_fields != 0:
            raise ValueError("only array classDescs supported")
        if din.read_byte() != _TC_ENDBLOCKDATA:
            raise ValueError("expected classAnnotation end")
        desc["super"] = read_class_desc()
        return desc

    def read_content():
        tc = din.read_byte()
        if tc == _TC_NULL:
            return None
        if tc == _TC_REFERENCE:
            return handles[u4() - _JS_BASE_HANDLE]
        if tc != _TC_ARRAY:
            raise ValueError(f"unsupported content tag {tc:#x}")
        desc = read_class_desc()
        name = desc["name"]
        if not name.startswith("["):
            raise ValueError(f"not an array class: {name!r}")
        size = u4()
        elem = name[1]
        if elem == "[":  # array of arrays
            arr: list = []
            handles.append(arr)
            for _ in range(size):
                arr.append(read_content())
            return arr
        if elem in _PRIM_ARRAY_FMT:
            code = _PRIM_ARRAY_FMT[elem]
            width = struct.calcsize(">" + code)
            raw = din.read_bytes(size * width)
            arr = list(struct.unpack(f">{size}{code}", raw))
            if elem == "C":
                arr = "".join(chr(c) for c in arr)  # char[] as str
            handles.append(arr)
            return arr
        raise ValueError(f"unsupported element type {elem!r}")

    out = []
    while din.pos < len(data):
        out.append(read_content())
    return out


def load_smartcn_coredict_mem(path: str) -> dict[str, int]:
    """The packaged ``coredict.mem`` → {word: frequency}, the shape
    ``smart_chinese_analyze(dicts=(words, bigrams))`` consumes.

    Layout (WordDictionary.java): charIndexTable[slot] holds a word's
    FIRST char at its double-hash slot (NUL = empty slot);
    wordIndexTable[slot] is the row into wordItem_charArrayTable /
    wordItem_frequencyTable, whose entries are the word SUFFIXES (word
    minus first char, empty = the single-char word) with parallel
    frequencies — so word = first char + suffix."""
    with open(path, "rb") as fh:
        objs = read_java_serialized(fh.read())
    word_index, char_index, char_tables, freq_tables = objs[:4]
    words: dict[str, int] = {}
    for slot, first in enumerate(char_index):
        if ord(first) == 0:
            continue
        row = word_index[slot]
        if row < 0 or row >= len(char_tables):
            continue
        suffixes = char_tables[row]
        freqs = freq_tables[row]
        if suffixes is None or freqs is None:
            continue
        for j, suffix in enumerate(suffixes):
            if suffix is None:
                continue
            words[first + suffix] = freqs[j]
    return words


def _j64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def _jmod(a: int, b: int) -> int:
    # Java % keeps the dividend's sign
    r = abs(a) % b
    return -r if a < 0 else r


def _fnv1_64(s: str) -> int:
    """AbstractDictionary.hash1(char[]): 64-bit FNV over the chars'
    low/high bytes, Java long wraparound, NO final avalanche
    (AbstractDictionary.java:143-158)."""
    p = 1099511628211
    h = 0xCBF29CE484222325
    for ch in s:
        o = ord(ch)
        h = ((h ^ (o & 0xFF)) * p) & ((1 << 64) - 1)
        h = ((h ^ (o >> 8)) * p) & ((1 << 64) - 1)
    return _j64(h)


def _djb2_quirk(s: str) -> int:
    """AbstractDictionary.hash2(char[]) (:188-199) — REPRODUCING the
    Java operator precedence exactly: '... + d & 0x00FF' masks the
    WHOLE sum, '... + d >> 8' shifts the WHOLE sum."""
    h = 5381
    for ch in s:
        o = ord(ch)
        h = (h * 33 + (o & 0xFFFF)) & 0xFF          # (+ d) & 0x00FF
        h = (h * 33 + (o & 0xFFFF)) >> 8            # (+ d) >> 8
    return h


_PRIME_BIGRAM_LENGTH = 402137


class SmartcnBigramMem:
    """``bigramdict.mem`` adapter with the dict-like ``.get`` the HHMM
    segmenter uses. The file stores only the 64-bit FNV hash of each
    bigram (BigramDictionary.java:94-95), so bigram STRINGS cannot be
    enumerated — lookups replay the double-hash open-addressing probe
    (getBigramItemIndex, BigramDictionary.java:227-247)."""

    def __init__(self, hash_table: list[int], freq_table: list[int]):
        self.hash_table = hash_table
        self.freq_table = freq_table

    def get(self, key: str, default=None):
        hash_id = _fnv1_64(key)
        h1 = _jmod(hash_id, _PRIME_BIGRAM_LENGTH)
        h2 = _jmod(_djb2_quirk(key), _PRIME_BIGRAM_LENGTH)
        if h1 < 0:
            h1 += _PRIME_BIGRAM_LENGTH
        if h2 < 0:
            h2 += _PRIME_BIGRAM_LENGTH
        index = h1
        i = 1
        while (self.hash_table[index] != 0
               and self.hash_table[index] != hash_id
               and i < _PRIME_BIGRAM_LENGTH):
            index = (h1 + i * h2) % _PRIME_BIGRAM_LENGTH
            i += 1
        if i < _PRIME_BIGRAM_LENGTH and self.hash_table[index] == hash_id:
            f = self.freq_table[index]
            return f if f != 0 else default
        return default


def load_smartcn_bigram_mem(path: str) -> SmartcnBigramMem:
    with open(path, "rb") as fh:
        objs = read_java_serialized(fh.read())
    return SmartcnBigramMem(objs[0], objs[1])


def write_java_serialized_arrays(objs: list) -> bytes:
    """Fixture twin of the subset reader: serializes strings (char[]),
    ('S'|'C'|'I'|'J', values) tuples (primitive arrays), nested lists
    (object arrays) and None, with stream-order handle assignment."""
    out = bytearray()
    out.extend(struct.pack(">HH", _JS_MAGIC, 0x0005))
    handles: dict = {}

    def write_class_desc(name: str):
        if name in handles:
            out.append(_TC_REFERENCE)
            out.extend(struct.pack(">i", handles[name]))
            return
        out.append(_TC_CLASSDESC)
        enc = name.encode("utf-8")
        out.extend(struct.pack(">H", len(enc)))
        out.extend(enc)
        out.extend(bytes(8))  # serialVersionUID (reader skips it)
        handles[name] = _JS_BASE_HANDLE + len(handles)
        out.append(0x02)  # SC_SERIALIZABLE
        out.extend(struct.pack(">H", 0))
        out.append(_TC_ENDBLOCKDATA)
        out.append(_TC_NULL)

    def type_of(obj) -> str:
        if isinstance(obj, str):
            return "[C"
        if isinstance(obj, tuple):
            return "[" + obj[0]
        inner = next((e for e in obj if e is not None), None)
        if inner is None:
            raise ValueError("cannot type an all-null array")
        return "[" + type_of(inner)

    def write_content(obj):
        if obj is None:
            out.append(_TC_NULL)
            return
        name = type_of(obj)
        out.append(_TC_ARRAY)
        write_class_desc(name)
        handles[id(obj)] = _JS_BASE_HANDLE + len(handles)
        if isinstance(obj, str):
            out.extend(struct.pack(">i", len(obj)))
            for ch in obj:
                out.extend(struct.pack(">H", ord(ch)))
            return
        if isinstance(obj, tuple):
            kind, vals = obj
            code = _PRIM_ARRAY_FMT[kind]
            out.extend(struct.pack(">i", len(vals)))
            for v in vals:
                out.extend(struct.pack(">" + code, v))
            return
        out.extend(struct.pack(">i", len(obj)))
        for e in obj:
            write_content(e)

    for o in objs:
        write_content(o)
    return bytes(out)
