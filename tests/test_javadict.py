"""Lucene packaged-binary dictionary readers (analysis/javadict.py).

Byte fixtures are produced by this repo's write_* twins of the public
formats (CodecUtil header, BinaryDictionaryWriter targetMap deltas,
ConnectionCosts zig-zag stream, TokenInfoDictionaryEntryWriter buffer
layout, FST linear arcs) — and, for the FST fixed-length-arc node
encodings the linear writer never emits (ARCS_FOR_BINARY_SEARCH /
ARCS_FOR_DIRECT_ADDRESSING / ARCS_FOR_CONTINUOUS), by hand-laid byte
constructions following FST.java readFirstArcInfo/readNextRealArc.
An opt-in smoke loads a real extracted kuromoji jar resource dir via
$KUROMOJI_DICT_DIR.
"""

import os
import struct

import pytest

from lucene_spark.analysis.javadict import (
    _Din,
    _Rev,
    FstMeta,
    JA_CHARACTER_CLASSES,
    check_header,
    decode_ja_entry,
    encode_ja_entry,
    fst_enumerate,
    load_lucene_kuromoji,
    read_buffer,
    read_char_def,
    read_conn_costs,
    read_fst,
    read_pos_dict,
    read_target_map,
    write_buffer,
    write_char_def,
    write_conn_costs,
    write_fst_linear,
    write_header,
    write_pos_dict,
    write_target_map,
)


def test_codec_header_roundtrip():
    out = bytearray()
    write_header(out, "kuromoji_dict", 1)
    din = _Din(bytes(out))
    assert check_header(din, "kuromoji_dict", 1, 1) == 1
    with pytest.raises(ValueError, match="codec mismatch"):
        check_header(_Din(bytes(out)), "nori_dict", 1, 1)
    bad = bytes(out[:3] + b"\x00" + out[4:])
    with pytest.raises(ValueError, match="header mismatch"):
        check_header(_Din(bad), "kuromoji_dict", 1, 1)


def test_target_map_roundtrip():
    mappings = [(4,), (8, 12, 20), (24,), (28, 36)]
    data = write_target_map(mappings, "kuromoji_dict_map")
    assert read_target_map(data, "kuromoji_dict_map") == mappings


def test_pos_dict_roundtrip():
    rows = [
        ("名詞-一般", None, None),
        ("動詞-自立", "五段・マ行", "基本形"),
    ]
    data = write_pos_dict(rows, "kuromoji_dict_pos")
    assert read_pos_dict(data, "kuromoji_dict_pos") == rows


def test_conn_costs_roundtrip():
    fwd, bwd = 4, 3
    matrix = {(f, b): (f * 31 + b * 7 - 40) for f in range(fwd)
              for b in range(bwd)}
    data = write_conn_costs(fwd, bwd, lambda f, b: matrix[(f, b)],
                            "kuromoji_cc")
    conn = read_conn_costs(data, "kuromoji_cc")
    for (f, b), c in matrix.items():
        # MorphDict keying: get((prev.right_id==forward, next.left_id==backward))
        assert conn.get((f, b)) == c
    assert conn.get((99, 0), 10000) == 10000


def test_char_def_roundtrip():
    cat = bytearray(0x10000)
    for cp in range(0x30A1, 0x30FD):
        cat[cp] = JA_CHARACTER_CLASSES.index("KATAKANA")
    for cp in range(ord("a"), ord("z") + 1):
        cat[cp] = JA_CHARACTER_CLASSES.index("ALPHA")
    flags = [(False, True)] * len(JA_CHARACTER_CLASSES)
    flags[JA_CHARACTER_CLASSES.index("KATAKANA")] = (True, True)
    flags[JA_CHARACTER_CLASSES.index("KANJI")] = (False, False)
    data = write_char_def(bytes(cat), flags, "kuromoji_cd")
    cat2, flags2 = read_char_def(data, "kuromoji_cd",
                                 len(JA_CHARACTER_CLASSES))
    assert cat2 == bytes(cat)
    assert flags2 == flags


def test_ja_buffer_entry_roundtrip():
    entry = encode_ja_entry("住ん", left_id=3, word_cost=4500,
                            baseform="住む", reading="スン")
    buf = read_buffer(write_buffer(entry, "kuromoji_dict"), "kuromoji_dict")
    pos_dict = [("x", None, None)] * 3 + [("動詞-自立", "五段・マ行", "基本形")]
    (left, pos, infl_t, infl_f, cost, base, reading) = decode_ja_entry(
        buf, 0, pos_dict)
    assert (left, cost) == (3, 4500)
    assert pos == "動詞-自立" and infl_t == "五段・マ行"
    assert base == (1, "む")       # shared prefix 住 + suffix む
    assert reading == "スン"       # katakana-packed path


def test_ja_buffer_non_katakana_reading():
    entry = encode_ja_entry("何か", left_id=1, word_cost=100,
                            reading="nanika")  # forces UTF-16 branch
    buf = read_buffer(write_buffer(entry, "kuromoji_dict"), "kuromoji_dict")
    out = decode_ja_entry(buf, 0, [None, ("名詞-一般", None, None)])
    assert out[6] == "nanika"


# --- FST -------------------------------------------------------------------


def test_fst_linear_roundtrip():
    entries = [("京都", 1), ("東京", 2), ("東京都", 3), ("都", 4)]
    entries.sort()
    data = write_fst_linear(entries)
    meta = read_fst(data)
    got = sorted(
        ("".join(chr(c) for c in labels), out)
        for labels, out in fst_enumerate(meta)
    )
    assert got == sorted(entries)


def test_fst_linear_ascii_and_sharing():
    entries = sorted([("cat", 7), ("car", 9), ("dog", 11), ("do", 13)])
    meta = read_fst(write_fst_linear(entries))
    got = sorted(
        ("".join(chr(c) for c in labels), out)
        for labels, out in fst_enumerate(meta)
    )
    assert got == entries


def _vint(v):
    out = bytearray()
    while v & ~0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _mk_meta(buf, start):
    m = FstMeta()
    m.version = 9
    m.input_type = 1  # BYTE2
    m.empty_output = None
    m.start_node = start
    m.num_bytes = len(buf)
    m.fst_bytes = bytes(buf)
    return m


def _append_node(buf, stream):
    """Append a forward-serialized node stream reversed; return address."""
    buf.extend(reversed(stream))
    return len(buf) - 1


def _leaf_arc(label, output, *, last):
    # FINAL + STOP_NODE + HAS_OUTPUT (+ LAST)
    flags = 0x01 | 0x08 | 0x10 | (0x02 if last else 0)
    s = bytearray([flags])
    s += struct.pack("<H", label)
    s += _vint(output)
    return s


def test_fst_binary_search_node():
    """Hand-built ARCS_FOR_BINARY_SEARCH node (FST.java:907-914): header
    [0x20][numArcs][bytesPerArc], then fixed slots with explicit labels."""
    buf = bytearray([0])
    arc_a = _leaf_arc(ord("a"), 5, last=False)
    arc_b = _leaf_arc(ord("b"), 9, last=True)
    bpa = max(len(arc_a), len(arc_b))
    stream = bytearray([0x20]) + _vint(2) + _vint(bpa)
    stream += arc_a.ljust(bpa, b"\0")
    stream += arc_b.ljust(bpa, b"\0")
    start = _append_node(buf, stream)
    got = sorted(fst_enumerate(_mk_meta(buf, start)))
    assert got == [((ord("a"),), 5), ((ord("b"),), 9)]


def test_fst_direct_addressing_node():
    """Hand-built ARCS_FOR_DIRECT_ADDRESSING node (FST.java:916-920,
    readPresenceBytes): labels {a, c} over range a..c — presence bits
    101, arc slots only for present labels."""
    buf = bytearray([0])
    arc_a = _leaf_arc(ord("a"), 5, last=False)
    arc_c = _leaf_arc(ord("c"), 9, last=True)
    # labels are implicit (firstLabel + rangeIndex) — strip the label bytes
    def strip_label(arc):
        return bytes([arc[0]]) + bytes(arc[3:])
    sa, sc = strip_label(arc_a), strip_label(arc_c)
    bpa = max(len(sa), len(sc))
    num_arcs = 3  # label RANGE (a..c)
    stream = bytearray([0x40]) + _vint(num_arcs) + _vint(bpa)
    stream.append(0b101)  # presence bits for range indexes 0,2
    stream += struct.pack("<H", ord("a"))  # firstLabel (BYTE2)
    stream += sa.ljust(bpa, b"\0")
    stream += sc.ljust(bpa, b"\0")
    start = _append_node(buf, stream)
    got = sorted(fst_enumerate(_mk_meta(buf, start)))
    assert got == [((ord("a"),), 5), ((ord("c"),), 9)]


def test_fst_continuous_node():
    """Hand-built ARCS_FOR_CONTINUOUS node (FST.java:908,735-736):
    consecutive labels, no presence table, implicit label per index."""
    buf = bytearray([0])
    def strip_label(arc):
        return bytes([arc[0]]) + bytes(arc[3:])
    sa = strip_label(_leaf_arc(ord("a"), 5, last=False))
    sb = strip_label(_leaf_arc(ord("b"), 7, last=False))
    sc = strip_label(_leaf_arc(ord("c"), 9, last=True))
    bpa = max(map(len, (sa, sb, sc)))
    stream = bytearray([0x60]) + _vint(3) + _vint(bpa)
    stream += struct.pack("<H", ord("a"))
    for s in (sa, sb, sc):
        stream += s.ljust(bpa, b"\0")
    start = _append_node(buf, stream)
    got = sorted(fst_enumerate(_mk_meta(buf, start)))
    assert got == [((ord("a"),), 5), ((ord("b"),), 7), ((ord("c"),), 9)]


def test_fst_target_next_linear():
    """BIT_TARGET_NEXT (FST.java:962-978): the target node sits right
    past this node's arc block; the reader resolves it by seeking."""
    buf = bytearray([0])
    # child node first: leaf 'y' final output 3
    child_stream = _leaf_arc(ord("y"), 3, last=True)
    child = _append_node(buf, child_stream)
    # parent: single arc 'x' with TARGET_NEXT (child is just below)
    flags = 0x02 | 0x04  # LAST + TARGET_NEXT
    s = bytearray([flags])
    s += struct.pack("<H", ord("x"))
    parent = _append_node(buf, s)
    assert parent - len(s) == child  # layout invariant the flag relies on
    got = sorted(fst_enumerate(_mk_meta(buf, parent)))
    assert got == [((ord("x"), ord("y")), 3)]


# --- end-to-end fixture dir ------------------------------------------------


def _build_fixture_dir(tmp_path) -> str:
    """A tiny kuromoji binary dir: 東京/京都/東京都/に + unknowns."""
    d = tmp_path / "kuromoji_bin"
    d.mkdir()
    # buffer entries; wordId = byte offset
    entries = [
        ("に", 2, 500, None, "ニ"),
        ("京都", 1, 3000, None, None),
        ("東京", 1, 3000, None, None),
        ("東京都", 1, 2500, None, None),
    ]
    buf = bytearray()
    wids = {}
    for (surf, left, cost, base, reading) in entries:
        wids[surf] = len(buf)
        buf += encode_ja_entry(surf, left_id=left, word_cost=cost,
                               baseform=base, reading=reading)
    (d / "TokenInfoDictionary$buffer.dat").write_bytes(
        write_buffer(bytes(buf), "kuromoji_dict"))
    # FST: surface -> ord (1-based, sorted); targetMap: ord -> wordIds
    surfaces = sorted(wids)
    fst_entries = [(s, i + 1) for i, s in enumerate(surfaces)]
    (d / "TokenInfoDictionary$fst.dat").write_bytes(
        write_fst_linear(fst_entries))
    # ord 0 is never emitted by the 1-based FST outputs; its dummy row
    # keeps sourceId == ord alignment
    (d / "TokenInfoDictionary$targetMap.dat").write_bytes(
        write_target_map(
            [(0,)] + [(wids[s],) for s in surfaces],
            "kuromoji_dict_map"))
    pos_rows = [("BOS", None, None), ("名詞-固有名詞", None, None),
                ("助詞-格助詞", None, None)]
    (d / "TokenInfoDictionary$posDict.dat").write_bytes(
        write_pos_dict(pos_rows, "kuromoji_dict_pos"))
    # connection costs: 4x4, cheap noun chains
    cheap = {(0, 1), (1, 1), (1, 2), (2, 0), (1, 0)}
    (d / "ConnectionCosts.dat").write_bytes(write_conn_costs(
        4, 4, lambda f, b: 0 if (f, b) in cheap else 1000, "kuromoji_cc"))
    # char classes: kanji/hiragana/katakana mapped, defaults group
    cat = bytearray(0x10000)
    for lo, hi, name in ((0x4E00, 0x9FFF, "KANJI"),
                         (0x3041, 0x3096, "HIRAGANA"),
                         (0x30A1, 0x30FC, "KATAKANA"),
                         (0x0061, 0x007A, "ALPHA")):
        ci = JA_CHARACTER_CLASSES.index(name)
        for cp in range(lo, hi + 1):
            cat[cp] = ci
    flags = [(False, True)] * len(JA_CHARACTER_CLASSES)
    flags[JA_CHARACTER_CLASSES.index("KANJI")] = (False, False)
    flags[JA_CHARACTER_CLASSES.index("KATAKANA")] = (True, True)
    flags[JA_CHARACTER_CLASSES.index("ALPHA")] = (True, True)
    (d / "CharacterDefinition.dat").write_bytes(
        write_char_def(bytes(cat), flags, "kuromoji_cd"))
    # unknown dictionary: one template per class, two for KATAKANA
    unk_buf = bytearray()
    unk_maps = []
    unk_pos_rows = [("記号-一般", None, None), ("名詞-一般", None, None)]
    for ci, name in enumerate(JA_CHARACTER_CLASSES):
        rows = [(0, 11000)]
        if name == "KATAKANA":
            rows = [(1, 9000), (0, 9500)]
        ids = []
        for (left, cost) in rows:
            ids.append(len(unk_buf))
            unk_buf += encode_ja_entry("\0", left_id=left, word_cost=cost)
        unk_maps.append(tuple(ids))
    (d / "UnknownDictionary$buffer.dat").write_bytes(
        write_buffer(bytes(unk_buf), "kuromoji_dict"))
    (d / "UnknownDictionary$targetMap.dat").write_bytes(
        write_target_map(unk_maps, "kuromoji_dict_map"))
    (d / "UnknownDictionary$posDict.dat").write_bytes(
        write_pos_dict(unk_pos_rows, "kuromoji_dict_pos"))
    return str(d)


def test_load_fixture_dir_segments(tmp_path):
    from lucene_spark.analysis.lattice import viterbi_segment

    d = load_lucene_kuromoji(_build_fixture_dir(tmp_path))
    # compound 東京都 (2500) beats 東京+都 split; に is a dictionary word
    segs = viterbi_segment("東京都に", d)
    assert [s.surface for s in segs] == ["東京都", "に"]
    assert segs[0].pos == "名詞-固有名詞"
    assert segs[1].pos == "助詞-格助詞"
    # unknown katakana run groups (invoke=1, group=1)
    segs2 = viterbi_segment("グーグル", d)
    assert [s.surface for s in segs2] == ["グーグル"]


def test_load_fixture_dir_japanese_analyze(tmp_path):
    from lucene_spark.analysis.ja import japanese_analyze

    d = load_lucene_kuromoji(_build_fixture_dir(tmp_path))
    toks = japanese_analyze("東京都に", mdict=d)
    # 助詞 is POS-stopped by the default ja stop tags
    assert [t.term for t in toks] == ["東京都"]


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="missing"):
        load_lucene_kuromoji(str(tmp_path))


_REAL = os.environ.get("KUROMOJI_DICT_DIR")


@pytest.mark.skipif(not _REAL, reason="KUROMOJI_DICT_DIR not mounted")
def test_real_kuromoji_binary_dir():
    """Opt-in: point KUROMOJI_DICT_DIR at the extracted
    org/apache/lucene/analysis/ja/dict/ resources of a kuromoji jar."""
    from lucene_spark.analysis.ja import japanese_analyze

    d = load_lucene_kuromoji(_REAL)
    toks = japanese_analyze("東京都に住んだ", mdict=d)
    assert "東京" in [t.term for t in toks] or "東京都" in [
        t.term for t in toks
    ]


# --- nori (ko) binary format ----------------------------------------------

from lucene_spark.analysis.javadict import (  # noqa: E402
    KO_CHARACTER_CLASSES,
    decode_ko_entry,
    encode_ko_entry,
    load_lucene_nori,
    read_ko_pos_dict,
    write_ko_pos_dict,
)


def test_ko_pos_dict_roundtrip():
    tags = ["NNG", "JKB", "VV", "UNKNOWN"]
    assert read_ko_pos_dict(write_ko_pos_dict(tags)) == tags


def test_ko_entry_morpheme_with_reading():
    entry = encode_ko_entry(left_id=1, right_id=1, word_cost=3500,
                            reading="한자")
    (left, right, cost, pos, reading, seg) = decode_ko_entry(
        entry, 0, ["EP", "NNG"], "漢字")
    assert (left, right, cost, pos) == (1, 1, 3500, "NNG")
    assert reading == "한자" and seg is None


def test_ko_entry_compound_decompound():
    # COMPOUND, single POS: forms are surface slices (lengths stored)
    entry = encode_ko_entry(left_id=1, right_id=1, word_cost=2500,
                            pos_type=1,
                            morphemes=[("국제", "NNG"), ("공항", "NNG")])
    (_l, _r, cost, pos, _rd, seg) = decode_ko_entry(
        entry, 0, ["EP", "NNG"], "국제공항")
    assert cost == 2500 and pos == "NNG"
    assert seg == (("국제", {"pos": "NNG"}), ("공항", {"pos": "NNG"}))


def test_ko_entry_inflect_multi_pos():
    # INFLECT, per-morpheme POS: forms stored inline
    entry = encode_ko_entry(left_id=37, right_id=0, word_cost=100,
                            pos_type=2, single_pos=False,
                            morphemes=[("가", "VV"), ("아", "EC")])
    (_l, _r, _c, pos, _rd, seg) = decode_ko_entry(
        entry, 0, ["EC"] + ["x"] * 36 + ["VV"], "가")
    assert pos == "VV"
    assert seg == (("가", {"pos": "VV"}), ("아", {"pos": "EC"}))


def _build_ko_fixture_dir(tmp_path) -> str:
    from lucene_spark.analysis.javadict import (
        write_buffer, write_char_def, write_conn_costs, write_fst_linear,
        write_target_map,
    )

    d = tmp_path / "nori_bin"
    d.mkdir()
    pos_tags = ["EP", "NNG", "JKB", "VV"]
    entries = [
        ("에", encode_ko_entry(2, 2, 500)),
        ("가다", encode_ko_entry(3, 3, 4000)),
        ("공항", encode_ko_entry(1, 1, 3000)),
        ("국제", encode_ko_entry(1, 1, 3000)),
        ("국제공항", encode_ko_entry(1, 1, 2500, pos_type=1,
                                  morphemes=[("국제", "NNG"),
                                             ("공항", "NNG")])),
    ]
    # buffer offsets must increase with FST ord (the targetMap deltas
    # are non-negative) — write entries in sorted-surface order
    entries.sort(key=lambda e: e[0])
    buf = bytearray()
    wids = {}
    for (surf, enc) in entries:
        wids[surf] = len(buf)
        buf += enc
    (d / "TokenInfoDictionary$buffer.dat").write_bytes(
        write_buffer(bytes(buf), "ko_dict"))
    surfaces = sorted(wids)
    (d / "TokenInfoDictionary$fst.dat").write_bytes(
        write_fst_linear([(s, i + 1) for i, s in enumerate(surfaces)]))
    (d / "TokenInfoDictionary$targetMap.dat").write_bytes(
        write_target_map([(0,)] + [(wids[s],) for s in surfaces],
                         "ko_dict_map"))
    (d / "TokenInfoDictionary$posDict.dat").write_bytes(
        write_ko_pos_dict(pos_tags))
    cheap = {(0, 1), (1, 1), (1, 2), (2, 3), (3, 0), (1, 0), (2, 1)}
    (d / "ConnectionCosts.dat").write_bytes(write_conn_costs(
        4, 4, lambda f, b: 0 if (f, b) in cheap else 1000, "ko_cc"))
    cat = bytearray(0x10000)
    for lo, hi, name in ((0xAC00, 0xD7A3, "HANGUL"),
                         (0x4E00, 0x9FFF, "HANJA"),
                         (0x0061, 0x007A, "ALPHA")):
        ci = KO_CHARACTER_CLASSES.index(name)
        for cp in range(lo, hi + 1):
            cat[cp] = ci
    flags = [(False, True)] * len(KO_CHARACTER_CLASSES)
    flags[KO_CHARACTER_CLASSES.index("HANJA")] = (False, False)
    flags[KO_CHARACTER_CLASSES.index("ALPHA")] = (True, True)
    (d / "CharacterDefinition.dat").write_bytes(
        write_char_def(bytes(cat), flags, "ko_cd"))
    unk_buf = bytearray()
    unk_maps = []
    for name in KO_CHARACTER_CLASSES:
        unk_maps.append((len(unk_buf),))
        unk_buf += encode_ko_entry(0, 0, 11000)
    (d / "UnknownDictionary$buffer.dat").write_bytes(
        write_buffer(bytes(unk_buf), "ko_dict"))
    (d / "UnknownDictionary$targetMap.dat").write_bytes(
        write_target_map(unk_maps, "ko_dict_map"))
    (d / "UnknownDictionary$posDict.dat").write_bytes(
        write_ko_pos_dict(["UNKNOWN"] * 1))
    return str(d)


def test_load_ko_fixture_dir(tmp_path):
    from lucene_spark.analysis.ko import korean_analyze

    d = load_lucene_nori(_build_ko_fixture_dir(tmp_path))
    # compound wins, DISCARD decompound emits parts, JKB 에 is POS-stopped
    toks = korean_analyze("국제공항에 가다", mdict=d)
    assert [t.term for t in toks] == ["국제", "공항", "가다"]
    toks_m = korean_analyze("국제공항에 가다", mdict=d, decompound="mixed")
    assert [t.term for t in toks_m] == ["국제공항", "국제", "공항", "가다"]


_KO_REAL = os.environ.get("NORI_DICT_DIR")


@pytest.mark.skipif(not _KO_REAL, reason="NORI_DICT_DIR not mounted")
def test_real_nori_binary_dir():
    from lucene_spark.analysis.ko import korean_analyze

    d = load_lucene_nori(_KO_REAL)
    toks = [t.term for t in korean_analyze("한국은 대단한 나라입니다", mdict=d)]
    assert toks


# --- smartcn .mem (Java serialization subset) -----------------------------

from lucene_spark.analysis.javadict import (  # noqa: E402
    SmartcnBigramMem,
    _fnv1_64,
    _djb2_quirk,
    _jmod,
    _PRIME_BIGRAM_LENGTH,
    read_java_serialized,
    write_java_serialized_arrays,
)


def test_java_serialization_roundtrip():
    objs = [
        ("S", [1, -2, 300]),
        "héllo",                       # char[]
        [["ab", None, "c"], None],     # char[][][] with nulls
        [("I", [7, 8]), ("I", [9])],   # int[][]
        ("J", [0, -1, 2**62]),         # long[]
    ]
    got = read_java_serialized(write_java_serialized_arrays(objs))
    assert got[0] == [1, -2, 300]
    assert got[1] == "héllo"
    assert got[2] == [["ab", None, "c"], None]
    assert got[3] == [[7, 8], [9]]
    assert got[4] == [0, -1, 2**62]


def test_java_serialization_rejects_garbage():
    with pytest.raises(ValueError, match="not a Java serialization"):
        read_java_serialized(b"\x00\x01\x02\x03")


def test_bigram_mem_probe_fixture():
    """Build a bigram hash table exactly the way BigramDictionary's
    loader does (double-hash open addressing over the FNV id), then
    verify the probe-on-lookup adapter finds planted keys and misses
    others."""
    table = [0] * _PRIME_BIGRAM_LENGTH
    freq = [0] * _PRIME_BIGRAM_LENGTH
    planted = {"中国@人民": 42, "道具@和": 7, "a@b": 13}
    for key, f in planted.items():
        hash_id = _fnv1_64(key)
        h1 = _jmod(hash_id, _PRIME_BIGRAM_LENGTH)
        h2 = _jmod(_djb2_quirk(key), _PRIME_BIGRAM_LENGTH)
        if h1 < 0:
            h1 += _PRIME_BIGRAM_LENGTH
        if h2 < 0:
            h2 += _PRIME_BIGRAM_LENGTH
        index = h1
        i = 1
        while table[index] != 0:
            index = (h1 + i * h2) % _PRIME_BIGRAM_LENGTH
            i += 1
        table[index] = hash_id
        freq[index] = f
    data = write_java_serialized_arrays([("J", table), ("I", freq)])
    got = read_java_serialized(data)
    bm = SmartcnBigramMem(got[0], got[1])
    for key, f in planted.items():
        assert bm.get(key, 0) == f
    assert bm.get("missing@pair", 0) == 0
    assert bm.get("中国@服装") is None
