"""Parsers for the PUBLIC MeCab dictionary formats.

The ja/ko analyzers (`ja.py` / `ko.py`) run a faithful Viterbi lattice
(`lattice.py`) but ship only small demo lexicons: the bundled
IPADIC / mecab-ko-dic dictionaries are separately-licensed DATA and are
not copied into this repo. This module closes the gap the honest way —
it parses the public MeCab dictionary *formats* so a user can mount a
real dictionary directory at runtime and drive the exact reference
chain with it.

Format references (all public):
- MeCab's documented dictionary format (``*.csv`` entries,
  ``matrix.def`` connection costs, ``char.def`` character categories,
  ``unk.def`` unknown-word templates) — taku910.github.io/mecab/dic.html;
- the reference's own builders for the SAME files:
  analysis/kuromoji/src/java/org/apache/lucene/analysis/ja/dict/
  TokenInfoDictionaryBuilder.java (IPADIC 13-field CSV),
  ConnectionCostsBuilder.java (matrix.def: ``forwardId backwardId cost``,
  looked up as costs.get(leftNode.rightID, rightNode.leftID)),
  CharacterDefinition.java / UnknownDictionaryBuilder.java (char.def +
  unk.def), CsvUtil.java (double-quote escaping);
  analysis/nori/.../ko/dict/TokenInfoDictionaryBuilder.java
  (mecab-ko-dic 12-field CSV with the ``expression`` decompound column).

Unknown-word semantics (lattice.py, both now reference-faithful):
- non-grouped categories emit candidates of EVERY length 1..LENGTH over
  same-class chars (MeCab's LENGTH=n; "KANJI 0 0 2" emits the 2-char
  candidate too);
- EVERY unk.def row per category becomes a lattice template and Viterbi
  picks the cheapest in context (kuromoji UnknownDictionaryBuilder
  keeps all rows; the former first-row-only simplification is closed).

char.def compatible-category lists ("0x3007 SYMBOL KANJI KANJINUMERIC")
keep the primary category only — this MATCHES the reference builder,
which does characterClassName.split(" ")[0] "use first category"
(morph/CharacterDefinitionWriter.java:61). The builder's Nakaguro
override (codepoint 0x30FB forced to SYMBOL regardless of the mapped
category, CharacterDefinitionWriter.java:65-68) is applied when the
dictionary defines a SYMBOL class.

Documented divergence:
- a char.def row with GROUP=0 LENGTH=0 (no unknown candidates at all in
  MeCab) is clamped to LENGTH=1 so the lattice can never dead-end on an
  unmatched character; no real IPADIC/mecab-ko-dic ships such a row.
"""

from __future__ import annotations

import os
from bisect import bisect_right
from typing import Iterable, Sequence

from .lattice import CharClass, DictEntry, MorphDict

__all__ = [
    "split_csv",
    "parse_matrix_def",
    "parse_char_def",
    "parse_unk_def",
    "parse_entries_csv",
    "load_mecab_dict",
]


def split_csv(line: str) -> list[str]:
    """MeCab CSV field split with kuromoji CsvUtil.java quote semantics:
    fields may be wrapped in double quotes (embedded commas stay literal)
    and '""' inside a quoted field is one quote."""
    out: list[str] = []
    buf: list[str] = []
    i, n = 0, len(line)
    in_q = False
    while i < n:
        c = line[i]
        if in_q:
            if c == '"':
                if i + 1 < n and line[i + 1] == '"':
                    buf.append('"')
                    i += 1
                else:
                    in_q = False
            else:
                buf.append(c)
        elif c == '"' and not buf:
            in_q = True
        elif c == ",":
            out.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    out.append("".join(buf))
    return out


def parse_matrix_def(lines: Iterable[str]) -> dict[tuple[int, int], int]:
    """``matrix.def``: header ``forward_size backward_size``, then
    ``forwardId backwardId cost`` rows (ConnectionCostsBuilder.java).
    The tokenizer looks costs up as (previous morpheme's right_id, next
    morpheme's left_id) — exactly MorphDict's ``conn`` keying."""
    conn: dict[tuple[int, int], int] = {}
    header: tuple[int, int] | None = None
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if header is None:
            if len(parts) != 2:
                raise ValueError(f"matrix.def header must be 2 ints: {raw!r}")
            header = (int(parts[0]), int(parts[1]))
            continue
        if len(parts) != 3:
            raise ValueError(f"matrix.def row must be 3 ints: {raw!r}")
        r, l, c = int(parts[0]), int(parts[1]), int(parts[2])  # noqa: E741
        if not (0 <= r < header[0] and 0 <= l < header[1]):
            raise ValueError(f"matrix.def id out of range: {raw!r}")
        conn[(r, l)] = c
    if header is None:
        raise ValueError("matrix.def is empty")
    return conn


def parse_char_def(lines: Iterable[str]):
    """``char.def``: category rows ``NAME INVOKE GROUP LENGTH`` then
    code-point mapping rows ``0xXXXX[..0xYYYY] CATEGORY [compat...]``
    (CharacterDefinition / MeCab dic format docs). Returns
    (categories: name -> (invoke, group, length),
    ranges: sorted [(lo, hi, name)]); DEFAULT is mandatory."""
    categories: dict[str, tuple[bool, bool, int]] = {}
    ranges: list[tuple[int, int, str]] = []
    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        parts = line.split()
        if parts[0].startswith("0x") or parts[0].startswith("0X"):
            cp = parts[0]
            if ".." in cp:
                lo_s, hi_s = cp.split("..", 1)
                lo, hi = int(lo_s, 16), int(hi_s, 16)
            else:
                lo = hi = int(cp, 16)
            if len(parts) < 2:
                raise ValueError(f"char.def mapping without category: {raw!r}")
            ranges.append((lo, hi, parts[1]))  # compat categories dropped
        else:
            if len(parts) != 4:
                raise ValueError(f"char.def category must be 4 fields: {raw!r}")
            categories[parts[0]] = (
                parts[1] == "1", parts[2] == "1", int(parts[3])
            )
    if "DEFAULT" not in categories:
        raise ValueError("char.def must define DEFAULT")
    for _lo, _hi, name in ranges:
        if name not in categories:
            raise ValueError(f"char.def maps to undefined category {name!r}")
    ranges.sort()
    return categories, ranges


def parse_unk_def(lines: Iterable[str]):
    """``unk.def``: per-category unknown-word templates, same CSV shape
    as entry rows but keyed by category name:
    ``CATEGORY,left_id,right_id,cost,POS1,...``. Keeps EVERY row per
    category in file order (kuromoji UnknownDictionaryBuilder puts each
    row in the unknown dictionary and the lattice chooses). Returns
    name -> tuple of (left_id, right_id, cost, pos) rows."""
    out: dict[str, list[tuple[int, int, int, str]]] = {}
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        f = split_csv(line)
        if len(f) < 5:
            raise ValueError(f"unk.def row needs >=5 fields: {raw!r}")
        name = f[0]
        pos = "-".join(p for p in f[4:8] if p and p != "*") or f[4]
        row = (int(f[1]), int(f[2]), int(f[3]), pos)
        rows = out.setdefault(name, [])
        if row not in rows:
            rows.append(row)
    if not out:
        raise ValueError("unk.def is empty")
    return {k: tuple(v) for k, v in out.items()}


def _entry_ipadic(f: Sequence[str]) -> DictEntry:
    # surface,left,right,cost,POS1,POS2,POS3,POS4,conjType,conjForm,
    # baseform,reading,pronunciation (TokenInfoDictionaryBuilder.java)
    if len(f) < 11:
        raise ValueError(f"ipadic entry needs >=11 fields, got {len(f)}")
    surface = f[0]
    attrs: dict = {"pos": "-".join(p for p in f[4:8] if p and p != "*")}
    base = f[10] if len(f) > 10 else "*"
    if base and base != "*" and base != surface:
        attrs["base"] = base
    reading = f[11] if len(f) > 11 else "*"
    if reading and reading != "*":
        attrs["reading"] = reading
    return DictEntry(surface, int(f[1]), int(f[2]), int(f[3]), attrs)


def _entry_ko(f: Sequence[str]) -> DictEntry:
    # surface,left,right,cost,POS,semanticClass,hasJongseong(T/F),reading,
    # type(Compound/Inflect/Preanalysis/*),firstPOS,lastPOS,expression
    # (nori TokenInfoDictionaryBuilder.java; expression =
    #  "surf/POS/sem+surf/POS/sem+...")
    if len(f) < 8:
        raise ValueError(f"mecab-ko entry needs >=8 fields, got {len(f)}")
    surface = f[0]
    attrs: dict = {"pos": f[4]}
    reading = f[7]
    if reading and reading != "*" and reading != surface:
        attrs["reading"] = reading
    segmentation = None
    etype = f[8] if len(f) > 8 else "*"
    expr = f[11] if len(f) > 11 else "*"
    if etype in ("Compound", "Inflect", "Preanalysis") and expr and expr != "*":
        parts = []
        for m in expr.split("+"):
            bits = m.split("/")
            if len(bits) < 2 or not bits[0]:
                raise ValueError(f"bad expression morpheme {m!r} in {surface!r}")
            parts.append((bits[0], {"pos": bits[1]}))
        segmentation = tuple(parts)
    return DictEntry(surface, int(f[1]), int(f[2]), int(f[3]), attrs,
                     segmentation)


def parse_entries_csv(lines: Iterable[str], fmt: str = "ipadic"):
    """Entry CSV rows → DictEntry list. ``fmt``: "ipadic" (13-field
    kuromoji layout) or "ko" (12-field mecab-ko-dic layout)."""
    if fmt not in ("ipadic", "ko"):
        raise ValueError(f"unknown MeCab dictionary format {fmt!r}")
    mk = _entry_ipadic if fmt == "ipadic" else _entry_ko
    out: list[DictEntry] = []
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        out.append(mk(split_csv(line)))
    return out


def _build_classify(ranges: list[tuple[int, int, str]]):
    """Codepoint -> category via bisect over the sorted range table
    (unmapped codepoints are DEFAULT, CharacterDefinition semantics)."""
    los = [lo for (lo, _hi, _n) in ranges]

    def classify(ch: str) -> str:
        o = ord(ch)
        i = bisect_right(los, o) - 1
        if i >= 0:
            lo, hi, name = ranges[i]
            if lo <= o <= hi:
                return name
        return "DEFAULT"

    return classify


def load_mecab_dict(
    path: str,
    fmt: str = "ipadic",
    encoding: str = "utf-8",
    default_conn: int = 10000,
) -> MorphDict:
    """Load a user-mounted MeCab dictionary directory into a MorphDict.

    ``path`` must contain ``matrix.def``, ``char.def``, ``unk.def`` and
    one or more ``*.csv`` entry files (the public source layout of
    IPADIC / mecab-ko-dic). ``encoding`` — upstream IPADIC ships EUC-JP
    ("euc-jp"); mecab-ko-dic ships UTF-8. The result plugs straight into
    ``japanese_analyze(text, mdict=...)`` / ``korean_analyze(text,
    mdict=...)``."""

    def _read(name: str) -> list[str]:
        p = os.path.join(path, name)
        with open(p, encoding=encoding) as fh:
            return fh.readlines()

    for required in ("matrix.def", "char.def", "unk.def"):
        if not os.path.exists(os.path.join(path, required)):
            raise FileNotFoundError(
                f"MeCab dictionary dir {path!r} is missing {required}"
            )
    conn = parse_matrix_def(_read("matrix.def"))
    categories, ranges = parse_char_def(_read("char.def"))
    unk = parse_unk_def(_read("unk.def"))
    if "DEFAULT" not in unk:
        raise ValueError("unk.def must define a DEFAULT template")
    classes = []
    for name, (invoke, group, length) in categories.items():
        rows = unk.get(name, unk["DEFAULT"])
        left, right, cost, pos = rows[0]
        # GROUP=1 groups the maximal same-category run regardless of
        # LENGTH (MeCab: LENGTH adds 1..n-char candidates ON TOP of the
        # group word; kuromoji caps runs at 1024); GROUP=0 emits
        # candidates of every length 1..LENGTH (lattice.py). LENGTH=0
        # with GROUP=0 is clamped to 1 (module docstring: MeCab would
        # emit nothing; clamping keeps the lattice from dead-ending and
        # no real dictionary ships such a row). Every unk.def row rides
        # along as a template; the lattice picks per context.
        classes.append(CharClass(
            name, invoke, group, 1024 if group else max(length, 1),
            left, right, cost, pos, templates=rows,
        ))
    entries: list[DictEntry] = []
    csvs = sorted(
        f for f in os.listdir(path) if f.endswith(".csv")
    )
    if not csvs:
        raise FileNotFoundError(f"no *.csv entry files in {path!r}")
    for f in csvs:
        entries.extend(parse_entries_csv(_read(f), fmt=fmt))
    base_classify = _build_classify(ranges)
    if "SYMBOL" in categories:
        # Nakaguro override: the reference builder forces 0x30FB to
        # SYMBOL whatever char.def maps it to
        # (morph/CharacterDefinitionWriter.java:65-68)
        def classify(ch: str) -> str:
            if ch == "・":
                return "SYMBOL"
            return base_classify(ch)
    else:
        classify = base_classify
    return MorphDict(
        entries, conn, classes, classify,
        default_conn=default_conn,
    )
