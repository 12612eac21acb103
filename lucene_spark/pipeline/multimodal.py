"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode step is REAL for images: PNG / JPEG / GIF dimensions live in
fixed header bytes, so ``parse_image_header`` extracts (format, width,
height) with pure ``struct`` parsing — no media library needed. Pixel-level
ops (resize, feature extraction) would need PIL/ffmpeg, which this
container lacks; the metadata path below is the genuine article.

Spark shape: binary column in, Arrow batches through ``mapInPandas``, typed
metadata out — one row per payload, partitioning preserved. At 100 TB the
payload column stays opaque bytes in parquet (never exploded), and the
header parse reads only the first ~KB of each payload.

Test corpora are synthesized deterministically from doc_id
(``synthesize_image``): real byte-valid headers whose dimensions follow
doc_id arithmetic, so a SQL oracle recomputes the expected metadata without
parsing bytes while the ENGINE genuinely parses them.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

__all__ = [
    "synthesize_image",
    "attach_image_payload",
    "parse_image_header",
    "image_metadata",
]

_META_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int"
)

# deterministic synth parameters (mirrored by the SQL oracle)
_W = lambda d: 160 + d % 241  # noqa: E731
_H = lambda d: 90 + d % 181  # noqa: E731
_FILLER = lambda d: d % 50  # noqa: E731
_FMT = ("png", "jpeg", "gif")

# fixed header sizes of the synthesized files (before filler)
PNG_BASE = 45  # 8 sig + 25 IHDR chunk + 12 IEND chunk
JPEG_BASE = 41  # 2 SOI + 18 APP0 + 19 SOF0 + 2 EOI
GIF_BASE = 14  # 6 sig + 7 logical screen descriptor + 1 trailer


def synthesize_image(doc_id: int) -> bytes:
    """A minimal byte-valid image whose format/dimensions derive from
    doc_id: format = doc_id % 3 (png/jpeg/gif), width = 160 + doc_id % 241,
    height = 90 + doc_id % 181, plus doc_id % 50 trailing filler bytes."""
    w, h, filler = _W(doc_id), _H(doc_id), bytes(_FILLER(doc_id))
    fmt = _FMT[doc_id % 3]
    if fmt == "png":
        ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
        out = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
            + struct.pack(">I", 0) + b"IEND" + b"\x00\x00\x00\x00"
        )
    elif fmt == "jpeg":
        # length 16 = 2 (length field) + 5 ("JFIF\0") + 9 (version/density)
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
        sof0 = (
            b"\xff\xc0"
            + struct.pack(">HBHHB", 17, 8, h, w, 3)
            + bytes(9)  # 3 component specs
        )
        out = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    else:
        out = (
            b"GIF89a"
            + struct.pack("<HH", w, h)
            + bytes(3)  # packed fields, bg color, aspect
            + b";"
        )
    return out + filler


# JPEG SOF markers that carry frame dimensions (every C0-CF except the
# huffman/arithmetic-table and restart markers C4, C8, CC)
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from the media header bytes — the real
    decode: PNG IHDR (big-endian u32 pair at offset 16), GIF logical
    screen descriptor (little-endian u16 pair at offset 6), JPEG SOFn
    marker scan. Unknown/corrupt payloads return (None, None, None)."""
    b = payload
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return "png", int(w), int(h)
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", int(w), int(h)
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no dims found
                break
            if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # bare markers
                i += 2
                continue
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            if marker in _SOF_MARKERS:
                if i + 9 > len(b):
                    break
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", int(w), int(h)
            i += 2 + seglen
        return "jpeg", None, None
    return None, None, None


def attach_image_payload(docs: DataFrame) -> DataFrame:
    """Synthesize the multimodal table: one deterministic image payload per
    doc_id (binary column — stands in for a crawl's media bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "payload": [
                        synthesize_image(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(run, schema="doc_id long, payload binary")


def image_metadata(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched header decode: one typed metadata row per payload
    (doc_id, n_bytes, format, width, height)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_image_header(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                }
            )

    return with_payload.mapInPandas(run, schema=_META_SCHEMA)
