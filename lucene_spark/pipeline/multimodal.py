"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The real decode (image/audio/video libraries) is NOT available in this
environment, so the decode step is a clearly-marked deterministic STUB —
but the Spark-side plumbing is real and tested: binary column in, Arrow
batches through ``mapInPandas``, typed metadata struct out, partitioning
preserved. Swapping ``_stub_decode`` for PIL/ffmpeg is a one-function
change; the batch shape (iterator of pandas DataFrames, one row per
payload) is exactly what a real decoder needs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attach_payload", "decode_metadata"]

_META_SCHEMA = (
    "doc_id long, n_bytes long, payload_md5 string, fake_width int, "
    "fake_height int, fake_frames int"
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of text as the opaque
    ``payload`` binary column (stands in for image/audio bytes)."""
    return docs.select("doc_id", F.encode(F.col(text_col), "utf-8").alias("payload"))


def _stub_decode(payload: bytes) -> tuple[int, str, int, int, int]:
    """STUB for the real media decoder (no PIL/ffmpeg in this container).

    Deterministic fake: dimensions derived from the payload's md5 so the
    oracle can recompute them. A real implementation would return
    (n_bytes, md5, width, height, n_frames) from the actual media headers —
    raise NotImplementedError here if you need to be loud about it.
    """
    h = hashlib.md5(payload).hexdigest()
    return (
        len(payload),
        h,
        160 + int(h[0:2], 16),    # fake width  160..415
        90 + int(h[2:4], 16),     # fake height  90..345
        1 + int(h[4:5], 16),      # fake frames   1..16
    )


def decode_metadata(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': one metadata row per payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_stub_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": [m[0] for m in metas],
                    "payload_md5": [m[1] for m in metas],
                    "fake_width": [m[2] for m in metas],
                    "fake_height": [m[3] for m in metas],
                    "fake_frames": [m[4] for m in metas],
                }
            )

    return with_payload.mapInPandas(run, schema=_META_SCHEMA)
