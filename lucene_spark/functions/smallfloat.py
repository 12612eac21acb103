"""Norm quantization: Lucene's SmallFloat int<->byte4 encoding, vectorized.

Semantics re-implemented from the published algorithm
(reference: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167):

- ``long_to_int4``: float-like order-preserving encoding of a non-negative
  integer keeping 4 significant bits (1 implicit + 3 stored) plus a shift.
- ``int_to_byte4``: identity for values < NUM_FREE_VALUES (=24), otherwise
  ``24 + long_to_int4(v - 24)``; exact for all values < 40.

Norm byte for a doc = ``int_to_byte4(field_length - num_overlaps)``
(Similarity.computeNorm, lucene/core/src/java/org/apache/lucene/search/
similarities/Similarity.java:152-162).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "int_to_byte4",
    "byte4_to_int",
    "BYTE4_DECODE_TABLE",
    "NUM_FREE_VALUES",
]


def _long_to_int4(i: np.ndarray) -> np.ndarray:
    """Vectorized longToInt4 for non-negative int64 arrays."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("only supports non-negative values")
    # number of significant bits: frexp is exact for integers < 2^53
    # (values here are < 2^31)
    _, num_bits = np.frexp(i.astype(np.float64))
    num_bits = num_bits.astype(np.int64)

    shift = np.maximum(num_bits - 4, 0)
    encoded = (i >> shift) & 0x07
    normal = num_bits >= 4
    out = np.where(normal, encoded | ((shift + 1) << 3), i)
    return out.astype(np.int64)


def _int4_to_long(e: np.ndarray) -> np.ndarray:
    e = np.asarray(e, dtype=np.int64)
    bits = e & 0x07
    shift = (e >> 3) - 1
    subnormal = shift == -1
    return np.where(subnormal, bits, (bits | 0x08) << np.maximum(shift, 0))


# NUM_FREE_VALUES = 255 - longToInt4(Integer.MAX_VALUE) = 255 - 231 = 24
MAX_INT4 = int(_long_to_int4(np.array([2**31 - 1]))[0])
NUM_FREE_VALUES = 255 - MAX_INT4
assert NUM_FREE_VALUES == 24, NUM_FREE_VALUES


def int_to_byte4(i: np.ndarray | int) -> np.ndarray:
    """Encode non-negative int(s) to unsigned-byte norm values [0, 255]."""
    scalar = np.isscalar(i)
    i = np.atleast_1d(np.asarray(i, dtype=np.int64))
    if np.any(i < 0):
        raise ValueError("only supports non-negative values")
    small = i < NUM_FREE_VALUES
    out = np.where(small, i, NUM_FREE_VALUES + _long_to_int4(np.maximum(i - NUM_FREE_VALUES, 0)))
    out = out.astype(np.int64)
    return int(out[0]) if scalar else out


def byte4_to_int(b: np.ndarray | int) -> np.ndarray:
    """Decode unsigned-byte norm value(s) [0, 255] back to int."""
    scalar = np.isscalar(b)
    b = np.atleast_1d(np.asarray(b, dtype=np.int64)) & 0xFF
    small = b < NUM_FREE_VALUES
    out = np.where(small, b, NUM_FREE_VALUES + _int4_to_long(np.maximum(b - NUM_FREE_VALUES, 0)))
    out = out.astype(np.int64)
    return int(out[0]) if scalar else out


# 256-entry decode table (BM25Similarity.LENGTH_TABLE analog,
# lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java:111-117)
BYTE4_DECODE_TABLE = byte4_to_int(np.arange(256))
