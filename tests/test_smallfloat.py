"""SmallFloat norm encoding parity (FIXTURES.md §5).

Scalar reference implementation written directly from the algorithm spec;
the vectorized module must agree value-for-value, incl. boundaries near
2^31-1 (lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-156).
"""

import numpy as np
import pytest

from lucene_spark.functions.smallfloat import (
    BYTE4_DECODE_TABLE,
    NUM_FREE_VALUES,
    byte4_to_int,
    int_to_byte4,
)


def _scalar_long_to_int4(i: int) -> int:
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def _scalar_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def _scalar_int_to_byte4(i: int) -> int:
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _scalar_long_to_int4(i - NUM_FREE_VALUES)


def _scalar_byte4_to_int(b: int) -> int:
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + _scalar_int4_to_long(b - NUM_FREE_VALUES)


def test_num_free_values():
    assert NUM_FREE_VALUES == 24


def test_exact_below_40():
    for i in range(40):
        assert byte4_to_int(int_to_byte4(i)) == i


def test_matches_scalar_reference_dense():
    xs = np.arange(0, 200_000)
    enc = int_to_byte4(xs)
    want = np.array([_scalar_int_to_byte4(int(i)) for i in range(0, 200_000)])
    assert (enc == want).all()


@pytest.mark.parametrize(
    "i", [0, 1, 7, 8, 15, 16, 23, 24, 39, 40, 41, 255, 256, 2**20, 2**30, 2**31 - 1]
)
def test_boundaries(i):
    assert int(int_to_byte4(i)) == _scalar_int_to_byte4(i)
    b = _scalar_int_to_byte4(i)
    assert int(byte4_to_int(b)) == _scalar_byte4_to_int(b)


def test_monotone_and_dominated():
    xs = np.arange(0, 1_000_000, 7)
    enc = int_to_byte4(xs)
    assert (np.diff(enc) >= 0).all()  # order preserving
    dec = byte4_to_int(enc)
    assert (dec <= xs).all()  # truncation, never overshoot


def test_decode_table():
    assert BYTE4_DECODE_TABLE.shape == (256,)
    assert [int(BYTE4_DECODE_TABLE[i]) for i in range(256)] == [
        _scalar_byte4_to_int(i) for i in range(256)
    ]
    # strictly increasing: distinct norm bytes decode to distinct lengths
    assert (np.diff(BYTE4_DECODE_TABLE) > 0).all()
