"""VB + delta codec tests, incl. the reference's exact byte vectors
(/root/reference/src/compressors/vb_encode.rs:33-111) and vectorized==scalar
property tests."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.functions.vb import (
    decode_ascending,
    delta_decode,
    delta_decode_array,
    delta_encode,
    delta_encode_array,
    encode_ascending,
    vb_decode,
    vb_decode_array,
    vb_decode_list,
    vb_encode,
    vb_encode_array,
    vb_encode_list,
)

REFERENCE_VECTORS = [
    (0, [128]),
    (1, [129]),
    (5, [133]),
    (42, [170]),
    (100, [228]),
    (127, [255]),
    (128, [1, 128]),
    (1097, [8, 201]),
    (16384, [1, 0, 128]),  # interior 0x00 — the reference's delimiter landmine
    (2097152, [1, 0, 0, 128]),
]


@pytest.mark.parametrize("num,expected", REFERENCE_VECTORS)
def test_vb_encode_reference_vectors(num, expected):
    assert list(vb_encode(num)) == expected


@pytest.mark.parametrize("num,expected", REFERENCE_VECTORS)
def test_vb_decode_reference_vectors(num, expected):
    value, read = vb_decode(bytes(expected))
    assert value == num
    assert read == len(expected)


@given(st.lists(st.integers(0, 2**40), max_size=200))
@settings(max_examples=50)
def test_vb_array_matches_scalar(vals):
    arr = np.array(vals, dtype=np.uint64)
    enc, lens = vb_encode_array(arr)
    assert enc.tobytes() == vb_encode_list(vals)
    assert lens.sum() == len(enc)
    if vals:
        assert vb_decode_array(enc).tolist() == vals
        assert vb_decode_list(enc.tobytes()) == vals


@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=200, unique=True))
@settings(max_examples=50)
def test_delta_roundtrip_ascending(vals):
    vals = sorted(vals)
    gaps = delta_encode(vals)
    assert delta_decode(gaps) == vals
    arr = np.array(vals)
    g2 = delta_encode_array(arr)
    assert g2.tolist() == gaps
    assert delta_decode_array(g2).tolist() == vals
    # full pipe
    assert decode_ascending(encode_ascending(arr)).tolist() == vals


def test_delta_zero_sentinel():
    # positions starting at 0: second value stays absolute in the reference
    # (helper.rs:6-44) — numerically identical to plain diff; must round-trip.
    vals = [0, 5, 9]
    assert delta_decode(delta_encode(vals)) == vals
    assert delta_encode(vals) == [0, 5, 4]


def test_empty():
    enc, lens = vb_encode_array(np.array([], dtype=np.uint64))
    assert len(enc) == 0 and len(lens) == 0
    assert decode_ascending(b"").tolist() == []


def test_truncated_stream_raises():
    with pytest.raises(ValueError):
        vb_decode_array(bytes([1, 0]))  # no terminator byte
