"""Property-based round-trip tests — the direct analog of the reference's
QuickCheck isomorphism suite (propIsoStream,
/root/reference/siphon/test/Test.hs:262-276): for arbitrary generated
columns, decode(encode(col)) == col, under every codec that accepts the
column, including adversarial shapes (the reference's hostile cells
generalized per FIXTURES.md)."""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from colonnade_spark.blocks import decode_block, encode_block

_SETTINGS = dict(max_examples=40, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

text_cell = st.one_of(
    st.text(max_size=200),
    st.text(alphabet="ab,\n\r\"'\x00", max_size=30),       # hostile chars
    st.sampled_from(["", " ", "def f(x):\n    return x\n",
                     "日本語🎉", "x" * 3000]),
)


@settings(**_SETTINGS)
@given(st.lists(st.one_of(text_cell, st.none()), max_size=120))
def test_string_roundtrip_auto(vals):
    arr = pa.array(vals, type=pa.string())
    assert decode_block(encode_block(arr)).equals(arr)


@settings(**_SETTINGS)
@given(st.lists(text_cell, min_size=1, max_size=80),
       st.sampled_from(["plain", "dict", "rle", "fsst"]))
def test_string_roundtrip_each_codec(vals, codec):
    arr = pa.array(vals, type=pa.string())
    assert decode_block(encode_block(arr, codec=codec)).equals(arr)


@settings(**_SETTINGS)
@given(st.lists(text_cell, min_size=2, max_size=80), st.booleans())
def test_string_roundtrip_fcode(vals, sort_first):
    # front coding applies to any n>=2 string column; sortedness only
    # changes the ratio, never correctness
    arr = pa.array(sorted(vals) if sort_first else vals, type=pa.string())
    assert decode_block(encode_block(arr, codec="fcode")).equals(arr)


int_cell = st.one_of(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.sampled_from([0, 1, -1, 2**63 - 1, -(2**63)]),
)


@settings(**_SETTINGS)
@given(st.lists(st.one_of(int_cell, st.none()), max_size=120))
def test_int_roundtrip_auto(vals):
    arr = pa.array(vals, type=pa.int64())
    assert decode_block(encode_block(arr)).equals(arr)


@settings(**_SETTINGS)
@given(st.lists(int_cell, min_size=2, max_size=80),
       st.sampled_from(["plain", "dict", "rle", "forbp", "delta"]))
def test_int_roundtrip_each_codec(vals, codec):
    arr = pa.array(vals, type=pa.int64())
    assert decode_block(encode_block(arr, codec=codec)).equals(arr)


@settings(**_SETTINGS)
@given(st.lists(st.one_of(st.booleans(), st.none()), max_size=100))
def test_bool_roundtrip(vals):
    arr = pa.array(vals, type=pa.bool_())
    assert decode_block(encode_block(arr)).equals(arr)


@settings(**_SETTINGS)
@given(st.lists(text_cell, max_size=60))
def test_auto_never_exceeds_plain(vals):
    """The compressed-size bound as a property: auto <= plain + frame slack."""
    arr = pa.array(vals, type=pa.string())
    assert len(encode_block(arr)) <= len(encode_block(arr, codec="plain")) + 160


@settings(**_SETTINGS)
@given(st.lists(text_cell, max_size=60))
def test_encode_deterministic(vals):
    arr = pa.array(vals, type=pa.string())
    assert encode_block(arr) == encode_block(arr)


float_cell = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.sampled_from([0.0, -0.0, 1.5, 1e300, -1e-300, float("inf"),
                     float("-inf"), float("nan"), 3.14159]),
)


@settings(**_SETTINGS)
@given(st.lists(st.one_of(float_cell, st.none()), max_size=120))
def test_float_roundtrip_auto(vals):
    """Auto selection over floats (plain or fbss) is bit-exact lossless,
    NaN/inf included."""
    arr = pa.array(vals, type=pa.float64())
    out = decode_block(encode_block(arr))
    # NaN != NaN under .equals value semantics is fine in arrow (equals is
    # bitwise for primitive buffers), assert byte equality explicitly too
    assert out.equals(arr) or (
        np.array_equal(np.asarray(out, dtype=np.float64),
                       np.asarray(arr, dtype=np.float64), equal_nan=True)
        and out.null_count == arr.null_count)


@settings(**_SETTINGS)
@given(st.lists(float_cell, min_size=16, max_size=120),
       st.sampled_from(["plain", "fbss"]))
def test_float_roundtrip_each_codec(vals, codec):
    arr = pa.array(vals, type=pa.float64())
    out = decode_block(encode_block(arr, codec=codec))
    assert np.array_equal(np.asarray(out, dtype=np.float64),
                          np.asarray(arr, dtype=np.float64), equal_nan=True)


@settings(**_SETTINGS)
@given(st.lists(float_cell, min_size=16, max_size=120))
def test_float_auto_never_exceeds_plain(vals):
    arr = pa.array(vals, type=pa.float64())
    assert len(encode_block(arr)) <= len(encode_block(arr, codec="plain")) + 160


@settings(**_SETTINGS)
@given(st.lists(text_cell, min_size=1, max_size=60))
def test_post_zlib_roundtrip(vals):
    """Post-encode fmap (zlib over block payload) round-trips any codec."""
    arr = pa.array(vals, type=pa.string())
    assert decode_block(encode_block(arr, post="zlib")).equals(arr)


@settings(**_SETTINGS)
@given(st.text(min_size=0, max_size=4000),
       st.integers(min_value=1, max_value=257),
       st.booleans())
def test_cell_fragments_roundtrip_property(cell, cap, post):
    """Multi-block cell isomorphism at ARBITRARY fragment caps — the
    reference's byte-per-chunk stress (siphon/test/Test.hs:103-122) applied
    to cell splitting: any unicode cell, any cap (down to 1 byte, splitting
    INSIDE multi-byte code points), with and without per-fragment zlib."""
    from colonnade_spark.blocks import (decode_cell_fragments,
                                        encode_cell_fragments)

    arr = pa.array([cell], type=pa.string())
    frames = encode_cell_fragments(arr, cap, post="zlib" if post else None)
    nbytes = len(cell.encode("utf-8"))
    assert len(frames) == max(-(-nbytes // cap), 1)
    out = decode_cell_fragments(frames)
    assert out[0].as_py() == cell and out.type == pa.string()
