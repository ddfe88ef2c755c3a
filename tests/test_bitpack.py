import numpy as np
import pytest

from colonnade_spark.codecs.bitpack_util import pack_uints, unpack_uints, width_for


def test_width_for():
    assert width_for(0) == 0
    assert width_for(1) == 1
    assert width_for(255) == 8
    assert width_for(256) == 9
    assert width_for((1 << 64) - 1) == 64


@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 13, 31, 33, 63, 64])
def test_pack_roundtrip(width):
    rng = np.random.default_rng(42 + width)
    if width == 0:
        vals = np.zeros(17, dtype=np.uint64)
    elif width == 64:
        vals = rng.integers(0, 1 << 62, size=1000, dtype=np.uint64) * 4 + 3
    else:
        vals = rng.integers(0, 1 << width, size=1000, dtype=np.uint64)
    buf = pack_uints(vals, width)
    assert len(buf) == (len(vals) * width + 7) // 8
    out = unpack_uints(buf, len(vals), width)
    np.testing.assert_array_equal(out, vals)


def test_pack_empty():
    assert pack_uints(np.zeros(0, dtype=np.uint64), 5) == b""
    assert unpack_uints(b"", 0, 5).size == 0


def test_pack_overflow_rejected():
    with pytest.raises(ValueError):
        pack_uints(np.array([8], dtype=np.uint64), 3)


def test_fast_paths_bit_identical_to_generic():
    """The width-dividing-8 and byte-multiple fast paths must produce the
    EXACT bitstream of the generic unpackbits/packbits path — old blocks
    stay decodable and re-encodes stay byte-deterministic across the
    optimization."""

    def generic_pack(values, width):
        v = np.ascontiguousarray(values, dtype="<u8")
        if width == 0 or v.size == 0:
            return b""
        bytes_le = v.view(np.uint8).reshape(-1, 8)
        bits = np.unpackbits(bytes_le, axis=1, bitorder="little")[:, :width]
        return np.packbits(bits.ravel(), bitorder="little").tobytes()

    rng = np.random.default_rng(3)
    for width in range(1, 65):
        for n in (1, 2, 3, 7, 8, 9, 257):
            if width == 64:
                vals = rng.integers(0, 1 << 62, size=n, dtype=np.uint64) * 4 + 1
            else:
                vals = rng.integers(0, 1 << width, size=n, dtype=np.uint64)
            buf = pack_uints(vals, width)
            assert buf == generic_pack(vals, width), (width, n)
            np.testing.assert_array_equal(unpack_uints(buf, n, width), vals)
