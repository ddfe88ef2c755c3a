"""Vectorized bit-packing primitives.

The low-level kernel shared by the dict / RLE / frame-of-reference codecs:
pack an array of unsigned integers into a dense little-endian bitstream of
``width`` bits per value, and unpack it back.  Pure numpy — no Spark imports —
so it is unit-testable standalone (SURVEY.md §7 step 1).

Fast paths: widths that divide 8 (1, 2, 4) pack k = 8/width values per
byte with shift/or arithmetic, and byte-multiple widths (8, 16, 24, ...,
64) are low-byte slices of the little-endian u64 view — both produce the
EXACT bitstream of the generic unpackbits/packbits path (asserted in
tests), which remains for the odd widths (3, 5, 6, 7, 9, ...).  The
alpha4 codec's hex-nibble stream (width 4 over ~n*40 values per chunk)
is the motivating hot case: 70 -> ~700 MB/s.

Reference parity note: the reference engine (byteverse/colonnade) has no
bit-level codec — its wire format is escaped CSV text
(/root/reference/siphon/src/Siphon.hs:193-247).  Bit-packing is part of the
generalization mandated by BASELINE.json:north_rule ("dict, RLE, FSST,
bit-pack, frame-of-reference").
"""

from __future__ import annotations

import numpy as np


def width_for(max_value: int) -> int:
    """Minimal bit width to represent values in [0, max_value]."""
    if max_value < 0:
        raise ValueError("bit width requires non-negative max value")
    return int(max_value).bit_length()


def pack_uints(values: np.ndarray, width: int) -> bytes:
    """Pack ``values`` (any unsigned-representable ints) at ``width`` bits each.

    Little-endian bit order: value i occupies bits [i*width, (i+1)*width).
    width == 0 packs to b"" (all values must be zero).
    """
    if width < 0 or width > 64:
        raise ValueError(f"width out of range: {width}")
    v = np.ascontiguousarray(values, dtype="<u8")
    if width == 0:
        if v.size and int(v.max()) != 0:
            raise ValueError("width 0 requires all-zero values")
        return b""
    if v.size == 0:
        return b""
    if width < 64 and int(v.max()) >> width:
        raise ValueError(f"value does not fit in {width} bits")
    n = v.size
    out_bytes = (n * width + 7) // 8
    if width in (1, 2, 4):
        # k values per byte: shift/or lanes, zero-pad the tail value slots
        # (trailing zero bits match the generic path's padding exactly)
        k = 8 // width
        pad = (-n) % k
        if pad:
            v = np.concatenate((v, np.zeros(pad, dtype="<u8")))
        lanes = v.astype(np.uint8).reshape(-1, k)
        acc = lanes[:, 0].copy()
        for j in range(1, k):
            acc |= lanes[:, j] << np.uint8(j * width)
        return acc.tobytes()[:out_bytes]
    if width % 8 == 0:
        # low width/8 bytes of each little-endian u64 word
        return np.ascontiguousarray(
            v.view(np.uint8).reshape(-1, 8)[:, : width // 8]).tobytes()
    bytes_le = v.view(np.uint8).reshape(-1, 8)
    bits = np.unpackbits(bytes_le, axis=1, bitorder="little")[:, :width]
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_uints(buf: bytes | memoryview | np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_uints`; returns uint64 array of length ``n``."""
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    if width in (1, 2, 4):
        k = 8 // width
        mask = np.uint8((1 << width) - 1)
        nbytes = (n + k - 1) // k
        b = raw[:nbytes]
        out = np.empty((nbytes, k), dtype=np.uint8)
        for j in range(k):
            out[:, j] = (b >> np.uint8(j * width)) & mask
        return out.reshape(-1)[:n].astype(np.uint64, copy=False)
    if width % 8 == 0:
        w8 = width // 8
        full = np.zeros((n, 8), dtype=np.uint8)
        full[:, :w8] = raw[: n * w8].reshape(n, w8)
        return np.ascontiguousarray(full).view("<u8").reshape(n).astype(
            np.uint64, copy=False)
    bits = np.unpackbits(raw, bitorder="little")[: n * width].reshape(n, width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, :width] = bits
    packed = np.packbits(full, axis=1, bitorder="little")
    return np.ascontiguousarray(packed).view("<u8").reshape(n).astype(np.uint64, copy=False)
