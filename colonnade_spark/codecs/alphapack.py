"""Small-alphabet string codec: map bytes through a <=16-symbol alphabet and
bit-pack at 1/2/4 bits per character, with bit-packed per-string lengths.

The killer column in training pipelines is the content HASH (md5/sha hex —
16 distinct byte values): plain stores 32 bytes + a 4-byte offset per row;
alpha-pack stores 16 bytes + ~6 BITS of length per row (~0.47 of plain), and
both directions are single-gather numpy (orders of magnitude faster than a
symbol-table coder on such columns).  Also covers digit columns, base64-ish
ids, DNA-alphabet text.

Reference parity: the reference's cells include fixed-alphabet content
(hex-ish ids, bools as "1"/"0" — geolite-csv/src/Geolite/Csv.hs:49-50); this
is its specialized-codec analog under the north rule's bit-packing family.
"""

from __future__ import annotations

import numpy as np

from .base import KIND_STR, Codec, ColumnData, ColumnStats, EncodeContext
from .bitpack_util import pack_uints, unpack_uints, width_for

_MAX_ALPHA = 16


def _alphabet(data: np.ndarray) -> np.ndarray | None:
    """Sorted distinct byte values, or None if > _MAX_ALPHA.

    Scans in slices with early exit: free-text columns (source code, prose)
    blow past 16 distinct bytes within the first slice, so the common
    reject answer costs ~64 KiB of scan instead of the whole buffer; a
    genuinely small-alphabet column (hex ids, digits) still gets the exact
    one-pass answer.  Deterministic — pure function of the buffer prefix.
    """
    if data.size == 0:
        return np.zeros(0, dtype=np.uint8)
    seen = np.zeros(256, dtype=bool)
    lo, step = 0, 1 << 16
    while lo < data.size:  # geometric stride: lo advances by the slice size
        seen[data[lo: lo + step]] = True
        if np.count_nonzero(seen) > _MAX_ALPHA:
            return None
        lo += step
        step = min(step << 2, 1 << 24)
    uniq = np.flatnonzero(seen)
    return uniq.astype(np.uint8)


class AlphaPackCodec(Codec):
    name = "alpha4"
    codec_id = 7

    def applicable(self, col: ColumnData, stats: ColumnStats) -> bool:
        # capability only (a 1-byte column packs fine); the tiny-column
        # floor lives in estimate() so a FORCED alpha4 on a small tail
        # batch encodes instead of raising (bench-caught: mapInArrow split
        # a 2000-row flag column into a 63-row tail batch)
        return col.kind == KIND_STR and col.n > 0

    def _plan(self, col: ColumnData, ctx: EncodeContext):
        # NO caching: an earlier id(col.data)-keyed memo silently returned a
        # PREVIOUS stripe's plan when the next stripe's buffer reallocated
        # at the same address with the same row count (malloc reuse) — the
        # stale per-string lengths corrupted offsets at decode.  id() is not
        # an identity across a chunk's lifetime; recomputing costs one
        # bincount + diff per call.
        alpha = _alphabet(col.data)
        if alpha is None or alpha.size == 0:
            return None
        w = max(width_for(alpha.size - 1), 1)
        lens = np.diff(col.offsets)
        lw = width_for(int(lens.max())) if col.n else 0
        return (alpha, w, lens, lw)

    def estimate(self, col: ColumnData, stats: ColumnStats, ctx: EncodeContext) -> int:
        if stats.total_bytes < 64:        # selection floor (header amortization)
            return stats.total_bytes * 4 + (1 << 20)
        plan = self._plan(col, ctx)
        if plan is None:
            return stats.total_bytes * 4 + (1 << 20)  # priced out
        alpha, w, lens, lw = plan
        return (4 + alpha.size + (col.data.size * w + 7) // 8
                + (col.n * lw + 7) // 8)

    def encode(self, col: ColumnData, stats: ColumnStats, ctx: EncodeContext) -> tuple[dict, bytes]:
        plan = self._plan(col, ctx)
        if plan is None:
            raise ValueError("alpha4 not applicable: alphabet too large")
        alpha, w, lens, lw = plan
        lut = np.zeros(256, dtype=np.uint8)
        lut[alpha] = np.arange(alpha.size, dtype=np.uint8)
        codes = lut[col.data]
        parts = [bytes([alpha.size, w, lw]), alpha.tobytes(),
                 pack_uints(lens.astype(np.uint64), lw),
                 pack_uints(codes.astype(np.uint64), w)]
        return {}, b"".join(parts)

    def decode(self, payload: memoryview, params: dict, n: int, kind: str,
               arrow_type: str) -> ColumnData:
        buf = np.frombuffer(payload, dtype=np.uint8)
        n_alpha, w, lw = int(buf[0]), int(buf[1]), int(buf[2])
        p = 3
        alpha = buf[p: p + n_alpha].copy()
        p += n_alpha
        len_bytes = (n * lw + 7) // 8
        lens = unpack_uints(buf[p: p + len_bytes], n, lw).astype(np.int64)
        p += len_bytes
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        total = int(offsets[-1])
        codes = unpack_uints(buf[p:], total, w).astype(np.uint8)
        data = alpha[codes] if total else np.zeros(0, dtype=np.uint8)
        return ColumnData(kind, n, arrow_type, data=data, offsets=offsets)
