"""Frame-of-reference + bit-pack codec for integer columns.

Subtract the chunk minimum (modular uint64 arithmetic, overflow-safe for the
full int64 domain), bit-pack the deltas at minimal width
(BASELINE.json:north_rule "bit-packing and frame-of-reference"; reference
fixture: small-int `accuracy_radius` column, FIXTURES.md §3).
"""

from __future__ import annotations

import numpy as np

from .base import KIND_INT, Codec, ColumnData, ColumnStats, EncodeContext
from .bitpack_util import pack_uints, unpack_uints, width_for

_M64 = (1 << 64) - 1


class ForBitpackCodec(Codec):
    name = "forbp"
    codec_id = 3

    def applicable(self, col: ColumnData, stats: ColumnStats) -> bool:
        return col.kind == KIND_INT and col.n > 0

    def estimate(self, col: ColumnData, stats: ColumnStats, ctx: EncodeContext) -> int:
        w = width_for((stats.vmax - stats.vmin) & _M64)
        return (col.n * w + 7) // 8 + 16

    def encode(self, col: ColumnData, stats: ColumnStats, ctx: EncodeContext) -> tuple[dict, bytes]:
        ref = stats.vmin
        deltas = col.values.astype(np.uint64) - np.uint64(ref & _M64)
        w = width_for((stats.vmax - ref) & _M64)
        return {"ref": ref, "w": w}, pack_uints(deltas, w)

    def decode(self, payload: memoryview, params: dict, n: int, kind: str,
               arrow_type: str) -> ColumnData:
        u = unpack_uints(payload, n, params["w"])
        vals = (u + np.uint64(params["ref"] & _M64)).view(np.int64)
        return ColumnData(kind, n, arrow_type, values=vals)
