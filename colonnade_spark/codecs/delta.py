"""Delta codec: zigzag-encoded deltas, bit-packed — for sorted/clustered
integer columns (ids, timestamps).  Modular uint64 arithmetic throughout so
the full int64 domain round-trips (BASELINE.json:north_rule "bit-packing";
sorted-id columns are the classic beneficiary)."""

from __future__ import annotations

import numpy as np

from .base import KIND_INT, Codec, ColumnData, ColumnStats, EncodeContext
from .bitpack_util import pack_uints, unpack_uints, width_for

_M64 = (1 << 64) - 1


def _zigzag(values: np.ndarray) -> np.ndarray:
    """int64 deltas (modular) → zigzagged uint64."""
    u = values.astype(np.uint64)
    du = u[1:] - u[:-1]                       # modular diff = two's complement
    ds = du.view(np.int64)
    return ((ds << np.int64(1)) ^ (ds >> np.int64(63))).view(np.uint64)


class DeltaCodec(Codec):
    name = "delta"
    codec_id = 4

    def applicable(self, col: ColumnData, stats: ColumnStats) -> bool:
        return col.kind == KIND_INT and col.n >= 2

    def estimate(self, col: ColumnData, stats: ColumnStats, ctx: EncodeContext) -> int:
        # recomputed per chunk — ctx persists across the stripes of a bucket,
        # so caching the width there would estimate every later stripe with
        # stripe 0's width (mis-selection)
        zig = _zigzag(col.values)
        w = width_for(int(zig.max())) if zig.size else 0
        return 8 + 1 + ((col.n - 1) * w + 7) // 8

    def encode(self, col: ColumnData, stats: ColumnStats, ctx: EncodeContext) -> tuple[dict, bytes]:
        zig = _zigzag(col.values)
        w = width_for(int(zig.max())) if zig.size else 0
        first = int(col.values[0])
        return {"w": w, "f": first}, pack_uints(zig, w)

    def decode(self, payload: memoryview, params: dict, n: int, kind: str,
               arrow_type: str) -> ColumnData:
        zig = unpack_uints(payload, n - 1, params["w"])
        ds = ((zig >> np.uint64(1)).view(np.int64)
              ^ -(zig & np.uint64(1)).view(np.int64)).view(np.uint64)
        first = np.uint64(params["f"] & _M64)
        vals = np.empty(n, dtype=np.uint64)
        vals[0] = first
        np.cumsum(ds, out=vals[1:])           # modular cumsum in uint64
        vals[1:] += first
        return ColumnData(kind, n, arrow_type, values=vals.view(np.int64))
