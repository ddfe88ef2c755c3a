"""Float codec: byte-stream split + DEFLATE — the float-specialized path the
reference's fixed-point decimal cells motivate
(/root/reference/geolite-csv/src/Geolite/Types.hs:7-10,39-40: ``Fixed E4``
lat/long — low-entropy reals).

Byte-stream split (as in Parquet's BYTE_STREAM_SPLIT encoding, public
format): transpose the column's bytes so byte-lane j of every value is
contiguous.  Exponent/sign lanes of real-world floats are highly repetitive;
after the split a cheap entropy coder (here zlib DEFLATE, fixed level —
deterministic) compresses them well, while raw IEEE bytes barely compress.
Lossless: the exact bit pattern round-trips (NaN payloads included).

Estimate is a sampled compression (first ``_SAMPLE`` values) extrapolated to
the chunk — a pure function of chunk content, per the determinism rule.
"""

from __future__ import annotations

import zlib

import numpy as np

from .base import KIND_FLOAT, Codec, ColumnData, ColumnStats, EncodeContext

_LEVEL = 6          # fixed: codec output must be deterministic
_SAMPLE = 4096

_DTYPE = {"float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
          "halffloat": "<f2"}


def _split_bytes(vals: np.ndarray) -> bytes:
    """(n values of w bytes) → w contiguous byte lanes."""
    raw = np.ascontiguousarray(vals).view(np.uint8).reshape(-1, vals.itemsize)
    return np.ascontiguousarray(raw.T).tobytes()


def _unsplit(buf: bytes, n: int, w: int, dt: str) -> np.ndarray:
    lanes = np.frombuffer(buf, dtype=np.uint8, count=n * w).reshape(w, n)
    return np.ascontiguousarray(lanes.T).reshape(-1).view(dt)[:n]


class FloatBssCodec(Codec):
    name = "fbss"
    codec_id = 6

    def applicable(self, col: ColumnData, stats: ColumnStats) -> bool:
        return col.kind == KIND_FLOAT and col.n >= 16

    def estimate(self, col: ColumnData, stats: ColumnStats, ctx: EncodeContext) -> int:
        vals = col.values
        head = vals[: min(col.n, _SAMPLE)]
        comp = len(zlib.compress(_split_bytes(head), _LEVEL))
        # extrapolate sample ratio to the chunk (+ small safety margin so a
        # lying sample loses ties to plain rather than winning them)
        ratio = comp / max(head.nbytes, 1)
        return int(vals.nbytes * ratio * 1.02) + 16

    def encode(self, col: ColumnData, stats: ColumnStats, ctx: EncodeContext) -> tuple[dict, bytes]:
        dt = _DTYPE.get(col.arrow_type, "<f8")
        vals = np.ascontiguousarray(col.values, dtype=dt)
        return {"w": vals.itemsize}, zlib.compress(_split_bytes(vals), _LEVEL)

    def decode(self, payload: memoryview, params: dict, n: int, kind: str,
               arrow_type: str) -> ColumnData:
        dt = _DTYPE.get(arrow_type, "<f8")
        w = params["w"]
        vals = _unsplit(zlib.decompress(payload), n, w, dt)
        return ColumnData(kind, n, arrow_type, values=vals)
