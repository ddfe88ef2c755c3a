"""Plain codec: raw column bytes + offsets.

This is the baseline comparator mandated by BASELINE.md: byte-equivalent to
the reference's CSV wire content (escaped UTF-8 cell bytes,
/root/reference/siphon/src/Siphon.hs:193-247) minus separator overhead.
Always a selection candidate, so total encoded size <= plain is structural.
"""

from __future__ import annotations

import numpy as np

from .base import (KIND_BOOL, KIND_FLOAT, KIND_INT, KIND_STR, Codec,
                   ColumnData, ColumnStats, EncodeContext, int_width)


class PlainCodec(Codec):
    name = "plain"
    codec_id = 0

    def applicable(self, col: ColumnData, stats: ColumnStats) -> bool:
        return True

    def estimate(self, col: ColumnData, stats: ColumnStats, ctx: EncodeContext) -> int:
        if col.kind == KIND_STR:
            offw = 8 if stats.total_bytes > 0xFFFFFFFF else 4
            return 1 + offw * (col.n + 1) + stats.total_bytes
        if col.kind == KIND_INT:
            return int_width(col.arrow_type) * col.n
        if col.kind == KIND_BOOL:
            return (col.n + 7) // 8
        return col.values.nbytes

    def encode(self, col: ColumnData, stats: ColumnStats, ctx: EncodeContext) -> tuple[dict, bytes]:
        if col.kind == KIND_STR:
            offw = 8 if col.total_bytes > 0xFFFFFFFF else 4
            dt = "<u8" if offw == 8 else "<u4"
            parts = [bytes([offw]),
                     np.ascontiguousarray(col.offsets, dtype=dt).tobytes(),
                     np.ascontiguousarray(col.data, dtype=np.uint8).tobytes()]
            return {}, b"".join(parts)
        if col.kind == KIND_INT:
            w = int_width(col.arrow_type)
            dt = {1: "<i1", 2: "<i2", 4: "<i4", 8: "<i8"}[w]
            if col.arrow_type.startswith("u"):
                dt = dt.replace("i", "u")
            return {}, np.ascontiguousarray(col.values.astype(dt)).tobytes()
        if col.kind == KIND_BOOL:
            return {}, np.packbits(col.values, bitorder="little").tobytes()
        return {}, np.ascontiguousarray(col.values).tobytes()

    def decode(self, payload: memoryview, params: dict, n: int, kind: str,
               arrow_type: str) -> ColumnData:
        if kind == KIND_STR:
            offw = payload[0]
            dt = "<u8" if offw == 8 else "<u4"
            off = np.frombuffer(payload, dtype=dt, count=n + 1, offset=1).astype(np.int64)
            data = np.frombuffer(payload, dtype=np.uint8, offset=1 + offw * (n + 1))
            return ColumnData(kind, n, arrow_type, data=data, offsets=off)
        if kind == KIND_INT:
            w = int_width(arrow_type)
            dt = {1: "<i1", 2: "<i2", 4: "<i4", 8: "<i8"}[w]
            if arrow_type.startswith("u"):
                dt = dt.replace("i", "u")
            vals = np.frombuffer(payload, dtype=dt, count=n).astype(np.int64)
            return ColumnData(kind, n, arrow_type, values=vals)
        if kind == KIND_BOOL:
            bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8),
                                 bitorder="little")[:n].astype(np.bool_)
            return ColumnData(kind, n, arrow_type, values=bits)
        dt = {"float": "<f4", "float32": "<f4", "halffloat": "<f2"}.get(arrow_type, "<f8")
        vals = np.frombuffer(payload, dtype=dt, count=n)
        return ColumnData(kind, n, arrow_type, values=vals)
