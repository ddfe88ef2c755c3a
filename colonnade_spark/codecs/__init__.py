"""Codec registry — the ``headedToIndexed`` analog: block headers carry a codec
id which is resolved here at decode time (the reference resolves column names
to indices once per file, /root/reference/siphon/src/Siphon.hs:252-278; we
resolve codec ids once per block)."""

from __future__ import annotations

from .base import (KIND_BOOL, KIND_FLOAT, KIND_INT, KIND_STR, Codec,
                   ColumnData, ColumnStats, EncodeContext, compute_stats,
                   from_arrow, to_arrow)
from .alphapack import AlphaPackCodec
from .delta import DeltaCodec
from .dictionary import DictCodec
from .fcode import FrontCodeCodec
from .floatbss import FloatBssCodec
from .forbp import ForBitpackCodec
from .fsst import FsstCodec
from .plain import PlainCodec
from .rle import RleCodec

_ALL = [PlainCodec(), DictCodec(), RleCodec(), ForBitpackCodec(),
        DeltaCodec(), FsstCodec(), FloatBssCodec(), AlphaPackCodec(),
        FrontCodeCodec()]

BY_NAME: dict[str, Codec] = {c.name: c for c in _ALL}
BY_ID: dict[int, Codec] = {c.codec_id: c for c in _ALL}

__all__ = [
    "BY_NAME", "BY_ID", "Codec", "ColumnData", "ColumnStats", "EncodeContext",
    "compute_stats", "from_arrow", "to_arrow",
    "KIND_STR", "KIND_INT", "KIND_FLOAT", "KIND_BOOL",
]
