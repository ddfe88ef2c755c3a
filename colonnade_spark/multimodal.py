"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signature, batch shape,
size-capped batches — is real and tested.  The *decode* step (actual
image/audio codecs) is stubbed behind :func:`register_decoder`:
this container has no media libraries, so the default decoder is either a
clearly-marked ``NotImplementedError`` ("real" mode) or a deterministic fake
(byte-histogram features) used by tests and queries.

At 100 TB: binary payloads ride the same engine as text — ``blocks.py``
handles ``binary``/``large_binary`` columns natively (plain codec; media is
already entropy-coded, so auto-selection correctly falls back to plain), and
`mapInPandas` streams batches so one task never materializes a partition.
"""

from __future__ import annotations

import sys
import zlib
from typing import Callable, Optional

import numpy as np
import pandas as pd

_DECODERS: dict = {}

FEATURE_SCHEMA = ("id bigint, n_bytes bigint, crc int, "
                  "entropy_milli bigint, features array<float>")


def register_decoder(modality: str, fn: Callable) -> None:
    """Plug a real decoder: fn(payload: bytes) -> np.ndarray feature vector."""
    _DECODERS[modality] = fn


def _fake_decode(payload: bytes, n_features: int = 8) -> np.ndarray:
    """Deterministic stand-in for a media decoder: coarse byte-histogram.
    Swap via register_decoder("image", real_fn) when codecs are available."""
    b = np.frombuffer(payload or b"", dtype=np.uint8)
    if b.size == 0:
        return np.zeros(n_features, dtype=np.float32)
    hist = np.bincount(b >> 5, minlength=n_features).astype(np.float32)
    return hist / b.size


def _entropy_milli(payload: bytes) -> int:
    b = np.frombuffer(payload or b"", dtype=np.uint8)
    if b.size == 0:
        return 0
    p = np.bincount(b, minlength=256) / b.size
    p = p[p > 0]
    return int(round(float(-(p * np.log2(p)).sum()) * 1000))


def extract_features(df, id_col: str, bin_col: str, modality: str = "fake",
                     max_batch_bytes: int = 64 << 20):
    """binary column → per-item metadata + feature vector, via mapInPandas.

    Batches are re-split by byte size inside the iterator so one giant blob
    cannot blow a task (the in-kernel size cap, SURVEY.md §4.2)."""
    from pyspark.sql import functions as F

    if modality == "real":
        raise NotImplementedError(
            "no media codecs in this environment — register_decoder() a real "
            "decoder and pass its modality name")
    decoder = _DECODERS.get(modality, _fake_decode)

    src = df.select(F.col(id_col).cast("bigint").alias("id"),
                    F.col(bin_col).alias("payload"))

    def run(batches):
        for pdf in batches:
            # size-capped sub-batches
            sizes = pdf["payload"].map(lambda p: len(p) if p is not None else 0)
            groups, acc, start = [], 0, 0
            for i, s in enumerate(sizes):
                acc += int(s)
                if acc >= max_batch_bytes:
                    groups.append((start, i + 1))
                    start, acc = i + 1, 0
            groups.append((start, len(pdf)))
            for lo, hi in groups:
                if lo >= hi:
                    continue
                sub = pdf.iloc[lo:hi]
                feats, crcs, ents, lens = [], [], [], []
                for p in sub["payload"]:
                    p = bytes(p) if p is not None else b""
                    feats.append(decoder(p).astype(np.float32).tolist())
                    crcs.append(zlib.crc32(p) - (1 << 31))
                    ents.append(_entropy_milli(p))
                    lens.append(len(p))
                yield pd.DataFrame({
                    "id": sub["id"].values,
                    "n_bytes": np.asarray(lens, dtype=np.int64),
                    "crc": np.asarray(crcs, dtype=np.int32),
                    "entropy_milli": np.asarray(ents, dtype=np.int64),
                    "features": feats,
                })

    return src.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_stub(df, id_col: str, bin_col: str, every_n: int = 10):
    """Video frame-sampling plumbing: emits (id, frame_idx, frame_bytes) rows
    where the split step is a deterministic fake (fixed-size byte windows in
    lieu of real container parsing)."""
    from pyspark.sql import functions as F

    src = df.select(F.col(id_col).cast("bigint").alias("id"),
                    F.col(bin_col).alias("payload"))

    def run(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf["id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                window = max(len(p) // max(every_n, 1), 1)
                for k in range(0, min(every_n, max(len(p), 1))):
                    lo = k * window
                    if lo >= len(p):
                        break
                    ids.append(i)
                    idxs.append(k)
                    frames.append(p[lo: lo + window])
            yield pd.DataFrame({"id": np.asarray(ids, dtype=np.int64),
                                "frame_idx": np.asarray(idxs, dtype=np.int32),
                                "frame": frames})

    return src.mapInPandas(run, schema="id bigint, frame_idx int, frame binary")
