"""Structured Streaming ingestion into the blocks warehouse.

The reference's streaming surface is incremental pull-based chunk encode
with resumable parser state (`encodeCsvStream`,
/root/reference/siphon/src/Siphon.hs:122-137; continuation-resume
Siphon.hs:612-616).  The Spark-native generalization is file-source
``readStream`` → ``foreachBatch`` → one *resumable encode job per
micro-batch*:

* each micro-batch encodes into its own sub-warehouse
  (``<warehouse>/batch=<id>``) through the full engine (salted staging,
  per-bucket checkpoint markers, lineage);
* Structured Streaming's checkpoint gives exactly-once batch ids — a
  crashed run replays only unfinished batches, and byte-determinism makes
  the replay idempotent (the engine-level analog of the reference's parser
  continuations);
* the decode side unions every batch's blocks — a reader never needs
  cross-batch state (blocks are row-aligned and self-describing).

This is ingestion micro-batching, not event-time analytics; the windowed /
watermark aggregation shape lives in ``queries.q_events_window`` (the same
``F.window`` operator Structured Streaming plans incrementally).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

from . import engine
from .plan import EncodePlan


def stream_encode(spark, input_path: str, warehouse: str, plan: EncodePlan,
                  *, checkpoint_dir: str | None = None, n_buckets: int = 4,
                  stripe_bytes: int = 4 << 20, max_files_per_trigger: int = 1,
                  await_termination: bool = True):
    """Ingest a growing directory of parquet files into the warehouse.

    Runs with ``availableNow`` semantics: processes everything currently
    available (in ``max_files_per_trigger``-file micro-batches) and stops.
    Re-invoking later picks up only NEW files (the streaming checkpoint
    remembers processed ones) — incremental ingestion with engine-level
    resume inside each batch.
    """
    checkpoint_dir = checkpoint_dir or os.path.join(warehouse, "_stream_ckpt")
    os.makedirs(warehouse, exist_ok=True)
    schema = spark.read.parquet(input_path).schema

    def handle_batch(df, batch_id: int) -> None:
        sub = os.path.join(warehouse, f"batch={batch_id}")
        engine.encode_table(spark, df, plan, sub, n_buckets=n_buckets,
                            stripe_bytes=stripe_bytes, mode="resume",
                            input_token=f"stream_batch_{batch_id}")

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", str(max_files_per_trigger))
         .parquet(input_path)
         .writeStream.foreachBatch(handle_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    if await_termination:
        q.awaitTermination()
    return q


def stream_windowed_counts(spark, input_path: str, out_dir: str, *,
                           checkpoint_dir: str, ts_col: str = "ts",
                           key_col: str = "event_type",
                           window: str = "1 hour",
                           watermark: str = "30 minutes",
                           max_files_per_trigger: int = 1):
    """Event-time windowed aggregation with a WATERMARK over a file stream —
    the late-data shape of Structured Streaming: windows finalize once the
    watermark (max seen event time − ``watermark``) passes their end, and
    events arriving later than the watermark are dropped, not double
    counted.  Append-mode parquet sink; the watermark state lives in the
    streaming checkpoint, so late data across RESTARTS is handled too
    (re-invoke with the same checkpoint).  Returns after draining available
    input (``availableNow``)."""
    from pyspark.sql import functions as F

    schema = spark.read.parquet(input_path).schema
    agg = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .parquet(input_path)
           .withWatermark(ts_col, watermark)
           .groupBy(F.window(ts_col, window), key_col)
           .agg(F.count("*").alias("n_events")))
    q = (agg.select(F.col("window.start").alias("win_start"), key_col,
                    "n_events")
         .writeStream.outputMode("append").format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def stream_dedup_exact(spark, input_path: str, *, checkpoint_dir: str,
                       out_dir: str, text_col: str = "content",
                       max_files_per_trigger: int = 1,
                       timeout_minutes: int = 0):
    """Streaming exact deduplication — a CUSTOM STATEFUL operator via
    ``applyInPandasWithState``: state is keyed by the content hash; the
    first arrival of each distinct content passes through, every later
    duplicate (same batch or any later batch) is dropped.  The training-
    pipeline "dedup the firehose" shape: state is partitioned by key (scales
    horizontally) and checkpointed (restart-safe).  Appends survivors to
    ``out_dir`` and returns after draining available input."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = spark.read.parquet(input_path).schema
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .parquet(input_path)
           .withColumn("__h", F.sha2(F.col(text_col), 256)))

    out_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in schema.fields)

    def keep_first(key, pdfs, state: GroupState):
        seen = state.exists
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if not seen:
                seen = True
                state.update((1,))
                yield pdf.iloc[[0]].drop(columns=["__h"])
            # later rows of this key (this batch or later ones): duplicates

    q = (src.groupBy("__h")
         .applyInPandasWithState(keep_first, outputStructType=out_ddl,
                                 stateStructType="n int",
                                 outputMode="append",
                                 timeoutConf=GroupStateTimeout.NoTimeout)
         .writeStream.outputMode("append").format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def stream_dedup_near(spark, input_path: str, *, checkpoint_dir: str,
                      out_dir: str, text_col: str = "content",
                      threshold: float = 0.8, n_hashes: int = 64,
                      max_kept_per_bucket: int = 8,
                      max_files_per_trigger: int = 1):
    """Streaming NEAR-duplicate dedup — the stateful-streaming analog of
    :func:`textops.dedup_near_keep_first`: state is keyed by the document's
    64-bit SimHash (near-identical documents collide), and within a bucket
    each arrival is verified against the MinHash signatures of the
    already-kept documents (estimated Jaccard >= ``threshold`` → dropped).
    Both signatures ride the stream as stateless vectorized projections;
    only signatures (never text) live in state.

    Recall contract (the streaming pigeonhole): only candidates whose
    SimHash collides EXACTLY are compared — hamming>0 near-dups pass
    through, to be swept by the batch operator's multi-band LSH.  State per
    bucket is capped at ``max_kept_per_bucket`` signatures (degenerate
    buckets are boilerplate that exact dedup already catches).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import ArrayType, LongType

    from .textops import minhash_signature_batch, simhash_batch

    schema = spark.read.parquet(input_path).schema

    @F.pandas_udf(LongType())
    def sim_udf(s: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(s.tolist()))

    @F.pandas_udf(ArrayType(LongType()))
    def minsig_udf(s: pd.Series) -> pd.Series:
        return pd.Series(minhash_signature_batch(s.tolist(), n_hashes))

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .parquet(input_path)
           .withColumn("__sim", sim_udf(F.col(text_col)))
           .withColumn("__msig", minsig_udf(F.col(text_col))))

    out_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in schema.fields)

    def keep_novel(key, pdfs, state: GroupState):
        kept = np.array(state.get[0], dtype=np.int64).reshape(-1, n_hashes) \
            if state.exists else np.empty((0, n_hashes), dtype=np.int64)
        for pdf in pdfs:
            emit_rows = []
            for i in range(len(pdf)):
                sig = np.asarray(pdf["__msig"].iloc[i], dtype=np.int64)
                if kept.size:
                    est = (kept == sig).mean(axis=1).max()
                    if est >= threshold:
                        continue                      # near-dup of a kept doc
                emit_rows.append(i)
                if len(kept) < max_kept_per_bucket:
                    kept = np.vstack([kept, sig])
            if emit_rows:
                yield pdf.iloc[emit_rows].drop(columns=["__sim", "__msig"])
        state.update((kept.ravel().tolist(),))

    q = (src.groupBy("__sim")
         .applyInPandasWithState(keep_novel, outputStructType=out_ddl,
                                 stateStructType="sigs array<bigint>",
                                 outputMode="append",
                                 timeoutConf=GroupStateTimeout.NoTimeout)
         .writeStream.outputMode("append").format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def batch_warehouses(warehouse: str) -> list:
    return sorted(glob.glob(os.path.join(warehouse, "batch=*")),
                  key=lambda p: int(p.rsplit("=", 1)[1]))


def stream_decode(spark, warehouse: str):
    """Union-decode every ingested batch's blocks (schemas identical: one
    plan governs the stream)."""
    out = None
    for sub in batch_warehouses(warehouse):
        d = engine.decode_table(spark, sub)
        out = d if out is None else out.unionByName(d)
    if out is None:
        raise FileNotFoundError(f"no ingested batches under {warehouse}")
    return out


def stream_manifest(warehouse: str) -> dict:
    """Merged manifest over all ingested batches (corpus totals)."""
    subs = batch_warehouses(warehouse)
    manifests = [engine.read_manifest(s) for s in subs]
    return {
        "batches": len(manifests),
        "rows": sum(m["rows"] for m in manifests),
        "bytes_in": sum(m["bytes_in"] for m in manifests),
        "bytes_out": sum(m["bytes_out"] for m in manifests),
        "plan_hash": manifests[-1]["plan_hash"] if manifests else None,
    }


def stream_sessionize(spark, input_path: str, *, checkpoint_dir: str,
                      out_dir: str, ts_col: str = "ts",
                      key_col: str = "user_id", gap: str = "30 minutes",
                      watermark: str = "1 hour",
                      max_files_per_trigger: int = 1):
    """Streaming gap-based sessionization via Spark's NATIVE
    ``session_window`` (merging event-time windows: a session extends
    while events arrive within ``gap`` of its current end and finalizes
    once the watermark passes end+gap).  The streaming twin of
    ``queries.q_events_sessionize`` — same 30-min-gap semantics, but
    incremental with checkpointed state: a restart resumes open sessions
    instead of recomputing (re-invoke with the same checkpoint).
    Append-mode parquet sink; returns after draining available input."""
    from pyspark.sql import functions as F

    schema = spark.read.parquet(input_path).schema
    agg = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .parquet(input_path)
           .withWatermark(ts_col, watermark)
           .groupBy(F.session_window(ts_col, gap), key_col)
           .agg(F.count("*").alias("n_events"),
                F.min(ts_col).alias("first_ts")))
    q = (agg.select(key_col,
                    F.col("session_window.start").alias("sess_start"),
                    F.col("session_window.end").alias("sess_end"),
                    "n_events", "first_ts")
         .writeStream.outputMode("append").format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
