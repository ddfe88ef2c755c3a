"""Streaming ingestion: file-source readStream → foreachBatch → resumable
per-batch encode jobs; incremental pickup of new files; union decode with
sha-equality (the streaming generalization of the reference's
encodeCsvStream + continuation resume, SURVEY.md §2.7)."""

import os

import pytest

from colonnade_spark import engine, streaming
from colonnade_spark.corpus import generate_corpus
from colonnade_spark.plan import corpus_plan


def test_stream_encode_ingests_and_resumes_incrementally(spark, tmp_path):
    src = str(tmp_path / "incoming")
    wh = str(tmp_path / "wh")
    plan = corpus_plan()

    # two initial files → two micro-batches (maxFilesPerTrigger=1)
    df1 = generate_corpus(spark, 120, seed=1)
    df1.coalesce(1).write.mode("append").parquet(src)
    df2 = generate_corpus(spark, 80, seed=2)
    df2.coalesce(1).write.mode("append").parquet(src)

    streaming.stream_encode(spark, src, wh, plan, n_buckets=2)
    batches = streaming.batch_warehouses(wh)
    assert len(batches) == 2
    m = streaming.stream_manifest(wh)
    assert m["rows"] == 200 and m["batches"] == 2

    decoded = streaming.stream_decode(spark, wh)
    assert decoded.count() == 200
    # full sha-equality against the union of sources
    src_df = spark.read.parquet(src)
    from pyspark.sql import functions as F
    j = (decoded.select("repo", "path", "commit",
                        F.sha2("content", 256).alias("h_d"))
         .join(src_df.select("repo", "path", "commit",
                             F.sha2("content", 256).alias("h_s")),
               ["repo", "path", "commit"], "full"))
    bad = j.filter("h_d IS NULL OR h_s IS NULL OR h_d <> h_s").count()
    assert bad == 0

    # a third file arrives later: re-invoking processes ONLY the new file
    before = {b: os.path.getmtime(os.path.join(b, "manifest.json"))
              for b in batches}
    df3 = generate_corpus(spark, 50, seed=3)
    df3.coalesce(1).write.mode("append").parquet(src)
    streaming.stream_encode(spark, src, wh, plan, n_buckets=2)
    batches2 = streaming.batch_warehouses(wh)
    assert len(batches2) == 3
    for b, t in before.items():  # old batches untouched
        assert os.path.getmtime(os.path.join(b, "manifest.json")) == t
    assert streaming.stream_manifest(wh)["rows"] == 250
    assert streaming.stream_decode(spark, wh).count() == 250


def test_stream_decode_empty_warehouse_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        streaming.stream_decode(spark, str(tmp_path / "nope"))
