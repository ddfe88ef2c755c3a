"""TableIO — thin seam between the engine and the table store.

SURVEY.md §7: no Iceberg runtime jar exists in this sandbox, so Iceberg
integration sits behind this abstraction: URIs select the backend —

* ``parquet:/abs/path`` (or a bare path) — deterministic local warehouse
  (partitioned parquet + the engine's JSON manifests), used by all tests;
* ``iceberg:catalog.db.table`` — a real Iceberg table when the session has
  the runtime (spark-submit with
  ``--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>``
  and a configured catalog, e.g.
  ``--conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog``
  ``--conf spark.sql.catalog.lake.type=hadoop``
  ``--conf spark.sql.catalog.lake.warehouse=s3://bucket/wh``).

The engine's block/marker/lineage layout is filesystem-based by design
(per-partition checkpoint markers need atomic file publication); TableIO
covers the *row-table* surfaces: input corpus, decoded output, lineage
published as a queryable table.
"""

from __future__ import annotations


def iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _split(uri: str) -> tuple[str, str]:
    if uri.startswith("iceberg:"):
        return "iceberg", uri[len("iceberg:"):]
    if uri.startswith("parquet:"):
        return "parquet", uri[len("parquet:"):]
    return "parquet", uri


def read_table(spark, uri: str):
    kind, loc = _split(uri)
    if kind == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg: URI but no Iceberg runtime in this session — "
                "add --packages org.apache.iceberg:iceberg-spark-runtime-*")
        return spark.read.format("iceberg").load(loc)
    return spark.read.parquet(loc)


def write_table(df, uri: str, mode: str = "overwrite",
                partition_by: list | None = None) -> None:
    kind, loc = _split(uri)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if kind == "iceberg":
        if not iceberg_available(df.sparkSession):
            raise RuntimeError(
                "iceberg: URI but no Iceberg runtime in this session")
        w.format("iceberg").saveAsTable(loc)
    else:
        w.parquet(loc)
