"""TableIO seam tests (SURVEY §9 debt: the iceberg: path is declared but no
runtime jar exists in this sandbox — so the ROUTING is pinned by mocks: URI
dispatch, loud failure without the runtime, and the exact reader/writer
calls a real Iceberg session would receive)."""

import pytest

from colonnade_spark import tableio


def test_parquet_roundtrip_via_seam(spark, tmp_path):
    df = spark.range(10)
    tableio.write_table(df, f"parquet:{tmp_path}/t")
    assert tableio.read_table(spark, f"{tmp_path}/t").count() == 10
    # bare paths route to parquet too; partition_by passes through
    df2 = spark.range(10).selectExpr("id", "id % 2 AS par")
    tableio.write_table(df2, f"{tmp_path}/t2", partition_by=["par"])
    assert tableio.read_table(spark, f"parquet:{tmp_path}/t2").count() == 10


def test_iceberg_uri_without_runtime_fails_loudly(spark):
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        tableio.read_table(spark, "iceberg:lake.db.t")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        tableio.write_table(spark.range(1), "iceberg:lake.db.t")


def test_iceberg_routing_with_mocked_runtime(monkeypatch):
    monkeypatch.setattr(tableio, "iceberg_available", lambda s: True)

    rcalls = {}

    class FakeReader:
        def format(self, f):
            rcalls["fmt"] = f
            return self

        def load(self, loc):
            rcalls["loc"] = loc
            return "DF"

    class FakeSpark:
        read = FakeReader()

    assert tableio.read_table(FakeSpark(), "iceberg:lake.db.t") == "DF"
    assert rcalls == {"fmt": "iceberg", "loc": "lake.db.t"}

    wcalls = {}

    class FakeWriter:
        def mode(self, m):
            wcalls["mode"] = m
            return self

        def partitionBy(self, *c):
            wcalls["pb"] = c
            return self

        def format(self, f):
            wcalls["fmt"] = f
            return self

        def saveAsTable(self, loc):
            wcalls["tbl"] = loc

    class FakeDF:
        write = FakeWriter()
        sparkSession = None

    tableio.write_table(FakeDF(), "iceberg:lake.db.t", mode="append",
                        partition_by=["lang"])
    assert wcalls == {"mode": "append", "pb": ("lang",),
                      "fmt": "iceberg", "tbl": "lake.db.t"}
