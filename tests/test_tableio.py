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


def test_snap_backend_snapshot_overwrite_append_contract(spark, tmp_path):
    """The seam's snapshot contract, proven with real I/O on the snap:
    backend (the sandbox stand-in for an Iceberg catalog): monotonic
    snapshot ids, append accumulates, overwrite replaces, immutable
    history supports time travel, expiry drops history and garbage."""
    import os

    uri = f"snap:{tmp_path}/t"
    ids = lambda df: sorted(r[0] for r in df.collect())

    tableio.write_table(spark.range(0, 3), uri)                  # snap 1
    tableio.write_table(spark.range(10, 12), uri, mode="append")  # snap 2
    assert ids(tableio.read_table(spark, uri)) == [0, 1, 2, 10, 11]
    tableio.write_table(spark.range(100, 101), uri)              # snap 3
    assert ids(tableio.read_table(spark, uri)) == [100]

    log = tableio.snapshots(spark, uri)
    assert [s["id"] for s in log] == [1, 2, 3]
    assert [s["op"] for s in log] == ["overwrite", "append", "overwrite"]

    # time travel: every historical snapshot still reproduces exactly
    assert ids(tableio.read_table(spark, uri, snapshot_id=1)) == [0, 1, 2]
    assert ids(tableio.read_table(spark, uri, snapshot_id=2)) == [0, 1, 2, 10, 11]
    with pytest.raises(ValueError, match="snapshot 99 not found"):
        tableio.read_table(spark, uri, snapshot_id=99)
    with pytest.raises(ValueError, match="snapshot_id requires"):
        tableio.read_table(spark, f"{tmp_path}/t", snapshot_id=1)

    # expiry: history gone, latest intact, orphan data dirs deleted
    removed = tableio.expire_snapshots(uri, keep_last=1)
    assert removed == [1, 2]
    assert ids(tableio.read_table(spark, uri)) == [100]
    with pytest.raises(ValueError, match="not found"):
        tableio.read_table(spark, uri, snapshot_id=1)
    dirs = [d for d in os.listdir(f"{tmp_path}/t") if d.startswith("snap-")]
    assert len(dirs) == 1 and dirs[0].startswith("snap-3-")


def test_iceberg_snapshot_surface_pinned(monkeypatch):
    """Beyond URI routing: pin the exact Iceberg snapshot-API calls the
    seam issues — the <table>.snapshots metadata query and the
    option("snapshot-id", ...) time-travel read (both documented Iceberg
    surfaces) — against a fake that replays a catalog's answers."""
    monkeypatch.setattr(tableio, "iceberg_available", lambda s: True)

    calls = {}

    class FakeRow(tuple):
        pass

    class FakeSpark:
        def sql(self, q):
            calls["sql"] = q

            class R:
                @staticmethod
                def collect():
                    return [FakeRow((101, "overwrite")),
                            FakeRow((202, "append"))]
            return R()

        class read:  # noqa: N801 - mimics the pyspark property surface
            @staticmethod
            def format(f):
                calls["fmt"] = f

                class Chain:
                    @staticmethod
                    def option(k, v):
                        calls["option"] = (k, v)
                        return Chain

                    @staticmethod
                    def load(loc):
                        calls["loc"] = loc
                        return "DF"
                return Chain

    snaps = tableio.snapshots(FakeSpark(), "iceberg:lake.db.t")
    assert calls["sql"] == ("SELECT snapshot_id, operation FROM "
                            "lake.db.t.snapshots ORDER BY committed_at")
    assert snaps == [{"id": 101, "op": "overwrite"},
                     {"id": 202, "op": "append"}]

    assert tableio.read_table(FakeSpark(), "iceberg:lake.db.t",
                              snapshot_id=202) == "DF"
    assert calls["fmt"] == "iceberg"
    assert calls["option"] == ("snapshot-id", 202)
    assert calls["loc"] == "lake.db.t"


def test_snap_backend_random_sequences_match_model(spark, tmp_path):
    """Model-based check: random op sequences (overwrite/append/expire)
    against an in-memory reference model — latest-state and every
    surviving snapshot's time-travel read must match the model exactly.
    Deterministic seed; splitmix-style op choice (no Python hash())."""
    def mix(x):
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & (1 << 64) - 1
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & (1 << 64) - 1
        return x ^ (x >> 31)

    for seq in range(4):
        uri = f"snap:{tmp_path}/t{seq}"
        model = []          # list of (snap_id, frozenset(rows))
        next_vals = iter(range(1000))
        sid = 0
        for step in range(6):
            r = mix(seq * 1000 + step)
            op = ("overwrite", "append", "expire")[r % 3]
            if op == "expire":
                if not model:
                    continue
                keep = max(1, (r >> 8) % (len(model) + 1))
                tableio.expire_snapshots(uri, keep_last=keep)
                model = model[-keep:]
                continue
            vals = [next(next_vals) for _ in range((r >> 16) % 3 + 1)]
            tableio.write_table(
                spark.createDataFrame([(v,) for v in vals], "v long"),
                uri, mode=op)
            sid += 1
            prev = model[-1][1] if (op == "append" and model) else frozenset()
            model.append((sid, prev | frozenset(vals)))
            # sid bookkeeping: the backend's ids are monotonic and survive
            # expiry, so re-read them to stay aligned
            model[-1] = (tableio.snapshots(spark, uri)[-1]["id"],
                         model[-1][1])
        if not model:
            continue
        got_log = tableio.snapshots(spark, uri)
        assert [s["id"] for s in got_log] == [m[0] for m in model]
        for snap_id, expect in model:
            got = frozenset(r["v"] for r in tableio.read_table(
                spark, uri, snapshot_id=snap_id).collect())
            assert got == expect, (seq, snap_id)
