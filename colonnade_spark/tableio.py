"""TableIO — seam between the engine and the table store.

SURVEY.md §7: no Iceberg runtime jar exists in this sandbox, so Iceberg
integration sits behind this abstraction: URIs select the backend —

* ``parquet:/abs/path`` (or a bare path) — plain deterministic parquet
  directory (no table metadata), used by most tests;
* ``snap:/abs/path`` — the snapshot-log parquet backend: every write
  commits a new immutable snapshot (monotonic id, operation, live file
  set) to ``_snapshots.json``; reads resolve the latest snapshot or a
  requested ``snapshot_id`` (time travel).  This is the sandbox stand-in
  that PROVES the seam's snapshot/overwrite/append contract with real
  I/O — the same observable semantics Iceberg's catalog provides;
* ``iceberg:catalog.db.table`` — a real Iceberg table when the session has
  the runtime (spark-submit with
  ``--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>``
  and a configured catalog, e.g.
  ``--conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog``
  ``--conf spark.sql.catalog.lake.type=hadoop``
  ``--conf spark.sql.catalog.lake.warehouse=s3://bucket/wh``).
  The snapshot surface maps onto Iceberg's documented API (the
  ``<table>.snapshots`` metadata table; ``option("snapshot-id", …)``
  reads) — tests/test_tableio.py pins the exact calls.

The engine's block/marker/lineage layout is filesystem-based by design
(per-partition checkpoint markers need atomic file publication); TableIO
covers the *row-table* surfaces: input corpus, decoded output, lineage
published as a queryable table.

Concurrency contract of ``snap:``: one writer at a time per table (the
engine's job-level discipline); readers are safe during a write because a
snapshot's file set is immutable and the log is published by atomic
rename.  Iceberg strengthens this to optimistic multi-writer commits —
one of the reasons the real catalog is the production target.
"""

from __future__ import annotations

import json
import os
import uuid


def iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _split(uri: str) -> tuple[str, str]:
    for scheme in ("iceberg", "snap", "parquet"):
        if uri.startswith(scheme + ":"):
            return scheme, uri[len(scheme) + 1:]
    return "parquet", uri


def _snap_log(loc: str) -> str:
    return os.path.join(loc, "_snapshots.json")


def _read_log(loc: str) -> list:
    try:
        with open(_snap_log(loc)) as f:
            return json.load(f)
    except FileNotFoundError:
        return []


def _publish_log(loc: str, log: list) -> None:
    tmp = os.path.join(loc, f"_snapshots_{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as f:
        json.dump(log, f, indent=1)
    os.replace(tmp, _snap_log(loc))     # atomic: readers see old or new


def snapshots(spark, uri: str) -> list:
    """Snapshot history, oldest first: ``[{"id", "op", "dirs"}, ...]`` for
    ``snap:``; for ``iceberg:`` the catalog's ``<table>.snapshots``
    metadata table (documented Iceberg surface)."""
    kind, loc = _split(uri)
    if kind == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg: URI but no Iceberg runtime in this session")
        rows = spark.sql(
            f"SELECT snapshot_id, operation FROM {loc}.snapshots "
            "ORDER BY committed_at").collect()
        return [{"id": r[0], "op": r[1]} for r in rows]
    if kind != "snap":
        raise ValueError(f"snapshots(): {uri!r} is not a snapshot table")
    return _read_log(loc)


def read_table(spark, uri: str, snapshot_id: int | None = None):
    kind, loc = _split(uri)
    if kind == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg: URI but no Iceberg runtime in this session — "
                "add --packages org.apache.iceberg:iceberg-spark-runtime-*")
        r = spark.read.format("iceberg")
        if snapshot_id is not None:
            r = r.option("snapshot-id", snapshot_id)
        return r.load(loc)
    if kind == "snap":
        log = _read_log(loc)
        if not log:
            raise FileNotFoundError(f"no snapshots at {loc}")
        snap = log[-1] if snapshot_id is None else next(
            (s for s in log if s["id"] == snapshot_id), None)
        if snap is None:
            raise ValueError(f"snapshot {snapshot_id} not found at {loc} "
                             f"(have {[s['id'] for s in log]})")
        if not snap["dirs"]:
            return spark.range(0).limit(0)      # empty table, schema-less
        return spark.read.parquet(*[os.path.join(loc, d)
                                    for d in snap["dirs"]])
    if snapshot_id is not None:
        raise ValueError("snapshot_id requires a snap: or iceberg: URI")
    return spark.read.parquet(loc)


def write_table(df, uri: str, mode: str = "overwrite",
                partition_by: list | None = None) -> None:
    kind, loc = _split(uri)
    if kind == "snap":
        if mode not in ("overwrite", "append"):
            raise ValueError(f"snap: backend supports overwrite/append, "
                             f"not {mode!r}")
        os.makedirs(loc, exist_ok=True)
        log = _read_log(loc)
        snap_id = (log[-1]["id"] + 1) if log else 1
        d = f"snap-{snap_id}-{uuid.uuid4().hex[:8]}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(os.path.join(loc, d))         # data first, commit last
        live = [d] if mode == "overwrite" else \
            (log[-1]["dirs"] if log else []) + [d]
        log.append({"id": snap_id, "op": mode, "dirs": live})
        _publish_log(loc, log)
        return
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


def expire_snapshots(uri: str, keep_last: int = 1) -> list:
    """Iceberg-maintenance analog (``expireSnapshots``): drop history
    older than the last ``keep_last`` snapshots and delete data dirs no
    surviving snapshot references.  Returns the removed snapshot ids."""
    import shutil

    kind, loc = _split(uri)
    if kind != "snap":
        raise ValueError("expire_snapshots() operates on snap: tables; "
                         "iceberg: tables use the catalog's own "
                         "expireSnapshots procedure")
    if keep_last < 1:
        # log[-0:] is the WHOLE log: keep_last=0 would silently no-op
        # while the caller asked to drop all history
        raise ValueError("keep_last must be >= 1 (a table always keeps "
                         "its current snapshot)")
    log = _read_log(loc)
    if len(log) <= keep_last:
        return []
    kept, dropped = log[-keep_last:], log[:-keep_last]
    live = {d for s in kept for d in s["dirs"]}
    _publish_log(loc, kept)                     # commit first, gc after
    for s in dropped:
        for d in s["dirs"]:
            if d not in live:
                shutil.rmtree(os.path.join(loc, d), ignore_errors=True)
    return [s["id"] for s in dropped]
