"""Ship the package to executors (spark-submit --py-files equivalent,
done programmatically so the driver contract works from any session)."""

from __future__ import annotations

import os
import zipfile

_shipped: set = set()


def package_zip(dest_dir: str = "/tmp") -> str:
    """Deterministic zip of the colonnade_spark package for --py-files.

    Atomic publish (unique tmp + os.replace, the repo-wide discipline):
    concurrent driver processes — parallel pytest workers, simultaneous
    submit_job runs — otherwise race on the shared fixed path and an
    executor can addPyFile a torn zip."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(dest_dir, "colonnade_spark_pyfiles.zip")
    tmp = f"{out}.{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join("colonnade_spark",
                                   os.path.relpath(full, pkg_dir))
                z.write(full, rel)
    os.replace(tmp, out)
    return out


def ensure_shipped(spark, warm: bool = True) -> None:
    """Idempotently addPyFile the package zip to the session, then verify
    the ship by importing the package in every executor python worker.

    The verification doubles as the executor warm-up (once per session):
    it forks each python worker, imports numpy/pyarrow/colonnade_spark and
    dlopens the C kernels, and exercises the mapInArrow + AQE codegen
    paths — one-time session costs (~1-2 s) that otherwise land inside
    whichever measured job happens to run the first Python stage (guide
    §1: measure the computation, not the environment spin-up; same
    stance as bench._warm_workers for the query phase)."""
    sc = spark.sparkContext
    if sc.applicationId in _shipped:
        return
    sc.addPyFile(package_zip())
    _shipped.add(sc.applicationId)
    if not warm:
        return

    def probe(batches):
        # import-check the shipped package where it matters: in the worker.
        # get_lib() builds/dlopens the C kernels; the micro round-trip
        # first-touches the numpy codec paths.
        import pyarrow as _pa

        from colonnade_spark import blocks
        from colonnade_spark.codecs import _native
        _native.get_lib()
        blocks.decode_block(blocks.encode_block(_pa.array(["warm", "up"])))
        for batch in batches:
            yield batch

    # the warm-up plan mirrors the engine's shape — broadcast join,
    # hash repartition, in-partition sort, mapInArrow, partial+final agg —
    # so Catalyst's analyzer/optimizer rules and the whole-stage codegen
    # for those operators JIT here, not in the first measured query
    from pyspark.sql import functions as F

    n = max(int(sc.defaultParallelism), 1)
    small = spark.range(4).selectExpr("cast(id as int) as g", "id as sk")
    (spark.range(n * 2, numPartitions=n)
     .selectExpr("cast(id as string) as s", "cast(id % 4 as int) as g")
     .join(F.broadcast(small), "g")
     .repartition(max(n, 4), F.col("g"))
     .sortWithinPartitions("g", "s")
     .select("s")
     .mapInArrow(probe, "s string")
     .write.format("noop").mode("overwrite").save())
