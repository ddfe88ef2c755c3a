"""Benchmark harness (driver contract + BASELINE.md measurement protocol).

Default mode: run every registry query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], then measure encode
throughput on a deterministic generated corpus at TWO parallelism levels
(local[N/4] and local[N] — the sandbox proxy for N vs 4N executors, per
BASELINE.md) in separate JVMs, and print ONE JSON line:

  {"metric": ..., "value": <total query sec>, "unit": "sec",
   "queries": {...}, "sf": ...,
   "encode": {"gbps_low", "gbps_high", "scaling_efficiency",
              "compressed_ratio", ...}}

Worker mode (internal): bench.py --encode-worker CORES CORPUS_DIR OUT_JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_FILES = int(os.environ.get("BENCH_CORPUS_FILES", "400000"))
SEED = 42


def _corpus_dir(n_files: int) -> str:
    return f"/tmp/colonnade_bench_corpus_{n_files}_{SEED}"


def ensure_corpus(spark, n_files: int) -> str:
    from colonnade_spark.corpus import generate_corpus

    path = _corpus_dir(n_files)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_corpus(spark, n_files, seed=SEED).write.mode("overwrite").parquet(path)
    return path


def encode_worker(cores: int, corpus_dir: str, out_json: str) -> None:
    import shutil

    from pyspark.sql import functions as F

    from colonnade_spark import engine
    from colonnade_spark.plan import corpus_plan
    from colonnade_spark.session import get_spark
    from colonnade_spark.shipping import ensure_shipped

    spark = get_spark(f"encode_bench_{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    ensure_shipped(spark)
    df = spark.read.parquet(corpus_dir)
    content_bytes = df.select(F.sum(F.octet_length("content"))).collect()[0][0]
    wh = f"/tmp/colonnade_bench_wh_{cores}"
    # bucket count sized by data (~24 MB/bucket), floored at core count:
    # tiny buckets pay fixed symbol-table cost, giant ones straggle
    n_buckets = max(cores, int(content_bytes // (24 << 20)) + 1)
    # best-of-2: this host has high steal-time variance; the first attempt
    # also warms the page cache (BASELINE.md environment notes)
    wall = None
    for _attempt in range(2):
        shutil.rmtree(wh, ignore_errors=True)
        t0 = time.time()
        manifest = engine.encode_table(
            spark, df, corpus_plan(), wh, n_buckets=n_buckets,
            stripe_bytes=4 << 20, mode="overwrite", input_token=f"bench{N_FILES}")
        attempt_wall = time.time() - t0
        wall = attempt_wall if wall is None else min(wall, attempt_wall)
    # decode + verify wall (reported, not part of encode throughput)
    t1 = time.time()
    ver = engine.verify_roundtrip(spark, df, corpus_plan(), wh)
    verify_wall = time.time() - t1
    out = {"cores": cores, "encode_sec": round(wall, 3),
           "content_bytes": int(content_bytes),
           "gbps": round(content_bytes / wall / 1e9, 4),
           "bytes_in": manifest["bytes_in"], "bytes_out": manifest["bytes_out"],
           "compressed_ratio": round(manifest["bytes_out"] / max(manifest["bytes_in"], 1), 4),
           "verify_sec": round(verify_wall, 3), "verify_ok": ver["ok"]}
    with open(out_json, "w") as f:
        json.dump(out, f)
    spark.stop()


def run_queries(spark, sf_dir: str) -> dict:
    from colonnade_spark.queries import registry

    timings = {}
    for name, (fn, _sql) in registry().items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # N vs 4N scaling pair: default 2 vs 8 — this host's CPU is overcommitted
    # above ~8 vCPUs with +-4x run variance at 32-way (see BASELINE.md
    # "Measured" notes and the full 1/2/4/8/32 ladder there)
    low = int(os.environ.get("BENCH_SCALE_LOW", "2"))
    high = min(int(os.environ.get("BENCH_SCALE_HIGH", "8")), cpus)
    low = min(low, max(high // 4, 1))

    from colonnade_spark.session import get_spark
    from colonnade_spark.shipping import ensure_shipped

    spark = get_spark("bench_queries", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_shipped(spark)
    corpus_dir = ensure_corpus(spark, N_FILES)
    timings = run_queries(spark, sf_dir)
    spark.stop()

    encode = {}
    if os.environ.get("BENCH_SKIP_ENCODE") != "1":
        results = {}
        for cores in (low, high):
            out_json = f"/tmp/colonnade_bench_out_{cores}.json"
            subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--encode-worker", str(cores), corpus_dir, out_json],
                           check=True, stdout=subprocess.DEVNULL)
            with open(out_json) as f:
                results[cores] = json.load(f)
        lo, hi = results[low], results[high]
        encode = {
            "corpus_files": N_FILES,
            "content_bytes": lo["content_bytes"],
            f"gbps_local{low}": lo["gbps"],
            f"gbps_local{high}": hi["gbps"],
            f"encode_sec_local{low}": lo["encode_sec"],
            f"encode_sec_local{high}": hi["encode_sec"],
            "scaling_efficiency": round(hi["gbps"] / (lo["gbps"] * (high / low)), 4),
            "scale_pair": [low, high],
            "compressed_ratio": hi["compressed_ratio"],
            "verify_ok": hi["verify_ok"],
        }

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "query wall-clock + encode GB/s at two parallelism levels",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "encode": encode,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--encode-worker":
        encode_worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    else:
        main()
