"""Micro-profile of the single-core auto-encode path on a realistic stripe.

Run with nothing else on the VM (CLAUDE.md: ±4x steal variance).  Applies the
session MALLOC env, warms up once, and times the SECOND pass; optional
--profile prints a cProfile top-30 of that second pass.

Usage: python scripts/profile_encode.py [n_files] [--profile]
"""
import sys
import time

sys.path.insert(0, ".")
from colonnade_spark.session import _apply_malloc_env  # noqa: E402

_apply_malloc_env()

import pyarrow as pa  # noqa: E402

from colonnade_spark.codecs import EncodeContext  # noqa: E402
from colonnade_spark.corpus import generate_corpus_arrow  # noqa: E402
from colonnade_spark.blocks import encode_block  # noqa: E402


def run(tbl: pa.Table) -> tuple[float, int, int]:
    total_in = 0
    total_out = 0
    t0 = time.perf_counter()
    for name in tbl.column_names:
        ctx = EncodeContext()
        arr = tbl.column(name).combine_chunks()
        blk = encode_block(arr, "auto", ctx=ctx)
        total_in += arr.nbytes
        total_out += len(blk)
    return time.perf_counter() - t0, total_in, total_out


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4000
    tbl = generate_corpus_arrow(n_files, seed=42)
    print(f"corpus: {n_files} files, {tbl.nbytes / 1e6:.1f} MB arrow")
    run(tbl)  # warm-up (page faults)
    if "--profile" in sys.argv:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        dt, tin, tout = run(tbl)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(30)
    else:
        dt, tin, tout = run(tbl)
    print(f"encode: {dt:.3f}s  {tin / 1e6:.1f} MB in -> {tout / 1e6:.1f} MB out "
          f"({tin / dt / 1e6:.1f} MB/s, ratio {tout / tin:.3f})")


if __name__ == "__main__":
    main()
