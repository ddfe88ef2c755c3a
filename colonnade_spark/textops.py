"""Text-analysis / dedup operators for training-data pipelines.

MinHash+LSH near-duplicate detection: shingle → minhash signature (vectorized
numpy inside a pandas UDF — the only Python step) → banding → bucket
self-join → signature-estimated Jaccard filter (all JVM-side array ops).

At 100 TB scale the bucket self-join is the hazard: a degenerate bucket
(e.g. empty strings) goes quadratic.  Mitigated here by a per-bucket size cap
(drop buckets larger than ``max_bucket``; such buckets are almost always
boilerplate that exact-dedup already catches — same practice as web-dedup
pipelines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

_M64 = (1 << 64) - 1


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_M64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_M64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_M64)
    return x ^ (x >> np.uint64(31))


def minhash_signature_batch(texts, n_hashes: int = 64, shingle: int = 5) -> list:
    """Signatures for a batch of strings; pure numpy, deterministic."""
    # per-hash affine params, fixed seed
    rng = np.random.default_rng(0xC01A_0B0E)
    A = rng.integers(1, _M64, size=n_hashes, dtype=np.uint64) | np.uint64(1)
    Bc = rng.integers(0, _M64, size=n_hashes, dtype=np.uint64)
    out = []
    for t in texts:
        b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
        if b.size < shingle:
            keys = np.array([int.from_bytes(b.tobytes().ljust(8, b"\0"), "little")],
                            dtype=np.uint64)
        else:
            k = np.zeros(b.size - shingle + 1, dtype=np.uint64)
            for j in range(shingle):
                k |= b[j: b.size - shingle + 1 + j].astype(np.uint64) << np.uint64(8 * j)
            keys = np.unique(k)
        m = _mix64(keys)
        # sig_i = min over shingles of (A_i * m + B_i) mod 2^64
        sig = np.array([int((m * A[i] + Bc[i]).min()) for i in range(n_hashes)],
                       dtype=np.uint64)
        out.append((sig >> np.uint64(1)).astype(np.int64).tolist())  # fit in long
    return out


def with_minhash(df, text_col: str, sig_col: str = "sig",
                 n_hashes: int = 64, shingle: int = 5):
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(s: pd.Series) -> pd.Series:
        return pd.Series(minhash_signature_batch(s.tolist(), n_hashes, shingle))

    return df.withColumn(sig_col, sig_udf(F.col(text_col)))


def minhash_near_dup_pairs(spark, df, id_col: str, text_col: str,
                           threshold: float = 0.8, n_hashes: int = 64,
                           bands: int = 16, shingle: int = 5,
                           max_bucket: int = 200):
    """Candidate pairs sharing >=1 LSH band, kept when the signature-estimated
    Jaccard >= threshold.  Returns (id_a, id_b, est_jaccard)."""
    from pyspark.sql import functions as F

    rows = n_hashes // bands
    sigged = with_minhash(df.select(id_col, text_col), text_col,
                          n_hashes=n_hashes, shingle=shingle)
    band_arr = F.array(*[
        F.hash(F.slice("sig", i * rows + 1, rows)).cast("long").alias(f"b{i}")
        for i in range(bands)])
    exploded = (sigged.select(id_col, "sig",
                              F.posexplode(band_arr).alias("band", "bh")))
    # degenerate-bucket cap (scale guard)
    bucket_sizes = (exploded.groupBy("band", "bh")
                    .agg(F.count("*").alias("bn"))
                    .filter(F.col("bn").between(2, max_bucket)))
    pruned = exploded.join(bucket_sizes, ["band", "bh"], "left_semi")
    a = pruned.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"),
                      "band", "bh")
    b = pruned.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"),
                      "band", "bh")
    pairs = (a.join(b, ["band", "bh"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sig_a", "sig_b")
             .dropDuplicates(["id_a", "id_b"]))
    est = F.expr(f"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
                 f" / cast({n_hashes} as double)")
    return (pairs.withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= threshold)
            .select(F.col("id_a").cast("bigint"), F.col("id_b").cast("bigint"),
                    "est_jaccard"))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_batch(texts, shingle: int = 4) -> list:
    """64-bit SimHash over character shingles; pure numpy, deterministic."""
    out = []
    for t in texts:
        b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
        if b.size < shingle:
            keys = np.array([int.from_bytes(b.tobytes().ljust(8, b"\0"), "little")],
                            dtype=np.uint64)
        else:
            k = np.zeros(b.size - shingle + 1, dtype=np.uint64)
            for j in range(shingle):
                k |= b[j: b.size - shingle + 1 + j].astype(np.uint64) << np.uint64(8 * j)
            keys = np.unique(k)
        h = _mix64(keys)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        score = 2 * bits.sum(axis=0) - h.size          # +1/-1 vote per bit
        sig = int((score > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))
        out.append(sig - (1 << 63))                    # shift into int64 range
    return out


def with_simhash(df, text_col: str, sig_col: str = "simhash", shingle: int = 4):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def sim_udf(s: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(s.tolist(), shingle))

    return df.withColumn(sig_col, sim_udf(F.col(text_col)))


def simhash_near_dup_pairs(spark, df, id_col: str, text_col: str,
                           max_hamming: int = 6, shingle: int = 4,
                           max_bucket: int = 100_000):
    """Near-dup pairs by SimHash: band the 64-bit signature into 4 x 16-bit
    chunks (pigeonhole: a pair within hamming distance 3 MUST share a chunk;
    within 6 it shares one w.h.p.), bucket-join, verify exact hamming
    distance JVM-side (bit_count).

    Scale note: on homogeneous corpora the signature bits skew (most-frequent
    shingles dominate) and one chunk value can hold most of the corpus — at
    100 TB the production answer is Manku et al.'s recursive bucket split
    (re-band oversized buckets on the remaining 48 bits); here oversized
    buckets are allowed up to ``max_bucket`` and dropped beyond it."""
    from pyspark.sql import functions as F

    sigged = with_simhash(df.select(id_col, text_col), text_col, shingle=shingle)
    chunks = F.array(*[
        F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
         .cast("int").alias(f"c{i}") for i in range(4)])
    exploded = sigged.select(id_col, "simhash",
                             F.posexplode(chunks).alias("band", "bh"))
    sizes = (exploded.groupBy("band", "bh").agg(F.count("*").alias("bn"))
             .filter(F.col("bn").between(2, max_bucket)))
    pruned = exploded.join(sizes, ["band", "bh"], "left_semi")
    a = pruned.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"),
                      "band", "bh")
    b = pruned.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"),
                      "band", "bh")
    pairs = (a.join(b, ["band", "bh"]).filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sig_a", "sig_b")
             .dropDuplicates(["id_a", "id_b"]))
    ham = F.expr("bit_count(sig_a ^ sig_b)")
    return (pairs.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select(F.col("id_a").cast("bigint"), F.col("id_b").cast("bigint"),
                    "hamming"))


# --------------------------------------------------------------------------
# exact n-gram Jaccard (verification of MinHash estimates)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(spark, df, id_col: str, text_col: str, pairs_df,
                        shingle: int = 5):
    """Exact character-n-gram Jaccard for given candidate pairs: JVM-side
    array ops (array_intersect/array_union) over distinct shingle hashes —
    no Python in the join path."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def shingles_udf(s: pd.Series) -> pd.Series:
        out = []
        for t in s.tolist():
            b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
            if b.size < shingle:
                out.append([int.from_bytes(b.tobytes().ljust(8, b"\0"), "little") >> 1])
                continue
            k = np.zeros(b.size - shingle + 1, dtype=np.uint64)
            for j in range(shingle):
                k |= b[j: b.size - shingle + 1 + j].astype(np.uint64) << np.uint64(8 * j)
            out.append((np.unique(_mix64(np.unique(k))) >> np.uint64(1))
                       .astype(np.int64).tolist())
        return pd.Series(out)

    sh = df.select(F.col(id_col), shingles_udf(F.col(text_col)).alias("sh"))
    j = (pairs_df
         .join(sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
         .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b"))
    jac = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b")))
    return j.select("id_a", "id_b", jac.alias("jaccard"))
