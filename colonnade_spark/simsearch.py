"""Similarity search over embedding columns (array<float>).

Two paths, per the training-pipeline requirements:

* :func:`brute_force_topk` — exact cosine top-k, all math JVM-side
  (``zip_with`` + ``aggregate`` in DOUBLE, broadcast query side).  The
  correctness baseline; O(n_queries × n_corpus).
* :func:`lsh_topk` — random-hyperplane LSH: b-bit signatures from
  deterministic hyperplanes (seeded splitmix, no stored model), candidates
  share a signature band, exact re-rank within candidates.  The scale path:
  the corpus-side join key is the band hash, so at 100 TB the self-join is
  bucket-local instead of a full cross join.

* :func:`cosine_near_dup_pairs` — embedding near-duplicate pairs above a
  cosine threshold.  Default is the LSH-banded scale path (candidates share
  >=1 random-hyperplane band; exact cosine verified on candidates only — no
  CartesianProduct in the plan); ``exact=True`` switches to the exhaustive
  all-pairs comparison (the oracle baseline; O(n²), driver-capped inputs
  only).
"""

from __future__ import annotations

import numpy as np

_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double),"
        " (s, v) -> s + v)")


def _dbl(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


def _planes(dim: int, n_bits: int, seed: int = 0x51AE) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (unit-free; sign test only)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def with_lsh_signature(df, vec_col: str, dim: int, n_bits: int = 32,
                       sig_col: str = "lsh_sig", seed: int = 0x51AE):
    """Add an n_bits-bit random-hyperplane signature column (JVM-side dot
    products against literal plane vectors — no Python)."""
    from pyspark.sql import functions as F

    planes = _planes(dim, n_bits, seed)
    sig = None
    for i in range(n_bits):
        lit = "array(" + ",".join(f"cast({v:.17g} as double)" for v in planes[i]) + ")"
        bit = F.when(F.expr(_DOT.format(a=_dbl(vec_col), b=lit)) > 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else (sig.bitwiseOR(F.shiftleft(bit, i)))
    return df.withColumn(sig_col, sig)


def brute_force_topk(spark, queries_df, corpus_df, vec_col: str, id_col: str,
                     k: int = 5):
    """Exact cosine top-k; queries broadcast, ranks deterministic
    (sim desc, id asc)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    q = queries_df.select(F.col(id_col).alias("qid"),
                          F.expr(_dbl(vec_col)).alias("qe"))
    c = corpus_df.select(F.col(id_col).alias("nid"),
                         F.expr(_dbl(vec_col)).alias("ce"))
    dot = _DOT.format(a="qe", b="ce")
    nq = _DOT.format(a="qe", b="qe")
    nc = _DOT.format(a="ce", b="ce")
    sim = F.expr(f"({dot}) / sqrt(({nq}) * ({nc}))")
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (c.crossJoin(F.broadcast(q)).withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
            .select("qid", "nid", "rank", "sim"))


def lsh_topk(spark, queries_df, corpus_df, vec_col: str, id_col: str,
             dim: int, k: int = 5, n_bits: int = 16, bands: int = 4):
    """Approximate top-k: candidates share >=1 LSH band (n_bits/bands bits
    each), exact cosine re-rank within candidates only."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rb = n_bits // bands
    mask = (1 << rb) - 1

    def banded(df, prefix):
        sig = with_lsh_signature(df.select(F.col(id_col).alias(f"{prefix}id"),
                                           F.expr(_dbl(vec_col)).alias(f"{prefix}e")),
                                 f"{prefix}e", dim, n_bits)
        bandcols = F.array(*[
            F.shiftright(F.col("lsh_sig"), i * rb).bitwiseAND(F.lit(mask))
            for i in range(bands)])
        return sig.select(f"{prefix}id", f"{prefix}e",
                          F.posexplode(bandcols).alias("band", "bh"))

    qb, cb = banded(queries_df, "q"), banded(corpus_df, "c")
    cand = (cb.join(F.broadcast(qb), ["band", "bh"])
            .dropDuplicates(["qid", "cid"]))
    dot = _DOT.format(a="qe", b="ce")
    nq = _DOT.format(a="qe", b="qe")
    nc = _DOT.format(a="ce", b="ce")
    sim = F.expr(f"({dot}) / sqrt(({nq}) * ({nc}))")
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (cand.withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
            .select("qid", F.col("cid").alias("nid"), "rank", "sim"))


def cosine_near_dup_pairs(spark, df, vec_col: str, id_col: str,
                          threshold: float = 0.9, *, exact: bool = False,
                          dim: int | None = None, n_bits: int = 32,
                          bands: int = 8):
    """Embedding near-duplicate pairs (cosine >= threshold).

    Default path (the 100-TB shape): random-hyperplane LSH signatures
    (:func:`with_lsh_signature`), banded into ``bands`` x ``n_bits/bands``
    bit chunks; candidate pairs share >= 1 band (equi bucket-join, shuffle on
    the band hash — no CartesianProduct); the exact cosine is then verified
    on candidates only.  Near-identical vectors agree on every hyperplane
    sign, so recall approaches 1 as the threshold does; for looser
    thresholds raise ``bands`` (more, shorter bands = higher recall).

    ``exact=True``: exhaustive all-pairs comparison — the correctness oracle
    for the banded path.  O(n²); only for driver-capped inputs.

    Norms are computed once per vector (not per pair) — one dot product per
    pair instead of three; same float values, 3x less work."""
    from pyspark.sql import functions as F

    v = df.select(F.col(id_col).alias("id"), F.expr(_dbl(vec_col)).alias("e"))
    if not exact:
        if dim is None:
            first = v.select(F.size("e")).first()
            dim = int(first[0]) if first else 0
        v = with_lsh_signature(v, "e", dim or 1, n_bits)
    v = v.withColumn("n2", F.expr(_DOT.format(a="e", b="e")))

    if exact:
        a = v.select(F.col("id").alias("id_a"), F.col("e").alias("ea"),
                     F.col("n2").alias("na"))
        b = v.select(F.col("id").alias("id_b"), F.col("e").alias("eb"),
                     F.col("n2").alias("nb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        rb = n_bits // bands
        mask = (1 << rb) - 1
        bandcols = F.array(*[
            F.shiftright(F.col("lsh_sig"), i * rb).bitwiseAND(F.lit(mask))
            for i in range(bands)])
        ex = v.select("id", "e", "n2",
                      F.posexplode(bandcols).alias("band", "bh"))
        a = ex.select(F.col("id").alias("id_a"), F.col("e").alias("ea"),
                      F.col("n2").alias("na"), "band", "bh")
        b = ex.select(F.col("id").alias("id_b"), F.col("e").alias("eb"),
                      F.col("n2").alias("nb"), "band", "bh")
        pairs = (a.join(b, ["band", "bh"])
                 .filter(F.col("id_a") < F.col("id_b"))
                 .dropDuplicates(["id_a", "id_b"]))
    dot = _DOT.format(a="ea", b="eb")
    sim = F.expr(f"({dot}) / sqrt(na * nb)")
    return (pairs.withColumn("cos_sim", sim)
            .filter(F.col("cos_sim") >= threshold)
            .select(F.col("id_a").cast("bigint"), F.col("id_b").cast("bigint"),
                    "cos_sim"))
