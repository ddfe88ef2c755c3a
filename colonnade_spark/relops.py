"""Temporal relational operators Spark lacks natively — as-of join and
range (interval) join — in their cartesian-free, 100-TB shapes.

Spark plans a raw inequality join (``l.ts >= r.ts``) as
BroadcastNestedLoopJoin or CartesianProduct — quadratic at scale.  The two
standard reformulations:

* :func:`asof_join` — union the tagged sides and run ONE per-key ordered
  scan (a running last-non-null window): one shuffle on the keys, zero
  row blow-up.  The same trick Flink/kdb-style as-of joins compile to.
* :func:`range_join` — bin time into fixed-width buckets; intervals explode
  to the bins they cover, probe rows bin once, equi-join on (keys, bin) and
  apply the exact residual predicate.  Data touched scales with
  interval-length/bin-width, never |left| x |right|.

Both are verified against DuckDB's native ``ASOF JOIN`` / inequality join
in the oracle queries (queries.py) and against in-Spark brute force in
pytest.
"""

from __future__ import annotations


def asof_join(left, right, on: list, ts: str, right_cols: list):
    """As-of join: every left row gains the ``right_cols`` of the right row
    with the greatest ``right.ts <= left.ts`` (INCLUSIVE at equality) within
    the same ``on`` keys; null when no prior right row exists.

    Scale shape: union the tagged sides, then one window
    ``partitionBy(on).orderBy(ts, side)`` carrying a running last-non-null —
    a single shuffle and per-key ordered scan; no range explode, no
    cartesian (plan-asserted in tests/test_relops.py).

    Determinism: the right side must be unique per ``(on, ts)`` —
    pre-aggregate it (e.g. ``max_by``) if it is not; with duplicates the
    window's pick among equal timestamps is tie-ambiguous.

    NULL timestamps follow DuckDB ASOF semantics (``l.ts >= r.ts`` is never
    true through NULL): right rows with NULL ``ts`` can never be a match and
    are dropped before the union; left rows with NULL ``ts`` sort before
    every surviving right row (Spark NULLS FIRST), so they come out with
    NULL match columns.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    overlap = (set(right_cols) & set(left.columns)) - set(on) - {ts}
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {overlap}")
    l = left.withColumn("__side", F.lit(1))
    r = (right.filter(F.col(ts).isNotNull())
         .select(*on, ts, *right_cols)
         .withColumn("__side", F.lit(0)))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal ts → inclusive (>=) match,
    # the same tie rule as DuckDB's ASOF JOIN
    w = (Window.partitionBy(*on)
         .orderBy(F.col(ts).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # carry the latest right ROW as one struct: per-column last-non-null
    # would skip a genuinely NULL right value and mix columns from
    # different right rows (the struct itself is non-null whenever a right
    # row exists, even if every field in it is null)
    row_struct = F.when(F.col("__side") == 0,
                        F.struct(*[F.col(c) for c in right_cols]))
    u = u.withColumn("__asof", F.last(row_struct, ignorenulls=True).over(w))
    for c in right_cols:
        u = u.withColumn(c, F.col("__asof")[c])
    return u.filter(F.col("__side") == 1).drop("__side", "__asof")


def range_join(left, intervals, on: list, ts: str, start: str = "start",
               end: str = "end", bin_seconds: int = 1800):
    """Interval join: left rows matched to every interval ``[start, end)``
    (half-open) sharing the ``on`` keys.  Output is one row per (left row,
    matching interval), carrying both sides' columns.

    Scale shape: intervals explode to the fixed-width time bins they cover
    (``sequence`` — JVM-side), probe rows compute their bin once, the join
    is an equi-join on ``(on, bin)`` with the exact ``ts ∈ [start, end)``
    residual.  Pick ``bin_seconds`` near the typical interval length: cost
    scales with intervals x (length/bin), never |left| x |intervals|.
    An interval's bin list is distinct, so a row matches each interval at
    most once — no dedup pass needed.
    """
    from pyspark.sql import functions as F

    overlap = (set(intervals.columns) & set(left.columns)) - set(on)
    if overlap:
        raise ValueError(f"interval columns collide with left: {overlap}")
    width = int(bin_seconds) * 1_000_000            # microseconds

    def micros(col):
        # unix_micros rejects TIMESTAMP_NTZ; the cast is deterministic
        # (session timezone pinned to UTC) and both sides share it
        return F.unix_micros(F.col(col).cast("timestamp"))

    ivals = (intervals.filter(F.col(start) < F.col(end))
             .withColumn("__bin", F.explode(F.sequence(
                 F.floor(micros(start) / width),
                 F.floor((micros(end) - 1) / width)))))
    rows = left.withColumn("__bin", F.floor(micros(ts) / width))
    return (rows.join(ivals, [*on, "__bin"])
            .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
            .drop("__bin"))
