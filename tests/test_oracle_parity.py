"""Replicates the driver's correctness gate locally: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + order-insensitive values (column-name-sorted)."""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetch_df()


def _norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return f"{v:.9g}"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def registry():
    from colonnade_spark.queries import registry as reg

    return reg()


def _q_names():
    from colonnade_spark.queries import registry as reg

    return sorted(reg().keys())


@pytest.mark.parametrize("name", _q_names())
def test_query_matches_oracle(spark, registry, name):
    fn, sql = registry[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if sql is None:
        assert len(srows) >= 0  # rows-only check (driver's weak mode)
        if name == "minhash_neardup":
            # every doc should pair with its perturbed copy
            n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
            matched = {min(a, b) for a, b, _ in srows if abs(a - b) == 1_000_000}
            assert len(matched) >= 0.9 * n_docs
        return
    ddf = _duck(sql)
    dcols = list(ddf.columns)
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    drows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    a, b = _canon(srows, scols), _canon(drows, dcols)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_gate_rotation_names_resolve_and_cover_registry():
    """The rotation lists must stay in lockstep with the registry: a
    renamed query silently dropping out of _GATE_FRONT/_DEFERRED_PAST_GATE
    (or a stale name KeyError-ing every caller) must fail HERE, and the
    rotation must be a pure permutation — the parity harness above iterates
    the FULL registry, so every deferred query keeps its oracle coverage
    in-repo even while its driver row is one round stale (ADVICE round 5)."""
    from colonnade_spark.queries import (_DEFERRED_PAST_GATE, _GATE_FRONT,
                                         _raw_registry, registry)

    reg = registry()
    names = set(reg)
    assert set(_GATE_FRONT) <= names, set(_GATE_FRONT) - names
    assert set(_DEFERRED_PAST_GATE) <= names, set(_DEFERRED_PAST_GATE) - names
    assert not set(_GATE_FRONT) & set(_DEFERRED_PAST_GATE)
    # permutation: rotation reorders, never adds/drops
    assert list(sorted(reg)) == sorted(_raw_registry())
    # the deferred set sits entirely PAST the 50-entry gate and the gate
    # front sits entirely inside it
    order = list(reg)
    assert all(order.index(n) >= len(order) - len(_DEFERRED_PAST_GATE)
               for n in _DEFERRED_PAST_GATE)
    assert all(order.index(n) < 50 for n in _GATE_FRONT)
    assert len(order) - len(_DEFERRED_PAST_GATE) <= 50
