import pytest

from colonnade_spark.plan import ColumnSpec, EncodePlan, corpus_plan, plan


def test_monoid_append():
    a = plan().headed("x").headed("y")
    b = plan().headed("z", "upper(x)")
    c = a + b
    assert c.column_names == ["x", "y", "z"]
    with pytest.raises(ValueError):
        _ = c + plan().headed("x")
    with pytest.raises(ValueError):
        plan().headed("x").headed("x")


def test_combinators_rewrite_exprs():
    p = (plan().headed("content")
         .from_maybe("content", "")
         .modify_when("content", "lang = 'md'", lambda e: f"upper({e})")
         .replace_when("content", "length(content) > 10", "BIG"))
    e = p.specs[0].expr
    assert "coalesce" in e and "upper" in e and "'BIG'" in e
    with pytest.raises(KeyError):
        plan().headed("a")._rewrite("missing", lambda e: e)


def test_map_header_and_headless():
    p = plan().headed("a").headed("b").map_header(lambda n: f"col_{n}")
    assert p.column_names == ["col_a", "col_b"]
    assert p.to_headless().headless
    q = plan().headless_col("1 + 1").headless_col("2")
    assert q.column_names == ["_c0", "_c1"]


def test_columns_dynamic():
    p = plan().columns(["py", "go"], lambda v: f"is_{v}",
                       lambda v: f"CASE WHEN lang = '{v}' THEN 1 ELSE 0 END")
    assert p.column_names == ["is_py", "is_go"]


def test_hash_stability_and_json_roundtrip():
    p = corpus_plan()
    assert p.plan_hash() == EncodePlan.from_json(p.to_json()).plan_hash()
    q = p.with_codec("content", "fsst")
    assert q.plan_hash() != p.plan_hash()
    assert q.specs[-1].codec == "fsst"


def test_project(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "name string, v int")
    p = plan().headed("name").derived("v2", "v * 2").with_keys("name")
    out = p.project(df)
    assert out.columns == ["name", "v2"]
    assert {r["v2"] for r in out.collect()} == {2, 4}
