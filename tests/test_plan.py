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


def test_to_headed_reattaches_names():
    """General mapHeadedness, headless→headed direction (Encode.hs:397-399):
    manifest names re-attach to positional columns; codec/post preserved."""
    p = (plan().headless_col("a + 1", codec="delta")
         .headless_col("b").to_headless())
    assert p.headless and p.column_names == ["_c0", "_c1"]
    h = p.to_headed(["x", "y"])
    assert not h.headless
    assert h.column_names == ["x", "y"]
    assert h.specs[0].expr == "a + 1" and h.specs[0].codec == "delta"


def test_to_headed_aggregates_all_errors():
    p = plan().headless_col("a").headless_col("b").headless_col("c")
    with pytest.raises(ValueError) as ei:
        p.to_headed(["x", "x"])
    msg = str(ei.value)
    # BOTH problems reported in one error (EitherWrap discipline)
    assert "arity" in msg and "duplicate name: 'x'" in msg


def test_resolve_positions_permuted_extra_and_errors():
    """headedToIndexed at plan level (Siphon.hs:252-278): permuted order ok,
    extras ignored, missing+duplicate aggregated — the plan-API extension of
    test_resolve_stripe_permuted_extra."""
    p = plan().headed("name").headed("age").headed("dept")
    # permuted with an extra column (mirrors the reference's Test.hs:123-138
    # expectation of indices 2,0,1)
    assert p.resolve_positions(["age", "dept", "extra", "name"]) == {
        "name": 3, "age": 0, "dept": 1}
    with pytest.raises(ValueError) as ei:
        p.resolve_positions(["age", "age", "extra"])
    msg = str(ei.value)
    assert "missing column: 'name'" in msg
    assert "duplicate column: 'age'" in msg
    assert "missing column: 'dept'" in msg


def test_post_encode_combinator_roundtrip(spark):
    """The post-encode fmap rides the plan through the full engine."""
    import tempfile

    from colonnade_spark import engine

    df = spark.createDataFrame(
        [(i, "body text " * 20) for i in range(300)], "k long, body string")
    p = (plan().headed("k").headed("body", codec="plain")
         .post_encode("body", "zlib").with_keys("k"))
    assert p.specs[1].post == "zlib"
    wh = tempfile.mkdtemp(prefix="post_enc_")
    engine.encode_table(spark, df, p, wh, n_buckets=2, mode="overwrite",
                        input_token="pz")
    assert engine.verify_roundtrip(spark, df, p, wh)["ok"]
    # the transform actually ran: lineage bytes_out far below plain bytes
    lin = {r["column"]: r for r in engine.lineage_table(spark, wh).collect()}
    assert lin["body"]["bytes_out"] < 0.2 * lin["body"]["bytes_in"]


def test_headless_append_renumbers_positions():
    """Regression (review): two headless-built plans always collided on
    _c0; append now renumbers positional names to continue the left's."""
    from colonnade_spark.plan import plan

    p = plan().headless_col("a") + plan().headless_col("b").headless_col("c")
    assert [s.name for s in p.specs] == ["_c0", "_c1", "_c2"]
    assert [s.expr for s in p.specs] == ["a", "b", "c"]


def test_map_header_rejects_collapsed_names():
    import pytest

    from colonnade_spark.plan import plan

    p = plan().headed("ID").headed("id")
    with pytest.raises(ValueError, match="collapsed"):
        p.map_header(str.lower)
