"""CSV seam tests — the reference's literal domain: hostile-cell round
trips (siphon/test/Test.hs:157-177), headed name resolution with permuted/
extra/missing columns (Siphon.hs:252-278), headless positional binding."""

import pytest

from colonnade_spark import csvio
from colonnade_spark.plan import plan

HOSTILE = [
    (0, "Simple", "py"),
    (1, "With,Escaped\nChars", "go"),          # comma AND newline in a cell
    (2, 'More"Escaped,""Chars', "rs"),         # quotes, doubled quotes
    (3, "", "md"),                             # empty cell
    (4, "日本語🎉 é", "txt"),                   # multi-byte
    (5, "\r lone cr", "c"),
]


@pytest.fixture()
def hostile_df(spark):
    return spark.createDataFrame(HOSTILE, "doc_id long, content string, lang string")


def _plan():
    return plan().headed("doc_id").headed("content").headed("lang")


def test_headed_roundtrip_hostile(spark, hostile_df, tmp_path):
    path = str(tmp_path / "h")
    csvio.write_csv(hostile_df, path, headed=True)
    back = csvio.read_csv_headed(spark, path, _plan(),
                                 cast={"doc_id": "bigint"},
                                 multiline_cells=True)
    got = sorted((r.doc_id, r.content or "", r.lang) for r in back.collect())
    want = sorted((i, c, l) for i, c, l in HOSTILE)
    # CSV has no empty-vs-null distinction (the reference's model too):
    # compare with '' for null
    assert got == want


def test_headless_roundtrip_positional(spark, hostile_df, tmp_path):
    path = str(tmp_path / "hl")
    csvio.write_csv(hostile_df, path, headed=False)
    back = csvio.read_csv_headless(spark, path, _plan(),
                                   cast={"doc_id": "bigint"},
                                   multiline_cells=True)
    got = sorted((r.doc_id, r.content or "", r.lang) for r in back.collect())
    assert got == sorted((i, c, l) for i, c, l in HOSTILE)


def test_headed_resolution_permuted_and_extra(spark, tmp_path):
    df = spark.createDataFrame(
        [("x", 1, "EXTRA", "en")], "content string, doc_id long, junk string, lang string")
    path = str(tmp_path / "perm")
    csvio.write_csv(df, path, headed=True)
    back = csvio.read_csv_headed(spark, path, _plan())
    r = back.collect()[0]
    # bound by NAME despite file order (content, doc_id, junk, lang);
    # the extra column is ignored
    assert (r.doc_id, r.content, r.lang) == ("1", "x", "en")
    assert back.columns == ["doc_id", "content", "lang"]


def test_headed_missing_columns_aggregate_one_error(spark, tmp_path):
    df = spark.createDataFrame([("x",)], "content string")
    path = str(tmp_path / "miss")
    csvio.write_csv(df, path, headed=True)
    with pytest.raises(ValueError) as ei:
        csvio.read_csv_headed(spark, path, _plan())
    # BOTH missing names in ONE aggregated error (the reference's
    # headedToIndexed contract)
    assert "doc_id" in str(ei.value) and "lang" in str(ei.value)


def test_headless_too_few_columns_loud(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    path = str(tmp_path / "short")
    csvio.write_csv(df, path, headed=False)
    with pytest.raises(ValueError, match="plan expects"):
        csvio.read_csv_headless(spark, path, _plan())


def test_headed_duplicate_header_names_raise_aggregated(spark, tmp_path):
    """Regression (review): Spark renames duplicate header names (a,a →
    a0,a1) before exposing them, which silently defeated the documented
    duplicate-name error; the reader now resolves against the FILE's
    actual header row."""
    import pytest

    from colonnade_spark.plan import plan

    path = str(tmp_path / "dup")
    df = spark.createDataFrame([("1", "2", "3")], "c1 string, c2 string, c3 string")
    df.toDF("a", "a", "b").write.option("header", "true").csv(path)
    p = plan().headed("a").headed("b")
    with pytest.raises(ValueError, match="duplicate column: 'a'"):
        csvio.read_csv_headed(spark, path, p)


def test_headed_dotted_header_names_bind(spark, tmp_path):
    """Regression (review): F.col('user.name') parses as struct access —
    binding is now by ordinal, so dotted header names work."""
    from colonnade_spark.plan import plan

    path = str(tmp_path / "dots")
    df = spark.createDataFrame([("u1", "x1")], "c1 string, c2 string")
    df.toDF("user.name", "x").write.option("header", "true").csv(path)
    p = plan().headed("user.name").headed("x")
    out = csvio.read_csv_headed(spark, path, p)
    row = out.collect()[0]
    assert row["user.name"] == "u1" and row["x"] == "x1"
