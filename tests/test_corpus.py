import numpy as np

from colonnade_spark.corpus import (GIANT_CELL_BYTES, SCHEMA, generate_batch,
                                    generate_corpus_arrow)


def test_schema_and_edges():
    t = generate_corpus_arrow(200, seed=42)
    assert t.schema.equals(SCHEMA)
    assert t.num_rows == 200
    d = t.to_pydict()
    assert d["content"][0] == ""                      # empty
    assert len(d["content"][1]) >= GIANT_CELL_BYTES   # giant cell
    assert "日本語" in d["content"][2]                  # unicode
    assert '"' in d["content"][3] and "\r\n" in d["content"][3]
    # duplicate (repo,path), different commit
    assert (d["repo"][6], d["path"][6]) == (d["repo"][7], d["path"][7])
    assert d["commit"][6] != d["commit"][7]
    # keys unique
    keys = list(zip(d["repo"], d["path"], d["commit"]))
    assert len(set(keys)) == len(keys)
    assert all(len(c) == 40 for c in d["commit"])


def test_partition_independence():
    """Rows are a pure function of (seed, file_id) — any batching, same data."""
    whole = generate_batch(np.arange(50), seed=42)
    parts = [generate_batch(np.arange(lo, lo + 10), seed=42) for lo in range(0, 50, 10)]
    import pyarrow as pa
    assert pa.Table.from_batches([whole]).equals(pa.Table.from_batches(parts))
    # different seed -> different corpus
    other = generate_batch(np.arange(50), seed=7)
    assert not pa.Table.from_batches([whole]).equals(pa.Table.from_batches([other]))


def test_skew_fixture():
    t = generate_corpus_arrow(3000, seed=42)
    d = t.to_pydict()
    sizes = {}
    for r, c in zip(d["repo"], d["content"]):
        sizes[r] = sizes.get(r, 0) + len(c)
    total = sum(sizes.values())
    giant = max(sizes.values())
    assert giant / total > 0.15  # one repo dominates (salting fixture)
