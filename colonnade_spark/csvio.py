"""CSV read/write seam — the reference's LITERAL domain (siphon is a
headed/headless CSV codec; colonnade supplies the column plans).

The Spark translation keeps the reference's decode semantics and lets
Spark's CSV datasource do the wire format (RFC 4180 quoting — quote
doubling, embedded commas/newlines/quotes — the same escaping siphon's
encoder emits, /root/reference/siphon/src/Siphon.hs:193-247):

* :func:`write_csv` — headed or headless emission
  (``encodeCsvUtf8`` / headless, Siphon.hs:149-176);
* :func:`read_csv_headed` — ``decodeHeadedCsvUtf8`` (Siphon.hs:95-101):
  the FILE's header row is resolved against the plan's expected names —
  order-insensitive, extra columns ignored, and missing/duplicated names
  aggregated into ONE error (``headedToIndexed``, Siphon.hs:252-278, via
  ``plan.resolve_positions``);
* :func:`read_csv_headless` — ``decodeIndexedCsvUtf8`` (Siphon.hs:103-121):
  positional binding of the plan's columns, by ordinal.

All columns arrive as strings (CSV has no types — exactly the reference's
model, where typed parsing is the per-cell ``Siphon`` decode); pass
``cast`` to apply per-column Spark SQL types after binding.  Scale shape:
the datasource is splittable (``multiLine=False`` default) and predicate/
projection behavior is Catalyst's — only the requested plan columns are
parsed (CSV column pruning).
"""

from __future__ import annotations

_CSV_OPTS = {"quote": '"', "escape": '"', "header": "false"}


def _reader(spark, **opts):
    r = spark.read
    o = dict(_CSV_OPTS)
    o.update(opts)
    for k, v in o.items():
        r = r.option(k, v)
    return r


def write_csv(df, path: str, *, headed: bool = True,
              mode: str = "overwrite") -> None:
    """Emit RFC 4180 CSV; ``headed`` writes the header row (the
    headed/headless duality of the reference's encoder).  Embedded
    newlines need no write-side flag — quoteAll already protects them;
    ``multiline_cells`` is a READER option (the readers take it)."""
    (df.write.mode(mode)
     .option("quote", '"').option("escape", '"')
     # quote every cell: Spark's minimal quoting does not quote a lone \r,
     # which the reader then swallows as a line terminator — the reference
     # treats \r as a hostile cell char that must survive (Test.hs:163-167)
     .option("quoteAll", "true")
     # Spark's CSV WRITE defaults ignoreLeading/TrailingWhiteSpace=true —
     # silently trims cell-edge whitespace (incl. a leading \r).  Cells
     # must round-trip byte-exact.
     .option("ignoreLeadingWhiteSpace", "false")
     .option("ignoreTrailingWhiteSpace", "false")
     .option("header", str(headed).lower())
     .csv(path))


def read_csv_headed(spark, path: str, plan, *, cast: dict | None = None,
                    multiline_cells: bool = False):
    """``decodeHeadedCsvUtf8``: bind the plan's columns by NAME against the
    file's header row — permuted ok, extras ignored, missing/duplicate
    names raise ONE aggregated error."""
    from pyspark.sql import functions as F

    raw = _reader(spark, header="true",
                  multiLine=str(multiline_cells).lower()).csv(path)
    pos = plan.resolve_positions(raw.columns)        # aggregated errors
    out = raw.select(*[F.col(raw.columns[pos[s.name]]).alias(s.name)
                       for s in plan.specs])
    return _apply_cast(out, cast)


def read_csv_headless(spark, path: str, plan, *, cast: dict | None = None,
                      multiline_cells: bool = False):
    """``decodeIndexedCsvUtf8``: positional binding — column i of the file
    is the plan's i-th column (the headless regime; reattaching names is
    the plan's job, like ``blocks.reattach_header`` for blocks)."""
    from pyspark.sql import functions as F

    raw = _reader(spark, header="false",
                  multiLine=str(multiline_cells).lower()).csv(path)
    if len(raw.columns) < len(plan.specs):
        raise ValueError(
            f"headless CSV has {len(raw.columns)} columns; plan expects "
            f"{len(plan.specs)}")
    out = raw.select(*[F.col(raw.columns[i]).alias(s.name)
                       for i, s in enumerate(plan.specs)])
    return _apply_cast(out, cast)


def _apply_cast(df, cast: dict | None):
    from pyspark.sql import functions as F

    if not cast:
        return df
    return df.select(*[
        F.col(c).cast(cast[c]).alias(c) if c in cast else F.col(c)
        for c in df.columns])
