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

import os

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


def _true_header(path: str) -> list | None:
    """The ACTUAL header row, parsed RFC-4180 driver-side from the first
    CSV part file.  Spark renames duplicate header names ('a,a,b' →
    a0,a1,b) BEFORE exposing them, which (a) makes the documented
    duplicate-name aggregated error impossible to raise and (b) lets a
    plan column literally named 'a0' bind silently to the wrong data.
    Local/posix paths only; object-store URIs fall back to Spark's
    (deduplicated) names — documented limitation."""
    import csv as _csv
    import glob as _glob

    if "://" in path:
        return None
    cands = [path] if os.path.isfile(path) else (
        sorted(_glob.glob(os.path.join(path, "part-*")))
        or sorted(_glob.glob(os.path.join(path, "*.csv"))))
    for p in cands:
        try:
            with open(p, newline="") as f:
                return next(_csv.reader(f))
        except (OSError, StopIteration):
            continue
    return None


def _qcol(df, i: int):
    """Column i of df as a Column, immune to dots/backticks in the name
    (bare F.col parses dots as struct access; df[i] resolves via the name
    too).  Backtick-quoted identifier per Spark's escaping rule."""
    from pyspark.sql import functions as F

    return F.col("`" + df.columns[i].replace("`", "``") + "`")


def read_csv_headed(spark, path: str, plan, *, cast: dict | None = None,
                    multiline_cells: bool = False):
    """``decodeHeadedCsvUtf8``: bind the plan's columns by NAME against the
    file's header row — permuted ok, extras ignored, missing/duplicate
    names raise ONE aggregated error."""
    raw = _reader(spark, header="true",
                  multiLine=str(multiline_cells).lower()).csv(path)
    header = _true_header(path)
    names = header if (header is not None
                       and len(header) == len(raw.columns)) else raw.columns
    pos = plan.resolve_positions(names)              # aggregated errors
    # bind by ORDINAL against Spark's column list (quoted — dotted header
    # names must not be parsed as struct access); resolution used the
    # FILE's actual header, so Spark's dedup-renames cannot mis-bind
    out = raw.select(*[_qcol(raw, pos[s.name]).alias(s.name)
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
    out = raw.select(*[_qcol(raw, i).alias(s.name)
                       for i, s in enumerate(plan.specs)])
    return _apply_cast(out, cast)


def _apply_cast(df, cast: dict | None):
    from pyspark.sql import functions as F

    if not cast:
        return df
    return df.select(*[
        F.col(c).cast(cast[c]).alias(c) if c in cast else F.col(c)
        for c in df.columns])
