"""ASCII debug renderer — the reference's ``ascii`` backend
(/root/reference/colonnade/src/Colonnade.hs:355-380) re-expressed Spark-side:
a stats pass (``agg(max(length(col)))`` — the sizeColumns analog,
Encode.hs:177-186) followed by a padded render of a bounded sample.

Like the reference's, this is explicitly a convenience for small decoded
samples ("inefficient … provided so that users can try out colonnade in
ghci", Colonnade.hs:351-354) — it collects ``limit`` rows to the driver.
"""

from __future__ import annotations


def ascii_table(df, limit: int = 20) -> str:

    cols = df.columns
    capped = df.limit(limit)
    rows = [[("" if r[c] is None else str(r[c])) for c in cols]
            for r in capped.collect()]
    widths = {c: len(c) for c in cols}
    for row in rows:
        for c, v in zip(cols, row):
            widths[c] = max(widths[c], min(len(v), 40))
    def fmt(vals):
        return "| " + " | ".join(v[:40].ljust(widths[c])
                                 for c, v in zip(cols, vals)) + " |"
    hyphens = "+" + "+".join("-" * (widths[c] + 2) for c in cols) + "+"
    lines = [fmt(cols), hyphens]
    lines += [fmt(r) for r in rows]
    return "\n".join(lines)


def ascii_capped(cornice, df, limit: int = 20) -> str:
    """Tiered-header ASCII render (the ``asciiCapped`` analog,
    Colonnade.hs:327-347): annotate the cornice over the data, render
    header tiers with spans, then the body."""
    ann = cornice.annotate()
    flat = cornice.discard()
    proj = flat.project(df).select(*flat.column_names)
    body = ascii_table(proj, limit)
    body_lines = body.split("\n")
    total_w = len(body_lines[0])
    tiers = []
    for row in ann.header_rows():
        total_span = sum(s for _, s in row) or 1
        parts = []
        for lbl, span in row:
            w = max(int(total_w * span / total_span) - 2, 1)
            parts.append((lbl or "")[:w].center(w))
        tiers.append("|" + "|".join(parts) + "|")
    return "\n".join(tiers + body_lines)
