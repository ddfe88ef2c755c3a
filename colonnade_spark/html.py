"""HTML table render backend — the blaze/lucid-colonnade analog.

Mirrors (semantics, not code — the reference is Haskell):

* :func:`html_table` — ``encodeHtmlTable``
  (/root/reference/blaze-colonnade/src/Text/Blaze/Colonnade.hs:305-326):
  ``<table><thead><tr><th>…`` + ``<tbody>`` body rows, 4-space indent like
  the reference's ``printCompactHtml`` doctests (Blaze/Colonnade.hs:73-250).
* :func:`html_capped` — ``encodeCappedTable`` / lucid ``encodeTableSized``:
  tiered ``<thead>`` rows with colspans from a Cornice annotation; a column
  with width < 1 renders ``style="display:none;"`` instead of a colspan —
  the ``setColspanOrHide`` behavior
  (/root/reference/lucid-colonnade/src/Lucid/Colonnade.hs:228-231).
* :func:`html_sectioned` — lucid ``sectioned``
  (/root/reference/lucid-colonnade/src/Lucid/Colonnade.hs:269-292): rows
  grouped by adjacent key, one full-width divider row (``colspan`` = column
  count) per group.

Like the reference's backends (and the ascii renderer here), these collect a
bounded sample to the driver — they are report/debug surfaces for decoded
samples, manifests and metrics tables, not distributed sinks.
"""

from __future__ import annotations

_ESCAPES = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def escape_html(s: str) -> str:
    """The ``Escaped c`` analog (siphon/src/Siphon.hs:85): content made safe
    for the wire format before embedding."""
    for ch, rep in _ESCAPES.items():
        s = s.replace(ch, rep)
    return s


def _cell(v) -> str:
    return escape_html("" if v is None else str(v))


def _rows(df, limit: int):
    return [[_cell(r[c]) for c in df.columns] for r in df.limit(limit).collect()]


def _attr(a: str | None) -> str:
    return f" {a}" if a else ""


def _tr(cells: list, tag: str, indent: str, attrs: dict | None = None,
        tr_attr: str | None = None) -> list:
    lines = [f"{indent}<tr{_attr(tr_attr)}>"]
    attrs = attrs or {}
    for i, c in enumerate(cells):
        a = attrs.get(i, "")
        lines.append(f"{indent}    <{tag}{a}>{c}</{tag}>")
    lines.append(f"{indent}</tr>")
    return lines


def html_table(df, limit: int = 20, table_attrs: str = "") -> str:
    """``encodeHtmlTable``: one header tier from column names, body from a
    bounded sample."""
    attrs = f" {table_attrs}" if table_attrs else ""
    lines = [f"<table{attrs}>", "    <thead>"]
    lines += _tr([_cell(c) for c in df.columns], "th", "        ")
    lines += ["    </thead>", "    <tbody>"]
    for row in _rows(df, limit):
        lines += _tr(row, "td", "        ")
    lines += ["    </tbody>", "</table>"]
    return "\n".join(lines)


def _colspan_or_hide(span: int) -> str:
    """setColspanOrHide (Lucid/Colonnade.hs:228-231): zero-width nodes are
    hidden, not dropped — positional structure is preserved."""
    if span < 1:
        return ' style="display:none;"'
    return f' colspan="{span}"'


def html_capped(cornice, df, limit: int = 20, widths: dict | None = None,
                table_attrs: str = "", fascia: list | None = None,
                cell_attrs=None) -> str:
    """``encodeCappedTable``: tiered headers with colspans from the Cornice
    annotation.  ``widths`` (column -> display width, e.g. from
    ``annotate_finely``) marks zero-width columns: their header cells and
    body cells render with ``display:none`` (setColspanOrHide).

    ``fascia`` is the per-header-row attribute stack (the ``Fascia p r`` of
    /root/reference/colonnade/src/Colonnade/Encode.hs:592-594: one ``r`` per
    ``<thead>`` tier, cap tiers first, the leaf/base tier last — the blaze
    doctest ``FasciaCap (class_ "category") (FasciaBase (class_
    "subcategory"))``, Blaze/Colonnade.hs:338-352); each entry lands on its
    tier's ``<tr>``.  A shorter list leaves the remaining tiers bare.

    ``cell_attrs`` is the per-cell attribute hook (the blaze ``Cell`` of
    Blaze/Colonnade.hs:263-266 — attributes applied to the wrapping
    ``<td>``): a callable ``(column_name, raw_value) -> str | None``."""
    flat = cornice.discard()
    proj = flat.project(df).select(*flat.column_names)
    widths = widths or {}
    fascia = fascia or []
    vis = [1 if widths.get(c, 1) >= 1 else 0 for c in flat.column_names]
    # tier colspans count VISIBLE columns (setColspanOrHide keys off the
    # annotated size, Lucid/Colonnade.hs:228-231): hiding a leaf column
    # must shrink its ancestors' spans, and a group whose columns are all
    # hidden renders display:none itself — the structural count would
    # leave tier rows wider than the visible body (review finding)
    ann = cornice._annotate_flat(vis)
    hidden = {i for i, v in enumerate(vis) if v < 1}

    attrs = f" {table_attrs}" if table_attrs else ""
    lines = [f"<table{attrs}>", "    <thead>"]
    # super-header tiers: colspan per annotated node (zero-width → hidden)
    tiers = ann.header_rows()
    for ti, tier in enumerate(tiers):
        tr_attr = fascia[ti] if ti < len(fascia) else None
        lines.append(f"        <tr{_attr(tr_attr)}>")
        for lbl, span in tier:
            lines.append(f"            <th{_colspan_or_hide(span)}>"
                         f"{_cell(lbl)}</th>")
        lines.append("        </tr>")
    # leaf header tier: the column names themselves (the Fascia base)
    leaf_tr = fascia[len(tiers)] if len(tiers) < len(fascia) else None
    leaf_attrs = {i: ' style="display:none;"' for i in hidden}
    lines += _tr([_cell(c) for c in flat.column_names], "th", "        ",
                 leaf_attrs, tr_attr=leaf_tr)
    lines += ["    </thead>", "    <tbody>"]
    cols = flat.column_names
    for r in proj.limit(limit).collect():
        row_attrs = dict(leaf_attrs)
        if cell_attrs is not None:
            for i, c in enumerate(cols):
                extra = cell_attrs(c, r[c])
                if extra:
                    row_attrs[i] = row_attrs.get(i, "") + f" {extra}"
        lines += _tr([_cell(r[c]) for c in cols], "td", "        ", row_attrs)
    lines += ["    </tbody>", "</table>"]
    return "\n".join(lines)


def html_definition_table(df, table_attrs: str = "") -> str:
    """yesod ``encodeDefinitionTable``
    (/root/reference/yesod-colonnade/src/Yesod/Colonnade.hs:118-131): a
    TRANSPOSED two-column render of a single row — one ``<tr><th>name</th>
    <td>value</td></tr>`` per column.  Takes the first row of ``df`` (the
    reference takes exactly one value)."""
    rows = df.limit(1).collect()
    attrs = f" {table_attrs}" if table_attrs else ""
    lines = [f"<table{attrs}>", "    <tbody>"]
    if rows:
        r = rows[0]
        for c in df.columns:
            lines.append("        <tr>")
            lines.append(f"            <th>{_cell(c)}</th>")
            lines.append(f"            <td>{_cell(r[c])}</td>")
            lines.append("        </tr>")
    lines += ["    </tbody>", "</table>"]
    return "\n".join(lines)


def anchor_cell(href_fn, content_fn=None):
    """yesod ``anchorCell``
    (/root/reference/yesod-colonnade/src/Yesod/Colonnade.hs:78-83): build a
    cell renderer producing ``<a href="...">content</a>``.  ``href_fn`` /
    ``content_fn`` take ``(column_name, raw_value)``; the result plugs into
    :func:`html_list_items`'s ``render_value`` (or any per-cell hook)."""
    def render(col, value):
        href = escape_html(str(href_fn(col, value)))
        body = _cell(content_fn(col, value)) if content_fn else _cell(value)
        return f'<a href="{href}">{body}</a>'

    return render


def html_list_items(df, wrap_tag: str = "ul", render_value=None,
                    cell_attrs=None) -> str:
    """yesod ``encodeListItems`` (Yesod/Colonnade.hs:99-113): ONE row
    rendered as a wrapped item list — one ``<li>`` per column combining the
    header with the cell (default ``header: value``), the header/body cell
    attributes merged onto the ``<li>`` (the reference's ``ha <> ba``).
    Takes the first row of ``df`` (the reference takes exactly one value).

    ``render_value(column, raw_value) -> html`` overrides the body render —
    e.g. :func:`anchor_cell`.  ``cell_attrs(column, raw_value) -> str``
    lands on the ``<li>``."""
    rows = df.limit(1).collect()
    lines = [f"<{wrap_tag}>"]
    if rows:
        r = rows[0]
        for c in df.columns:
            attr = cell_attrs(c, r[c]) if cell_attrs else None
            body = (render_value(c, r[c]) if render_value
                    else _cell(r[c]))
            lines.append(f"    <li{_attr(attr)}>{_cell(c)}: {body}</li>")
    lines.append(f"</{wrap_tag}>")
    return "\n".join(lines)


def html_sectioned(df, section_col: str, limit: int = 100,
                   table_attrs: str = "") -> str:
    """lucid ``sectioned`` (Lucid/Colonnade.hs:269-292): rows grouped by
    adjacent section value; each group preceded by one divider row spanning
    every column.  The sort that makes groups adjacent is the Spark-side
    ``orderBy`` (the reference receives pre-grouped ``f (b, g a)``)."""
    cols = [c for c in df.columns if c != section_col]
    ordered = df.orderBy(section_col, *cols).limit(limit)
    sample = ordered.collect()
    attrs = f" {table_attrs}" if table_attrs else ""
    lines = [f"<table{attrs}>", "    <thead>"]
    lines += _tr([_cell(c) for c in cols], "th", "        ")
    lines += ["    </thead>", "    <tbody>"]
    current = object()
    for r in sample:
        key = r[section_col]
        if key != current:
            current = key
            lines.append("        <tr>")
            lines.append(f'            <td colspan="{len(cols)}">'
                         f"{_cell(key)}</td>")
            lines.append("        </tr>")
        lines += _tr([_cell(r[c]) for c in cols], "td", "        ")
    lines += ["    </tbody>", "</table>"]
    return "\n".join(lines)


# --------------------------------------------------------------------------
# compact pretty-printers (Blaze/Colonnade.hs:436-524)
# --------------------------------------------------------------------------

_NO_TAG = object()


def remove_whitespace_after_tag(chosen_tag: str, html: str) -> str:
    """``removeWhitespaceAfterTag`` (Blaze/Colonnade.hs:447-489): a
    character fold that drops whitespace occurring while the innermost
    open tag is ``chosen_tag``.  Faithfully ports the reference's state
    machine, INCLUDING its quirks: on malformed input the error message
    itself is returned as the output string (``either id …``,
    Blaze/Colonnade.hs:448), and self-closing/void tags confuse the
    context stack.  The reference self-disclaims it as "incorrect in many
    corner cases … use is discouraged" (Blaze/Colonnade.hs:509-512); this
    port reproduces, not fixes, that contract — it exists for compact
    doctest-style table output only."""
    NORMAL, SOMETAG, OPENING, OPENING_ATTRS, CLOSING, AFTERTAG = range(6)
    ctx: list = []
    status = NORMAL
    tag = ""
    out: list = []
    for c in html:
        if status == NORMAL:
            if c == "<":
                status = SOMETAG
                out.append(c)
            elif c.isspace():
                if ctx and ctx[0] == chosen_tag:
                    pass          # drop the whitespace
                else:
                    out.append(c)
            else:
                out.append(c)
        elif status == SOMETAG:
            if c == "/":
                status, tag = CLOSING, ""
                out.append(c)
            elif c in "<>":
                return f"unexpected {c}"
            else:
                status, tag = OPENING, c
                out.append(c)
        elif status == OPENING:
            if c == ">":
                ctx.insert(0, tag)
                status = AFTERTAG
                out.append(c)
            elif c.isspace():
                ctx.insert(0, tag)
                status = OPENING_ATTRS
                out.append(c)
            else:
                tag += c
                out.append(c)
        elif status == OPENING_ATTRS:
            if c == ">":
                status = AFTERTAG
            out.append(c)
        elif status == CLOSING:
            if c == ">":
                if not ctx:
                    return "closing tag without any opening tag"
                closest = ctx.pop(0)
                if closest != tag:
                    return (f"closing tag <{tag}> did not match "
                            f"opening tag <{closest}>")
                status = AFTERTAG
                out.append(c)
            else:
                tag += c
                out.append(c)
        else:  # AFTERTAG
            if c == "<":
                status = SOMETAG
                out.append(c)
            elif c.isspace():
                if ctx and ctx[0] == chosen_tag:
                    pass          # drop; stay AFTERTAG
                else:
                    out.append(c)
                    status = NORMAL
            else:
                out.append(c)
                status = NORMAL
    return "".join(out)


def compact_html(html: str) -> str:
    """``printCompactHtml`` minus the ``putStrLn`` (Blaze/Colonnade.hs:
    513-521): strip whitespace inside td/th and common inline tags,
    right-to-left over the same tag list as the reference."""
    for t in ("em", "span", "strong", "th", "td"):
        html = remove_whitespace_after_tag(t, html)
    return html.rstrip("\n")


def very_compact_html(html: str) -> str:
    """``printVeryCompactHtml`` minus the ``putStrLn`` (Blaze/Colonnade.
    hs:523-531): additionally collapses whitespace inside <tr>."""
    for t in ("tr", "em", "span", "strong", "th", "td"):
        html = remove_whitespace_after_tag(t, html)
    return html.rstrip("\n")


def print_compact_html(html: str) -> None:
    print(compact_html(html))


def print_very_compact_html(html: str) -> None:
    print(very_compact_html(html))
