"""Cornice — hierarchically grouped column headers (SURVEY.md §2.2).

The reference's ``Cornice h p a c`` (GADT at
/root/reference/colonnade/src/Colonnade/Encode.hs:601-603) is a tree of
super-headers over a Colonnade, used for multi-row table headers with
colspans.  Here: a tree of labeled groups over an :class:`EncodePlan`,
with the same operator set —

=================  =============================================
reference          here
=================  =============================================
``cap``            :func:`cap` (Colonnade.hs:289-290)
``recap``          :func:`recap` (Colonnade.hs:324-325)
``discard``        :meth:`Cornice.discard` (Encode.hs:273-277)
``endow``          :meth:`Cornice.endow` (Encode.hs:279-286)
``annotate``       :meth:`Cornice.annotate` (Encode.hs:301-315)
``annotateFinely`` :meth:`Cornice.annotate_finely` (Encode.hs:330-340)
``size``           :meth:`AnnotatedCornice.size` (Encode.hs:402-406)
``uncapAnnotated`` :meth:`AnnotatedCornice.uncap` (Encode.hs:288-299)
=================  =============================================

``annotate`` computes colspans structurally; ``annotate_finely`` runs a real
Spark aggregation (one pass, partial+final for free) computing per-column
max display width over the data — the reference's full-scan width pass
(Encode.hs:330-340) expressed as ``agg(max(length(...)))``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

from .plan import EncodePlan


@dataclass(frozen=True)
class Cornice:
    label: Optional[str]
    children: tuple = ()     # tuple[Cornice | EncodePlan]

    # -- structure ----------------------------------------------------------
    def __add__(self, other: "Cornice") -> "Cornice":
        """Monoid append (the reference's Semigroup instance: sibling caps
        concatenate at the SAME tier — ``CorniceCap v1 <> CorniceCap v2``,
        Encode.hs:631-637 — e.g. the blaze doctest ``mconcat [cap "Personal"
        ..., cap "Work" ...]``).  The unlabeled root is a pure forest node:
        it renders no header tier of its own."""
        a = self.children if self.label is None else (self,)
        b = other.children if other.label is None else (other,)
        return Cornice(None, tuple(a) + tuple(b))
    def discard(self) -> EncodePlan:
        """Drop all super-headers, keep the flat plan."""
        out = None
        for p in self._leaf_plans():
            out = p if out is None else out + p
        return out if out is not None else EncodePlan()

    def endow(self, sep: str = ".") -> EncodePlan:
        """Fold super-headers into column names (qualification)."""
        out = None
        for path, plan in self._walk(()):
            prefix = sep.join(path)
            q = plan.map_header(lambda n, _p=prefix: f"{_p}{sep}{n}" if _p else n)
            out = q if out is None else out + q
        return out if out is not None else EncodePlan()

    def annotate(self) -> "AnnotatedCornice":
        """Structural annotation: column count (colspan) per node."""
        return self._annotate_flat([1] * len(self.discard().specs))

    def annotate_finely(self, df) -> "AnnotatedCornice":
        """Data-driven annotation: per-node total max display width, via one
        Spark aggregation over the projected columns."""
        from pyspark.sql import functions as F

        flat = self.discard()
        proj = flat.project(df).select(*flat.column_names)
        aggs = [F.max(F.length(F.col(c).cast("string"))).alias(c)
                for c in flat.column_names]
        row = proj.agg(*aggs).collect()[0].asDict()
        # POSITIONAL mapping back to the leaves: discard() renames
        # positional _cN columns on append, so a name-keyed lookup against
        # the leaves' ORIGINAL names silently mis-assigned sibling
        # headless plans' widths (review finding)
        return self._annotate_flat(
            [int(row[c] or 0) for c in flat.column_names])

    def _annotate_flat(self, values: list) -> "AnnotatedCornice":
        """Annotate with one integer per flat column, consumed in discard()
        leaf order; each node's size_ is the sum over its leaf columns and
        leaves keep their per-column values (``Sized``, Encode.hs:288-299)."""
        it = iter(values)

        def build(node):
            kids, total = [], 0
            for ch in node.children:
                if isinstance(ch, Cornice):
                    a = build(ch)
                else:
                    cs = tuple(next(it) for _ in ch.specs)
                    a = AnnotatedCornice(None, label=None, plan=ch,
                                         size_=sum(cs), children=(),
                                         col_sizes=cs, n_cols=len(ch.specs))
                kids.append(a)
                total += a.size_
            return AnnotatedCornice(node, label=node.label, plan=None,
                                    size_=total, children=tuple(kids),
                                    n_cols=sum(k.n_cols for k in kids))

        return build(self)

    # -- internals -----------------------------------------------------------
    def _leaf_plans(self):
        for ch in self.children:
            if isinstance(ch, Cornice):
                yield from ch._leaf_plans()
            else:
                yield ch

    def _walk(self, path):
        p = path + (self.label,) if self.label is not None else path
        for ch in self.children:
            if isinstance(ch, Cornice):
                yield from ch._walk(p)
            else:
                yield p, ch


@dataclass(frozen=True)
class AnnotatedCornice:
    node: Optional[Cornice]
    label: Optional[str]
    plan: Optional[EncodePlan]
    size_: int
    children: tuple
    #: leaf nodes: one size per column (the reference keeps per-column
    #: ``Sized`` values, Encode.hs:288-299 — uncap must not average them)
    col_sizes: tuple = ()
    #: structural column count under this node (independent of the
    #: annotation values — distinguishes "all columns zero-width" from
    #: "no columns at all")
    n_cols: int = 0

    def size(self) -> int:
        """O(1) annotation read (Encode.hs:402-406)."""
        return self.size_

    def uncap(self) -> list:
        """Flatten to [(column_name, size)] — the ``Sized`` columns
        (Encode.hs:288-299), each column keeping ITS OWN size (the old
        total//n averaging hid genuinely zero-width columns behind wide
        siblings — review finding)."""
        if self.plan is not None:
            cs = self.col_sizes or tuple(
                self.size_ // max(len(self.plan.specs), 1)
                for _ in self.plan.specs)
            return list(zip(self.plan.column_names, cs))
        out = []
        for ch in self.children:
            out.extend(ch.uncap())
        return out

    def header_rows(self) -> list:
        """Tiered header rows with colspans — [(label, span)] per tier
        (the ``headersMonoidal`` shape, Encode.hs:414-446)."""
        rows, frontier = [], [self]
        while frontier:
            # zero-WIDTH nodes stay IN the row (they render hidden, not
            # dropped — the setColspanOrHide contract preserves positional
            # structure); structurally EMPTY nodes (no columns at all,
            # e.g. the ToEmptyCornice mempty) contribute no slot and drop
            row = [(n.label, n.size_) for n in frontier if n.n_cols > 0]
            if any(lbl is not None for lbl, _ in row):
                rows.append(row)
            nxt = []
            for n in frontier:
                nxt.extend(n.children)
            frontier = nxt
        return rows


def cap(label: str, plan: EncodePlan) -> Cornice:
    """Group a plan's columns under one super-header."""
    return Cornice(label, (plan,))


def recap(label: str, *children: Union[Cornice, EncodePlan]) -> Cornice:
    """Add another header tier above existing cornices/plans."""
    return Cornice(label, tuple(children))


def empty_cornice(tiers: int = 1) -> Cornice:
    """``ToEmptyCornice`` per pillar (Encode.hs:583-590 — the class;
    Encode.hs:623-628 — the Monoid built on it): the identity element of
    the per-tier cornice monoid.  ``tiers == 0`` is the Base identity
    (``CorniceBase mempty`` — a cornice over the empty plan); ``tiers >=
    1`` is the Cap identity (``CorniceCap Vector.empty`` — an empty
    sibling forest; depth is erased here because the Python tree is
    untyped, so every Cap tier shares one identity value).  Identity is
    SEMANTIC, matching the rendered/derived surfaces: ``(mempty + x)``
    and ``(x + mempty)`` agree with ``x`` on discard/endow/annotate —
    the frozen-tree structural form may differ by an unlabeled root."""
    if tiers <= 0:
        return Cornice(None, (EncodePlan(),))
    return Cornice(None, ())
