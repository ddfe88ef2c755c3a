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
        kids, total = [], 0
        for ch in self.children:
            if isinstance(ch, Cornice):
                a = ch.annotate()
            else:
                a = AnnotatedCornice(ch if isinstance(ch, Cornice) else None,
                                     label=None, plan=ch,
                                     size_=len(ch.specs), children=())
            kids.append(a)
            total += a.size_
        return AnnotatedCornice(self, label=self.label, plan=None,
                                size_=total, children=tuple(kids))

    def annotate_finely(self, df) -> "AnnotatedCornice":
        """Data-driven annotation: per-node total max display width, via one
        Spark aggregation over the projected columns."""
        from pyspark.sql import functions as F

        flat = self.discard()
        proj = flat.project(df).select(*flat.column_names)
        aggs = [F.max(F.length(F.col(c).cast("string"))).alias(c)
                for c in flat.column_names]
        row = proj.agg(*aggs).collect()[0].asDict()
        widths = {c: int(row[c] or 0) for c in flat.column_names}
        return self._annotate_with(widths)

    def _annotate_with(self, widths: dict) -> "AnnotatedCornice":
        kids, total = [], 0
        for ch in self.children:
            if isinstance(ch, Cornice):
                a = ch._annotate_with(widths)
            else:
                s = sum(widths.get(c, 0) for c in ch.column_names)
                a = AnnotatedCornice(None, label=None, plan=ch, size_=s, children=())
            kids.append(a)
            total += a.size_
        return AnnotatedCornice(self, label=self.label, plan=None,
                                size_=total, children=tuple(kids))

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

    def size(self) -> int:
        """O(1) annotation read (Encode.hs:402-406)."""
        return self.size_

    def uncap(self) -> list:
        """Flatten to [(column_name, size)] — the ``Sized`` columns
        (Encode.hs:288-299)."""
        if self.plan is not None:
            per = self.size_ // max(len(self.plan.specs), 1)
            return [(c, per) for c in self.plan.column_names]
        out = []
        for ch in self.children:
            out.extend(ch.uncap())
        return out

    def header_rows(self) -> list:
        """Tiered header rows with colspans — [(label, span)] per tier
        (the ``headersMonoidal`` shape, Encode.hs:414-446)."""
        rows, frontier = [], [self]
        while frontier:
            row = [(n.label, n.size_) for n in frontier if n.size_ > 0]
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
