"""Sort-order metadata and satisfaction tests.

This is the heart of the reference's flagship feature: tables declare
a file sort order (``WITH ORDER (env, service, host)``,
``docs/2_cli_create_tables.md:17-23``) and the planner elides sorts
whose requirement is already satisfied:

- exact match      -> no sort   (docs/4_cli_read_plans_sort_projection.md:33-57)
- prefix subset    -> no sort   ("Good Subset", docs/4:60-84)
- non-prefix subset-> sort kept ("Bad Subset",  docs/4:87-111)

Spark path tables carry no ordering property, so Catalyst cannot make
this call; we implement the satisfaction test here, above Catalyst,
and :mod:`sparkplans.engine` consults it at plan-construction time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence, Union


@dataclass(frozen=True)
class SortKey:
    """One key of a sort order: column name, direction, null placement."""

    col: str
    asc: bool = True
    nulls_first: bool | None = None  # None = direction default (asc->first)

    @property
    def effective_nulls_first(self) -> bool:
        if self.nulls_first is None:
            return self.asc
        return self.nulls_first

    def __str__(self) -> str:
        d = "ASC" if self.asc else "DESC"
        n = "NULLS FIRST" if self.effective_nulls_first else "NULLS LAST"
        return f"{self.col} {d} {n}"


SortKeyLike = Union[str, tuple, SortKey]


def normalize_sort_keys(keys: Iterable[SortKeyLike] | SortKeyLike | None) -> tuple[SortKey, ...]:
    """Accepts ``"col"``, ``"col DESC"``, ``("col", False)`` or
    :class:`SortKey` items (or a single such item) and returns a
    canonical tuple of :class:`SortKey`."""
    if keys is None:
        return ()
    if isinstance(keys, (str, SortKey)):
        keys = [keys]
    elif isinstance(keys, tuple) and keys and isinstance(keys[0], str):
        # a single ("col", asc, nulls_first) spec — NOT a sequence of
        # keys (a tuple of SortKeys iterates below)
        keys = [keys]
    out: list[SortKey] = []
    for k in keys:
        if isinstance(k, SortKey):
            out.append(k)
        elif isinstance(k, tuple):
            if not (k and isinstance(k[0], str)):
                raise TypeError(f"cannot interpret sort key: {k!r}")
            col = k[0]
            asc = bool(k[1]) if len(k) > 1 else True
            nf = k[2] if len(k) > 2 else None
            out.append(SortKey(col, asc, nf))
        elif isinstance(k, str):
            parts = k.replace(",", " ").split()
            col = parts[0]
            rest = [p.upper() for p in parts[1:]]
            asc = "DESC" not in rest
            nf: bool | None = None
            if "FIRST" in rest:
                nf = True
            elif "LAST" in rest:
                nf = False
            out.append(SortKey(col, asc, nf))
        else:
            raise TypeError(f"cannot interpret sort key: {k!r}")
    return tuple(out)


def ordering_satisfies(
    provided: Sequence[SortKey] | Sequence[SortKeyLike] | None,
    required: Sequence[SortKey] | Sequence[SortKeyLike] | None,
) -> bool:
    """True iff data sorted by ``provided`` is also sorted by
    ``required``: ``required`` must be a *leading prefix* of
    ``provided`` with matching directions and null placement.

    The non-prefix case must return False — docs/4:87-111 ("Bad
    Subset": order (env, service, host) does NOT satisfy
    ORDER BY env, host) is the regression case.
    """
    prov = normalize_sort_keys(provided)
    req = normalize_sort_keys(required)
    if not req:
        return True
    if len(req) > len(prov):
        return False
    for p, r in zip(prov, req):
        if p.col != r.col or p.asc != r.asc:
            return False
        if p.effective_nulls_first != r.effective_nulls_first:
            return False
    return True


def sort_columns(keys: Sequence[SortKey]) -> list:
    """SortKeys -> Spark Column sort expressions, honoring direction
    AND null placement (shared by the engine's order_by and the
    sorted-write sink so declared orders mean the same thing on both
    the read and write paths)."""
    from pyspark.sql import functions as F

    cols = []
    for k in keys:
        c = F.col(k.col)
        if k.asc:
            c = c.asc_nulls_first() if k.effective_nulls_first else c.asc_nulls_last()
        else:
            c = c.desc_nulls_first() if k.effective_nulls_first else c.desc_nulls_last()
        cols.append(c)
    return cols


def project_ordering(
    provided: Sequence[SortKey], available_cols: Iterable[str]
) -> tuple[SortKey, ...]:
    """Ordering surviving a projection: the longest prefix of
    ``provided`` whose columns all survive (mirrors docs/4:113-140 —
    the scan "still has knowledge of sort order" after projecting to
    (host, env) because sort columns were retained; once a sort column
    is dropped, the suffix ordering is lost)."""
    cols = set(available_cols)
    out: list[SortKey] = []
    for k in provided:
        if k.col in cols:
            out.append(k)
        else:
            break
    return tuple(out)
