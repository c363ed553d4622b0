"""Declarative data-quality expectations — constraint validation as a
first-class operator (the gate a training-data pipeline runs before a
table is allowed downstream).

The reference's statistics surface (`with_collect_stat`,
tests/setup_tables.rs:43,69) reads table health; this operator
*asserts* it: not-null, uniqueness, accepted values, numeric ranges,
regex shape, and referential integrity, each reported as one row
`(check_name, n_rows, n_violations, passed)`.

Scale: every column-local check compiles into ONE aggregation pass
over the table (conditional counts + countDistinct — constant-size
state per partition, never the data).  Referential-integrity checks
each add one left join against the deduped reference keys —
broadcast by default (dimension-sized), hash join when
``broadcast=False`` (fact-sized reference at 100 TB).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Check:
    """One expectation.  ``kind`` selects the compilation strategy:
    'agg' checks fold into the shared single-pass aggregate; 'unique'
    adds a countDistinct to that same pass; 'foreign_key' compiles to
    a standalone reference join."""

    name: str
    kind: str  # 'agg' | 'unique' | 'foreign_key'
    column: str | None = None
    columns: tuple[str, ...] = ()
    ref_name: str | None = None
    ref_column: str | None = None
    _violation: Column | None = field(default=None, compare=False)


def not_null(column: str) -> Check:
    return Check(
        f"not_null({column})", "agg", column,
        _violation=F.col(column).isNull(),
    )


def unique(*columns: str) -> Check:
    return Check(
        f"unique({', '.join(columns)})", "unique", columns=tuple(columns)
    )


def accepted_values(column: str, values, allow_null: bool = False) -> Check:
    bad = ~F.col(column).isin(list(values))
    if not allow_null:
        bad = bad | F.col(column).isNull()
    else:
        bad = F.col(column).isNotNull() & bad
    return Check(f"accepted_values({column})", "agg", column, _violation=bad)


def in_range(column: str, lo=None, hi=None) -> Check:
    """Nulls do not violate a range (use not_null separately)."""
    conds = []
    if lo is not None:
        conds.append(F.col(column) < F.lit(lo))
    if hi is not None:
        conds.append(F.col(column) > F.lit(hi))
    if not conds:
        raise ValueError("in_range needs lo and/or hi")
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return Check(
        f"in_range({column})", "agg", column,
        _violation=F.col(column).isNotNull() & out,
    )


def matches(column: str, pattern: str) -> Check:
    """Partial-match regex (rlike semantics); nulls do not violate."""
    return Check(
        f"matches({column})", "agg", column,
        _violation=F.col(column).isNotNull() & ~F.col(column).rlike(pattern),
    )


def foreign_key(column: str, ref_name: str, ref_column: str) -> Check:
    """Every non-null value of ``column`` must exist in
    ``refs[ref_name]``'s ``ref_column`` (SQL FK semantics: null FKs
    pass)."""
    return Check(
        f"foreign_key({column}->{ref_name}.{ref_column})",
        "foreign_key", column, ref_name=ref_name, ref_column=ref_column,
    )


def annotate_violations(
    df: DataFrame,
    checks: list[Check],
    refs: dict[str, DataFrame] | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Row-level twin of :func:`validate`: returns ``df`` with a
    ``failed_checks`` array naming every check each row violates
    (empty array = clean row).  This is the routing primitive behind
    quarantine flows — `streaming.quality_gate` splits on
    ``size(failed_checks) > 0``.

    'unique' checks are not row-local (a duplicate is a property of
    the pair) and are rejected here — run them through
    :func:`validate`.  FK checks compile to a left join against the
    deduped reference keys, same plan as validate's.
    """
    if not checks:
        raise ValueError("no checks given")
    for c in checks:
        if c.kind == "unique":
            raise ValueError(f"{c.name}: unique is not row-local")
        if c.kind == "foreign_key" and (refs is None or c.ref_name not in refs):
            raise ValueError(f"{c.name}: missing refs[{c.ref_name!r}]")
    out = df
    flags = []
    for i, c in enumerate(checks):
        if c.kind == "agg":
            flags.append(F.when(c._violation, F.lit(c.name)))
        else:  # foreign_key
            marker = f"__fk_ok_{i}"
            keys = refs[c.ref_name].select(
                F.col(c.ref_column).alias(f"__ref_{i}")
            ).distinct().withColumn(marker, F.lit(True))
            if broadcast:
                keys = F.broadcast(keys)
            out = out.join(
                keys, F.col(c.column) == F.col(f"__ref_{i}"), "left"
            ).drop(f"__ref_{i}")
            flags.append(
                F.when(
                    F.col(c.column).isNotNull() & F.col(marker).isNull(),
                    F.lit(c.name),
                )
            )
    result = out.withColumn(
        "failed_checks",
        F.sort_array(F.filter(F.array(*flags), lambda x: x.isNotNull())),
    )
    return result.drop(
        *[f"__fk_ok_{i}" for i, c in enumerate(checks) if c.kind == "foreign_key"]
    )


def validate(
    df: DataFrame,
    checks: list[Check],
    refs: dict[str, DataFrame] | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Run all ``checks``; returns one row per check:
    (check_name, n_rows, n_violations, passed).

    Column-local checks share a single aggregation job; each FK check
    is one join job against the deduped reference keys (broadcast by
    default).  Output row order is not defined — sort on check_name
    for display.
    """
    if not checks:
        raise ValueError("no checks given")
    cols = set(df.columns)
    for c in checks:
        need = (c.column,) if c.column else c.columns
        missing = [x for x in need if x and x not in cols]
        if missing:
            raise ValueError(f"{c.name}: no such columns {missing}")
        if c.kind == "foreign_key" and (refs is None or c.ref_name not in refs):
            raise ValueError(f"{c.name}: missing refs[{c.ref_name!r}]")

    local = [c for c in checks if c.kind in ("agg", "unique")]
    out: DataFrame | None = None
    if local:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, c in enumerate(local):
            if c.kind == "agg":
                aggs.append(F.count(F.when(c._violation, 1)).alias(f"__v{i}"))
            else:
                # unique: extra duplicate rows among fully-non-null keys
                # (null keys don't violate, consistent with FK/range)
                nn = F.col(c.columns[0]).isNotNull()
                for k in c.columns[1:]:
                    nn = nn & F.col(k).isNotNull()
                aggs.append(
                    (
                        F.count(F.when(nn, 1)) - F.countDistinct(*c.columns)
                    ).alias(f"__v{i}")
                )
        row = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v{i}").alias("n_violations"),
                (F.col(f"__v{i}") == 0).alias("passed"),
            )
            for i, c in enumerate(local)
        ]
        out = row.select(F.explode(F.array(*structs)).alias("c")).select("c.*")

    for c in checks:
        if c.kind != "foreign_key":
            continue
        keys = refs[c.ref_name].select(
            F.col(c.ref_column).alias("__ref")
        ).distinct()
        if broadcast:
            keys = F.broadcast(keys)
        j = df.select(F.col(c.column).alias("__fk")).join(
            keys, F.col("__fk") == F.col("__ref"), "left"
        )
        row = j.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(
                F.when(F.col("__fk").isNotNull() & F.col("__ref").isNull(), 1)
            ).alias("n_violations"),
        ).select(
            F.lit(c.name).alias("check_name"),
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        out = row if out is None else out.unionByName(row)
    return out
