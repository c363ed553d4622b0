"""Snapshot diff — CDC-style change detection between two versions of
a keyed table: which rows were inserted, deleted, or updated.

The warehouse companion to `sinks.merge_upsert` (applying changes) and
`queries.scd2_user_value` (tracking them): this operator *derives* the
change set, the way a pipeline reconciles a re-extracted source
against yesterday's snapshot before writing history.

Scale: one full-outer shuffle join on the key columns — both sides
partition on the same key, so on a cluster with both snapshots
bucketed by key this is a zero-shuffle sort-merge join.  Value
comparison is null-safe equality folded JVM-side (no UDF); with
``hash_compare=True`` wide tables compare via a single xxhash64 over
the compared columns instead of N equality tests (one long per row
crosses the comparator, useful at 100-column width).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
    hash_compare: bool = False,
    include_changed_cols: bool = False,
) -> DataFrame:
    """Diff ``new`` against ``old`` by ``keys``.

    Returns one row per changed key: the key columns plus
    ``change_type`` ('insert' | 'delete' | 'update'); unchanged rows
    are dropped.  With ``include_changed_cols`` adds a sorted array of
    the compared columns whose values differ (empty for
    insert/delete).  Null-safe throughout: NULL == NULL is unchanged.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    for side, df in (("old", old), ("new", new)):
        missing = [k for k in keys if k not in df.columns]
        if missing:
            raise ValueError(f"{side} side missing key columns {missing}")
    if compare is None:
        compare = [
            c for c in old.columns if c not in keys and c in new.columns
        ]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__vo_{c}") for c in compare],
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__vn_{c}") for c in compare],
    )
    cond = reduce(
        lambda a, b: a & b,
        [o[f"__ko_{k}"].eqNullSafe(n[f"__kn_{k}"]) for k in keys],
    )
    j = o.join(n, cond, "full_outer")

    in_old = reduce(
        lambda a, b: a | b, [F.col(f"__ko_{k}").isNotNull() for k in keys]
    )
    in_new = reduce(
        lambda a, b: a | b, [F.col(f"__kn_{k}").isNotNull() for k in keys]
    )
    if not compare:
        changed = F.lit(False)
    elif hash_compare:
        changed = ~F.xxhash64(
            *[F.col(f"__vo_{c}") for c in compare]
        ).eqNullSafe(F.xxhash64(*[F.col(f"__vn_{c}") for c in compare]))
    else:
        changed = ~reduce(
            lambda a, b: a & b,
            [
                F.col(f"__vo_{c}").eqNullSafe(F.col(f"__vn_{c}"))
                for c in compare
            ],
        )

    out = j.select(
        *[
            F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k)
            for k in keys
        ],
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(changed, F.lit("update"))
        .alias("change_type"),
        *(
            [
                F.when(
                    in_old & in_new,
                    F.sort_array(
                        F.filter(
                            F.array(
                                *[
                                    F.when(
                                        ~F.col(f"__vo_{c}").eqNullSafe(
                                            F.col(f"__vn_{c}")
                                        ),
                                        F.lit(c),
                                    )
                                    for c in compare
                                ]
                            ),
                            lambda x: x.isNotNull(),
                        )
                    ),
                )
                .otherwise(F.array().cast("array<string>"))
                .alias("changed_cols")
            ]
            if include_changed_cols
            else []
        ),
    )
    return out.filter(F.col("change_type").isNotNull())


def schema_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema-level drift between two snapshots: added / removed /
    type-changed columns — the metadata companion to the row-level
    ``table_diff`` (a pipeline checks this FIRST; a type flip makes
    row comparison meaningless).  Pure metadata: no job runs."""
    spark = old.sparkSession
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    rows = []
    for c in sorted(set(o) | set(n)):
        if c not in n:
            rows.append((c, "removed", o[c], None))
        elif c not in o:
            rows.append((c, "added", None, n[c]))
        elif o[c] != n[c]:
            rows.append((c, "type_changed", o[c], n[c]))
    return spark.createDataFrame(
        rows or [],
        "column string, change_type string, old_type string, new_type string",
    )
