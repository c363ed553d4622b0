"""Differential SQL fuzzing — a seeded mini-SQLsmith over the TPC-H
schema, every generated query executed on BOTH engines (Spark SQL and
DuckDB) and compared with the driver's own signature (row count +
column names + order-insensitive value hash).

The reference validates its optimizer with hand-picked transcripts
(docs/2-8); hand-picked queries only cover the shapes their author
thought of.  This corpus draws from a grammar of exactly-typed SQL —
integer/string/date expressions, filters, group-bys, HAVING,
equi-joins, set ops, scalar subqueries, DISTINCT — so every round of
CI re-checks a few hundred *novel* plans end-to-end against an
independent engine.  Floats are deliberately excluded: every value
compared is exact (BIGINT / VARCHAR / DATE), so a mismatch is a real
semantics bug, never summation order.

Determinism: seeds are fixed; the same query text is generated on
every run (regressions are reproducible by seed number).
"""

from __future__ import annotations

import random

import pytest

from oracle_harness import duck_connection, result_signature

SF_DIR = "/root/testdata/sf0.001"

# table -> (int columns, string columns, date columns)
SCHEMA = {
    "nation": (["n_nationkey", "n_regionkey"], ["n_name"], []),
    "region": (["r_regionkey"], ["r_name"], []),
    "customer": (["c_custkey", "c_nationkey"], ["c_name", "c_mktsegment"], []),
    "orders": (
        ["o_orderkey", "o_custkey"],
        ["o_orderstatus", "o_orderpriority"],
        ["o_orderdate"],
    ),
    "supplier": (["s_suppkey", "s_nationkey"], ["s_name"], []),
}

UNIQUE_KEY = {
    "nation": "n_nationkey",
    "region": "r_regionkey",
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "supplier": "s_suppkey",
}

JOINS = [
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("nation", "region", "n_regionkey", "r_regionkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
]

STR_LITS = ["A", "B", "FURNITURE", "BUILDING", "O", "F", "1-URGENT", "x"]
DATE_LITS = ["1993-06-17", "1995-01-01", "1996-12-31", "1994-03-15"]


class Gen:
    def __init__(self, seed: int):
        self.r = random.Random(seed)

    def int_expr(self, cols, depth=0):
        r = self.r
        c = r.choice(cols)
        roll = r.random()
        if depth >= 2 or roll < 0.45:
            return c
        if roll < 0.6:
            return f"({c} + {r.randint(1, 50)})"
        if roll < 0.72:
            return f"({c} * {r.randint(2, 7)})"
        if roll < 0.84:
            return f"({c} % {r.randint(2, 13)})"
        if roll < 0.92:
            return f"abs({self.int_expr(cols, depth + 1)})"
        return (
            f"(CASE WHEN {self.pred(cols, [], [])} THEN "
            f"{self.int_expr(cols, depth + 1)} ELSE "
            f"{self.int_expr(cols, depth + 1)} END)"
        )

    def str_expr(self, cols):
        r = self.r
        c = r.choice(cols)
        return r.choice(
            [
                c,
                f"upper({c})",
                f"lower({c})",
                f"substr({c}, 1, {r.randint(1, 6)})",
                f"trim({c})",
                f"({c} || '_' || {c})",
            ]
        )

    def pred(self, icols, scols, dcols, depth=0):
        r = self.r
        choices = []
        if icols:
            choices += ["int"] * 3
        if scols:
            choices += ["str"] * 2
        if dcols:
            choices += ["date"]
        kind = r.choice(choices)
        if kind == "int":
            op = r.choice(["=", "<>", "<", ">", "<=", ">="])
            base = f"{self.int_expr(icols, 2)} {op} {r.randint(0, 30)}"
            if r.random() < 0.2:
                ins = ", ".join(str(r.randint(0, 25)) for _ in range(3))
                base = f"{r.choice(icols)} IN ({ins})"
        elif kind == "str":
            c = r.choice(scols)
            roll = r.random()
            if roll < 0.4:
                base = f"{c} {r.choice(['=', '<>'])} '{r.choice(STR_LITS)}'"
            elif roll < 0.7:
                ins = ", ".join(f"'{x}'" for x in self.r.sample(STR_LITS, 3))
                base = f"{c} IN ({ins})"
            else:
                base = f"{c} LIKE '{r.choice('ABCDEFS')}%'"
        else:
            c = r.choice(dcols)
            base = f"{c} {r.choice(['<', '>', '<=', '>='])} DATE '{r.choice(DATE_LITS)}'"
        if depth < 2 and r.random() < 0.35:
            conj = r.choice(["AND", "OR"])
            other = self.pred(icols, scols, dcols, depth + 1)
            base = f"({base} {conj} {other})"
        if depth < 2 and r.random() < 0.08:
            base = f"(NOT {base})"
        return base

    def agg_items(self, icols):
        r = self.r
        pool = [
            "count(*)",
            f"count({r.choice(icols)})",
            f"sum({self.int_expr(icols)})",
            f"min({self.int_expr(icols)})",
            f"max({self.int_expr(icols)})",
            f"count(DISTINCT {r.choice(icols)})",
        ]
        return r.sample(pool, r.randint(2, 4))

    def query(self):
        r = self.r
        shape = r.choice(
            [
                "scan", "agg", "agg", "join", "join_agg", "setop", "subq",
                "window", "rollup", "order_limit",
            ]
        )
        if shape == "window":
            # deterministic: every ORDER BY is on the table's unique key
            t = r.choice(list(SCHEMA))
            i, s, d = SCHEMA[t]
            uk = UNIQUE_KEY[t]
            g = r.choice(s + [c for c in i if c != uk])
            win = f"PARTITION BY {g} ORDER BY {uk}"
            fns = r.sample(
                [
                    f"row_number() OVER ({win})",
                    f"rank() OVER ({win})",
                    f"sum({self.int_expr(i)}) OVER ({win} ROWS BETWEEN "
                    f"UNBOUNDED PRECEDING AND CURRENT ROW)",
                    f"lag({r.choice(i)}, 1) OVER ({win})",
                    f"count(*) OVER ({win})",
                ],
                2,
            )
            items = ", ".join(f"{f} AS w{k}" for k, f in enumerate(fns))
            return (
                f"SELECT {uk} AS k0, {g} AS g0, {items} FROM {t} "
                f"WHERE {self.pred(i, s, d)}"
            )
        if shape == "rollup":
            t = r.choice(list(SCHEMA))
            i, s, d = SCHEMA[t]
            a = r.choice(s or i)
            b = r.choice([c for c in i if c != a] or i)
            op = r.choice(["ROLLUP", "CUBE", "GROUPING SETS"])
            spec = f"({a}, {b})" if op != "GROUPING SETS" else f"(({a}, {b}), ({a}), ())"
            aggs = ", ".join(
                f"{x} AS a{k}" for k, x in enumerate(self.agg_items(i))
            )
            # the OR-tautology keeps the filtered input non-empty:
            # Spark's expand-based ROLLUP/CUBE/GROUPING SETS emits NO
            # grand-total row over empty input where the standard (and
            # DuckDB/PostgreSQL) emit one — pinned as a documented
            # divergence in test_empty_rollup_divergence below.
            return (
                f"SELECT {a} AS g0, {b} AS g1, {aggs} FROM {t} "
                f"WHERE ({self.pred(i, s, d)} OR {UNIQUE_KEY[t]} % 2 = 0) "
                f"GROUP BY {op} {spec}"
            )
        if shape == "order_limit":
            t = r.choice(list(SCHEMA))
            i, s, d = SCHEMA[t]
            uk = UNIQUE_KEY[t]
            direction = r.choice(["ASC", "DESC"])
            return (
                f"SELECT {uk} AS k0, {self.int_expr(i)} AS c0 FROM {t} "
                f"WHERE {self.pred(i, s, d)} "
                f"ORDER BY {uk} {direction} LIMIT {r.randint(1, 40)}"
            )
        if shape == "scan":
            t = r.choice(list(SCHEMA))
            i, s, d = SCHEMA[t]
            items = [f"{self.int_expr(i)} AS c0"]
            if s:
                items.append(f"{self.str_expr(s)} AS c1")
            if r.random() < 0.5:
                items.append(f"length({r.choice(s or i)}) AS c2")
            dkw = "DISTINCT " if r.random() < 0.3 else ""
            return (
                f"SELECT {dkw}{', '.join(items)} FROM {t} "
                f"WHERE {self.pred(i, s, d)}"
            )
        if shape == "agg":
            t = r.choice(list(SCHEMA))
            i, s, d = SCHEMA[t]
            g = r.choice(i + s)
            aggs = ", ".join(
                f"{a} AS a{k}" for k, a in enumerate(self.agg_items(i))
            )
            having = (
                f" HAVING count(*) > {r.randint(0, 3)}"
                if r.random() < 0.4
                else ""
            )
            return (
                f"SELECT {g} AS g0, {aggs} FROM {t} "
                f"WHERE {self.pred(i, s, d)} GROUP BY 1{having}"
            )
        if shape in ("join", "join_agg"):
            t1, t2, k1, k2 = r.choice(JOINS)
            i1, s1, d1 = SCHEMA[t1]
            i2, s2, d2 = SCHEMA[t2]
            jt = r.choice(["JOIN", "JOIN", "LEFT JOIN"])
            on = f"{t1}.{k1} = {t2}.{k2}"
            where = self.pred(i1, s1, d1)
            if shape == "join":
                cols = f"{t1}.{r.choice(i1)} AS c0, {t2}.{r.choice(i2 + s2)} AS c1"
                return (
                    f"SELECT {cols} FROM {t1} {jt} {t2} ON {on} WHERE {where}"
                )
            g = f"{t2}.{r.choice(i2 + s2)}"
            aggs = ", ".join(
                f"{a} AS a{k}" for k, a in enumerate(self.agg_items(i1))
            )
            return (
                f"SELECT {g} AS g0, {aggs} FROM {t1} {jt} {t2} ON {on} "
                f"WHERE {where} GROUP BY 1"
            )
        if shape == "setop":
            t = r.choice(list(SCHEMA))
            i, s, d = SCHEMA[t]
            c = r.choice(i)
            op = r.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
            return (
                f"SELECT {c} AS c0 FROM {t} WHERE {self.pred(i, s, d)} "
                f"{op} SELECT {c} AS c0 FROM {t} WHERE {self.pred(i, s, d)}"
            )
        # scalar subquery
        t = r.choice(list(SCHEMA))
        i, s, d = SCHEMA[t]
        c = r.choice(i)
        inner = f"SELECT min({c}) + {r.randint(0, 20)} FROM {t}"
        return (
            f"SELECT {self.int_expr(i)} AS c0 FROM {t} "
            f"WHERE {c} <= ({inner}) AND {self.pred(i, s, d)}"
        )


def _spark_views(spark):
    for t in SCHEMA:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").createOrReplaceTempView(t)


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


SEEDS = list(range(200))


@pytest.mark.parametrize("seed", SEEDS)
def test_differential(spark, duck, seed):
    sql = Gen(seed).query()
    _spark_views(spark)
    sdf = spark.sql(sql)
    rows = [tuple(r) for r in sdf.collect()]
    s_sig = result_signature(sdf.columns, rows)
    cur = duck.execute(sql)
    d_sig = result_signature(
        [x[0] for x in cur.description], cur.fetchall()
    )
    assert s_sig == d_sig, f"seed {seed} mismatch:\n{sql}\nspark={s_sig}\nduck={d_sig}"


def test_empty_rollup_divergence(spark, duck):
    """Documented engine divergence the fuzzer surfaced: per the SQL
    standard, ``GROUP BY ROLLUP(...)`` / ``GROUPING SETS`` including
    the empty set ``()`` is equivalent to (among others) a global
    aggregate, which returns exactly one row even over empty input —
    DuckDB and PostgreSQL emit the grand-total row (count 0);  Spark's
    expand-then-aggregate implementation emits NOTHING (zero input
    rows expand to zero rows).  Pinned so a future Spark version
    changing this (or a regression in our rollup operators' reliance
    on it) is caught immediately."""
    _spark_views(spark)
    sql = (
        "SELECT r_name AS g0, count(*) AS a0 FROM region "
        "WHERE r_name LIKE 'ZZZ%' GROUP BY ROLLUP(r_name)"
    )
    assert spark.sql(sql).collect() == []
    assert duck.execute(sql).fetchall() == [(None, 0)]
