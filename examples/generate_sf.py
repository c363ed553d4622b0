"""Distributed TPC-H-ish data generator for scale factors the driver
did not ship (sf >= 1), matching /root/testdata/sf*'s schemas and
distributions so verify_all.py / scaling_sweep.py / bench.py run
unchanged against the output.

Everything is generated JVM-side from `spark.range` + hash-derived
uniforms (xxhash64 -> pmod -> scale): no driver loops, no Python UDFs,
no collect — the generator itself is a 100 TB-shaped pipeline (a 1000-
executor cluster would produce partitions independently; determinism
comes from the id-seeded hashes, not from partition layout).

Distribution notes (measured on the driver's sf0.01/sf0.1 output):
  region/nation fixed (5/25); customer = 150k*sf; supplier = 10k*sf;
  part = 200k*sf; orders = 1.5M*sf (dates uniform 1995-01-01..
  2001-08-01); lineitem = 6M*sf (qty 1..50, discount 0..0.10 step .01,
  tax 0..0.08, shipdate independent uniform, extprice U[900,105000]);
  events = 1M*sf over a fixed 30-day window (ts monotone with jitter,
  users = customers/10, value ~ Exp(mean 50) 2dp); documents =
  max(500, 50k*sf) (31-word vocab, lang en 40% / 4x15%, ~0.2% planted
  exact dups); embeddings = max(500, 20k*sf) (64-dim, 10 label
  clusters, L2-normalized).

Known distribution divergence (measured, round 6): the DRIVER's
embeddings are label-tagged but essentially unclustered (same-label
mean cosine 0.0017, max 0.41 at sf0.01), while this generator's
clusters are TIGHT (same-label mean cosine 0.942, max 0.973 — stable
sf1..sf100).  Consequence for scale runs on generated dirs: any
pair-ENUMERATION query with a threshold below ~0.97 (e.g.
`embedding_near_dups` at its driver-tuned 0.35) has output
~N²/(2·n_labels) — quadratic by DATA, not by plan — so the
linear-output dedup materializations (`semantic_dedup`,
decontamination max-scores, ANN top-k) are the meaningful sf30+
measurements on this data.  See SCALE.md "sf100 ML wave".

Usage: python examples/generate_sf.py --sf 1 --out /root/testdata-local/sf1
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]  # en 40%, rest 15% each
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _u(col, salt: str):
    """Deterministic uniform [0,1) from a column + salt (JVM-side)."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1_000_000_000)) / 1e9


def _pick(col, salt: str, values: list[str]):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(len(values))) + 1).cast("int"))


def _money(col, salt: str, lo: float, hi: float):
    return F.round(F.lit(lo) + _u(col, salt) * F.lit(hi - lo), 2)


def counts_for(sf: float) -> dict[str, int]:
    return {
        "customer": int(150_000 * sf),
        "supplier": int(10_000 * sf),
        "part": int(200_000 * sf),
        "orders": int(1_500_000 * sf),
        "lineitem": int(6_000_000 * sf),
        "events": int(1_000_000 * sf),
        "documents": max(500, int(50_000 * sf)),
        "embeddings": max(500, int(20_000 * sf)),
    }


def _orderdate(okey):
    """o_orderdate as a pure function of the order key so lineitem
    could re-derive it without a join (uniform 1995-01-01..2001-08-01,
    2404 days)."""
    return F.date_add(F.lit("1995-01-01").cast("date"),
                      F.pmod(F.xxhash64(okey, F.lit("odate")), F.lit(2404)).cast("int"))


def generate(
    spark: SparkSession,
    sf: float,
    out: str,
    partitions: int | None = None,
    tables: set[str] | None = None,
) -> None:
    n = counts_for(sf)
    p = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def rng(count, parts=None):
        return spark.range(0, count, 1, parts or p)

    def write(df, name):
        # tables=None generates everything; a subset generates only the
        # named tables (e.g. documents/embeddings/events for an
        # ML-family-only scale decade without 18M-row lineitem cost)
        if tables is not None and name not in tables:
            return
        df.write.mode("overwrite").parquet(os.path.join(out, name + ".parquet"))
        print(f"  {name}: {n.get(name, 'fixed')} rows")

    region = spark.createDataFrame(
        [(i, r) for i, r in enumerate(REGIONS)], "r_regionkey int, r_name string"
    )
    write(region, "region")
    nation = spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    write(nation, "nation")

    write(
        rng(n["customer"]).select(
            F.col("id").alias("c_custkey"),
            F.format_string("Customer#%09d", "id").alias("c_name"),
            F.pmod(F.xxhash64("id", F.lit("cnat")), F.lit(25)).cast("int").alias("c_nationkey"),
            _money(F.col("id"), "cbal", -1000.0, 10000.0).alias("c_acctbal"),
            _pick(F.col("id"), "cseg", SEGMENTS).alias("c_mktsegment"),
        ),
        "customer",
    )
    write(
        rng(n["supplier"]).select(
            F.col("id").alias("s_suppkey"),
            F.format_string("Supplier#%09d", "id").alias("s_name"),
            F.pmod(F.xxhash64("id", F.lit("snat")), F.lit(25)).cast("int").alias("s_nationkey"),
            _money(F.col("id"), "sbal", -1000.0, 10000.0).alias("s_acctbal"),
        ),
        "supplier",
    )
    part = rng(n["part"]).select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(" ", _pick(F.col("id"), "padj", ADJ), _pick(F.col("id"), "pnoun", NOUN)).alias("p_name"),
        F.concat(F.lit("Brand#"), F.pmod(F.xxhash64("id", F.lit("pbrand")), F.lit(25)).cast("string")).alias("p_brand"),
        _pick(F.col("id"), "ptype", PTYPES).alias("p_type"),
        (F.pmod(F.xxhash64("id", F.lit("psize")), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + F.pmod(F.col("id"), F.lit(1000)) * 0.1, 2).alias("p_retailprice"),
    )
    write(part, "part")

    # partsupp: materialize the EXACT dbgen-stride synthesis rule the
    # tpch22_* suite uses as its fallback CTE (queries/tpch.py
    # `_PARTSUPP`) — literally that SQL text over the part/supplier
    # frames just built, so a real partsupp.parquet scan and the
    # synthesized CTE agree bit-for-bit and the queries can prefer the
    # scan (one less re-derivation across q2's correlated boundary).
    if tables is None or "partsupp" in tables:
        from sparkplans.queries.tpch import _PARTSUPP

        part.createOrReplaceTempView("part")
        rng(n["supplier"]).select(
            F.col("id").alias("s_suppkey")
        ).createOrReplaceTempView("supplier")
        write(
            spark.sql(f"WITH {_PARTSUPP} SELECT * FROM partsupp"),
            "partsupp",
        )
    write(
        rng(n["orders"]).select(
            F.col("id").alias("o_orderkey"),
            F.pmod(F.xxhash64("id", F.lit("ocust")), F.lit(n["customer"])).alias("o_custkey"),
            _pick(F.col("id"), "ostat", ["F", "O", "P"]).alias("o_orderstatus"),
            _money(F.col("id"), "ototal", 1000.0, 500000.0).alias("o_totalprice"),
            _orderdate(F.col("id")).cast("timestamp_ntz").alias("o_orderdate"),
            _pick(F.col("id"), "oprio", PRIORITIES).alias("o_orderpriority"),
        ),
        "orders",
    )
    write(
        rng(n["lineitem"]).select(
            F.pmod(F.xxhash64("id", F.lit("lord")), F.lit(n["orders"])).alias("l_orderkey"),
            F.pmod(F.xxhash64("id", F.lit("lpart")), F.lit(n["part"])).alias("l_partkey"),
            F.pmod(F.xxhash64("id", F.lit("lsupp")), F.lit(n["supplier"])).alias("l_suppkey"),
            (F.pmod(F.xxhash64("id", F.lit("lno")), F.lit(7)) + 1).cast("int").alias("l_linenumber"),
            (F.pmod(F.xxhash64("id", F.lit("lqty")), F.lit(50)) + 1).cast("double").alias("l_quantity"),
            _money(F.col("id"), "lext", 900.0, 105000.0).alias("l_extendedprice"),
            (F.pmod(F.xxhash64("id", F.lit("ldisc")), F.lit(11)).cast("double") / 100).alias("l_discount"),
            (F.pmod(F.xxhash64("id", F.lit("ltax")), F.lit(9)).cast("double") / 100).alias("l_tax"),
            _pick(F.col("id"), "lrf", ["A", "N", "R"]).alias("l_returnflag"),
            _pick(F.col("id"), "lls", ["F", "O"]).alias("l_linestatus"),
            F.date_add(F.lit("1995-01-02").cast("date"),
                       F.pmod(F.xxhash64("id", F.lit("lship")), F.lit(2498)).cast("int"))
            .cast("timestamp_ntz").alias("l_shipdate"),
        ),
        "lineitem",
    )

    # events: monotone-with-jitter timestamps over a fixed 30-day window
    span_us = 30 * 86400 * 1_000_000
    step = max(span_us // n["events"], 1)
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros
    write(
        rng(n["events"]).select(
            F.col("id").alias("event_id"),
            (F.lit(base_us) + F.col("id") * F.lit(step)
             + F.pmod(F.xxhash64("id", F.lit("ejit")), F.lit(step))).alias("_us"),
        ).select(
            "event_id",
            F.timestamp_micros(F.col("_us")).cast("timestamp_ntz").alias("ts"),
            F.pmod(F.xxhash64("event_id", F.lit("euser")), F.lit(max(n["customer"] // 10, 1))).alias("user_id"),
            _pick(F.col("event_id"), "etype", EVENT_TYPES).alias("event_type"),
            F.round(-50.0 * F.log(F.lit(1.0) - _u(F.col("event_id"), "eval")), 2).alias("value"),
            F.format_string('{"k": %d}', F.pmod(F.xxhash64("event_id", F.lit("ek")), F.lit(100)).cast("int")).alias("props"),
        ),
        "events",
    )

    # documents: hash-chosen words from the 31-word vocab; ~0.2% of
    # docs are exact duplicates of an earlier doc (dup-of id = id - id%503)
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    is_dup = (F.pmod(F.xxhash64("id", F.lit("ddup")), F.lit(500)) == 0) & (F.col("id") % 503 != 0)
    src_id = F.when(is_dup, F.col("id") - F.pmod(F.col("id"), F.lit(503))).otherwise(F.col("id"))
    n_words = (F.pmod(F.xxhash64(src_id, F.lit("dlen")), F.lit(90)) + 8).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(vocab, (F.pmod(F.xxhash64(src_id, i, F.lit("dword")), F.lit(len(VOCAB))) + 1).cast("int")),
        ),
        " ",
    )
    lang_roll = F.pmod(F.xxhash64(src_id, F.lit("dlang")), F.lit(100))
    lang = (
        F.when(lang_roll < 40, "en").when(lang_roll < 55, "de")
        .when(lang_roll < 70, "es").when(lang_roll < 85, "fr").otherwise("zh")
    )
    write(
        rng(n["documents"]).select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            lang.alias("lang"),
            F.concat(F.lit("src"), F.pmod(F.xxhash64("id", F.lit("dsrc")), F.lit(20)).cast("string")).alias("source"),
        ).withColumn("n_chars", F.length("text").cast("long")),
        "documents",
    )

    # embeddings: 10 label clusters on the unit sphere — center(label)
    # + noise, L2-normalized JVM-side (transform + aggregate)
    label = F.pmod(F.xxhash64("id", F.lit("elabel")), F.lit(10)).cast("int")
    dims = F.sequence(F.lit(0), F.lit(63))
    raw = F.transform(
        dims,
        lambda j: (
            (F.pmod(F.xxhash64(label, j, F.lit("ecenter")), F.lit(2001)) - 1000) / 1000.0
            + 0.25 * ((F.pmod(F.xxhash64("id", j, F.lit("enoise")), F.lit(2001)) - 1000) / 1000.0)
        ),
    )
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x))
    write(
        rng(n["embeddings"]).select(
            F.col("id").alias("vec_id"),
            F.transform(raw, lambda x: (x / norm).cast("float")).alias("embedding"),
            label.alias("label"),
        ),
        "embeddings",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--tables",
        default="",
        help="comma-separated subset to generate (default: all tables)",
    )
    args = ap.parse_args()
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName(f"generate-sf{args.sf}")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    print(f"generating sf={args.sf} -> {args.out}")
    generate(
        spark,
        args.sf,
        args.out,
        tables={t for t in args.tables.split(",") if t} or None,
    )
    spark.stop()


if __name__ == "__main__":
    main()
