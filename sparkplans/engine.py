"""The engine facade and the order-aware plan-construction layer.

This is the one genuinely custom component (SURVEY §4.4): PySpark
cannot inject Catalyst rules without JVM code, so ordering-awareness
lives *above* Catalyst.  :class:`OrderedFrame` wraps a DataFrame plus
the ordering the engine knows it has (from catalog metadata, declared
via ``WITH ORDER`` — ``docs/2_cli_create_tables.md:17-23``), and
propagates / consumes that knowledge:

- ``filter`` preserves ordering (docs/6:40-58);
- ``select`` keeps the longest surviving prefix (docs/4:113-140);
- ``order_by`` elides the sort when the known ordering satisfies the
  requirement (exact or prefix — docs/4:33-84) and emits it otherwise
  (non-prefix — docs/4:87-111);
- ``join`` against a broadcast side preserves probe-side ordering
  (the reference's CollectLeft hash join property, docs/8:188-196).

Everything else is vanilla DataFrame construction; Catalyst and AQE
still do all the classic optimizations underneath.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from sparkplans import plans
from sparkplans.catalog import Catalog
from sparkplans.ordering import (
    SortKey,
    normalize_sort_keys,
    ordering_satisfies,
    project_ordering,
    sort_columns,
)
from sparkplans.session import EngineOptions, build_session, configure_session, settings


def _sort_cols(keys: Sequence[SortKey]) -> list[Column]:
    return sort_columns(keys)


class OrderedFrame:
    """A DataFrame plus engine-known ordering metadata.

    ``ordering`` is the per-partition sort order the engine knows the
    data has; ``globally_ordered`` is True when the frame is a single
    sorted stream (one partition / one file, or after a global sort).
    """

    def __init__(
        self,
        engine: "Engine",
        df: DataFrame,
        ordering: Sequence[SortKey] = (),
        globally_ordered: bool = False,
    ):
        self.engine = engine
        self.df = df
        self.ordering = tuple(ordering)
        self.globally_ordered = globally_ordered and bool(self.ordering)

    # -- ordering-preserving relational ops -----------------------------

    def filter(self, cond) -> "OrderedFrame":
        return OrderedFrame(self.engine, self.df.filter(cond), self.ordering, self.globally_ordered)

    where = filter

    def select(self, *cols) -> "OrderedFrame":
        out = self.df.select(*cols)
        surviving = project_ordering(self.ordering, out.columns)
        return OrderedFrame(self.engine, out, surviving, self.globally_ordered and len(surviving) == len(self.ordering))

    def with_column(self, name: str, col: Column) -> "OrderedFrame":
        return OrderedFrame(self.engine, self.df.withColumn(name, col), self.ordering, self.globally_ordered)

    def limit(self, n: int) -> "OrderedFrame":
        return OrderedFrame(self.engine, self.df.limit(n), self.ordering, self.globally_ordered)

    # -- the sort-elision rule ------------------------------------------

    def order_by(self, *keys) -> "OrderedFrame":
        """Emit ``orderBy`` only when needed.

        Cases (mirroring docs/4 and docs/6):
        1. requirement satisfied AND single sorted stream -> no-op
           (the reference's plan with *no SortExec at all*,
           tests/setup_tables.rs:118-123);
        2. requirement satisfied per-partition, many partitions -> a
           global merge is still required; Spark expresses this as
           ``orderBy`` (range exchange + in-partition sort over
           already-sorted runs — the result-equivalent of
           SortPreservingMergeExec, docs/6:14-37);
        3. not satisfied -> full ``orderBy`` (docs/4:87-111).
        """
        req = normalize_sort_keys(list(keys))
        prefer = self.engine.options.prefer_existing_sort
        if prefer and ordering_satisfies(self.ordering, req):
            if self.globally_ordered or self.df.rdd.getNumPartitions() <= 1:
                return OrderedFrame(self.engine, self.df, self.ordering, True)
        return OrderedFrame(self.engine, self.df.orderBy(*_sort_cols(req)), req, True)

    def sort_within_partitions(self, *keys) -> "OrderedFrame":
        req = normalize_sort_keys(list(keys))
        if self.engine.options.prefer_existing_sort and ordering_satisfies(self.ordering, req):
            return self
        return OrderedFrame(self.engine, self.df.sortWithinPartitions(*_sort_cols(req)), req, False)

    # -- joins ----------------------------------------------------------

    def join_broadcast(self, other: DataFrame | "OrderedFrame", on, how: str = "inner") -> "OrderedFrame":
        """Broadcast-hash join with this frame as the probe side — the
        reference's CollectLeft hash join (docs/8:120,188-196): the
        small side is collected/broadcast once, probe partitions stream
        through unchanged, so probe-side ordering survives."""
        small = other.df if isinstance(other, OrderedFrame) else other
        out = self.df.join(F.broadcast(small), on, how)
        keep = self.ordering if how in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti") else ()
        return OrderedFrame(self.engine, out, project_ordering(keep, out.columns), False)

    def join(self, other: DataFrame | "OrderedFrame", on, how: str = "inner") -> "OrderedFrame":
        right = other.df if isinstance(other, OrderedFrame) else other
        return OrderedFrame(self.engine, self.df.join(right, on, how), ())

    # -- aggregation -----------------------------------------------------

    def group_by(self, *cols):
        """Plain groupBy; Spark plans partial->shuffle->final
        automatically (the reference's two-phase aggregate,
        docs/7:67-97).  When the grouping keys prefix-match the known
        ordering and partitions align with files, AQE keeps this cheap;
        a pipeline/sorted aggregation analog is a physical-planning
        detail Spark owns (SURVEY §2.4)."""
        return self.df.groupBy(*cols)

    # -- escape hatch ----------------------------------------------------

    def __getattr__(self, item):
        return getattr(self.df, item)


class Engine:
    """Top-level facade: session + catalog + order-aware planning +
    plan inspection (the reference's ``SessionContext`` analog,
    ``tests/setup_tables.rs:33-37``)."""

    def __init__(
        self,
        options: EngineOptions | None = None,
        spark: SparkSession | None = None,
        app_name: str = "sparkplans",
    ):
        self.options = options or EngineOptions()
        if spark is None:
            self.spark = build_session(self.options, app_name=app_name)
        else:
            self.spark = configure_session(spark, self.options)
        self.catalog = Catalog(self.spark)

    # -- tables ----------------------------------------------------------

    def create_external_table(self, name: str, path: str, **kwargs) -> OrderedFrame:
        spec = self.catalog.create_external_table(name, path, **kwargs)
        return self.table(name)

    def create_table(self, name: str, schema, rows=None):
        self.catalog.create_table(name, schema, rows)
        return self.table(name)

    def insert_into(self, name: str, rows: list) -> None:
        self.catalog.insert_into(name, rows)

    def table(self, name: str) -> OrderedFrame:
        spec = self.catalog._tables.get(name)
        df = self.catalog.read(name) if spec is not None else self.spark.table(name)
        order = spec.sort_order if spec else ()
        single = bool(spec) and not spec.in_memory and len(spec.files) <= 1
        return OrderedFrame(self, df, order, globally_ordered=single and bool(order))

    def create_versioned_table(self, name: str, root: str):
        """Attach a `sparkplans.table.VersionedTable` (Delta-style log
        over parquet) to the catalog namespace: ``table(name)`` reads
        the latest snapshot; ``table_at(name, version)`` time-travels.
        Returns the VersionedTable handle for writes."""
        from sparkplans.table import VersionedTable

        vt = VersionedTable(self.spark, root)
        if not hasattr(self, "_versioned"):
            self._versioned: dict[str, VersionedTable] = {}
        self._versioned[name] = vt
        if vt.latest_version() is not None:
            vt.read().createOrReplaceTempView(name)
        return vt

    def table_at(self, name: str, version: int | None = None) -> OrderedFrame:
        """Snapshot / time-travel read of a versioned table.  Also
        refreshes the registered view to the latest snapshot when
        called without a version (a plain ``table(name)`` keeps the
        file list pinned at registration — snapshot isolation)."""
        vt = getattr(self, "_versioned", {}).get(name)
        if vt is None:
            raise KeyError(f"{name} is not a versioned table")
        df = vt.read(version=version)
        if version is None:
            df.createOrReplaceTempView(name)
        return OrderedFrame(self, df, ())

    def read_range(self, name: str, col: str, lo=None, hi=None) -> OrderedFrame:
        """Range scan with catalog file-level min/max pruning (the
        reference's statistics-driven scan, lifted to the listing
        table: files proven disjoint from [lo, hi] are never
        scheduled).  Row-level filtering still applies; ordering
        metadata survives because filter preserves per-partition
        order."""
        spec = self.catalog._tables.get(name)
        df = self.catalog.read_range(name, col, lo, hi)
        order = spec.sort_order if spec else ()
        return OrderedFrame(self, df, order)

    # -- SQL -------------------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        """Spark SQL, plus DML dispatch for versioned tables: ``DELETE
        FROM <vt> WHERE ...`` and ``UPDATE <vt> SET c = expr[, ...]
        [WHERE ...]`` route to the table's copy-on-write commits
        (Spark itself rejects DML on file tables).  Returns a 1-row
        (version, rows) frame for DML; everything else passes through
        untouched."""
        import re as _re

        m = _re.match(
            r"\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*;?\s*$",
            query, _re.IGNORECASE | _re.DOTALL,
        )
        if m and m.group(1) in getattr(self, "_versioned", {}):
            vt = self._versioned[m.group(1)]
            v = vt.delete(m.group(2))
            self.table_at(m.group(1))  # refresh the registered view
            n = vt.read().count()
            return self.spark.createDataFrame(
                [(v, n)], "version int, rows bigint"
            )
        m = _re.match(
            r"\s*UPDATE\s+(\w+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
            query, _re.IGNORECASE | _re.DOTALL,
        )
        if m and m.group(1) in getattr(self, "_versioned", {}):
            vt = self._versioned[m.group(1)]
            assigns = {}
            for part in _split_top_level_commas(m.group(2)):
                col, expr = part.split("=", 1)
                assigns[col.strip()] = expr.strip()
            cond = m.group(3) if m.group(3) else "true"
            v = vt.update(cond, assigns)
            self.table_at(m.group(1))
            n = vt.read().count()
            return self.spark.createDataFrame(
                [(v, n)], "version int, rows bigint"
            )
        m = _re.match(
            r"\s*DESCRIBE\s+HISTORY\s+(\w+)\s*;?\s*$", query, _re.IGNORECASE
        )
        if m and m.group(1) in getattr(self, "_versioned", {}):
            vt = self._versioned[m.group(1)]
            rows = [
                (
                    int(e["version"]),
                    e.get("op", ""),
                    len(e.get("files", [])),
                    e.get("batch_id"),
                )
                for e in vt.history()
            ]
            return self.spark.createDataFrame(
                rows, "version int, op string, n_files int, batch_id bigint"
            )
        m = _re.match(
            r"\s*(VACUUM|OPTIMIZE)\s+(\w+)\s*;?\s*$", query, _re.IGNORECASE
        )
        if m and m.group(2) in getattr(self, "_versioned", {}):
            vt = self._versioned[m.group(2)]
            if m.group(1).upper() == "VACUUM":
                dead = vt.vacuum(keep_versions=1, orphan_age_seconds=0)
                return self.spark.createDataFrame(
                    [(len(dead),)], "files_removed int"
                )
            v = vt.compact(target_files=1)
            self.table_at(m.group(2))
            return self.spark.createDataFrame([(v,)], "version int")
        # time travel: FROM <vt> VERSION AS OF <n> registers a pinned
        # snapshot view and rewrites the query to read it
        for name, ver in _re.findall(
            r"(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)", query, _re.IGNORECASE
        ):
            if name in getattr(self, "_versioned", {}):
                view = f"{name}__v{ver}"
                self._versioned[name].read(
                    version=int(ver)
                ).createOrReplaceTempView(view)
                query = _re.sub(
                    rf"\b{_re.escape(name)}\s+VERSION\s+AS\s+OF\s+{_re.escape(ver)}\b",
                    view, query, flags=_re.IGNORECASE,
                )
        return self.spark.sql(query)

    def set(self, key: str, value) -> None:
        """``SET key = value`` (docs/1:110-127)."""
        self.spark.conf.set(key, str(value))

    def settings(self) -> dict[str, str]:
        return settings(self.spark)

    def cache_table(self, name: str) -> None:
        """Pin a registered table in executor memory (columnar
        InMemoryRelation); repeated scans then skip the file source.
        Right for hot dimension tables; wrong for anything near the
        size of the cluster's memory."""
        self.spark.catalog.cacheTable(name)

    def uncache_table(self, name: str) -> None:
        self.spark.catalog.uncacheTable(name)

    def refresh_information_schema(self) -> None:
        """Register the reference's ``information_schema`` surface as
        SQL-queryable temp views (docs/1_cli_information_schema.md:
        24-108): ``information_schema_tables`` / ``_columns`` /
        ``_settings``.  Snapshot views — call again after DDL."""
        cat = self.catalog
        tables = cat.show_tables()
        cols = [c for t in tables for c in cat.show_columns(t["table_name"])]
        sets = [{"key": k, "value": str(v)} for k, v in sorted(self.settings().items())]
        for name, rows, schema in [
            ("information_schema_tables", tables,
             "table_name STRING, table_type STRING, format STRING, path STRING, sort_order STRING, num_files INT"),
            ("information_schema_columns", cols,
             "table_name STRING, column_name STRING, data_type STRING, is_nullable STRING"),
            ("information_schema_settings", sets, "key STRING, value STRING"),
        ]:
            data = [tuple(r.values()) for r in rows]
            self.spark.createDataFrame(data, schema).createOrReplaceTempView(name)

    # -- plan inspection -------------------------------------------------

    def explain(self, df: DataFrame | OrderedFrame, mode: str = "tree") -> str:
        d = df.df if isinstance(df, OrderedFrame) else df
        if mode == "analyze":
            return plans.explain_analyze(d)
        if mode == "verbose":
            return plans.explain_verbose(d)
        return plans.plan_text(d, mode)

    def stop(self) -> None:
        self.spark.stop()


def _split_top_level_commas(s: str) -> list[str]:
    """Split a SET clause on commas outside parentheses/quotes."""
    parts, depth, buf, q = [], 0, [], None
    for ch in s:
        if q:
            buf.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return parts
