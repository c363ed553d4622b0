"""Versioned tables: a minimal Delta/Iceberg-style transaction log.

The reference (like vanilla Spark paths) treats a table as "whatever
files are in the directory" — no atomicity, no history.  This module
adds the missing storage contract with nothing but parquet + a JSON
log, the same core recipe the open table formats use:

- **Layout**: ``<root>/_log/00000042.json`` (one entry per committed
  version) + ``<root>/data/v42-*/*.parquet`` (immutable data files).
- **Commit = atomic rename.** A writer stages its data files, writes
  the log entry to a temp name, and ``os.rename``s it to the next
  version number.  POSIX rename-no-overwrite (via ``os.link``)
  makes exactly one of two racing writers win; the loser re-reads the
  log and retries on the next version — optimistic concurrency.
- **Snapshot isolation**: a read resolves the file list from the log
  ONCE (latest committed or an explicit ``version=``), so concurrent
  commits never tear a running query.  Old versions stay readable —
  time travel — until ``vacuum`` removes files no live version
  references.

At 100 TB this is exactly how the lakehouse formats behave: the log
is tiny driver-side metadata; data files are immutable and
partition-parallel; appends never rewrite, overwrites just change
which files a version points to.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    pass


class SchemaEvolutionError(ValueError):
    """A write's schema conflicts with the table's (same column name,
    different type) — evolution is widening-only, never casting."""


def _merge_schemas(old, new):
    """Union schema: ``old``'s fields in order (made nullable — older
    files must null-fill columns they predate), then ``new``'s unseen
    fields.  Same-name different-type raises; this is the ADD COLUMN /
    missing-column half of lakehouse schema evolution, with no
    implicit type changes."""
    from pyspark.sql.types import StructField, StructType

    if old is None:
        return new
    by_name = {f.name: f for f in new.fields}
    fields = []
    for f in old.fields:
        g = by_name.get(f.name)
        if g is not None and g.dataType != f.dataType:
            raise SchemaEvolutionError(
                f"column {f.name!r}: table has {f.dataType.simpleString()}, "
                f"write has {g.dataType.simpleString()}"
            )
        fields.append(StructField(f.name, f.dataType, nullable=True))
    seen = {f.name for f in old.fields}
    for g in new.fields:
        if g.name not in seen:
            fields.append(StructField(g.name, g.dataType, nullable=True))
    return StructType(fields)


class VersionedTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.log_dir = os.path.join(root, "_log")
        self.data_dir = os.path.join(root, "data")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- log primitives -------------------------------------------------

    def _entry_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:08d}.json")

    def versions(self) -> list[int]:
        return sorted(
            int(f[:-5])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and not f.startswith("_")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _read_entry(self, version: int) -> dict:
        with open(self._entry_path(version)) as f:
            return json.load(f)

    def _commit(self, entry: dict, retries: int = 20) -> int:
        """Atomically claim the next version number.  ``os.link`` (not
        rename) refuses to overwrite an existing target, so exactly one
        of N racing writers wins each version; losers retry above the
        new tip."""
        tmp = os.path.join(self.log_dir, f"_tmp-{uuid.uuid4().hex}.json")
        for _ in range(retries):
            v = (self.latest_version() or 0) + 1 if self.versions() else 0
            entry["version"] = v
            with open(tmp, "w") as f:
                json.dump(entry, f)
            try:
                os.link(tmp, self._entry_path(v))
                os.unlink(tmp)
                return v
            except FileExistsError:
                continue  # lost the race — re-read tip, try next number
        os.unlink(tmp)
        raise CommitConflict(f"could not commit after {retries} attempts")

    # -- writes ---------------------------------------------------------

    def _stage(self, df: DataFrame) -> list[str]:
        sub = os.path.join(self.data_dir, f"stage-{uuid.uuid4().hex}")
        df.write.parquet(sub)
        return sorted(
            os.path.join(sub, f)
            for f in os.listdir(sub)
            if f.endswith(".parquet")
        )

    @staticmethod
    def _collect_file_stats(files: list[str], cols: list[str]) -> dict:
        """Per-file row count and [min, max] per requested column, read
        from the parquet footers of the JUST-WRITTEN files — the Delta
        recipe: stats are paid once at commit time and recorded in the
        log, so later reads prune files from metadata alone (the
        catalog's ``file_stats`` footer sweep, amortized to zero).
        Only JSON-stable scalar types (int/float/str) are recorded;
        anything else is conservatively left out (file never prunes)."""
        import pyarrow.parquet as pq

        out: dict = {}
        for f in files:
            md = pq.ParquetFile(f).metadata
            entry: dict = {"rows": md.num_rows, "cols": {}}
            names = md.schema.names
            for c in cols:
                if c not in names:
                    continue
                idx = names.index(c)
                mn = mx = None
                ok = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    mn = st.min if mn is None else min(mn, st.min)
                    mx = st.max if mx is None else max(mx, st.max)
                if ok and isinstance(mn, (int, float, str)) and isinstance(
                    mx, (int, float, str)
                ):
                    entry["cols"][c] = [mn, mx]
            out[f] = entry
        return out

    def _evolved_schema(self, df: DataFrame):
        """Schema the table has AFTER committing ``df``: the current
        schema with ``df``'s new columns appended (widening only —
        same-name different-type is rejected, no implicit casts).
        Resolved from the LOG, never from data-file footers: at 100 TB
        a ``mergeSchema`` read sweeps every footer; the log answers in
        constant time."""
        tip = self.latest_version()
        prev = self._schema_at(tip) if tip is not None else None
        return _merge_schemas(prev, df.schema)

    def append(self, df: DataFrame, stats_cols: list[str] | None = None) -> int:
        """Commit the rows as a new version on top of the current tip.

        Schema evolution: a batch may ADD columns (older files read
        back null-filled) or OMIT columns (the new files read back
        null-filled) — the union schema rides in the log entry and
        pins every subsequent read.  Type conflicts raise.

        ``stats_cols``: record per-file [min, max] for these columns in
        the log entry — fuel for :meth:`read_pruned` data skipping."""
        schema = self._evolved_schema(df)
        files = self._stage(df)
        entry = {"op": "append", "files": files, "schema": schema.json()}
        if stats_cols:
            entry["file_stats"] = self._collect_file_stats(files, stats_cols)
        return self._commit(entry)

    def overwrite(
        self, df: DataFrame, stats_cols: list[str] | None = None
    ) -> int:
        """Commit a version that replaces the table contents.  Old
        versions remain readable (time travel) until vacuum().  The
        schema rides in the log entry so a legitimately-empty version
        (overwrite with 0 rows) stays readable."""
        files = self._stage(df)
        entry = {"op": "overwrite", "files": files, "schema": df.schema.json()}
        if stats_cols:
            entry["file_stats"] = self._collect_file_stats(files, stats_cols)
        return self._commit(entry)

    # -- reads ----------------------------------------------------------

    def _files_at(self, version: int) -> list[str]:
        files: list[str] = []
        for v in self.versions():
            if v > version:
                break
            e = self._read_entry(v)
            if e["op"] == "overwrite":
                files = list(e["files"])
            else:
                files.extend(e["files"])
        return files

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read: latest committed version, or time travel to
        an explicit one.  The file list is resolved once — commits
        landing after this call do not affect the returned frame."""
        tip = self.latest_version()
        if tip is None:
            raise FileNotFoundError(f"no committed versions at {self.root}")
        v = tip if version is None else version
        if v not in self.versions():
            raise FileNotFoundError(f"version {v} not in log")
        files = self._files_at(v)
        if not files:
            # a version with no files is a legitimate empty table
            # (overwrite of an empty frame, empty first micro-batch):
            # reconstruct it from the recorded schema
            schema = self._schema_at(v)
            if schema is None:
                raise FileNotFoundError(f"version {v} has no data files")
            return self.spark.createDataFrame([], schema)
        schema = self._schema_at(v)
        if schema is not None:
            # Pin the read to the schema recorded AT THAT VERSION:
            # files written before a column existed null-fill it, files
            # written with since-dropped writers' narrow schemas widen,
            # and time travel to an old version shows the old schema.
            return self.spark.read.schema(schema).parquet(*files)
        return self.spark.read.parquet(*files)

    def _stats_at(self, version: int) -> dict:
        """file -> recorded stats, for every entry at or below
        ``version`` (stats ride with the file path; membership is
        governed by the file list)."""
        stats: dict = {}
        for v in self.versions():
            if v > version:
                break
            stats.update(self._read_entry(v).get("file_stats", {}))
        return stats

    def pruned_files(
        self, col: str, lo=None, hi=None, version: int | None = None
    ) -> list[str]:
        """Files of the snapshot that may contain ``col`` values in
        ``[lo, hi]`` (either bound None = unbounded), decided from the
        LOG's recorded stats — zero footer reads, zero data reads.
        Conservative: files without recorded stats are always kept;
        pruning only skips files PROVEN disjoint (the reference's
        ``pruning_predicate`` over min/max, docs/5:97-108, at the
        lakehouse-log level)."""
        v = self.latest_version() if version is None else version
        stats = self._stats_at(v)
        keep = []
        for f in self._files_at(v):
            s = stats.get(f)
            if s is None:
                keep.append(f)
                continue
            if s.get("rows") == 0:
                continue
            rng = s.get("cols", {}).get(col)
            if rng is None:
                keep.append(f)
                continue
            mn, mx = rng
            if lo is not None and mx < lo:
                continue
            if hi is not None and mn > hi:
                continue
            keep.append(f)
        return keep

    def read_pruned(
        self, col: str, lo=None, hi=None, version: int | None = None
    ) -> DataFrame:
        """Range read with log-stats data skipping: schedule only the
        files that may intersect the predicate, then apply the real
        filter for row-level correctness.  At 100 TB a time-range query
        over an append-ordered table touches just the matching files —
        and unlike footer-based pruning, deciding WHICH files costs one
        driver-side log read, not a million-footer sweep."""
        from pyspark.sql import functions as F

        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed versions at {self.root}")
        files = self.pruned_files(col, lo, hi, version=v)
        schema = self._schema_at(v)
        if not files:
            return self.spark.createDataFrame([], schema)
        df = (
            self.spark.read.schema(schema).parquet(*files)
            if schema is not None
            else self.spark.read.parquet(*files)
        )
        if lo is not None:
            df = df.filter(F.col(col) >= lo)
        if hi is not None:
            df = df.filter(F.col(col) <= hi)
        return df

    def _schema_at(self, version: int):
        """Schema of the table at ``version``: the most recent log
        entry at or below it that recorded one (pre-schema log entries
        return None)."""
        from pyspark.sql.types import StructType

        for v in reversed([x for x in self.versions() if x <= version]):
            s = self._read_entry(v).get("schema")
            if s is not None:
                return StructType.fromJson(json.loads(s))
        return None

    def history(self) -> list[dict]:
        return [self._read_entry(v) for v in self.versions()]

    def merge(self, updates: DataFrame, key: str) -> int:
        """MERGE (upsert) as a new version: rows in ``updates`` replace
        same-key rows of the current snapshot, new keys append — the
        copy-on-write MERGE INTO of the lakehouse formats.  The rewrite
        materializes survivors + updates into fresh files and commits
        them as an overwrite; old versions still time-travel.

        Note: like first-generation Delta, this is last-writer-wins —
        a concurrent append between our snapshot read and commit is
        shadowed by the rewrite.  Serializable MERGE would re-validate
        the read version at commit time and retry; the log carries
        enough (version numbers) to add that."""
        current = self.read()
        # schema evolution applies to MERGE too: updates may carry new
        # columns (survivors null-fill them) or omit existing ones
        _merge_schemas(current.schema, updates.schema)  # type-conflict gate
        survivors = current.join(
            updates.select(key).distinct(), key, "left_anti"
        )
        merged = survivors.unionByName(updates, allowMissingColumns=True)
        files = self._stage(merged)
        return self._commit(
            {
                "op": "overwrite",
                "merge_key": key,
                "files": files,
                "schema": merged.schema.json(),
            }
        )

    def delete(self, condition) -> int:
        """Copy-on-write DELETE: rows matching ``condition`` (a Column
        or SQL string) are dropped by rewriting the survivors into
        fresh files and committing them as an overwrite — the TPC-H
        RF2-style maintenance op, and exactly how the lakehouse
        formats delete without mutating files.  Old versions still
        time-travel to the pre-delete data; vacuum reclaims later.

        At 100 TB the rewrite cost is bounded by the files that
        actually contain matches — pair with :meth:`read_pruned`-style
        stats to rewrite only touched files; this minimal form
        rewrites the snapshot (correct at any scale, optimal when
        deletes are broad)."""
        from pyspark.sql import functions as _F

        cond = _F.expr(condition) if isinstance(condition, str) else condition
        current = self.read()
        # SQL DELETE drops rows where the predicate is TRUE; rows where
        # it evaluates to NULL survive (three-valued logic — same
        # asymmetry update() gets from when/otherwise).  A plain
        # filter(~cond) would silently delete NULL-predicate rows.
        survivors = current.filter(~cond.eqNullSafe(_F.lit(True)))
        files = self._stage(survivors)
        return self._commit(
            {
                "op": "overwrite",
                "delete": str(condition),
                "files": files,
                "schema": survivors.schema.json(),
            }
        )

    def update(self, condition, assignments: dict) -> int:
        """Copy-on-write UPDATE: rows matching ``condition`` get the
        ``assignments`` (column -> Column/SQL expression) applied;
        everything else is carried unchanged.  One rewrite commit,
        same snapshot/time-travel semantics as :meth:`delete`."""
        from pyspark.sql import functions as _F

        cond = _F.expr(condition) if isinstance(condition, str) else condition
        current = self.read()
        updated = current
        for col, expr in assignments.items():
            val = _F.expr(expr) if isinstance(expr, str) else expr
            updated = updated.withColumn(
                col, _F.when(cond, val).otherwise(_F.col(col))
            )
        files = self._stage(updated)
        return self._commit(
            {
                "op": "overwrite",
                "update": str(condition),
                "files": files,
                "schema": updated.schema.json(),
            }
        )

    def streaming_append_batch(self, batch_df: DataFrame, batch_id: int) -> int | None:
        """foreachBatch sink body with exactly-once semantics: the
        micro-batch id is recorded in the log entry, and a replayed
        batch (same id already committed) is a no-op — restart-safe
        without any side channel, because the dedup record and the data
        commit are the same atomic rename.

        Use: ``stream.writeStream.foreachBatch(t.streaming_append_batch)``.
        """
        for e in self.history():
            if e.get("batch_id") == batch_id or batch_id in e.get(
                "committed_batch_ids", []
            ):
                return None  # replay after restart — already committed
        schema = self._evolved_schema(batch_df)
        files = self._stage(batch_df)
        return self._commit(
            {
                "op": "append",
                "batch_id": batch_id,
                "files": files,
                "schema": schema.json(),
            }
        )

    def changes(
        self, from_version: int, to_version: int, keys: list[str]
    ) -> DataFrame:
        """CDC between two committed versions: the insert/delete/update
        change set that turns ``from_version`` into ``to_version``
        (`operators/diff.table_diff` over the two time-travel reads).
        This is how a downstream consumer incrementally follows the
        table without re-reading full snapshots it already has."""
        from sparkplans.operators.diff import table_diff

        return table_diff(
            self.read(version=from_version),
            self.read(version=to_version),
            keys=keys,
        )

    def compact(self, target_files: int = 1) -> int:
        """Small-files maintenance as a plain commit: rewrite the
        current snapshot into ``target_files`` files and commit the
        result as an overwrite version (op tagged ``compact``).  Reads
        concurrent with the compaction keep their pinned pre-compact
        file list; vacuum reclaims the fragments later — compaction
        never blocks or breaks readers, the lakehouse-format
        property."""
        current = self.read().coalesce(target_files)
        files = self._stage(current)
        return self._commit(
            {
                "op": "overwrite",
                "compact": True,
                "files": files,
                "schema": current.schema.json(),
            }
        )

    # -- maintenance ----------------------------------------------------

    def vacuum(
        self, keep_versions: int = 1, orphan_age_seconds: float = 3600.0
    ) -> list[str]:
        """Drop data files referenced only by versions older than the
        newest ``keep_versions`` (their log entries are removed too).
        Returns the deleted file paths.

        The earliest kept version is rewritten as a self-contained
        base; its rewrite PRESERVES its own auxiliary metadata
        (``batch_id``, ``merge_key``, ``schema``) and folds the
        ``batch_id``s of every removed entry into
        ``committed_batch_ids`` — so streaming_append_batch's
        exactly-once dedup still recognizes a replayed micro-batch
        after vacuum (the round-1 duplicate-rows defect).

        Staged-but-never-committed files (crashed writers, commits
        that exhausted retries) are also swept: any ``data/stage-*``
        directory none of whose files appear in a kept version, older
        than ``orphan_age_seconds`` (the age gate avoids racing an
        in-flight writer), is removed."""
        import shutil
        import time

        vs = self.versions()
        keep = vs[-keep_versions:] if keep_versions else []
        live: set[str] = set()
        for v in keep:
            live.update(self._files_at(v))
        doomed: list[str] = []
        removed_batch_ids: list[int] = []
        for v in vs:
            if v in keep:
                continue
            e = self._read_entry(v)
            if e.get("batch_id") is not None:
                removed_batch_ids.append(e["batch_id"])
            removed_batch_ids.extend(e.get("committed_batch_ids", []))
            for f in e.get("files", []):
                if f not in live and os.path.exists(f):
                    doomed.append(f)
        # earliest kept version must become self-contained: rewrite its
        # entry as an overwrite of its resolved file list, carrying
        # forward its metadata and the removed entries' batch ids
        if keep:
            base = keep[0]
            base_entry = self._read_entry(base)
            resolved = self._files_at(base)
            rewritten = {
                k: v
                for k, v in base_entry.items()
                if k
                not in ("op", "files", "version", "committed_batch_ids",
                        "file_stats")
            }
            rewritten.update(
                {"op": "overwrite", "files": resolved, "version": base}
            )
            # fold the recorded stats of every surviving file into the
            # rewritten base (they were spread over the removed appends)
            folded_stats = {
                f: s
                for f, s in self._stats_at(base).items()
                if f in set(resolved)
            }
            if folded_stats:
                rewritten["file_stats"] = folded_stats
            folded = sorted(
                set(
                    removed_batch_ids
                    + base_entry.get("committed_batch_ids", [])
                )
            )
            if folded:
                rewritten["committed_batch_ids"] = folded
            with open(self._entry_path(base), "w") as f:
                json.dump(rewritten, f)
        for v in vs:
            if v not in keep:
                os.unlink(self._entry_path(v))
        for f in doomed:
            os.unlink(f)
        # sweep orphaned stage directories (never-committed writers)
        now = time.time()
        for d in os.listdir(self.data_dir):
            if not d.startswith("stage-"):
                continue
            sub = os.path.join(self.data_dir, d)
            try:
                if now - os.path.getmtime(sub) < orphan_age_seconds:
                    continue
                members = [
                    os.path.join(sub, f)
                    for f in os.listdir(sub)
                    if f.endswith(".parquet")
                ]
            except FileNotFoundError:
                continue
            if not any(m in live for m in members):
                shutil.rmtree(sub, ignore_errors=True)
                doomed.extend(m for m in members)
        return doomed
