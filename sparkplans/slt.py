"""sqllogictest-style harness for the SQL surface.

The reference's own roadmap starts with "Write ``sqllogictest`` ..."
(``docs/9_what_next.md:3``) — this delivers that test format for the
Spark engine: plain-text ``.slt`` files of statements and queries with
expected results, runnable against an :class:`sparkplans.engine.Engine`
(so ``SET``, information_schema views, and registered tables all work).

Supported dialect (the classic sqllogictest core):

- ``statement ok`` — the following SQL (until a blank line) must
  execute without error.  DDL/DML side effects persist within a file.
- ``statement error`` — the SQL must raise.
- ``query <types> [nosort|rowsort|valuesort]`` — run the SQL, compare
  against the expected block after ``----``: ONE VALUE PER LINE in
  row-major order.  ``types`` is one letter per column: ``I`` integer,
  ``R`` real (formatted to 3 decimal places, the sqllogictest
  convention), ``T`` text.  ``nosort`` (default) compares in result
  order — use only with ORDER BY; ``rowsort`` sorts rows, ``valuesort``
  sorts the flattened value list.
- ``#`` comments and blank-line record separation.

NULL renders as ``NULL`` and the empty string as ``(empty)``, per the
original harness.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Record:
    kind: str                       # "statement" | "query"
    sql: str
    expect_error: bool = False
    types: str = ""
    sort: str = "nosort"
    expected: list[str] = field(default_factory=list)
    line: int = 0


def parse(text: str) -> list[Record]:
    records: list[Record] = []
    lines = text.splitlines()
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        header = line
        lineno = i + 1
        if header.startswith("statement"):
            expect_error = header.split()[1:] == ["error"]
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() != "":
                sql_lines.append(lines[i])
                i += 1
            records.append(
                Record(
                    kind="statement",
                    sql="\n".join(sql_lines),
                    expect_error=expect_error,
                    line=lineno,
                )
            )
        elif header.startswith("plan"):
            # `plan contains` record: run EXPLAIN on the SQL and assert
            # each expected line is a substring of the formatted
            # physical plan; a line prefixed `!` must be ABSENT.  The
            # reference's docs/5-6 walkthroughs are EXPLAIN transcripts,
            # and datafusion's own sqllogictest corpus asserts plans the
            # same way — this is the Spark-stable version (substrings,
            # not whole-plan goldens, which churn across versions).
            if header.split()[1:] != ["contains"]:
                raise ValueError(f"line {lineno}: expected 'plan contains'")
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            if i >= n:
                raise ValueError(f"line {lineno}: plan missing '----'")
            i += 1
            expected = []
            while i < n and lines[i].strip() != "":
                expected.append(lines[i].strip())
                i += 1
            records.append(
                Record(
                    kind="plan",
                    sql="\n".join(sql_lines),
                    expected=expected,
                    line=lineno,
                )
            )
        elif header.startswith("query"):
            parts = header.split()
            types = parts[1] if len(parts) > 1 else ""
            sort = parts[2] if len(parts) > 2 else "nosort"
            if not re.fullmatch(r"[IRT]+", types):
                raise ValueError(f"line {lineno}: bad type string {types!r}")
            if sort not in ("nosort", "rowsort", "valuesort"):
                raise ValueError(f"line {lineno}: bad sort mode {sort!r}")
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            if i >= n:
                raise ValueError(f"line {lineno}: query missing '----'")
            i += 1  # past ----
            expected = []
            while i < n and lines[i].strip() != "":
                expected.append(lines[i].strip())
                i += 1
            records.append(
                Record(
                    kind="query",
                    sql="\n".join(sql_lines),
                    types=types,
                    sort=sort,
                    expected=expected,
                    line=lineno,
                )
            )
        else:
            raise ValueError(f"line {lineno}: unknown record {header!r}")
    return records


def _format(val, t: str) -> str:
    if val is None:
        return "NULL"
    if t == "I":
        return str(int(val))
    if t == "R":
        return f"{float(val):.3f}"
    s = str(val)
    return s if s else "(empty)"


def run_text(engine, text: str, name: str = "<slt>") -> int:
    """Execute every record; raise AssertionError with file:line on the
    first mismatch.  Returns the number of records run."""
    records = parse(text)
    for rec in records:
        where = f"{name}:{rec.line}"
        if rec.kind == "statement":
            if rec.expect_error:
                try:
                    engine.sql(rec.sql).collect()
                except Exception:
                    continue
                raise AssertionError(
                    f"{where}: statement error expected, but it succeeded:\n"
                    f"{rec.sql}"
                )
            engine.sql(rec.sql).collect()
            continue
        if rec.kind == "plan":
            from sparkplans.plans import plan_text

            df = engine.sql(rec.sql)
            # match against formatted (numbered details: PushedFilters,
            # ReadSchema, codegen ids) AND simple (inline operator args:
            # `Exchange hashpartitioning(k#1, 4)`) — each mode carries
            # properties the other elides
            txt = plan_text(df, "formatted") + "\n" + plan_text(df, "simple")
            for want in rec.expected:
                if want.startswith("!"):
                    needle = want[1:].strip()
                    if needle in txt:
                        raise AssertionError(
                            f"{where}: plan must NOT contain {needle!r}\n"
                            f"query:\n{rec.sql}\nplan:\n{txt}"
                        )
                elif want not in txt:
                    raise AssertionError(
                        f"{where}: plan missing {want!r}\n"
                        f"query:\n{rec.sql}\nplan:\n{txt}"
                    )
            continue
        df = engine.sql(rec.sql)
        rows = df.collect()
        ncols = len(rec.types)
        got_rows = []
        for r in rows:
            vals = list(r)
            if len(vals) != ncols:
                raise AssertionError(
                    f"{where}: query returns {len(vals)} columns, type "
                    f"string {rec.types!r} declares {ncols}\n{rec.sql}"
                )
            got_rows.append(
                [_format(v, t) for v, t in zip(vals, rec.types)]
            )
        if rec.sort == "rowsort":
            got_rows.sort()
            flat = [v for row in got_rows for v in row]
        elif rec.sort == "valuesort":
            flat = sorted(v for row in got_rows for v in row)
        else:
            flat = [v for row in got_rows for v in row]
        want = rec.expected
        if rec.sort == "valuesort":
            want = sorted(want)
        if flat != want:
            raise AssertionError(
                f"{where}: result mismatch\nquery:\n{rec.sql}\n"
                f"expected ({len(want)} values): {want}\n"
                f"got      ({len(flat)} values): {flat}"
            )
    return len(records)


def run_file(engine, path: str) -> int:
    with open(path) as f:
        return run_text(engine, f.read(), name=path)
