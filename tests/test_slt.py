"""sqllogictest harness + corpus (reference docs/9_what_next.md:3 —
"Write sqllogictest" — delivered).  Every .slt file under tests/slt/
must run green against the Engine's SQL surface; parser unit tests pin
the dialect."""

import glob
import os

import pytest

from sparkplans import slt
from sparkplans.engine import Engine

SLT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "slt")


def _files():
    return sorted(glob.glob(os.path.join(SLT_DIR, "*.slt")))


def test_corpus_nonempty():
    assert len(_files()) >= 2


@pytest.mark.parametrize(
    "path", _files(), ids=[os.path.basename(p) for p in _files()]
)
def test_slt_file(spark, path):
    n = slt.run_file(Engine(spark=spark), path)
    assert n > 0


def test_parser_roundtrip():
    recs = slt.parse(
        "# c\nstatement ok\nSELECT 1\n\n"
        "query IT rowsort\nSELECT 1, 'a'\n----\n1\na\n"
    )
    assert [r.kind for r in recs] == ["statement", "query"]
    assert recs[1].types == "IT" and recs[1].sort == "rowsort"
    assert recs[1].expected == ["1", "a"]


def test_parser_rejects_bad_types():
    with pytest.raises(ValueError):
        slt.parse("query IQ\nSELECT 1\n----\n1\n")


def test_mismatch_reports_location(spark):
    text = "query I nosort\nSELECT 2\n----\n3\n"
    with pytest.raises(AssertionError, match="<slt>:1"):
        slt.run_text(Engine(spark=spark), text)


def test_statement_error_must_fail(spark):
    text = "statement error\nSELECT 1\n"
    with pytest.raises(AssertionError, match="expected"):
        slt.run_text(Engine(spark=spark), text)
