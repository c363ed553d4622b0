"""The docs/1-9 parity walkthrough must keep running end-to-end —
it's the executable face of the reference-doc surface."""

import pytest
import os
import subprocess
import sys


@pytest.mark.heavy
def test_walkthrough_runs_clean():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "walkthrough.py")],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    for marker in [
        "sort elision", "pushed filters", "join strategies: ['BroadcastHashJoin']",
        "HashAggregate stages: 2",
        "CBO join reorder moved the selective customer dim innermost: True",
        "count-min sketch: top-3 token estimates dominate exact: True",
        "time travel keeps old schema:",
    ]:
        assert marker in out, f"walkthrough output missing: {marker}"
