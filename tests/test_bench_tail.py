"""The driver retains only the last 2,000 characters of bench stdout and
parses the final JSON line out of that window. Rounds 9/14/15/16 let the
tail line outgrow the window and the driver recorded ``parsed: null`` —
losing the per-query medians entirely. ``bench.fit_tail_line`` must keep
the line inside the window whatever the diagnostics grow to."""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import bench


def _essentials():
    # realistic r16-scale payload: 17 headline queries, 5 passes
    queries = {f"q{i:02d}_headline_query_name": 1.234 for i in range(17)}
    return {
        "metric": "headline_total",
        "value": 16.358,
        "unit": "sec",
        "queries": queries,
        "warm_total": 15.546,
        "pass_totals": [24.9, 17.0, 16.3, 15.3, 15.5],
        "contended": False,
        "sf": 0.1,
    }


def _diagnostics():
    stddev = {f"q{i:02d}_headline_query_name": 0.123 for i in range(17)}
    return [
        ("query_stddev", stddev),
        (
            "ingest_loop",
            {
                "1x": {"cycle_sec_total": 54.1, "docs_per_sec": 97.0},
                "10x": {"cycle_sec_total": 76.9, "docs_per_sec": 68.3},
                "cycle_ratio_10x": 1.42,
                "stream": {
                    "docs_in": 1750,
                    "total_sec": 82.7,
                    "docs_per_sec": 21.2,
                    "detector_sec": 41.8,
                    "ingest_sec": 40.9,
                },
            },
        ),
        ("bloom_gate", {f"gated_k{i}": 1.112 for i in range(9)}),
        ("q25_candidates", {f"prefilter_{i}": 17012 for i in range(5)}),
        ("scale10_ratio_minhash_uncached", {"sig": 1.1, "band": 1.2}),
        ("cc_rounds", {"1x_rounds": 2, "10x_rounds": 4}),
        ("pagerank", {"1x_sec": 2.75, "10x_sec": 3.9, "ratio": 1.42}),
        ("index_tier", {f"tier_k{i}": 40105 for i in range(6)}),
        ("q20_stages", {f"stage_{i}": 0.166 for i in range(7)}),
        ("idle_waited_sec", 10.0),
    ]


def test_realistic_payload_fits_and_keeps_top_priorities():
    out = bench.fit_tail_line(_essentials(), _diagnostics())
    line = json.dumps(out)
    assert len(line) <= bench.TAIL_LINE_BYTES
    # essentials intact, verbatim
    for k, v in _essentials().items():
        assert out[k] == v
    # the two highest-priority diagnostics must fit at this realistic size
    assert "query_stddev" in out
    assert "ingest_loop" in out
    # round-trips as one JSON line (what the driver does with the tail)
    assert json.loads(line)["queries"] == _essentials()["queries"]
    assert "\n" not in line


def test_oversized_diagnostic_is_skipped_not_truncated():
    huge = ("blob", "x" * 5000)
    diags = [huge, ("small", 1)]
    out = bench.fit_tail_line(_essentials(), diags)
    assert "blob" not in out
    # a later, smaller diagnostic still gets in after a skip
    assert out["small"] == 1
    assert len(json.dumps(out)) <= bench.TAIL_LINE_BYTES


def test_essentials_survive_even_when_nothing_else_fits():
    ess = _essentials()
    out = bench.fit_tail_line(ess, _diagnostics(), limit=10)
    assert out == ess


def test_priority_order_is_respected_under_pressure():
    ess = {"metric": "m", "value": 1, "unit": "sec", "queries": {}, "sf": 0.1}
    base = len(json.dumps(ess))
    diags = [("a", "x" * 50), ("b", "y" * 50), ("c", 1)]
    # room for exactly the first diagnostic (+ key overhead) and the tiny one
    out = bench.fit_tail_line(ess, diags, limit=base + 70)
    assert "a" in out and "b" not in out and "c" in out
