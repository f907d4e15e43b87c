"""The bench's compact stdout line — the driver's per-round record — must
always parse and always keep queries{} (r13, r19 AND r20 lost their
official BENCH artifact to oversized stdout; r20 proved the driver's
capture window is 2000 chars, so the guard constant is 1900)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

from bench import STDOUT_WINDOW, compact_stdout_line  # noqa: E402


def test_window_matches_observed_driver_capture():
    # BENCH_r20.json.tail was exactly 2000 chars and started mid-object:
    # the driver's real window is 2000, so the guard must stay below it.
    assert STDOUT_WINDOW <= 1900


def _doc(n_queries=60):
    return {
        "metric": "headline_query_wall_seconds",
        "value": 42.0,
        "unit": "sec",
        "queries": {f"query_name_{i:03d}": 0.123 for i in range(n_queries)},
        "sf": 0.1,
        "trials": 3,
        "errors": {},
        "comparable_r4_subtotal_sec": 10.0,
        "comparable_r8_subtotal_sec": 16.0,
        "box_calibration_sec": 0.3,
        "box_python_calibration_sec": 0.5,
        "calibration_protocol": "x" * 700,
        "capture_order": [f"query_name_{i:03d}" for i in range(n_queries)],
        "timing": "y" * 300,
        "notes": {"a": "z" * 2000},
    }


def test_prose_and_derivable_fields_never_ship():
    line = compact_stdout_line(_doc())
    parsed = json.loads(line)
    for k in ("notes", "timing", "calibration_protocol", "capture_order"):
        assert k not in parsed
    assert len(parsed["queries"]) == 60
    assert len(line) <= STDOUT_WINDOW


def test_query_times_rounded_to_two_decimals():
    parsed = json.loads(compact_stdout_line(_doc()))
    assert all(v == 0.12 for v in parsed["queries"].values())


def test_shedding_drops_secondary_fields_never_queries():
    # enough queries that the line exceeds the limit even without prose
    doc = _doc(n_queries=300)
    line = compact_stdout_line(doc, limit=STDOUT_WINDOW)
    parsed = json.loads(line)
    assert len(parsed["queries"]) == 300  # the record survives
    assert "box_calibration_sec" not in parsed  # shed early
    assert "comparable_r8_subtotal_sec" not in parsed  # shed first
    # with an impossible limit, everything sheddable goes but the line
    # still parses with queries intact
    tiny = json.loads(compact_stdout_line(doc, limit=1))
    assert len(tiny["queries"]) == 300
    assert "errors" not in tiny


def test_real_capture_is_under_the_window():
    # the committed capture must produce a parseable line under the
    # driver's OBSERVED 2000-char window, not merely under 4 KB
    with open(_REPO / "BENCH_LOCAL.json") as fh:
        doc = json.load(fh)
    line = compact_stdout_line(doc)
    assert len(line) <= STDOUT_WINDOW
    assert json.loads(line)["queries"]
