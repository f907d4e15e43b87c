"""The bench's compact stdout line — the driver's per-round record — must
always parse and always keep queries{} (r13 and r19 both lost their
official BENCH artifact to oversized stdout)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

from bench import compact_stdout_line  # noqa: E402


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
    assert len(line) <= 4096


def test_shedding_drops_secondary_fields_never_queries():
    # enough queries that the line exceeds the limit even without prose
    doc = _doc(n_queries=300)
    line = compact_stdout_line(doc, limit=4096)
    parsed = json.loads(line)
    assert len(parsed["queries"]) == 300  # the record survives
    assert "box_calibration_sec" not in parsed  # shed first
    # with an impossible limit, everything sheddable goes but the line
    # still parses with queries intact
    tiny = json.loads(compact_stdout_line(doc, limit=1))
    assert len(tiny["queries"]) == 300
    assert "errors" not in tiny


def test_real_capture_is_under_the_window():
    # the committed r20 capture must produce a parseable sub-4KB line
    with open(_REPO / "BENCH_LOCAL.json") as fh:
        doc = json.load(fh)
    line = compact_stdout_line(doc)
    assert len(line) <= 4096
    assert json.loads(line)["queries"]
