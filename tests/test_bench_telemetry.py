"""bench.py load telemetry (r11 judge Next #1): per-lane loadavg +
CPU-busy fields and the movers quiet/loaded classification must land in
both artifacts so a load-inflated sweep self-clears without a judge-side
re-run."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_lane_telemetry_fields():
    import time

    b = bench._load_begin()
    time.sleep(0.2)  # a 0-jiffy /proc/stat delta would omit cpu_busy_pct
    e = bench._load_end(b)
    assert set(e) >= {"loadavg_1m_start", "loadavg_1m_end", "wall_sec", "ncpu"}
    assert e["ncpu"] > 0
    # /proc/stat is available on this platform, so busy% must be present
    assert "cpu_busy_pct" in e and 0.0 <= e["cpu_busy_pct"] <= 100.0


def test_stdout_payload_carries_load_and_movers_and_parses():
    lane = {"headline": bench._load_end(bench._load_begin())}
    movers = {
        "q_loaded": {
            "ratio_single_shot": 2.5, "ratio_median": 1.05,
            "load_1m_samples": [90.0, 85.0], "quiet": False,
            "moved_while_quiet": False,
        },
        "q_real": {
            "ratio_single_shot": 2.0, "ratio_median": 1.9,
            "load_1m_samples": [3.0, 2.0], "quiet": True,
            "moved_while_quiet": True,
        },
    }
    movers["q_faster"] = {
        "ratio_single_shot": 0.4, "ratio_median": 0.4,
        "load_1m_samples": [2.0], "quiet": True,
        "moved_while_quiet": True,
    }
    line = bench._stdout_payload(
        {"q1": 1.0, "q2": -1.0}, 1.0, 0.1, None, lane, movers
    )
    assert len(line) <= bench.MAX_LINE
    payload = json.loads(line)
    assert payload["load_ncpu"] == bench._ncpu()
    assert "headline" in payload["load"]
    assert len(payload["load"]["headline"]) == 3
    assert payload["movers_quiet_slower"] == 1
    assert payload["movers_quiet_faster"] == 1
    assert payload["movers_load_noise"] == 1
    assert payload["queries"]["q2"] == -1.0  # failures never dropped


def test_second_decade_bounds_are_sane():
    # every second-decade query documents a bound >= 1 (sublinear claims
    # would make the gate vacuous); triangle keeps its O(E^1.5) bound and
    # only the pair-verification query may claim the data-construction
    # quadratic (see SECOND_DECADE_BOUNDS comment)
    for name, bound in bench.SECOND_DECADE_BOUNDS.items():
        assert 1.0 <= bound <= 2.0, name
        if bound > 1.5:
            assert name == "dedup_lsh_recall_report", name
    assert bench.SECOND_DECADE_BOUNDS["triangle_count_oriented"] == 1.5
