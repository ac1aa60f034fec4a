"""Bench harness self-checks (CPU): the chip-health probe must produce
sane, finite numbers — it annotates every recorded benchmark, and a silent
regression here would poison the perf record (BASELINE.md)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def test_chip_health_probe_sane():
    import bench

    h = bench.chip_health()
    gather = h["gather_ns_per_row"]
    assert 0.01 < gather < 1e5  # positive, finite, plausible on any backend
    mxu = h["mxu_tflops"]
    # Either a plausible throughput or explicitly flagged unreliable (None)
    # when jitter swamps the marginal — never an absurd number.
    assert mxu is None or 0.05 <= mxu <= 400.0


def test_bench_headline_json_keys():
    """The driver parses the single stdout JSON line; its keys are a
    contract."""
    import json

    import bench

    # Reconstruct the JSON payload exactly as main() builds it.
    headline = {"ms_per_frame": 5.0}
    health = {"mxu_tflops": None, "gather_ns_per_row": 7.3}
    payload = {
        "metric": "ms/frame diablo 800x800 phong+shadow",
        "value": round(headline["ms_per_frame"], 4),
        "unit": "ms",
        "vs_baseline": round(bench.TARGET_MS / headline["ms_per_frame"], 4),
        "chip_mxu_tflops": (
            round(health["mxu_tflops"], 1)
            if health["mxu_tflops"] is not None
            else None
        ),
        "chip_gather_ns_per_row": round(health["gather_ns_per_row"], 1),
    }
    s = json.dumps(payload)
    back = json.loads(s)
    assert back["value"] == 5.0 and back["vs_baseline"] == 0.4
    assert back["chip_mxu_tflops"] is None
