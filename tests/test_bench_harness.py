"""Bench harness self-checks (CPU): the chip-health probe must produce
sane, finite numbers — it annotates every recorded benchmark, and a silent
regression here would poison the perf record (BASELINE.md)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


@pytest.mark.slow  # runs the real burst-marginal probe loops (~25 s CPU)
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

    # The exact payload builder main() prints.
    headline = {"ms_per_frame": 5.0}
    health = {"mxu_tflops": None, "gather_ns_per_row": 7.3}
    back = json.loads(json.dumps(bench.headline_payload(headline, health)))
    assert back["value"] == 5.0 and back["vs_baseline"] == 0.4
    assert back["chip_mxu_tflops"] is None
    # Self-interpreting health verdict: gather-probe-derived, with the
    # MXU-noise caveat inline so a recorded JSON needs no BASELINE.md
    # exegesis (VERDICT r3 weak #3 / next #6).
    assert back["chip_health"] == "healthy"
    assert "noisy-by-design" in back["probe_note"]
    degraded = bench.headline_payload(
        {"ms_per_frame": 137.0}, {"mxu_tflops": 169.0, "gather_ns_per_row": 250.0}
    )
    assert degraded["chip_health"] == "degraded"
    assert degraded["chip_mxu_tflops"] == 169.0
    knobbed = bench.headline_payload(headline, health, ["tex_tile=16"])
    assert knobbed["knobs"] == ["tex_tile=16"]


def _load_script(name):
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), "..", "scripts", name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_variant_knobs_mirror_sweep_plan():
    """knob_sweep.VARIANT_KNOBS must reproduce the sweep plan's configs
    exactly — flipped-config confirmation benches run with --knob
    overrides, not the sweep's RenderConfig objects, so a drift between
    the table and the plan would bench a config the sweep never measured.
    Also pins the plan invariants the harness relies on: the label's
    first token is the pipeline name, every variant pins auto_tune off
    (raw-vs-raw deltas), and each (pipeline, asset) group's FIRST entry
    is its parity-golden anchor."""
    from tiny_renderer_tpu import RenderConfig
    from tiny_renderer_tpu.app import apply_knobs
    from tiny_renderer_tpu.pipelines.frame import PIPELINES

    ks = _load_script("knob_sweep.py")
    plan = [(name.strip(), cfg, pipe, asset)
            for name, cfg, pipe, _, asset in ks.build_plan(RenderConfig)]
    assert {n for n, _, _, _ in plan} == set(ks.VARIANT_KNOBS)
    for name, cfg, pipe, asset in plan:
        assert apply_knobs(RenderConfig(), ks.VARIANT_KNOBS[name]) == cfg, name
        assert name.split()[0] == pipe and pipe in PIPELINES, name
        assert cfg.auto_tune is False, name
        assert asset in ("diablo", "african_head"), name


def test_watchdog_failure_payload_carries_last_good(tmp_path):
    """A dead-tunnel bench failure must still surface the last certified
    official measurement (bench caches it after every clean run)."""
    import json

    import bench

    # No cache file: a plain failure payload with value None.
    missing = bench.watchdog_failure_payload(str(tmp_path / "absent.json"))
    assert missing["value"] is None and "last_good" not in missing
    assert "watchdog" in missing["error"]

    good = {"metric": "ms/frame diablo 800x800 phong+shadow",
            "value": 4.91, "vs_baseline": 0.4073}
    p = tmp_path / "last_good.json"
    p.write_text(json.dumps(good))
    payload = bench.watchdog_failure_payload(str(p))
    assert payload["value"] is None
    assert payload["last_good"]["value"] == 4.91
    # Corrupt cache: degrade to the plain failure payload, never raise.
    p.write_text("{not json")
    assert "last_good" not in bench.watchdog_failure_payload(str(p))


def test_drift_flagging_vs_last_good():
    """Official-run drift flagging (VERDICT r4 #7): any config whose ms
    moved more than the ±20% cross-run chip-state floor vs the cached
    last-good run must surface in the JSON payload; smaller moves and
    unknown configs must not."""
    import bench

    last_good = {"configs": {"diablo:shadow": 4.35, "diablo:occlusion": 22.1,
                             "african_head:default": 3.54}}
    measured = {
        "diablo:shadow": 4.60,        # +5.7% — inside the floor
        "diablo:occlusion": 27.0,     # +22.2% — flagged
        "diablo_x16:phong": 9.99,     # no last-good entry — ignored
    }
    drift = bench.drift_vs_last_good(measured, last_good)
    assert set(drift) == {"diablo:occlusion"}
    rec = drift["diablo:occlusion"]
    assert rec["ms"] == 27.0 and rec["last_good_ms"] == 22.1
    assert rec["delta_pct"] == 22.2
    # Degenerate inputs: no cache / cache without per-config records.
    assert bench.drift_vs_last_good(measured, None) == {}
    assert bench.drift_vs_last_good(measured, {"value": 4.35}) == {}
    # Drift is two-sided: a too-fast reading is as suspect as a too-slow one.
    fast = bench.drift_vs_last_good({"diablo:shadow": 3.0}, last_good)
    assert fast["diablo:shadow"]["delta_pct"] == -31.0


def test_bench_rejects_bad_knob_before_device_init(monkeypatch, capsys):
    """--knob typos must fail during argument validation, before any
    device op can burn a live tunnel window."""
    import pytest

    import bench

    monkeypatch.setattr(sys, "argv", ["bench.py", "--knob", "tex_tle=16"])
    # _find_assets and the jax import come AFTER validation; a bad knob
    # must raise first (ValueError from apply_knobs).
    with pytest.raises(ValueError, match="tex_tle"):
        bench.main()
