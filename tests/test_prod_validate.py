"""Verdict logic of the one-command production validation kit
(scripts/prod_validate.py, VERDICT r4 #4).

The kit's device-touching steps (parity smoke, bench, stress) are each
already suite-covered through their own modules; what needs pinning here
is the PASS/FAIL decision table the production claim rests on, and that
the script wires together as a real subprocess (slow, CPU platform).
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "prod_validate.py")


def _load():
    spec = importlib.util.spec_from_file_location("prod_validate", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def pv():
    return _load()


def test_parity_failure_always_fails(pv):
    v, why = pv.verdict(False, 1.5, 1.0, True)
    assert v == "FAIL" and "parity" in why


def test_north_star_met_passes(pv):
    v, why = pv.verdict(True, 1.9, 2.0, True)
    assert v == "PASS" and "north star met" in why


def test_target_met_even_if_model_check_failed(pv):
    # A met target is a met target; the model check gates only the
    # conditional pass.
    v, _ = pv.verdict(True, 1.9, 9.0, False)
    assert v == "PASS"


def test_above_break_even_conditional_pass(pv):
    v, why = pv.verdict(True, 4.3, 7.3, True)
    assert v == "PASS (conditional)" and "part, not the code" in why


def test_below_break_even_falsifies_model(pv):
    v, why = pv.verdict(True, 4.3, 2.5, True)
    assert v == "FAIL" and "MODEL FALSIFIED" in why


def test_break_even_boundary_is_falsifying(pv):
    v, why = pv.verdict(True, 2.1, 2.6, True)
    assert v == "FAIL" and "MODEL FALSIFIED" in why


def test_above_break_even_no_capacity_number_is_honest(pv):
    # model_ok None = the stress step banked nothing (e.g. it crashed);
    # the conditional pass must say so, not claim a model agreement.
    v, why = pv.verdict(True, 4.3, 7.3, None)
    assert v == "PASS (conditional)" and "banked no number" in why


def test_above_break_even_but_model_mismatch_fails(pv):
    v, why = pv.verdict(True, 4.3, 7.3, False)
    assert v == "FAIL" and "re-fit" in why


def test_no_headline_fails(pv):
    v, why = pv.verdict(True, None, 7.3, True)
    assert v == "FAIL" and "headline" in why


def test_last_json_line_parses_tail_json(pv):
    text = "# noise\n{broken\n" + json.dumps({"a": 1}) + "\ntrailing"
    assert pv._last_json_line(text) == {"a": 1}
    assert pv._last_json_line("no json here") is None


@pytest.mark.slow
def test_prod_validate_cpu_plumbing(tmp_path):
    """The whole kit end-to-end on the CPU platform: every step runs, the
    summary JSON line appears, and the verdict is report-only."""
    out = str(tmp_path / "pv.jsonl")
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--cpu", "--size", "64", "--frames", "2",
         "--out", out],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=os.path.dirname(SCRIPT),
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "PROD-VALIDATE REPORT-ONLY" in proc.stdout
    with open(out) as f:
        rec = json.loads(f.read().strip())
    assert rec["kind"] == "prod_validate"
    assert rec["parity"] == {"diablo": "OK", "african_head": "OK"}
    assert rec["headline_ms"] is not None
    assert set(rec["steps_rc"]) == {"bench", "stress", "diablo",
                                    "african_head"}
