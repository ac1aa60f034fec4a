"""One-command production validation kit (VERDICT r4 #4).

Point this at ANY TPU part and it answers, in one process / one device
init (dead-tunnel protocol, CLAUDE.md): does the >500 FPS production
claim hold here, and if not, is the shortfall chip-state-consistent with
the committed scaling model (BASELINE.md "Scaling model (round-4
refit)") or is the model falsified?

Steps, ordered by evidentiary value so an early tunnel death still banks
the most important artifacts:

  1. chip-health probe       bench.chip_health(): the gather ns/row
                             microprobe is the part's state signal (the
                             renderer is gather-row bound; the MXU probe
                             is RTT-noisy and ignored for the verdict).
  2. parity smoke            scripts/tpu_smoke.py at the flagship
                             800x800 shape, BOTH assets x all 7
                             pipelines (+ swizzle variants), budget
                             0.5% mismatch vs the reference-semantics
                             oracle (round 3's worst 800^2 was 0.073%).
  3. official bench          bench.py --all (drift-aware JSON line).
  4. capacity + model check  scripts/stress_validate.py: the 80k-tri
                             out-of-sample predicted-vs-measured test.
  5. headline refit          per-stage profile of the headline config on
                             THIS part -> effective shade gather rate.

Verdict logic (printed as the final PROD-VALIDATE line, PASS/FAIL):

  * parity must pass on both assets — else FAIL (correctness first).
  * headline <= 2.0 ms  -> PASS: north star met on this part.
  * else, if the gather probe > 2.6 ns/row (the fitted break-even) and
    the capacity measurement agrees with the model within the cross-run
    drift floor -> PASS (conditional): the part, not the code, is the
    limiter — exactly what the model predicts for this chip class.  (If
    the capacity step banked no number at all — model_ok None — the
    conditional pass stands on the probe alone and says so.)
  * else -> FAIL: either the model is falsified (probe <= 2.6 ns/row
    yet the target is missed) or the capacity check disagrees with the
    fitted laws beyond drift.

Usage (on a TPU host; defaults are the production protocol):
    scripts/one_attempt.sh /tmp/prod_validate.log python scripts/prod_validate.py

CPU plumbing smoke (numbers meaningless, verdict forced to report-only):
    python scripts/prod_validate.py --size 128 --frames 4 --cpu
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_MS = 2.0        # north star: >500 FPS on diablo shadow 800x800
BREAK_EVEN_G = 2.6     # ns/row; BASELINE.md round-4 refit break-even
DRIFT_FLOOR = 0.20     # cross-run chip-state drift (BASELINE.md)
MODEL_ABS_FLOOR_MS = 0.05  # protocol noise floor for stage residuals


def _load(name):
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _step(name, argv, fn, capture=False):
    """scripts/_measure.step with this script's tag; capture=True returns
    the teed stdout text so JSON lines can be parsed."""
    from _measure import step

    rc, out = step(name, argv, fn, tag="prod-validate", capture=capture)
    return rc, (out if capture else None)


def _last_json_line(text):
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                continue
    return None


def verdict(parity_ok, headline_ms, g_probe, model_ok,
            target_ms=TARGET_MS, break_even=BREAK_EVEN_G):
    """Pure verdict logic (unit-tested in tests/test_prod_validate.py)."""
    if not parity_ok:
        return "FAIL", "parity smoke failed — fix correctness before perf"
    if headline_ms is None:
        return "FAIL", "no headline measurement banked (tunnel died?)"
    if headline_ms <= target_ms:
        return "PASS", (f"north star met: {headline_ms:.3f} ms <= "
                        f"{target_ms:.1f} ms (>500 FPS) on this part")
    if g_probe is not None and g_probe > break_even and model_ok is not False:
        # model_ok None = the capacity step banked no number this run
        # (e.g. the tunnel died mid-queue); say so rather than claiming a
        # model agreement that wasn't measured.
        basis = ("the capacity check matches the model" if model_ok
                 else "the capacity check banked no number this run "
                      "(see steps_rc; re-run stress_validate)")
        return "PASS (conditional)", (
            f"target missed ({headline_ms:.3f} ms) but this part's gather "
            f"rate {g_probe:.2f} ns/row is above the {break_even:.1f} "
            f"break-even and {basis} — the "
            f"part, not the code, is the limiter; re-run on a "
            f"production-bandwidth part")
    if g_probe is not None and g_probe <= break_even:
        return "FAIL", (
            f"MODEL FALSIFIED: gather rate {g_probe:.2f} ns/row is at or "
            f"below the {break_even:.1f} ns/row break-even yet the "
            f"headline is {headline_ms:.3f} ms > {target_ms:.1f} ms — "
            f"the scaling model's projection does not hold; re-fit")
    return "FAIL", (
        "capacity measurement disagrees with the fitted laws beyond the "
        "drift floor — re-fit the scaling model on this part before "
        "trusting any projection")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--budget", type=float, default=0.005)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform: plumbing smoke only "
                         "(perf numbers meaningless; verdict report-only)")
    ap.add_argument("--out", default=None,
                    help="append the summary JSON line to this file")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tiny_renderer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)
    print(f"backend: {jax.default_backend()}", flush=True)

    import bench

    tpu_smoke = _load("tpu_smoke.py")
    stress_validate = _load("stress_validate.py")

    # 1. Chip health.
    health = bench.chip_health()
    g_probe = health["gather_ns_per_row"]
    mxu = health["mxu_tflops"]
    print(f"# chip health: gather {g_probe:.2f} ns/row"
          + (f", MXU {mxu:.1f} Tflop/s (noisy; not used for the verdict)"
             if mxu is not None else ""), flush=True)

    # 2. Parity smoke, both assets, flagship shape.
    parity_rcs = {}
    for asset in ("diablo", "african_head"):
        parity_rcs[asset], _ = _step(
            f"parity {asset} {args.size}px",
            ["tpu_smoke.py", "--size", str(args.size),
             "--budget", str(args.budget),
             "--asset", f"/root/reference/assets/{asset}"],
            tpu_smoke.main,
        )
    parity_ok = all(rc == 0 for rc in parity_rcs.values())

    # 3. Official bench (drift-aware JSON line).  The burst-marginal
    # protocol is long-vs-8 bursts, so frames must exceed 8.
    frames = max(16, args.frames)
    bench_argv = ["bench.py", "--all", "--frames", str(frames)]
    if args.size != 800:
        bench_argv += ["--size", str(args.size)]
    if args.cpu:
        bench_argv += ["--backend", "jnp"]
    rc_bench, bench_out = _step("official bench", bench_argv, bench.main,
                                capture=True)
    payload = _last_json_line(bench_out or "")
    headline_ms = payload.get("value") if payload else None

    # 4. Capacity config + out-of-sample model check.
    stress_argv = ["stress_validate.py", "--size", str(args.size),
                   "--frames", str(max(16, args.frames // 2))]
    rc_stress, stress_out = _step("capacity + model check", stress_argv,
                                  stress_validate.main, capture=True)
    stress = _last_json_line(stress_out or "")
    model_ok, model_ratio = False, None
    if stress and rc_stress == 0:
        pred_total = sum(stress["predicted_ms"].values())
        meas_total = sum(stress["deltas_ms"].get(k, 0.0)
                         for k in ("vertex", "bin", "raster", "full"))
        if meas_total > 0:
            model_ratio = meas_total / pred_total
            tol = max(DRIFT_FLOOR * pred_total, MODEL_ABS_FLOOR_MS)
            model_ok = abs(meas_total - pred_total) <= tol
            print(f"# model check: predicted {pred_total:.3f} ms, measured "
                  f"{meas_total:.3f} ms (ratio {model_ratio:.2f}; "
                  f"{'within' if model_ok else 'OUTSIDE'} the "
                  f"{DRIFT_FLOOR:.0%} drift floor)", flush=True)

    # 5. Effective shade gather rate on THIS part's headline config —
    # the refit signal: if it drifts far from the probe, locality (not
    # raw chip state) changed and the model needs a re-fit here.
    g_eff = None
    if stress:
        shade_ms = stress["deltas_ms"].get("full")
        rows = stress["pred"]["shade_rows"]
        if shade_ms and rows:
            g_eff = shade_ms * 1e6 / rows
            print(f"# effective shade gather rate on this part: "
                  f"{g_eff:.2f} ns/row (probe {g_probe:.2f}; tuned-dev-chip "
                  f"fit was {stress_validate.G_NS_PER_ROW})", flush=True)

    v, why = verdict(parity_ok, headline_ms, g_probe,
                     model_ok if (stress and rc_stress == 0
                                  and model_ratio is not None) else None)
    if args.cpu:
        v = f"REPORT-ONLY [{v}]"
        why = "CPU plumbing smoke — perf numbers are not TPU numbers; " + why

    summary = {
        "kind": "prod_validate",
        "verdict": v,
        "why": why,
        "parity": {k: ("OK" if rc == 0 else "FAIL")
                   for k, rc in parity_rcs.items()},
        "headline_ms": headline_ms,
        "target_ms": TARGET_MS,
        "gather_ns_per_row": round(g_probe, 3) if g_probe is not None else None,
        "break_even_ns_per_row": BREAK_EVEN_G,
        "effective_g_ns_per_row": round(g_eff, 3) if g_eff else None,
        "model_ratio": round(model_ratio, 3) if model_ratio else None,
        "steps_rc": {"bench": rc_bench, "stress": rc_stress, **parity_rcs},
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
    }
    line = json.dumps(summary)
    print(f"PROD-VALIDATE {v}: {why}", flush=True)
    print(line, flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    sys.exit(0 if v.startswith("PASS") or args.cpu else 1)


if __name__ == "__main__":
    main()
