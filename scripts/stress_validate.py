"""Out-of-sample test of the fitted scaling model on the capacity config
(VERDICT r4 #2).

The capacity config — diablo subdivided 2x = 80,352 triangles at 800x800
phong, 16x the reference's largest scene (scaling past the serial
triangle loop of /root/reference/src/scene.rs:212 is what the TPU
rebuild exists to demonstrate) — has CPU-tested correctness
(tests/test_stress_scene.py) but until round 5 no recorded hardware
number.  It is also the one free falsification test of the round-4
scaling refit (BASELINE.md "Scaling model (round-4 refit)"): the fitted
laws were trained on 2.5k-5k-triangle scenes, and the stress scene moves
every predictor out of sample at once — binning sort elements x16,
raster candidate term x(incidence growth), shade rows at a different
coverage/locality mix.

This script measures, in ONE process on hardware:

  1. the official burst-marginal ms/frame for the capacity config
     (the same protocol bench.py --stress uses), and
  2. per-stage cumulative-prefix deltas (pipelines.profile) plus the
     analytically-counted predictors (reusing scaling_model.predictors
     and .coverage_stats verbatim),

then prints a predicted-vs-measured table against the committed round-4
fitted coefficients.  One JSON line with everything is appended to
--out (default docs/scaling_r5_stress.jsonl) for the record.

Usage:
    scripts/one_attempt.sh /tmp/stress.log python scripts/stress_validate.py
"""

from __future__ import annotations

import dataclasses
import importlib.util
import json
import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

# Round-4 fitted coefficients (BASELINE.md "Scaling model (round-4 refit)"
# + the round-3 terms the r4 sweep could no longer resolve cleanly —
# binning shrank into the noise floor after the span flip, so its law
# stands on the r3 fit, which agreed cross-asset to 2%).
G_NS_PER_ROW = 8.99       # diablo-effective shade gather rate at tex_tile=16
G_FLOOR = 7.3             # microprobe rate = perfect-locality bound
BIN_NS_PER_ELEM = 1.82    # r3 fit: binning = 1.82 ns x sort elements
RAS_US_PER_STEP = 0.10    # r3 tile sweep: output-block DMA per grid step
RAS_PS_PER_CAND = 22.0    # r3 fit: per candidate-pixel evaluation
VERTEX_MS = 0.05          # r3 fit: fixed (pre-expanded geometry + LICM)


def _load_scaling_model():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling_model.py")
    spec = importlib.util.spec_from_file_location("scaling_model", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def predicted_ms(pred, g_ns=G_NS_PER_ROW):
    return {
        "vertex": VERTEX_MS,
        "binning": BIN_NS_PER_ELEM * pred["bin_sort_elems"] * 1e-6,
        "raster": (RAS_US_PER_STEP * pred["ras_steps"] * 1e-3
                   + RAS_PS_PER_CAND * pred["ras_cands"] * 1e-9),
        "shade": g_ns * pred["shade_rows"] * 1e-6,
    }


def main():
    import argparse

    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "scaling_r5_stress.jsonl"))
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--levels", type=int, default=2)
    ap.add_argument("--size", type=int, default=800,
                    help="reduce for CPU smoke runs of this script")
    args, _ = ap.parse_known_args()
    # The burst-marginal protocol measures a long burst AGAINST an
    # 8-frame one; fewer than 9 frames divides by zero in bench_config.
    args.frames = max(args.frames, 12)

    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)

    import bench
    from tiny_renderer_tpu import RenderConfig, Scene, load_model
    from tiny_renderer_tpu.assets.mesh_tools import subdivide_mesh
    from tiny_renderer_tpu.pipelines.profile import stage_breakdown

    sm = _load_scaling_model()

    health = bench.chip_health()
    print(f"# chip health: {health}", flush=True)

    # 1. Official capacity number — identical protocol to bench.py --stress.
    r = bench.bench_config(bench._find_assets(), "diablo", "phong",
                           orbit=True, frames=args.frames, backend="auto",
                           size=args.size, subdivide=args.levels)
    print(f"# capacity: {r['asset']} {r['pipeline']} "
          f"{r['ms_per_frame']:.3f} ms/frame ({r['fps']:.1f} FPS) "
          f"{r['mtri_per_s']:.1f} Mtri/s {r['mpix_per_s']:.0f} Mpix/s",
          flush=True)

    # 2. Stage decomposition + predictors on the same scene.
    model = load_model(os.path.join(bench._find_assets(), "diablo"),
                       verbose=False)
    model = dataclasses.replace(
        model, mesh=subdivide_mesh(model.mesh, levels=args.levels))
    scene = Scene(model, "phong",
                  RenderConfig(width=args.size, height=args.size),
                  backend="auto")
    cfg = scene.config  # tuned defaults as resolved by Scene
    T = model.num_triangles
    inc, cov = sm.coverage_stats(scene)
    deltas, _ = stage_breakdown(scene, iters=24)
    pred = sm.predictors(cfg, T, inc, cov, pipeline="phong")

    exp = predicted_ms(pred)
    print(f"# T={T} incidences/pass={inc} covered_strips={cov} "
          f"shade_rows={pred['shade_rows']} "
          f"sort_elems={pred['bin_sort_elems']}", flush=True)
    print("# stage      predicted    measured   (fitted laws, round-4 "
          "coefficients; shade also shown at the 7.3 ns/row locality floor)",
          flush=True)
    # profile.STAGES names the cumulative prefixes vertex/bin/raster/full;
    # "full" minus the raster prefix is the shade(+rest) delta BASELINE's
    # tables report.
    meas_by = {"vertex": deltas.get("vertex"), "binning": deltas.get("bin"),
               "raster": deltas.get("raster"), "shade": deltas.get("full")}
    for stage in ("vertex", "binning", "raster", "shade"):
        meas = meas_by[stage] if meas_by[stage] is not None else float("nan")
        extra = ""
        if stage == "shade":
            extra = (f"   [floor g={G_FLOOR}: "
                     f"{predicted_ms(pred, G_FLOOR)['shade']:.3f}]")
        print(f"#   {stage:8s} {exp[stage]:8.3f}    {meas:8.3f}{extra}",
              flush=True)
    tot_pred = sum(exp.values())
    tot_meas = sum(v for v in meas_by.values() if v is not None)
    print(f"#   {'total':8s} {tot_pred:8.3f}    {tot_meas:8.3f}  "
          f"(official burst: {r['ms_per_frame']:.3f})", flush=True)

    rec = {
        "kind": "stress_oos", "asset": f"diablo_x{4 ** args.levels}",
        "pipeline": "phong", "size": args.size, "T": T,
        "ms_per_frame": round(r["ms_per_frame"], 4),
        "mtri_per_s": round(r["mtri_per_s"], 2),
        "chip_gather_ns_per_row": round(health["gather_ns_per_row"], 2),
        "deltas_ms": {k: round(v, 4) for k, v in deltas.items()},
        "predicted_ms": {k: round(v, 4) for k, v in exp.items()},
        "pred": pred,
    }
    line = json.dumps(rec)
    print(line, flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    print("PROBE-DONE", flush=True)


if __name__ == "__main__":
    main()
