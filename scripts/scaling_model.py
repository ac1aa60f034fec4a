"""Per-stage traffic/scaling measurements for the bandwidth model (VERDICT r2 #2).

For a matrix of configs that vary HBM traffic independently (resolution,
strip length, asset/triangle count), measure the per-stage device times
(pipelines.profile cumulative-prefix marginals) and emit, per config, one
JSON line with the measured stage deltas plus analytically-counted
predictors (HBM bytes, gather rows, incidences, sort elements).  The fit
(least squares over all configs; see BASELINE.md "Scaling model") maps
stage time ~ beta_bytes * bytes + beta_rows * rows + compute terms, and
the production-v5e projection divides the bandwidth terms by the
bandwidth ratio.

Usage: scripts/tpu_retry.sh /tmp/scaling.log x python scripts/scaling_model.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _row_bands(config, T):
    """Mirror frame._auto_row_bands (shape-static band count)."""
    from tiny_renderer_tpu.pipelines.frame import _auto_row_bands

    return _auto_row_bands({"a1": np.zeros((T,), np.float32)}, config)


def predictors(config, T, inc, cov_strips, pipeline="shadow"):
    """Analytic per-stage traffic counts for the compact (strip-shade)
    pallas path at the round-3 configuration (pre-expanded geometry,
    csr_indirect on, strip_mask off, burst needs_z=False)."""
    from tiny_renderer_tpu.ops.binning import incidence_cap, record_lanes

    Hp, Wp = config.padded_height, config.padded_width
    H, W = config.height, config.width
    SL = config.strip_len
    cap = incidence_cap(T, config)
    lanes = record_lanes(())
    passes = 2 if pipeline in ("shadow", "occlusion") else 1
    HW = H * W

    n_gathers = {"shadow": 3, "occlusion": 1, "phong": 2, "default": 2}[pipeline]
    frag_rows = cov_strips * SL

    # Grid-step count (output-block DMA granularity showed up as the
    # dominant raster scaling term in the tile sweep).
    steps = config.tiles_y * config.tiles_x * passes

    return {
        # vertex: pure compute over (T,) arrays; no HBM term worth modeling.
        "vertex_T": T * passes,
        # binning per frame: (span_y*span_x)T-key sort (multi-pass; count
        # raw elements — 32/T/pass at the 8x4 class default, 8 at the
        # round-4 tuned 4x2), records (T, lanes) write, csr_tris write.
        # Capacity-scale scenes bin once PER ROW BAND (frame._auto_row_bands).
        "bin_sort_elems": (config.max_span_y * config.max_span_x * T * passes
                           * _row_bands(config, T)),
        "bin_bytes": (T * lanes * 4 + cap * 4) * passes,
        # raster: records+tris DMA, target writes (pass1 z, pass2 idx),
        # grid steps, candidate evaluations.
        "ras_bytes": (
            (T * lanes * 4 + cap * 4) * passes  # VMEM DMA of records+ids
            + Hp * Wp * 4              # pass-1 shadow z target
            + Hp * Wp * 4              # pass-2 idx target
        ),
        "ras_steps": steps,
        "ras_cands": inc * config.tile_h * config.tile_w,
        # shade: per-fragment gather rows (attrs + texture word + shadow
        # fetch for shadow), full idx coverage read, covered-strip idx
        # gathers + word scatter, acc init/read + frame write + checksum.
        "shade_rows": frag_rows * n_gathers + cov_strips * 2,  # idx rows + scatter rows
        "shade_bytes": (
            HW * 4                     # idx plane coverage read
            + HW * 4 * 2               # acc words: zeros init + unpack read
            + HW * 3 * 2               # u8 frame write + checksum read
        ),
        "frag_rows": frag_rows,
        "cov_strips": cov_strips,
        "incidences": inc,
    }


def coverage_stats(scene):
    """(incidences per camera pass, covered strips) measured on device."""
    import jax.numpy as jnp

    from tiny_renderer_tpu.ops import mathlib as ml
    from tiny_renderer_tpu.ops.vertex import triangle_setup

    cfg = scene.config
    out = scene.render()
    idx_like = out["z"] if out.get("z") is not None else None
    z = np.asarray(idx_like) if idx_like is not None else None
    SL = cfg.strip_len
    HW = cfg.height * cfg.width
    cov = int(
        np.any((z > ml.F32_MIN).reshape(-1)[: HW - HW % SL].reshape(-1, SL), axis=1).sum()
    )

    light = jnp.asarray(scene._light_direction)
    u = ml.default_prepare(
        cfg, np.asarray(scene._light_direction), np.asarray(scene._look_from),
        np.asarray(scene._look_at), np.asarray(scene._up), np,
    )
    geom = {k: np.asarray(v) for k, v in scene._geom.items()}
    s = triangle_setup(geom, u, cfg, needs=(), xp=np)
    th, tw = cfg.tile_h, cfg.tile_w
    sy = np.minimum(s["y1"] // th - s["y0"] // th + 1, cfg.max_span_y)
    sx = np.minimum(s["x1"] // tw - s["x0"] // tw + 1, cfg.max_span_x)
    inc = int(np.sum(np.where(s["valid"], sy * sx, 0)))
    return inc, cov


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from tiny_renderer_tpu import RenderConfig, Scene, load_model
    from tiny_renderer_tpu.pipelines.profile import stage_breakdown

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=None,
        help="also append each config's JSON line to this file (e.g. "
             "docs/scaling_r4_data.jsonl for scripts/scaling_fit.py)",
    )
    args, _ = ap.parse_known_args()

    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)

    import bench

    h = bench.chip_health()
    print(f"# chip health: {h}", flush=True)

    matrix = [
        ("diablo", 400, 16),
        ("diablo", 800, 16),
        ("diablo", 1200, 16),
        ("diablo", 800, 64),
        ("african_head", 800, 16),
    ]
    models = {}
    for asset, size, sl in matrix:
        if asset not in models:
            models[asset] = load_model(
                f"/root/reference/assets/{asset}", verbose=False
            )
        cfg = RenderConfig(width=size, height=size, strip_len=sl,
                           strip_batch=512 * 16 // sl)
        scene = Scene(models[asset], "shadow", cfg, backend="pallas")
        # Scene resolves per-pipeline/resolution tuned defaults (round 4:
        # tex_tile=16, span 4x2/5x3) — predictors must count the config
        # the render actually ran with.
        cfg = scene.config
        inc, cov = coverage_stats(scene)
        deltas, cumulative = stage_breakdown(scene, iters=24)
        T = models[asset].num_triangles
        rec = {
            "asset": asset, "size": size, "strip_len": sl, "T": T,
            "deltas_ms": {k: round(v, 4) for k, v in deltas.items()},
            "pred": predictors(cfg, T, inc, cov),
        }
        line = json.dumps(rec)
        print(line, flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")
    print("PROBE-DONE", flush=True)


if __name__ == "__main__":
    main()
