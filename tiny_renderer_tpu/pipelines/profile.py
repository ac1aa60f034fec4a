"""Per-stage device-time breakdown (SURVEY.md §5.1's tracing plan).

The reference has no per-stage instrumentation (only the FPS print,
src/app.rs:230-242); a TPU renderer needs one because the whole frame is a
single fused XLA program — wall-clock alone can't attribute time.  This
module compiles CUMULATIVE PREFIXES of render_frame (vertex | +binning |
+raster | full) and reports the deltas as stage costs, with the
device->host frame fetch timed separately.

Measurement protocol (dev-TPU quirks, CLAUDE.md): each prefix runs K
times inside ONE lax.scan dispatch over jittered camera/light angles (the
runtime dedupes bit-identical executions; per-dispatch tunnel latency is
~31 ms and would otherwise swamp every stage), the reported number is the
marginal between two scan lengths, and completion is a tiny host fetch of
a checksum (block_until_ready is unreliable over the tunnel).

Caveat recorded with the numbers: XLA fuses each prefix independently, so
deltas are attribution estimates, not exact schedules — good to the ~10%
level that perf decisions here need.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mathlib as ml
from ..ops.vertex import triangle_setup
from ..utils.timing import StageTimer
from .frame import (
    PIPELINES,
    _band_plan,
    _fused_raster,
    _planes_spec,
    _rasterize,
    _strip_mask_len,
    _use_fused_raster,
    render_frame,
)
from .shaders import kernel_varying_spec, VARYING_SPECS


def _checksum(*arrays):
    s = jnp.float32(0.0)
    for a in arrays:
        s += jnp.sum(a.astype(jnp.float32))
    return s


def _prefix_fn(pipeline, config, backend, stage):
    """A jittable function running render_frame up to `stage`
    ("vertex" | "bin" | "raster" | "full"), returning a tiny checksum.
    Mirrors render_frame's structure (frame.py:191-264)."""
    spec = PIPELINES[pipeline]

    def fn(geom, textures, light_direction, look_from, look_at, up):
        if stage == "full":
            # Burst posture (needs_z=False): the program being attributed
            # is the headline path, incl. the fused two-pass raster.
            out = render_frame(
                geom, textures, light_direction, look_from, look_at, up,
                pipeline=pipeline, config=config, backend=backend,
                needs_z=False,
            )
            return _checksum(out["frame"])

        setups = []
        if spec.two_pass:
            u1 = ml.shadow_pass_1_prepare(config, light_direction, look_at, up, jnp)
            setups.append(
                (triangle_setup(geom, u1, config, matrix_key="shadow_matrix",
                                cull=False, needs=(), xp=jnp), ())
            )
            uniforms = ml.shadow_pass_2_prepare(
                config, light_direction, look_from, look_at, up, jnp
            )
        else:
            uniforms = ml.default_prepare(
                config, light_direction, look_from, look_at, up, jnp
            )
        # Mirror render_frame's spec selection exactly: the strip-compacted
        # shade (default on kernel backends) bins/rasterizes with NO
        # varying lanes (the strip_planes kspec when that knob is on) —
        # profiling the full varying-plane spec here would inflate the
        # bin/raster prefixes and understate the shade delta.
        compact = backend != "jnp" and config.compact_shade
        pspec = _planes_spec(pipeline, textures, config, backend) if compact else None
        if compact:
            kspec = pspec or ()
        elif backend != "jnp":
            kspec = kernel_varying_spec(pipeline, textures)
        else:
            kspec = VARYING_SPECS[pipeline]
        setups.append(
            (triangle_setup(geom, uniforms, config, needs=spec.needs, xp=jnp), kspec)
        )

        if stage == "vertex":
            return _checksum(*[s["rx"] for s, _ in setups])

        if stage == "bin":
            if backend == "jnp":  # no binning stage on the dense path
                return _checksum(*[s["rx"] for s, _ in setups])
            from ..ops.binning import bin_triangles

            outs = []
            for s, sp in setups:
                # Mirror the (possibly row-banded) binning work the raster
                # path actually performs (frame._band_plan) so the bin
                # prefix's cost attribution matches the rendered frame.
                for t0, _, cfg_b in _band_plan(s, config):
                    records, tris, starts, _ = bin_triangles(
                        s, cfg_b, sp, row_tile_offset=t0)
                    outs += [records[:, 0], starts]
                    if tris is not None:
                        outs.append(tris)
            return _checksum(*outs)

        # stage == "raster": run both passes' rasters, skip shading.
        # Match the headline path's emit flags: fused two-pass kernel when
        # the headline uses it (shared gate — _use_fused_raster, so the
        # attributed program cannot drift from render_frame's under
        # idx_int16/strip_planes configs); otherwise shadow pass z-only,
        # camera pass idx-only.
        s2 = setups[-1][0]
        if _use_fused_raster(spec, config, backend, s2, pspec, needs_z=False):
            shadow_z, idx, _, _ = _fused_raster(
                setups[0][0], s2, config, backend
            )
            return _checksum(shadow_z, idx)
        outs = []
        for i, (s, sp) in enumerate(setups):
            shadow_pass = spec.two_pass and i == 0
            z, idx, varys, strips, _ = _rasterize(
                s, config, backend, spec=sp,
                emit_idx=not shadow_pass,
                emit_z=shadow_pass or not compact,
                emit_strips=(
                    _strip_mask_len(config)
                    if compact and not shadow_pass else 0
                ),
            )
            outs.append(z if z is not None else idx)
            if varys is not None:
                outs.append(varys[0])
            if strips is not None:
                outs.append(strips)
        return _checksum(*outs)

    return jax.jit(fn)


STAGES = ("vertex", "bin", "raster", "full")
STAGE_LABELS = {
    "vertex": "vertex setup",
    "bin": "+ binning",
    "raster": "+ raster",
    "full": "+ shade (full frame)",
}


def _scan_prefix_fn(pipeline, config, backend, stage):
    """jit((geom, textures, cams, ligs) -> checksum) running the prefix
    once per (camera, light) angle pair inside one dispatch."""
    prefix = _prefix_fn(pipeline, config, backend, stage)
    look_at = jnp.zeros((3,), jnp.float32)
    up = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)

    @jax.jit
    def run(geom, textures, cams, ligs):
        def body(acc, ab):
            ca, la = ab
            light = jnp.stack([jnp.sin(la), jnp.float32(0.0), jnp.cos(la)])
            look_from = jnp.stack([jnp.sin(ca), jnp.float32(0.0), jnp.cos(ca)])
            return acc + prefix(geom, textures, light, look_from, look_at, up), 0

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), (cams, ligs))
        return acc

    return run


def stage_breakdown(scene, iters: int = 12):
    """Measure per-stage device ms for a Scene's pipeline/config/backend.

    Returns (deltas, cumulative): dicts of stage -> ms.  deltas attribute
    each stage's marginal cost; 'fetch' is the frame device->host transfer.
    `iters` is the long scan length (short is iters//3; marginal between
    the two cancels dispatch latency).
    """
    geom, textures = scene._geom, scene._textures
    backend = scene._frame_fn.keywords["backend"]
    pipeline = scene._frame_fn.keywords["pipeline"]
    config = scene.config

    k_small = max(2, iters // 3)
    iters = max(iters, k_small + 2)
    rng = np.random.default_rng()
    base = float(rng.uniform(0.3, 0.4))

    def angles(k, eps):
        ca = (base + eps + 1e-4 * np.arange(k)).astype(np.float32)
        la = (-0.6 + eps + 1e-4 * np.arange(k)).astype(np.float32)
        return jnp.asarray(ca), jnp.asarray(la)

    timer = StageTimer()
    cumulative = {}
    for s_i, stage in enumerate(STAGES):
        fn = _scan_prefix_fn(pipeline, config, backend, stage)

        def run(k, eps):
            cams, ligs = angles(k, eps)
            np.asarray(fn(geom, textures, cams, ligs))  # fetch barrier

        run(k_small, 0.0)  # compile + warm both lengths
        run(iters, 1e-3)
        with timer.stage(stage + ":small"):
            run(k_small, 2e-3 + s_i)
        with timer.stage(stage):
            run(iters, 3e-3 + s_i)
        cumulative[stage] = (
            (timer.totals[stage] - timer.totals[stage + ":small"])
            * 1e3
            / (iters - k_small)
        )

    # Frame fetch (device->host blit), chunked transfer path.  Completion
    # barrier is a tiny host fetch — block_until_ready is unreliable over
    # the tunnel (CLAUDE.md), and an incomplete render would otherwise be
    # absorbed into the first timed fetch.
    scene.render()
    np.asarray(scene._out["frame"][0, 0])
    t0 = time.perf_counter()
    for _ in range(max(2, iters // 2)):
        scene.get_frame_buffer()
    fetch_ms = (time.perf_counter() - t0) * 1e3 / max(2, iters // 2)

    deltas = {}
    prev = 0.0
    for stage in STAGES:
        deltas[stage] = cumulative[stage] - prev
        prev = cumulative[stage]
    deltas["fetch"] = fetch_ms
    return deltas, cumulative


def print_stage_breakdown(scene, iters: int = 6, out=print):
    deltas, cumulative = stage_breakdown(scene, iters)
    out("per-stage device time (cumulative-prefix deltas):")
    for stage in STAGES:
        out(
            f"  {STAGE_LABELS[stage]:22s} {deltas[stage]:8.3f} ms"
            f"   (prefix total {cumulative[stage]:8.3f} ms)"
        )
    out(f"  {'frame fetch (blit)':22s} {deltas['fetch']:8.3f} ms")
    return deltas
