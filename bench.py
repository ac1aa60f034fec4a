"""Benchmark harness.

Renders the 5 configs from BASELINE.json and prints ONE JSON line for the
headline metric: ms/frame for diablo 800x800 with the two-pass shadow
pipeline (north star: >500 FPS on one v5e chip => 2.0 ms/frame budget;
vs_baseline = 2.0 / measured_ms, so >1.0 beats the target).

Device time is measured with an N-frame burst — a lax.scan over orbit
angles inside ONE jit dispatch returning per-frame checksums — so the
number reflects pure device throughput, independent of host/tunnel dispatch
latency (the dev TPU sits behind a high-latency tunnel).  A host-loop
measurement (one dispatch per frame) and a blit measurement
(device->host frame fetch) are reported alongside on stderr.

Usage: python bench.py [--frames 64] [--all] [--backend auto]
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_MS = 2.0  # >500 FPS north star (BASELINE.json)

# Cache of the most recent successful official-config headline; the init
# watchdog attaches it to the failure JSON on a dead tunnel so a failed
# round-end bench still carries the last certified measurement.
_LAST_GOOD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_last_good.json"
)


def watchdog_failure_payload(path=None):
    """The JSON emitted when the TPU init watchdog fires: a dead tunnel
    should not erase the record, so the most recent successful
    official-config measurement (cached after every clean run) rides
    along as `last_good`."""
    last_good = None
    try:
        with open(path or _LAST_GOOD_PATH) as f:
            last_good = json.load(f)
    except (OSError, ValueError):
        pass
    return {
        "metric": "ms/frame diablo 800x800 phong+shadow",
        "value": None, "unit": "ms", "vs_baseline": None,
        "error": "TPU init watchdog: no device op within 900s "
                 "(dead axon tunnel; see CLAUDE.md)",
        **({"last_good": last_good} if last_good else {}),
    }

# Cross-run drift floor (VERDICT r4 #7): single runs of the SAME binary
# drift ~±20% with chip state (BASELINE.md rounds 2-4; A/B decisions
# therefore only ever come from interleaved same-process sweeps).  Any
# official config that moved more than this vs the last healthy-phase run
# is flagged in the JSON line itself, so one artifact is readable without
# cross-referencing sweep logs.
DRIFT_FLOOR = 0.20


def drift_vs_last_good(config_ms, last_good, floor=DRIFT_FLOOR):
    """Per-config drift records for entries exceeding the floor, or {}.

    `config_ms` maps "asset:pipeline" -> measured ms; `last_good` is the
    cached .bench_last_good.json payload (or None)."""
    if not last_good or not isinstance(last_good.get("configs"), dict):
        return {}
    drift = {}
    for key, ms in sorted(config_ms.items()):
        old = last_good["configs"].get(key)
        if old:
            rel = (ms - old) / old
            if abs(rel) > floor:
                drift[key] = {"ms": ms, "last_good_ms": old,
                              "delta_pct": round(100 * rel, 1)}
    return drift


CONFIGS = [
    ("african_head", "default", False),
    ("diablo", "phong", False),
    ("diablo", "darboux", False),
    ("diablo", "shadow", False),
    ("diablo", "occlusion", True),  # animated orbit
]


def _find_assets():
    for root in ("assets", "/root/reference/assets"):
        if os.path.isdir(os.path.join(root, "diablo")):
            return root
    raise FileNotFoundError("no asset root found")


def bench_config(asset_root, asset, pipeline, orbit, frames, backend, size=800,
                 subdivide=0, knobs=()):
    import jax
    import jax.numpy as jnp

    from tiny_renderer_tpu import RenderConfig, Scene, load_model
    from tiny_renderer_tpu.pipelines.frame import make_burst_fn

    model = load_model(os.path.join(asset_root, asset), verbose=False)
    if subdivide:
        import dataclasses

        from tiny_renderer_tpu.assets.mesh_tools import subdivide_mesh

        model = dataclasses.replace(
            model, mesh=subdivide_mesh(model.mesh, levels=subdivide)
        )
        asset = f"{asset}_x{4 ** subdivide}"
    config = RenderConfig(width=size, height=size)
    if knobs:
        from tiny_renderer_tpu.app import apply_knobs

        config = apply_knobs(config, knobs)
    scene = Scene(model, pipeline, config, backend=backend)

    gj = scene._geom
    tj = scene._textures

    # Orbit angle tracks.  Non-orbit configs still get per-frame epsilon
    # jitter, and every process gets a random base offset: the dev-TPU
    # runtime dedupes executions with identical inputs — even ACROSS
    # processes — which would turn a static-camera burst into no work.
    n = max(8, frames)
    base = float(np.random.default_rng().uniform(0, 1e-2))
    step = 0.05 if orbit else 1e-4
    cam = (0.37 + base + step * np.arange(n)).astype(np.float32)
    lig = (-0.6 + base + (0.03 if orbit else 1e-4) * np.arange(n)).astype(np.float32)

    burst = make_burst_fn(pipeline, config, backend=scene._frame_fn.keywords["backend"])

    # Warmup/compile both burst lengths.  Completion barrier is a host fetch
    # of the (tiny) checksums: block_until_ready is unreliable over the
    # tunneled dev TPU.
    def run_burst(c, l):
        out = burst(gj, tj, jnp.asarray(c), jnp.asarray(l))
        np.asarray(out["checksums"])

    run_burst(cam[:8], lig[:8])
    run_burst(cam, lig)

    # Device throughput: marginal cost per frame between two burst lengths
    # (cancels dispatch/tunnel latency).  Each timed call gets unique angles
    # so the runtime cannot dedupe against a previous execution.
    t0 = time.perf_counter()
    run_burst(cam[:8] + 2e-5, lig[:8])
    t8 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_burst(cam + 1e-5, lig)
    t_n = time.perf_counter() - t0
    device_ms = max((t_n - t8) * 1e3 / (n - 8), 1e-3)

    # Host loop: one dispatch per frame (includes per-frame dispatch latency).
    def set_state(i, eps=0.0):
        ca, la = float(cam[i % n]) + eps, float(lig[i % n])
        scene.set_camera(
            np.array([math.sin(ca), 0.0, math.cos(ca)], np.float32),
            np.zeros(3, np.float32),
            np.array([0.0, 1.0, 0.0], np.float32),
        )
        scene.set_light_direction(np.array([math.sin(la), 0.0, math.cos(la)], np.float32))

    set_state(0)
    scene.render()
    scene.block_until_ready()
    loop_frames = min(frames, 20)
    t0 = time.perf_counter()
    for i in range(loop_frames):
        set_state(i, eps=3e-5)
        scene.render()
    out = scene._out
    np.asarray(out["frame"][0, 0])  # completion barrier (tiny fetch)
    hostloop_ms = (time.perf_counter() - t0) * 1e3 / loop_frames

    # Blit: device->host frame fetch (chunked).
    t0 = time.perf_counter()
    scene.get_frame_buffer()
    blit_ms = (time.perf_counter() - t0) * 1e3

    tris = model.num_triangles
    pixels = size * size
    passes = 2 if pipeline in ("shadow", "occlusion") else 1
    return {
        "asset": asset,
        "pipeline": pipeline,
        "ms_per_frame": device_ms,
        "ms_per_frame_hostloop": hostloop_ms,
        "blit_ms": blit_ms,
        "fps": 1e3 / device_ms,
        "mtri_per_s": tris * passes / device_ms / 1e3,
        "mpix_per_s": pixels / device_ms / 1e3,
    }


def chip_health():
    """Microprobe of the two costs that dominate this renderer: MXU matmul
    throughput and per-row gather cost from a renderer-sized (4 MB) table.

    Burst marginals (difference of two lax.scan lengths, jittered inputs)
    — the ~31 ms tunnel dispatch RTT would otherwise dominate.  The chip
    is multi-state (the SAME binary measured 5.0, 6.7, and 137 ms
    headlines hours apart); recording the probe alongside the headline makes every
    bench self-interpreting.  NOTE: gathers from much larger tables
    (e.g. 64 MB) run ~35x slower in EVERY state on this chip — the probe
    must use renderer-sized tables to track the renderer's regime."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng()

    def marginal(f, args, n_lo=4, n_hi=16):
        # Every step's result folds into the carry (a cheap scalar reduce):
        # no step can be dead-code-eliminated and no big per-step output is
        # materialized.
        def burst(n, seed):
            def body(c, k):
                # Full-result reduce: cheap next to the op being probed,
                # and XLA can neither narrow nor skip any step.
                return c + jnp.sum(f(k + seed, *args)), None
            c, _ = jax.lax.scan(
                body, jnp.float32(0) + seed, jnp.arange(n, dtype=jnp.int32)
            )
            return c

        # Every timed call gets a fresh seed operand: the tunnel runtime
        # dedupes executions with bit-identical inputs (CLAUDE.md), which
        # would collapse the marginal to ~0.
        lo = jax.jit(functools.partial(burst, n_lo))
        hi = jax.jit(functools.partial(burst, n_hi))
        np.asarray(lo(jnp.int32(1))); np.asarray(hi(jnp.int32(2)))
        t0 = time.perf_counter(); np.asarray(lo(jnp.int32(3))); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(hi(jnp.int32(4))); t_hi = time.perf_counter() - t0
        return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)

    x = jnp.asarray(
        rng.random((2048, 2048)).astype(np.float32)
    )
    # 48 extra steps (~0.8 TFLOP marginal): the per-call tunnel-RTT jitter
    # (~+-1 ms) must stay small next to the marginal being measured.
    mm = marginal(
        lambda k, a: (a + k.astype(jnp.float32) * 1e-9) @ a, (x,),
        n_lo=8, n_hi=56,
    )
    tflops = 2 * 2048**3 / mm / 1e12
    # The ~48-step matmul marginal (~5 ms at peak) can still drown in
    # tunnel-RTT jitter; an impossible reading means exactly that.  The
    # gather number is the meaningful one for this renderer anyway.
    if not (0.05 <= tflops <= 400.0):
        tflops = None

    tbl = jnp.asarray(rng.random(1 << 20).astype(np.float32))  # 4 MB
    idx = jnp.asarray(rng.integers(0, 1 << 20, 640_000).astype(np.int32))
    gt = marginal(lambda k, t, i: t[(i + k) & ((1 << 20) - 1)], (tbl, idx))
    return {"mxu_tflops": tflops, "gather_ns_per_row": gt * 1e9 / 640_000}


def headline_payload(headline, health, knobs=()):
    """The single stdout JSON line's payload — the driver-facing contract.

    Self-interpreting health verdict (VERDICT r3 weak #3): derived from the
    gather probe ONLY — the renderer is gather-bound and that probe is
    stable (7.1-7.8 ns/row healthy), while the MXU probe is
    noisy-by-design across runs (30-176 Tflop/s minutes apart; see
    BASELINE.md) and must not be read as chip state."""
    return {
        "metric": "ms/frame diablo 800x800 phong+shadow",
        "value": round(headline["ms_per_frame"], 4),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / headline["ms_per_frame"], 4),
        "chip_mxu_tflops": (
            round(health["mxu_tflops"], 1)
            if health["mxu_tflops"] is not None
            else None
        ),
        "chip_gather_ns_per_row": round(health["gather_ns_per_row"], 1),
        "chip_health": (
            "healthy" if health["gather_ns_per_row"] <= 8.5 else "degraded"
        ),
        "probe_note": "gather probe is the chip-state signal; the MXU "
                      "reading is noisy-by-design (renderer is not MXU-bound)",
        **({"knobs": list(knobs)} if knobs else {}),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--all", action="store_true", help="run all 5 configs (stderr report)")
    ap.add_argument("--stress", action="store_true",
                    help="add the 80k-triangle capacity config (stderr only)")
    ap.add_argument("--no-compile-cache", action="store_true",
                    help="skip the persistent XLA compile cache (warm starts "
                         "only shorten compile wall time; measured ms/frame "
                         "is post-warmup and unaffected)")
    ap.add_argument("--knob", action="append", default=[], metavar="NAME=VALUE",
                    help="override a RenderConfig field for every config "
                         "(repeatable; same syntax/validation as the app CLI) "
                         "— for hardware experiments; applied knobs are "
                         "echoed in the JSON line")
    args = ap.parse_args()

    if args.knob:
        # Validate knob names/values NOW, before any device op: a typo'd
        # --knob must not burn a live tunnel window on init + health
        # probes before crashing.  apply_knobs is pure CPU.
        from tiny_renderer_tpu.app import apply_knobs
        from tiny_renderer_tpu.config import RenderConfig

        apply_knobs(RenderConfig(), args.knob)

    asset_root = _find_assets()

    # Liveness sentinel: over the axon dev tunnel a fresh process's first
    # device op can block forever; supervisors watch for this line.
    import jax
    import jax.numpy as jnp

    if not args.no_compile_cache:
        from tiny_renderer_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()

    # Watchdog around the first device op only: on a dead axon tunnel a
    # fresh process blocks here FOREVER at 0% CPU (one >8 h outage
    # observed) — better to emit a parseable failure line than hang the
    # caller.  900 s is generous for the slowest healthy init; the event
    # is set the moment the sentinel op completes, so compiles and the
    # actual bench are never at risk.  A daemon THREAD, not SIGALRM: a
    # Python signal handler only runs when the main thread re-enters the
    # eval loop, which a thread wedged inside the runtime's C++ wait
    # never does (same reason Ctrl-C can't interrupt a hung device op).
    import threading

    _live = threading.Event()

    def _watchdog():
        if _live.wait(900):
            return
        print(json.dumps(watchdog_failure_payload()), flush=True)
        os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        np.asarray(jnp.ones((8, 128)) * 2)
    except Exception as e:  # noqa: BLE001 — fast-failing backend phase
        # The tunnel has a third failure mode besides wedge and silent
        # exit: the first device op raises immediately (observed
        # FAILED_PRECONDITION, round-5 05:25 UTC attempt).  Emit the
        # same parseable failure line the hang watchdog would, with
        # last_good riding along.
        _live.set()
        payload = watchdog_failure_payload()
        payload["error"] = f"first device op failed: {e!r:.200}"
        print(json.dumps(payload), flush=True)
        sys.exit(3)
    _live.set()
    print("TUNNEL-LIVE", file=sys.stderr, flush=True)

    health = chip_health()
    mxu = health["mxu_tflops"]
    mxu_s = f"{mxu:.1f} Tflop/s" if mxu is not None else "unreliable (RTT jitter)"
    print(
        f"# chip health: {mxu_s} MXU, "
        f"{health['gather_ns_per_row']:.1f} ns/row gather "
        f"(healthy dev chip: ~179 Tflop/s, ~7.3 ns/row; the tunnel chip is "
        f"BIMODAL — the same binary has measured 5.0 and 137 ms headlines "
        f"an hour apart; see BASELINE.md)",
        file=sys.stderr,
        flush=True,
    )

    results = []
    configs = [c + (0,) for c in (CONFIGS if args.all else [("diablo", "shadow", False)])]
    if args.stress:
        # Capacity config: diablo subdivided 2x = 80,352 triangles (16x the
        # reference's largest scene; assets.mesh_tools).  stderr-only — the
        # JSON headline stays the reference workload.
        configs.append(("diablo", "phong", True, 2))
    for asset, pipeline, orbit, subdiv in configs:
        r = bench_config(asset_root, asset, pipeline, orbit, args.frames,
                         args.backend, args.size, subdivide=subdiv,
                         knobs=args.knob)
        results.append(r)
        print(
            f"# {r['asset']:13s} {r['pipeline']:9s} {r['ms_per_frame']:8.3f} ms/frame "
            f"({r['fps']:7.1f} FPS) {r['mpix_per_s']:8.0f} Mpix/s {r['mtri_per_s']:6.1f} Mtri/s "
            f"hostloop {r['ms_per_frame_hostloop']:.2f} ms blit {r['blit_ms']:.1f} ms",
            file=sys.stderr,
            flush=True,
        )

    headline = next(
        (r for r in results if r["asset"] == "diablo" and r["pipeline"] == "shadow"),
        results[-1],
    )
    payload = headline_payload(headline, health, args.knob)
    last_good = None
    try:
        with open(_LAST_GOOD_PATH) as f:
            last_good = json.load(f)
    except (OSError, ValueError):
        pass
    if health["gather_ns_per_row"] > 8.5 and last_good:
        # Degraded chip phase (the bimodal ~27x-slower state): attach the
        # last healthy-phase measurement so the number is self-interpreting.
        payload["last_good"] = last_good

    config_ms = {f"{r['asset']}:{r['pipeline']}": round(r["ms_per_frame"], 4)
                 for r in results}
    drift = drift_vs_last_good(config_ms, last_good)
    if drift:
        payload["drift_exceeds_floor"] = drift
        payload["drift_note"] = (
            "delta vs last healthy run exceeds the ±20% cross-run "
            "chip-state drift floor (BASELINE.md); treat as chip state, "
            "not code, unless an interleaved A/B confirms")
    print(json.dumps(payload))
    if (not args.knob and args.size == 800
            and health["gather_ns_per_row"] <= 8.5):
        # Cache the official-config measurement for the watchdog's
        # last_good record (best effort — a read-only tree is fine).
        # Gated on a healthy gather probe so a degraded-phase run (the
        # ~27x-slower chip state) never replaces a certified number.
        # Per-config ms values merge over runs (a shadow-only run must not
        # erase the --all rows) and feed the drift flagging above.
        merged = dict(last_good.get("configs", {})) if last_good else {}
        merged.update(config_ms)
        record = {k: v for k, v in payload.items()
                  if k not in ("last_good", "drift_exceeds_floor", "drift_note")}
        try:
            with open(_LAST_GOOD_PATH, "w") as f:
                json.dump({**record, "configs": merged,
                           "measured_at": time.strftime(
                               "%Y-%m-%d %H:%M:%S UTC", time.gmtime())}, f)
        except OSError:
            pass


if __name__ == "__main__":
    main()
