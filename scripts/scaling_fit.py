"""Fit the per-stage scaling model from scaling_model.py's JSON lines.

Reads a jsonl file (docs/scaling_r3_data.jsonl, docs/scaling_r4_data.jsonl)
where each line is one config's measured per-stage deltas plus analytic
traffic predictors, and reproduces the BASELINE.md "Scaling model" fits:

* shade  = g x shade_rows          (per-workload and global least squares)
* raster = a x grid_steps + b x candidate-pixels
* binning = c x sort_elements
* vertex ~= fixed

then prints the headline(g) projection table (compute terms held fixed,
only the gather-row term scaled) and the production break-even gather
cost for the 2.0 ms (>500 FPS) north star.  This is the fit code the
round-3 BASELINE section referenced ("fit code in the round log") made a
checked-in, re-runnable artifact: any skeptic can re-derive every number
from the committed jsonl.

Usage: python scripts/scaling_fit.py docs/scaling_r4_data.jsonl \
           [--headline-row docs/scaling_r4_data.jsonl:1]

The headline row (default: the 800px diablo SL16 line) supplies the row
count and compute terms for the projection table.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if not rows:
        sys.exit(f"no data lines in {path}")
    return rows


def origin_lsq(x, y):
    """1-D least squares through the origin: y ~= k * x."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    k = float(np.dot(x, y) / np.dot(x, x))
    resid = y - k * x
    return k, resid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data", help="scaling_model.py jsonl output")
    ap.add_argument(
        "--target-ms", type=float, default=2.0,
        help="north-star frame time for the break-even solve",
    )
    args = ap.parse_args()
    rows = load(args.data)

    def col(stage):
        return np.array([r["deltas_ms"][stage] for r in rows])

    def pred(name):
        return np.array([float(r["pred"][name]) for r in rows])

    labels = [f"{r['asset']} {r['size']} SL{r['strip_len']}" for r in rows]

    # --- shade: g x gather rows ------------------------------------------
    shade = col("full")
    srows = pred("shade_rows")
    g_glob, resid = origin_lsq(srows, shade)
    print(f"shade = {g_glob * 1e6:.2f} ns x gather_rows  (global fit)")
    for lab, s, n, rr in zip(labels, shade, srows, resid):
        print(
            f"  {lab:22s} {s:7.3f} ms / {n:8.0f} rows = "
            f"{s / n * 1e6:5.2f} ns/row   resid {rr / s * 100:+5.1f}%"
        )
    # Within-workload rate for the headline asset (locality differs across
    # assets; the projection uses the headline's own effective rate).
    dia = [i for i, r in enumerate(rows)
           if r["asset"] == "diablo" and r["strip_len"] == 16]
    if len(dia) >= 2:
        g_head, dres = origin_lsq(srows[dia], shade[dia])
        print(
            f"shade (diablo SL16 within-workload) = {g_head * 1e6:.2f} ns/row"
            f"  resid max {np.max(np.abs(dres / shade[dia])) * 100:.1f}%"
        )
    else:
        g_head = g_glob

    # --- raster: a x steps + b x candidate-pixels ------------------------
    ras = col("raster")
    A = np.stack([pred("ras_steps"), pred("ras_cands")], axis=1)
    (a, b), *_ = np.linalg.lstsq(A, ras, rcond=None)
    rres = ras - A @ (a, b)
    print(
        f"raster = {a * 1e3:.3f} us x grid_steps + {b * 1e9:.0f} ps x "
        f"candidate-pixels  (residuals +-{np.max(np.abs(rres)):.2f} ms)"
    )

    # --- binning: c x sort elements --------------------------------------
    bn = col("bin")
    selems = pred("bin_sort_elems")
    c, bres = origin_lsq(selems, bn)
    print(
        f"binning = {c * 1e6:.2f} ns x sort_elements  "
        f"(residuals +-{np.max(np.abs(bres)):.2f} ms)"
    )

    # --- vertex: fixed ----------------------------------------------------
    vx = col("vertex")
    print(f"vertex ~= {np.mean(vx):.2f} ms fixed (spread +-{np.ptp(vx) / 2:.2f})")

    # --- projection -------------------------------------------------------
    # Headline row: 800px diablo at the headline strip length.
    try:
        i = labels.index("diablo 800 SL16")
    except ValueError:
        i = 0
    n_rows = srows[i]
    compute = (
        np.mean(vx)
        + c * selems[i]
        + a * float(rows[i]["pred"]["ras_steps"])
        + b * float(rows[i]["pred"]["ras_cands"])
    )
    print(
        f"\nheadline(g) ~= {compute:.2f} ms compute "
        f"+ {n_rows / 1e3:.0f}k rows x g   [row: {labels[i]}]"
    )
    for g in (0.5e-6, 1.0e-6, 2.0e-6, g_head):
        print(f"  g = {g * 1e6:4.2f} ns/row -> {compute + n_rows * g:5.2f} ms")
    be = (args.target_ms - compute) / n_rows
    print(
        f"  break-even with the {args.target_ms:.1f} ms target: "
        f"g <= {be * 1e6:.2f} ns/row"
    )


if __name__ == "__main__":
    main()
