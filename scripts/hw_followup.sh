#!/bin/bash
# Post-sweep live-window chain: once the knob sweep has finished
# (/tmp/SWEEP_DONE) and any config-default decisions are committed, run
# the full on-hardware certification + official bench while the tunnel
# is still alive.  Each stage goes through tpu_retry.sh (CPU-aware wedge
# detection) with a cool-down between TPU processes (the tunnel needs
# ~60s to release the chip; overlapping processes wedge both).
#
# Usage: nohup scripts/hw_followup.sh >/tmp/hw_followup.log 2>&1 &
set -u
cd /root/repo
STAMP=$(date +%H%M%S)

echo "[followup] tpu_smoke (parity certification, both assets) at $(date +%H:%M:%S)"
scripts/tpu_retry.sh /tmp/smoke_${STAMP}.log x python scripts/tpu_smoke.py
rc=$?
echo "[followup] tpu_smoke rc=$rc (log /tmp/smoke_${STAMP}.log)"

sleep 90  # let the tunnel release the chip before the next process

echo "[followup] bench --all at $(date +%H:%M:%S)"
scripts/tpu_retry.sh /tmp/bench_${STAMP}.log x python bench.py --all --frames 40
rc=$?
echo "[followup] bench rc=$rc (log /tmp/bench_${STAMP}.log)"
echo "[followup] done at $(date +%H:%M:%S)"
