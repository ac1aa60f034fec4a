#!/bin/bash
# Usage: tpu_retry.sh <logfile> <unused> <cmd...>
#
# TPU-run supervisor for the axon dev tunnel: a fresh JAX process sometimes
# wedges forever before its first device op (see CLAUDE.md). The wrapped
# command must print TUNNEL-LIVE after a first trivial device op (bench.py
# and the scripts here do).
# Retries if the TUNNEL-LIVE sentinel doesn't appear within 300s (axon
# wedge; the window was 120s, but slow tunnel phases take longer than
# that to hand out the first device op — killing those wastes attempts).
LOG=$1; shift
shift  # legacy pattern arg, unused
for attempt in 1 2 3 4 5 6 7; do
  : > "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  live=0
  for i in $(seq 1 60); do
    sleep 5
    if ! kill -0 $PID 2>/dev/null; then live=2; break; fi
    if grep -q TUNNEL-LIVE "$LOG"; then live=1; break; fi
  done
  if [ $live -ge 1 ]; then
    wait $PID; echo "[retry-wrapper] attempt $attempt finished rc=$?" >> "$LOG"; exit 0
  fi
  echo "[retry-wrapper] attempt $attempt wedged; killing tree of $PID" >> "$LOG"
  # Kill grandchildren (python under timeout), then children, then the head.
  for child in $(pgrep -P $PID); do
    pkill -9 -P $child 2>/dev/null
    kill -9 $child 2>/dev/null
  done
  kill -9 $PID 2>/dev/null
  sleep 60
done
echo "[retry-wrapper] all attempts wedged" >> "$LOG"; exit 1
