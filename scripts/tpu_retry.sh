#!/bin/bash
# Usage: tpu_retry.sh <logfile> <unused> <cmd...>
#
# TPU-run supervisor for the axon dev tunnel: a fresh JAX process sometimes
# wedges forever before its first device op (see CLAUDE.md). The wrapped
# command must print TUNNEL-LIVE after a first trivial device op (bench.py
# and the scripts here do).
#
# Wedge detection is CPU-aware: the true wedge signature is a process
# blocked at ~0% CPU in iowait.  A slow tunnel phase instead shows real
# CPU burn (init/compile) — killing those wastes attempts (a 300s fixed
# window killed a 23%-CPU attempt that was about to go live).  So an
# attempt is only declared wedged when TUNNEL-LIVE hasn't appeared AND
# the process has accumulated <5s of CPU over the last 60s window, with
# a 900s hard cap per attempt regardless.
LOG=$1; shift
shift  # legacy pattern arg, unused
cpu_secs() {  # total CPU seconds of $1 and its descendants
  local total=0 p
  for p in $1 $(pgrep -P "$1" 2>/dev/null) $(pgrep -P "$(pgrep -P "$1" 2>/dev/null | head -1)" 2>/dev/null); do
    [ -r "/proc/$p/stat" ] || continue
    local st
    st=$(awk '{print int(($14+$15)/100)}' "/proc/$p/stat" 2>/dev/null) || continue
    total=$((total + st))
  done
  echo $total
}
for attempt in 1 2 3 4 5 6 7; do
  : > "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  live=0
  prev_cpu=0
  for i in $(seq 1 15); do  # 15 x 60s = 900s hard cap
    sleep 60
    if ! kill -0 $PID 2>/dev/null; then live=2; break; fi
    if grep -q TUNNEL-LIVE "$LOG"; then live=1; break; fi
    cur_cpu=$(cpu_secs $PID)
    if [ $((cur_cpu - prev_cpu)) -lt 5 ]; then
      break  # <5s CPU in the last minute and no sentinel: wedged
    fi
    prev_cpu=$cur_cpu
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
