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
cpu_secs() {  # total CPU seconds of $1 and ALL its descendants (BFS walk)
  local total=0 queue="$1" p st kids
  while [ -n "$queue" ]; do
    set -- $queue
    p=$1; shift; queue="$*"
    if [ -r "/proc/$p/stat" ]; then
      # utime+stime plus cutime+cstime so CPU burned by already-reaped
      # children (e.g. exited compile workers) stays counted.
      st=$(awk '{print int(($14+$15+$16+$17)/100)}' "/proc/$p/stat" 2>/dev/null) && \
        total=$((total + st))
    fi
    kids=$(pgrep -P "$p" 2>/dev/null | tr '\n' ' ')
    [ -n "$kids" ] && queue="$queue $kids"
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
    if [ $cur_cpu -lt $prev_cpu ]; then
      # A counted descendant exited (its seconds left the sum before
      # being reaped into an ancestor) — something WAS alive and burning;
      # not a wedge.  Rebase and keep waiting.
      prev_cpu=$cur_cpu
      continue
    fi
    if [ $((cur_cpu - prev_cpu)) -lt 5 ]; then
      break  # <5s CPU in the last minute and no sentinel: wedged
    fi
    prev_cpu=$cur_cpu
  done
  if [ $live -ge 1 ]; then
    wait $PID; rc=$?
    # A quick silent exit is NOT success: after a kill -9 of a wedged
    # attempt, the next axon init (within ~1-2 min) can exit(0) DURING
    # plugin setup with zero output (observed 3x on 2026-08-19: rc=0,
    # empty log, <60 s).  Only a log containing the TUNNEL-LIVE sentinel
    # counts as having reached the device.
    if grep -q TUNNEL-LIVE "$LOG"; then
      echo "[retry-wrapper] attempt $attempt finished rc=$rc" >> "$LOG"; exit $rc
    fi
    echo "[retry-wrapper] attempt $attempt exited rc=$rc WITHOUT TUNNEL-LIVE; retrying after cooldown" >> "$LOG"
    sleep 120
    continue
  fi
  echo "[retry-wrapper] attempt $attempt wedged; killing tree of $PID" >> "$LOG"
  # Collect the whole descendant tree (BFS, by parent pid — never by
  # pattern), then kill leaves-first so nothing reparents mid-walk.
  tree=""; queue="$PID"
  while [ -n "$queue" ]; do
    set -- $queue
    p=$1; shift; queue="$*"
    tree="$p $tree"
    kids=$(pgrep -P "$p" 2>/dev/null | tr '\n' ' ')
    [ -n "$kids" ] && queue="$queue $kids"
  done
  for p in $tree; do kill -9 "$p" 2>/dev/null; done
  sleep 60
done
echo "[retry-wrapper] all attempts wedged" >> "$LOG"; exit 1
