#!/bin/bash
# Single-attempt TPU run with CPU-aware wedge detection — the DEAD-PHASE
# protocol wrapper (CLAUDE.md): when the axon tunnel is in a dead phase,
# every fresh JAX process wedges at ~0% CPU before its first device op,
# and rapid retries may keep it wedged.  So: ONE fresh attempt after a
# fully quiet >=60-min window; never auto-retry (that is tpu_retry.sh's
# job, for the ordinary wedge-on-init case).
#
# Usage: scripts/one_attempt.sh <logfile> <cmd...>
#   e.g. scripts/one_attempt.sh /tmp/live.log python scripts/live_window.py
#
# Wedge = TWO consecutive 60s windows with <5s CPU (whole process tree)
# and no TUNNEL-LIVE line in the log; a slow-phase attempt burning real
# CPU gets the full 15-min budget.  Exits 9 on a wedge (tree killed),
# else the wrapped command's exit code.
LOG=$1; shift
cpu_secs() {
  local total=0 queue="$1" p st kids
  while [ -n "$queue" ]; do
    set -- $queue
    p=$1; shift; queue="$*"
    if [ -r "/proc/$p/stat" ]; then
      st=$(awk '{print int(($14+$15+$16+$17)/100)}' "/proc/$p/stat" 2>/dev/null) && \
        total=$((total + st))
    fi
    kids=$(pgrep -P "$p" 2>/dev/null | tr '\n' ' ')
    [ -n "$kids" ] && queue="$queue $kids"
  done
  echo $total
}
: > "$LOG"
"$@" >> "$LOG" 2>&1 &
PID=$!
echo $PID > /tmp/one_attempt.pid
live=0; prev_cpu=0; low=0
for i in $(seq 1 15); do
  sleep 60
  if ! kill -0 $PID 2>/dev/null; then live=2; break; fi
  if grep -q TUNNEL-LIVE "$LOG"; then live=1; break; fi
  cur_cpu=$(cpu_secs $PID)
  if [ $cur_cpu -lt $prev_cpu ]; then prev_cpu=$cur_cpu; low=0; continue; fi
  if [ $((cur_cpu - prev_cpu)) -lt 5 ]; then
    low=$((low + 1))
    [ $low -ge 2 ] && break
  else
    low=0
  fi
  prev_cpu=$cur_cpu
done
if [ $live -ge 1 ]; then
  wait $PID; rc=$?
  echo "[one-attempt] finished rc=$rc" >> "$LOG"
  exit $rc
fi
echo "[one-attempt] WEDGED; killing tree of $PID" >> "$LOG"
tree=""; queue="$PID"
while [ -n "$queue" ]; do
  set -- $queue
  p=$1; shift; queue="$*"
  tree="$p $tree"
  kids=$(pgrep -P "$p" 2>/dev/null | tr '\n' ' ')
  [ -n "$kids" ] && queue="$queue $kids"
done
for p in $tree; do kill -9 "$p" 2>/dev/null; done
exit 9
