#!/bin/bash
# Watchdog for the full-budget 3D run: the tunneled TPU backend can stall a
# device fetch indefinitely during an outage (observed in the round-2 2D run
# at iteration 5000, and again in this 3D run at ~1500). Restarting the
# recipe is safe: the trainer does a degraded resume from the latest iter_<N>
# checkpoint with the LR schedule fast-forwarded, and a finished training
# phase skips straight to the checkpoint sweep.
#
#   nohup bash scripts/watchdog_full3d.sh > /tmp/full3d_watchdog.log 2>&1 &

REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="$REPO/runs/full3d/model/LA/r2full_8_labeledfinal/vnet/log.txt"
OUT=/tmp/full3d.log
STALE=1200  # seconds without output growth = stalled (covers a cold remote compile)

newest_mtime() {
  local t=0 f
  for f in "$LOG" "$OUT"; do
    if [ -f "$f" ]; then
      local m
      m=$(stat -c %Y "$f")
      [ "$m" -gt "$t" ] && t=$m
    fi
  done
  echo "$t"
}

cd "$REPO" || exit 1
while true; do
  PYTHONPATH="$REPO:/root/.axon_site" python -u scripts/run_full_3d.py >> "$OUT" 2>&1 &
  PID=$!
  echo "$PID" > /tmp/full3d.pid
  echo "watchdog: started trainer pid $PID at $(date +%H:%M:%S)"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(newest_mtime) ))
    if [ "$AGE" -gt "$STALE" ]; then
      echo "watchdog: output stale ${AGE}s, killing $PID at $(date +%H:%M:%S)"
      kill "$PID"; sleep 20; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  RC=$?
  if grep -q '"done": true' "$OUT"; then
    echo "watchdog: run complete at $(date +%H:%M:%S)"
    break
  fi
  echo "watchdog: restarting (rc=$RC) at $(date +%H:%M:%S)"
  sleep 15
done
