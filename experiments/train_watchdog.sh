#!/bin/bash
# Launch a training run and auto-restart (with RESUME) if it stalls.
# Usage: train_watchdog.sh <out_dir> <log> <stall_sec> -- <train args...>
# The axon relay occasionally drops an in-flight execution under host
# contention, wedging the trainer; checkpoints every 50 epochs make a
# RESUME restart cheap.
set -u
OUT=$1; LOG=$2; STALL=$3; shift 3
[ "$1" = "--" ] && shift

launch() {
  nohup python demo/train.py "$@" --out_dir "$OUT" >> "$LOG" 2>&1 &
  echo $! > "$OUT.pid"
}

latest_ckpt() {
  ls -d "$OUT"/checkpoints/ckp_* 2>/dev/null | sort | tail -1
}

mkdir -p "$(dirname "$OUT")"
launch "$@"
while true; do
  sleep 60
  PID=$(cat "$OUT.pid")
  if ! kill -0 "$PID" 2>/dev/null; then
    # finished or crashed; if final weights exist we are done
    if [ -f "$OUT/weights.pt" ] || [ -d "$OUT/weights" ]; then
      echo "watchdog: run complete" >> "$LOG"; exit 0
    fi
    CK=$(latest_ckpt)
    if [ -n "$CK" ]; then
      echo "watchdog: process died, resuming from $CK" >> "$LOG"
      launch "$@" --RESUME "$CK" --lr 1e-4 --RESUME_keep_schedule
    else
      echo "watchdog: process died with no checkpoint, relaunching" >> "$LOG"
      launch "$@"
    fi
    continue
  fi
  # liveness = newest of the csv (one row per epoch) and the nohup log
  # (compile/progress chatter); first epoch needs data load + a fresh
  # compile, which can take >10 min on this 1-core host under contention.
  T_CSV=$(stat -c %Y "$OUT/training.csv" 2>/dev/null || echo 0)
  T_LOG=$(stat -c %Y "$LOG" 2>/dev/null || echo 0)
  NEWEST=$(( T_CSV > T_LOG ? T_CSV : T_LOG ))
  AGE=$(( $(date +%s) - NEWEST ))
  if [ "$NEWEST" -gt 0 ] && [ "$AGE" -gt "$STALL" ]; then
    echo "watchdog: stalled ${AGE}s, killing $PID" >> "$LOG"
    kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null; sleep 2
    CK=$(latest_ckpt)
    if [ -n "$CK" ]; then
      echo "watchdog: resuming from $CK" >> "$LOG"
      launch "$@" --RESUME "$CK" --lr 1e-4 --RESUME_keep_schedule
    else
      echo "watchdog: no checkpoint yet, relaunching fresh" >> "$LOG"
      rm -rf "$OUT"; launch "$@"
    fi
  fi
done
