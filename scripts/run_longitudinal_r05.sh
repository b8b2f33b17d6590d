#!/bin/bash
# Round-5 longitudinal run (VERDICT r4 item 1) with a liveness watchdog:
# the axon tunnel can drop an RPC and leave the client futex-waiting
# forever (two hung launches on 2026-08-20, host CPU time frozen), so a
# plain `timeout` would burn the whole budget on a hang.  Poll
# metrics.csv; if it stops advancing for WATCHDOG seconds, kill the
# trainer by pid (never by pattern) and relaunch — training resumes from
# the newest checkpoint and the synthetic dataset comes from the disk
# cache, so a retry costs minutes, not the run.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-runs/longitudinal_r05}
TOTAL=${TOTAL:-2500}
R1W=${R1W:-50.0}
DNOISE=${DNOISE:-0}
WATCHDOG=${WATCHDOG:-2100}   # > one FID eval (~10 min) + slack
FIRST=${FIRST:-2700}         # cold start: compiles + dataset build
mkdir -p "$OUT"
for attempt in 1 2 3 4; do
  echo "=== attempt $attempt $(date -u +%H:%M:%S) ===" >> "$OUT/launch.log"
  python train.py --run_id 8 --synthetic_images renders --synthetic_n 8192 \
    --inception_weights random --out_dir "$OUT" --total_iters "$TOTAL" \
    --fid_every 250 --checkpoint_every 500 --log_every 10 \
    --fid_n_samples 2000 --fid_real_samples 8192 --r1_weight "$R1W" \
    --d_input_noise "$DNOISE" \
    >> "$OUT/launch.log" 2>&1 &
  pid=$!
  echo "$pid" > /tmp/longitudinal.pid
  deadline=$FIRST
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    m="$OUT/8/metrics.csv"
    if [ -f "$m" ]; then
      age=$(( $(date +%s) - $(stat -c %Y "$m") ))
      deadline=$WATCHDOG
    else
      age=$(( $(date +%s) - $(stat -c %Y /tmp/longitudinal.pid) ))
    fi
    if [ "$age" -gt "$deadline" ]; then
      echo "WATCHDOG: no progress for ${age}s, killing $pid" >> "$OUT/launch.log"
      kill -9 "$pid" 2>/dev/null
      sleep 5
      break
    fi
  done
  wait "$pid"; rc=$?
  echo "attempt $attempt rc=$rc" >> "$OUT/launch.log"
  # 0 = completed; anything else (watchdog kill, crash) retries.
  [ "$rc" -eq 0 ] && break
done
echo "LONGITUDINAL DONE"
