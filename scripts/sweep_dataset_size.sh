#!/bin/bash
# VERDICT r4 item 1: diagnose the rising-FID longitudinal curve.
# Hypothesis: with 256 images (the r4 run), D memorizes the dataset within
# a few hundred steps (metrics.csv shows d_loss collapsing to ~0.003-0.03
# with g_loss spiking to 15-28), so FID on the EMA generator worsens.
# Sweep the synthetic dataset size; everything else identical.
set -u
cd "$(dirname "$0")/.."
for n in 256 2048 8192; do
  out=runs/sweep_r05/n$n
  mkdir -p "$out"
  echo "=== arm n=$n ==="
  timeout 3600 python train.py --run_id 8 --synthetic_images renders \
    --synthetic_n "$n" --inception_weights random --out_dir "$out" \
    --total_iters 2000 --fid_every 250 --checkpoint_every 2000 \
    --log_every 10 --fid_n_samples 2000 --fid_real_samples 8192 \
    >"$out/launch.log" 2>&1
  echo "arm n=$n rc=$?"
done
echo SWEEP DONE
