#!/usr/bin/env python
"""EMA / live-G reconstruction trend from a longitudinal run's checkpoints.

For every saved checkpoint step, restores the state and computes the
generator's pixel reconstruction MSE (in [-1, 1] space) against ground
truth on the first K rows of the conditionally-exact synthetic render
dataset — the offline version of the loop's ``ema_recon`` column, usable
on runs recorded before that column existed (e.g. runs/longitudinal_r05).
A falling EMA curve is direct evidence training improves the model,
independent of the FID harness (reference analog: FID monitoring as the
de-facto correctness harness, /root/reference/train.py:267-277).

Usage:
    python scripts/recon_trend.py --out_dir runs/longitudinal_r05 \
        --run_id 8 --synthetic_n 8192
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--run_id", type=int, default=8)
    ap.add_argument("--synthetic_n", type=int, default=8192)
    ap.add_argument("--k", type=int, default=64, help="probe rows")
    ap.add_argument("--seed", type=int, default=None,
                    help="state-init seed (default: run_id, train.py's)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from gif_tpu.train import get_config, create_train_state
    from gif_tpu.train.checkpoint import CheckpointManager
    from gif_tpu.flame.resources import load_flame_resources
    from gif_tpu.data.pipeline import SyntheticRenderDataset
    from gif_tpu.eval.sampling import FlameSampler
    from gif_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    res = load_flame_resources(None)
    ds = SyntheticRenderDataset(res, n=args.synthetic_n, size=256)
    cfg = get_config(args.run_id, batch_size=16, embedding_vocab_size=len(ds))
    seed = cfg.run_id if args.seed is None else args.seed
    abstract = create_train_state(cfg, jax.random.PRNGKey(seed))

    run_dir = os.path.join(args.out_dir, str(cfg.run_id))
    mgr = CheckpointManager(os.path.join(run_dir, "checkpoint"))
    steps = mgr.all_steps()
    if not steps and mgr.latest_step() is not None:
        steps = [mgr.latest_step()]

    k = min(args.k, len(ds))
    gt = (ds.images[:k].astype(np.float32) / 255.0) * 2.0 - 1.0
    flame = np.asarray(ds.flame_params[:k], np.float32)
    idx = np.arange(k, dtype=np.int32)

    def mse(params, buffers):
        s = FlameSampler(cfg, res, params, buffers, batch_size=16,
                        eye_center=False)
        return float(np.mean((s.sample(flame, idx)[0] - gt) ** 2))

    rows = [{
        "step": 0,
        "ema_recon": mse(abstract.g_ema_params, abstract.buffers),
        "live_recon": mse(abstract.g_params, abstract.buffers),
    }]
    for s in steps:
        st = mgr.restore(abstract, step=s)
        rows.append({
            "step": s,
            "ema_recon": mse(st.g_ema_params, st.buffers),
            "live_recon": mse(st.g_params, st.buffers),
        })

    print(f"{'step':>6}  {'ema_recon':>10}  {'live_recon':>10}")
    for r in rows:
        print(f"{r['step']:>6}  {r['ema_recon']:>10.5f}  {r['live_recon']:>10.5f}")
    out = os.path.join(run_dir, "recon_trend.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
