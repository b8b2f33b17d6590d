#!/usr/bin/env python
"""Inspect training batches: real image next to its on-device FLAME render.

Re-creates reference plots/show_trainig_data.py / tests/viz_data_loader.py:
pulls batches through the exact training input path (dataset -> native
assembly -> on-device render of the conditioning maps) and writes
side-by-side grids, the quickest way to eyeball data/label alignment.

  python scripts/show_training_data.py --data data/ffhq256/dataset.npz
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_id", type=int, default=0)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--flame_resources", type=str, default=None)
    p.add_argument("--n_batches", type=int, default=2)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out_dir", type=str, default="data_viz")
    args = p.parse_args()

    import jax.numpy as jnp

    from gif_tpu.train import get_config
    from gif_tpu.train.step import render_condition_maps
    from gif_tpu.flame.resources import load_flame_resources
    from gif_tpu.data.pipeline import SyntheticFlameDataset, load_packed_dataset, data_iterator
    from gif_tpu.utils.viz import make_grid, to_uint8, save_png

    res = load_flame_resources(args.flame_resources)
    if args.data:
        ds = load_packed_dataset(args.data)
    else:
        print("no --data; showing the synthetic dataset")
        ds = SyntheticFlameDataset(n=64, size=256)
    cfg = get_config(args.run_id, embedding_vocab_size=len(ds),
                     batch_size=args.batch)

    it = data_iterator(ds, args.batch)
    os.makedirs(args.out_dir, exist_ok=True)
    for b in range(args.n_batches):
        batch = next(it)
        cond = np.asarray(
            render_condition_maps(res, jnp.asarray(batch["flame"]), cfg)
        )
        row = np.concatenate(
            [batch["real_image"], cond[..., :3]]
            + ([cond[..., 3:6]] if cond.shape[-1] > 3 else []),
            axis=2,
        )  # side by side per sample
        grid = make_grid(to_uint8(row), rows=args.batch, cols=1)
        save_png(os.path.join(args.out_dir, f"batch_{b}.png"), grid)
    print(f"wrote {args.n_batches} grids to {args.out_dir}")


if __name__ == "__main__":
    main()
