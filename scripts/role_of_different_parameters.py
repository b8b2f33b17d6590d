#!/usr/bin/env python
"""Figure-3 style parameter-swap columns.

Re-creates reference plots/role_of_different_parameters.py: take FLAME
vectors in pairs and progressively copy shape / +expression / +pose /
+texture from the second into the first (reference :21-46), rendering and
generating each stage to show which image factors each parameter controls.

  python scripts/role_of_different_parameters.py --n_pairs 8 --out_dir fig3
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def interchange_params_and_make_batch(flame1, flame2):
    """Rows: [flm1, shape<-2, +exp<-2, +pose<-2, +tex<-2, flm2]
    (reference :21-46 progressive copy order)."""
    rows = [flame1.copy()]
    cur = flame1.copy()
    cur[0:100] = flame2[0:100]
    rows.append(cur.copy())
    cur[100:150] = flame2[100:150]
    rows.append(cur.copy())
    cur[150:156] = flame2[150:156]
    rows.append(cur.copy())
    cur[159:209] = flame2[159:209]
    rows.append(cur.copy())
    rows.append(flame2.copy())
    return np.stack(rows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_id", type=int, default=0)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--converted_ckpt", type=str, default=None)
    p.add_argument("--flame_resources", type=str, default=None)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--n_pairs", type=int, default=8)
    p.add_argument("--out_dir", type=str, default="fig3_out")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--vocab", type=int, default=69158)
    p.add_argument("--tiny", action="store_true",
                   help="32px/16ch smoke config (CPU e2e runs; pair with "
                        "--flame_resources synthetic_small)")
    args = p.parse_args()

    from gif_tpu.train import get_config
    from gif_tpu.train.config import TINY_OVERRIDES
    from gif_tpu.flame.resources import load_flame_resources
    from gif_tpu.eval.sampling import FlameSampler, random_flame_params
    from gif_tpu.utils.viz import save_set_of_images
    from scripts.generate_random_samples import load_params

    cfg = get_config(args.run_id, embedding_vocab_size=args.vocab, batch_size=6,
                     **(TINY_OVERRIDES if args.tiny else {}))
    res = load_flame_resources(args.flame_resources)

    dataset_params = None
    if args.data and os.path.exists(args.data):
        dataset_params = np.load(args.data)["flame_params"]

    rng = np.random.default_rng(args.seed)
    g_params, buffers = load_params(args, cfg)
    sampler = FlameSampler(cfg, res, g_params, buffers, batch_size=6)

    for b in range(args.n_pairs):
        f2 = random_flame_params(rng, 2, dataset_params)
        batch = interchange_params_and_make_batch(f2[0], f2[1])
        idx = np.full(len(batch), rng.integers(0, args.vocab), np.int32)
        images, conds = sampler.sample(batch, idx)
        d = os.path.join(args.out_dir, f"pair_{b}")
        save_set_of_images(d, "img_", (images + 1) / 2)
        save_set_of_images(d, "rndr_", (conds[..., :3] + 1) / 2)
        if conds.shape[-1] > 3:
            save_set_of_images(d, "norm_", (conds[..., 3:6] + 1) / 2)
    print(f"wrote {args.n_pairs} swap columns to {args.out_dir}")


if __name__ == "__main__":
    main()
