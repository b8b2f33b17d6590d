#!/usr/bin/env python
"""Random conditional samples from a trained GIF generator.

Re-creates reference plots/generate_random_samples.py: draw random
shape/exp/pose with dataset-sourced cam/tex/light, eye-centre the camera,
render conditioning maps on-device, generate images, and save images +
conditions + params.

  python scripts/generate_random_samples.py --ckpt runs/0/checkpoint \
      --run_id 0 --n 128 --out_dir samples_out
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_params(args, cfg):
    """CLI-arg adapter over gif_tpu.eval.sampling.load_generator_params."""
    from gif_tpu.eval.sampling import load_generator_params

    return load_generator_params(
        cfg, ckpt=args.ckpt, converted_ckpt=args.converted_ckpt
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_id", type=int, default=0)
    p.add_argument("--ckpt", type=str, default=None, help="Orbax checkpoint dir")
    p.add_argument("--converted_ckpt", type=str, default=None,
                   help="pickle from gif_tpu.tools.convert_checkpoint")
    p.add_argument("--flame_resources", type=str, default=None)
    p.add_argument("--data", type=str, default=None,
                   help="packed dataset npz for real cam/tex/light rows")
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--out_dir", type=str, default="random_samples")
    p.add_argument("--seed", type=int, default=2)
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

    cfg = get_config(args.run_id, embedding_vocab_size=args.vocab,
                     batch_size=args.batch,
                     **(TINY_OVERRIDES if args.tiny else {}))
    res = load_flame_resources(args.flame_resources)

    dataset_params = None
    if args.data and os.path.exists(args.data):
        dataset_params = np.load(args.data)["flame_params"]

    rng = np.random.default_rng(args.seed)
    flame = random_flame_params(rng, args.n, dataset_params)
    indices = rng.integers(0, args.vocab, args.n).astype(np.int32)

    g_params, buffers = load_params(args, cfg)
    sampler = FlameSampler(cfg, res, g_params, buffers, batch_size=args.batch)
    images, conds = sampler.sample(flame, indices)

    save_set_of_images(os.path.join(args.out_dir, "images"), "img_",
                       (images + 1) / 2)
    save_set_of_images(os.path.join(args.out_dir, "conditions"), "cond_",
                       (conds[..., :3] + 1) / 2)
    np.save(os.path.join(args.out_dir, "params.npy"),
            {"flame": flame, "indices": indices}, allow_pickle=True)
    print(f"wrote {args.n} samples to {args.out_dir}")


if __name__ == "__main__":
    main()
