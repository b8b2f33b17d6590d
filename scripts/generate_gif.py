#!/usr/bin/env python
"""Animate a FLAME parameter sequence into a GIF/MP4.

Re-creates reference my_utils/generate_gif.py: interpolate between FLAME
keyframes (or play a given sequence, e.g. VOCA speech), render + generate
each frame with a fixed identity, and write an animation
(``get_gif_from_list_of_params``, reference :188-234).

  python scripts/generate_gif.py --ckpt runs/0/checkpoint --out face.gif
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def interpolate_keyframes(keys: np.ndarray, steps_per_seg: int) -> np.ndarray:
    """Linear interpolation through keyframe rows (reference
    interpolate_FFHQ, :237-310 uses linear walks through attribute space)."""
    segs = []
    for a, b in zip(keys[:-1], keys[1:]):
        t = np.linspace(0, 1, steps_per_seg, endpoint=False)[:, None]
        segs.append(a[None] * (1 - t) + b[None] * t)
    segs.append(keys[-1:][None][0])
    return np.concatenate(segs, axis=0)


def save_animation(frames_uint8, path, fps=15):
    from gif_tpu.utils.viz import save_animation as _save

    _save(frames_uint8, path, fps=fps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_id", type=int, default=0)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--converted_ckpt", type=str, default=None)
    p.add_argument("--flame_resources", type=str, default=None)
    p.add_argument("--sequence", type=str, default=None,
                   help="npy of (T, 236) FLAME params (e.g. VOCA); default: "
                        "random keyframe interpolation")
    p.add_argument("--n_keyframes", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--identity", type=int, default=0)
    p.add_argument("--out", type=str, default="animation.gif")
    p.add_argument("--vocab", type=int, default=69158)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="32px/16ch smoke config (CPU e2e runs; pair with "
                        "--flame_resources synthetic_small)")
    args = p.parse_args()

    from gif_tpu.train import get_config
    from gif_tpu.train.config import TINY_OVERRIDES
    from gif_tpu.flame.resources import load_flame_resources
    from gif_tpu.eval.sampling import FlameSampler, random_flame_params
    from gif_tpu.utils.viz import to_uint8
    from scripts.generate_random_samples import load_params

    cfg = get_config(args.run_id, embedding_vocab_size=args.vocab,
                     **(TINY_OVERRIDES if args.tiny else {}))
    res = load_flame_resources(args.flame_resources)

    if args.sequence:
        seq = np.load(args.sequence).astype(np.float32)
    else:
        rng = np.random.default_rng(args.seed)
        keys = random_flame_params(rng, args.n_keyframes)
        seq = interpolate_keyframes(keys, args.steps)

    indices = np.full(len(seq), args.identity, np.int32)
    g_params, buffers = load_params(args, cfg)
    sampler = FlameSampler(cfg, res, g_params, buffers)
    images, _ = sampler.sample(seq, indices)
    save_animation(to_uint8(images), args.out)
    print(f"wrote {len(seq)}-frame animation to {args.out}")


if __name__ == "__main__":
    main()
