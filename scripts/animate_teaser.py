#!/usr/bin/env python
"""Animated teaser: smoothly sweep each control axis for one identity.

Re-creates reference plots/video/animate_teaser/generate_teaser_photo_frames
.py + videomaker.py: for a fixed identity, animate each control axis in turn
(shape PCA, expression PCA, jaw pose, albedo PCA, SH light) through a
-sigma -> +sigma -> back sweep, generating one frame per step, and write the
concatenated sequence as a GIF next to the per-frame PNGs (the reference
pipes frames through ffmpeg; frames are kept so any video tool can re-encode
them).

  python scripts/animate_teaser.py --ckpt runs/0/checkpoint --out_dir anim
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sweep_axis(base: np.ndarray, dim: int, sigma: float, steps: int) -> np.ndarray:
    """(T, 236): base with params[dim] swept 0 -> +s -> -s -> 0 (cosine)."""
    t = np.linspace(0, 2 * np.pi, steps, endpoint=False)
    vals = sigma * np.sin(t)
    out = np.repeat(base[None], steps, axis=0)
    out[:, dim] = vals
    return out


def build_sweep_sequence(base: np.ndarray, sigma: float, steps: int) -> np.ndarray:
    """Concatenated axis sweeps (the teaser's rows, animated): top-2 shape,
    top-2 expression, jaw, top albedo component, strongest light band."""
    from gif_tpu import constants as cnst

    segs = [
        sweep_axis(base, 0, sigma, steps),
        sweep_axis(base, 1, sigma, steps),
        sweep_axis(base, 100, sigma, steps),
        sweep_axis(base, 101, sigma, steps),
    ]
    jaw = np.repeat(base[None], steps, axis=0)
    jaw[:, 153] = 0.15 * (1 - np.cos(np.linspace(0, 2 * np.pi, steps)))
    segs.append(jaw)
    segs.append(sweep_axis(base, cnst.DECA_IDX["tex"][0], sigma, steps))
    segs.append(sweep_axis(base, cnst.DECA_IDX["lit"][0] + 3, sigma, steps))
    return np.concatenate(segs, axis=0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_id", type=int, default=0)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--converted_ckpt", type=str, default=None)
    p.add_argument("--flame_resources", type=str, default=None)
    p.add_argument("--identity", type=int, default=0)
    p.add_argument("--steps", type=int, default=24, help="frames per axis sweep")
    p.add_argument("--sigma", type=float, default=2.0)
    p.add_argument("--out_dir", type=str, default="teaser_anim")
    p.add_argument("--fps", type=int, default=15)
    p.add_argument("--vocab", type=int, default=69158)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from gif_tpu.train import get_config
    from gif_tpu.flame.resources import load_flame_resources
    from gif_tpu.eval.sampling import FlameSampler
    from gif_tpu.utils.viz import save_set_of_images, to_uint8
    from gif_tpu import constants as cnst
    from scripts.generate_random_samples import load_params
    from PIL import Image

    cfg = get_config(args.run_id, embedding_vocab_size=args.vocab)
    res = load_flame_resources(args.flame_resources)
    rng = np.random.default_rng(args.seed)

    base = np.zeros(236, np.float32)
    base[cnst.DECA_IDX["lit"][0]: cnst.DECA_IDX["lit"][0] + 3] = 3.0
    base[cnst.DECA_IDX["tex"][0]: cnst.DECA_IDX["tex"][1]] = (
        rng.standard_normal(50) * 0.3
    )
    seq = build_sweep_sequence(base, args.sigma, args.steps)
    indices = np.full(len(seq), args.identity, np.int32)

    g_params, buffers = load_params(args, cfg)
    sampler = FlameSampler(cfg, res, g_params, buffers)
    images, conds = sampler.sample(seq, indices)

    save_set_of_images(os.path.join(args.out_dir, "frames"), "", (images + 1) / 2)
    save_set_of_images(
        os.path.join(args.out_dir, "renders"), "mesh_", (conds[..., :3] + 1) / 2
    )
    from gif_tpu.utils.viz import save_animation

    gif = os.path.join(args.out_dir, "teaser_animation.gif")
    save_animation(to_uint8(images), gif, fps=args.fps)
    print(f"wrote {len(seq)} frames + {gif}")


if __name__ == "__main__":
    main()
