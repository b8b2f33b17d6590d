#!/usr/bin/env python
"""Project FLAME landmarks onto rendered/generated images.

The runnable counterpart of the reference's DECA re-inference check
(tests/deca_inf_vs_given_cond_landmark_viz.py:40-80 — its DECA import is
absent upstream): decode each FLAME parameter vector with the full
``(verts, lmk2d, lmk3d)`` contract, project the landmarks with the
orthographic camera, and draw them over the condition render (and the
generated image when a checkpoint is given).  With an external landmark
file (e.g. re-inferred fits) it also reports the mean pixel re-inference
error, the paper's metric.

  python scripts/landmark_overlay.py --n 8 --out_dir lmk_out
  python scripts/landmark_overlay.py --ckpt runs/0/checkpoint \
      --reinferred other_fits.npy --out_dir lmk_out
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def project_landmarks(res, flame: np.ndarray, image_size: int) -> np.ndarray:
    """(N, 236) FLAME params -> (N, 68, 2) pixel-space dynamic-contour
    landmarks (the lmk2d set), using the same camera/flip convention as the
    renderer."""
    import jax.numpy as jnp

    from gif_tpu.flame.decoder import flame_decode_full
    from gif_tpu.flame.camera import batch_orth_proj

    f = jnp.asarray(flame)
    _, lmk2d, _ = flame_decode_full(res, f[:, 0:100], f[:, 100:150], f[:, 150:156])
    proj = batch_orth_proj(lmk2d, f[:, 156:159])
    proj = proj.at[:, :, 1].multiply(-1.0)  # renderer's y flip
    xy = np.asarray(proj[:, :, :2])
    return (xy + 1.0) * (image_size / 2.0)


def draw_points(img_u8: np.ndarray, pts: np.ndarray, radius: int = 1) -> np.ndarray:
    """Stamp green squares at pixel points (no drawing deps needed)."""
    out = img_u8.copy()
    h, w = out.shape[:2]
    for x, y in pts:
        xi, yi = int(round(x)), int(round(y))
        if 0 <= xi < w and 0 <= yi < h:
            y0, y1 = max(0, yi - radius), min(h, yi + radius + 1)
            x0, x1 = max(0, xi - radius), min(w, xi + radius + 1)
            out[y0:y1, x0:x1] = (0, 255, 0)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_id", type=int, default=0)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--converted_ckpt", type=str, default=None)
    p.add_argument("--flame_resources", type=str, default=None)
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--reinferred", type=str, default=None,
                   help="npy of (N, 236) re-inferred FLAME fits to score "
                        "against (mean landmark pixel error)")
    p.add_argument("--out_dir", type=str, default="lmk_out")
    p.add_argument("--vocab", type=int, default=69158)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from PIL import Image

    from gif_tpu.train import get_config
    from gif_tpu.flame.resources import load_flame_resources
    from gif_tpu.flame.camera import position_to_given_location
    from gif_tpu.eval.sampling import (
        FlameSampler,
        load_generator_params,
        random_flame_params,
    )
    from gif_tpu.utils.viz import to_uint8
    import jax.numpy as jnp

    cfg = get_config(args.run_id, embedding_vocab_size=args.vocab)
    res = load_flame_resources(args.flame_resources)
    rng = np.random.default_rng(args.seed)
    flame = random_flame_params(rng, args.n)
    flame = np.asarray(position_to_given_location(res, jnp.asarray(flame)))

    g_params, buffers = load_generator_params(
        cfg, ckpt=args.ckpt, converted_ckpt=args.converted_ckpt
    )
    sampler = FlameSampler(cfg, res, g_params, buffers, eye_center=False)
    indices = rng.integers(0, args.vocab, args.n).astype(np.int32)
    images, conds = sampler.sample(flame, indices)

    pts = project_landmarks(res, flame, cfg.max_size)
    os.makedirs(args.out_dir, exist_ok=True)
    imgs_u8 = to_uint8(images)
    conds_u8 = to_uint8(conds[..., :3])
    for i in range(args.n):
        Image.fromarray(draw_points(imgs_u8[i], pts[i])).save(
            os.path.join(args.out_dir, f"lmk_face_{i}.png")
        )
        Image.fromarray(draw_points(conds_u8[i], pts[i])).save(
            os.path.join(args.out_dir, f"lmk_render_{i}.png")
        )

    if args.reinferred:
        other = np.load(args.reinferred).astype(np.float32)[: args.n]
        pts_other = project_landmarks(res, other, cfg.max_size)
        err = np.linalg.norm(pts - pts_other, axis=-1).mean()
        print(f"mean landmark re-inference error: {err:.2f} px")
    print(f"wrote {args.n} overlays to {args.out_dir}")


if __name__ == "__main__":
    main()
