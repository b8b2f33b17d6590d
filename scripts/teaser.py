#!/usr/bin/env python
"""Teaser-figure generation: per identity, sweep each control axis ±3σ.

Re-creates reference plots/teaser/generateteaser_image.py: for each chosen
identity, build a row of FLAME parameter variations — shape ±3σ on the top
PCA components, expression ±3σ, jaw pose, albedo PCA component ±3σ, and the
highest-variance SH lighting component ±3σ — eye-centre the camera, render,
generate, and optionally steal the textures back (the reference's
texture-consistency visual).

  python scripts/teaser.py --ckpt runs/0/checkpoint --out_dir teaser_out
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_variation_rows(base: np.ndarray, sigma: float = 3.0):
    """(236,) base params -> list of (name, (236,) params) axis sweeps."""
    rows = [("mean", base.copy())]
    for comp in range(2):  # top shape components
        for s in (-sigma, sigma):
            v = base.copy()
            v[comp] = s
            rows.append((f"shape{comp}_{s:+.0f}", v))
    for comp in range(2):  # top expression components
        for s in (-sigma, sigma):
            v = base.copy()
            v[100 + comp] = s
            rows.append((f"exp{comp}_{s:+.0f}", v))
    for s in (-0.3, 0.3):  # jaw open/close
        v = base.copy()
        v[153] = abs(s) if s > 0 else 0.0
        v[150 + 1] = s  # head yaw
        rows.append((f"pose_{s:+.1f}", v))
    for s in (-sigma, sigma):  # albedo PCA component 0
        v = base.copy()
        v[159] = s
        rows.append((f"albedo_{s:+.0f}", v))
    for s in (-sigma, sigma):  # dominant lighting band
        v = base.copy()
        v[209 + 2] += s  # highest-variance SH component (reference :146-156)
        rows.append((f"light_{s:+.0f}", v))
    return rows


def load_flame_variation_dir(directory: str):
    """Externally-fit +/-3sigma FLAME variations from shape/exp/pose npz
    subdirectories (reference generate_teaser_photo_gt.py:17-28): each npz
    holds shape_params/exp_params/pose_params; camera is appended as zeros
    and re-solved by the sampler's eye centering."""
    import glob as _glob

    rows = []
    for child in ("exp", "pose", "shape"):
        for f in sorted(_glob.glob(os.path.join(directory, child, "*.npz"))):
            vals = np.load(f, allow_pickle=True)
            p159 = np.hstack(
                [
                    np.asarray(vals["shape_params"]).reshape(-1)[:100],
                    np.asarray(vals["exp_params"]).reshape(-1)[:50],
                    np.asarray(vals["pose_params"]).reshape(-1)[:6],
                    np.zeros(3),
                ]
            ).astype(np.float32)
            name = os.path.basename(f).split(".")[0] + "_" + child
            rows.append((name, p159))
    if not rows:
        raise SystemExit(f"no npz variations under {directory}")
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_id", type=int, default=0)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--converted_ckpt", type=str, default=None)
    p.add_argument("--flame_resources", type=str, default=None)
    p.add_argument("--n_identities", type=int, default=4)
    p.add_argument("--flame_npz_dir", type=str, default=None,
                   help="directory of shape/ exp/ pose/ subdirs of npz FLAME "
                        "fit variations (photo-GT teaser, reference "
                        "plots/teaser/generate_teaser_photo_gt.py:17-28); "
                        "replaces the synthetic axis sweeps")
    p.add_argument("--out_dir", type=str, default="teaser_out")
    p.add_argument("--steal_textures", action="store_true")
    p.add_argument("--vocab", type=int, default=69158)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="32px/16ch smoke config (CPU e2e runs; pair with "
                        "--flame_resources synthetic_small)")
    args = p.parse_args()

    import jax.numpy as jnp

    from gif_tpu.train import get_config
    from gif_tpu.train.config import TINY_OVERRIDES
    from gif_tpu.flame.resources import load_flame_resources
    from gif_tpu.eval.sampling import FlameSampler, random_flame_params
    from gif_tpu.utils.viz import save_set_of_images
    from scripts.generate_random_samples import load_params

    cfg = get_config(args.run_id, embedding_vocab_size=args.vocab,
                     **(TINY_OVERRIDES if args.tiny else {}))
    res = load_flame_resources(args.flame_resources)
    g_params, buffers = load_params(args, cfg)
    # Eye-centering is applied HERE (host-side) rather than inside the
    # sampler, so the `flame` rows below carry the SAME camera the images
    # were generated under — the texture steal projects with that camera,
    # and a stale pre-centering cam would sample misaligned pixels
    # (landmark_overlay.py uses the same pattern).
    from gif_tpu.flame.camera import position_to_given_location

    sampler = FlameSampler(
        cfg, res, g_params, buffers, batch_size=8, eye_center=False
    )

    ext_rows = None
    if args.flame_npz_dir:
        ext_rows = load_flame_variation_dir(args.flame_npz_dir)

    rng = np.random.default_rng(args.seed)
    for ident in range(args.n_identities):
        base = random_flame_params(rng, 1)[0]
        if ext_rows is not None:
            rows = []
            for name, p159 in ext_rows:
                v = base.copy()
                v[:159] = p159[:159]
                rows.append((name, v))
        else:
            rows = build_variation_rows(base)
        flame = np.stack([r[1] for r in rows])
        flame = np.asarray(position_to_given_location(res, jnp.asarray(flame)))
        idx = np.full(len(rows), rng.integers(0, args.vocab), np.int32)
        images, conds = sampler.sample(flame, idx)
        d = os.path.join(args.out_dir, f"identity_{ident}")
        save_set_of_images(d, "img_", (images + 1) / 2)
        save_set_of_images(d, "cond_", (conds[..., :3] + 1) / 2)
        with open(os.path.join(d, "rows.txt"), "w") as f:
            f.write("\n".join(name for name, _ in rows))

        if args.steal_textures:
            from gif_tpu.models import flame_texture_space

            tex, vis = flame_texture_space(
                res, jnp.asarray(images), jnp.asarray(flame[:, :159])
            )
            save_set_of_images(
                d, "texture_", np.asarray((tex + 1) / 2 * vis)
            )
    print(f"wrote {args.n_identities} teaser rows to {args.out_dir}")


if __name__ == "__main__":
    main()
