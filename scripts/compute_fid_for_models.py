#!/usr/bin/env python
"""FID vs conditioning-corruption sweep.

Re-creates reference compute_fid_for_models_like_style_gan.py: for a range
of corruption sigmas, perturb shape / expression+jaw / pose of the
conditioning FLAME params (reference :32-56), generate 10k samples, and
report FID per sigma — quantifying how tightly the generator follows its 3D
conditioning.

  python scripts/compute_fid_for_models.py --ckpt runs/0/checkpoint \
      --data dataset.npz --inception_weights resources/inception_fid.npz
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def corrupt_flame(flame: np.ndarray, sigma: float, mode: str, rng) -> np.ndarray:
    """Additive Gaussian corruption of one parameter group
    (reference :32-56: shape, exp+jaw, or pose)."""
    out = flame.copy()
    if sigma == 0:
        return out
    if mode == "shape":
        out[:, 0:100] += rng.standard_normal((len(out), 100)) * sigma
    elif mode == "exp_jaw":
        out[:, 100:150] += rng.standard_normal((len(out), 50)) * sigma
        out[:, 153:156] += rng.standard_normal((len(out), 3)) * sigma * 0.1
    elif mode == "pose":
        out[:, 150:153] += rng.standard_normal((len(out), 3)) * sigma * 0.1
    else:
        raise ValueError(mode)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_id", type=int, default=0)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--converted_ckpt", type=str, default=None)
    p.add_argument("--flame_resources", type=str, default=None)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--inception_weights", type=str, required=False)
    p.add_argument("--n_samples", type=int, default=10_000)
    p.add_argument("--mode", choices=["shape", "exp_jaw", "pose"], default="shape")
    p.add_argument("--sigmas", type=float, nargs="+",
                   default=[0.0, 0.1, 0.2, 0.4, 0.8, 1.0, 1.5, 2.0, 3.0, 5.0])
    p.add_argument("--out", type=str, default="fid_vs_corruption.json")
    p.add_argument("--vocab", type=int, default=69158)
    args = p.parse_args()

    import jax
    from gif_tpu.train import get_config
    from gif_tpu.flame.resources import load_flame_resources
    from gif_tpu.eval.sampling import FlameSampler, random_flame_params
    from gif_tpu.eval import FidComputer, InceptionV3FID
    from gif_tpu.tools.convert_inception import load_converted_params
    from scripts.generate_random_samples import load_params

    cfg = get_config(args.run_id, embedding_vocab_size=args.vocab)
    res = load_flame_resources(args.flame_resources)

    if args.inception_weights and os.path.exists(args.inception_weights):
        inc_params = load_converted_params(args.inception_weights)
    else:
        print("WARNING: random Inception weights — FID values are relative only")
        from gif_tpu.eval.inception import random_fid_params

        inc_params = random_fid_params()
    fid_computer = FidComputer(inc_params)

    dataset_params = None
    real_images = None
    if args.data and os.path.exists(args.data):
        d = np.load(args.data, mmap_mode="r")
        dataset_params = np.asarray(d["flame_params"])
        # Stays uint8 (mem-mapped slice): FidComputer.activations scales
        # per chunk, so the real set never materializes in float.
        real_images = d["images"][: args.n_samples]

    rng = np.random.default_rng(0)
    base = random_flame_params(rng, args.n_samples, dataset_params)
    indices = rng.integers(0, args.vocab, args.n_samples).astype(np.int32)

    g_params, buffers = load_params(args, cfg)
    sampler = FlameSampler(cfg, res, g_params, buffers)

    from gif_tpu.eval.fid import activation_statistics, frechet_distance

    def generated_statistics(flame):
        # Streamed: batches flow straight through Inception, host memory
        # O(batch) — sampler.sample() would hold ~7.9 GB of f32 images
        # (plus the unused condition maps) at the 10k protocol scale.
        acts = []
        for img, n_valid in sampler.sample_batches_device(flame, indices):
            # Device-resident: images feed Inception without leaving the
            # chip; only (batch, 2048) activations come back.
            acts.append(fid_computer.activations_device(img)[:n_valid])
        return activation_statistics(np.concatenate(acts, axis=0))

    if real_images is not None:
        mu_sigma_real = fid_computer.statistics(real_images)
    else:
        # Reference = UNCORRUPTED (sigma=0) generations, computed
        # explicitly — not whatever sigma happens to come first in the
        # sweep list.
        print("WARNING: no real images; using sigma=0 generations as the "
              "reference distribution")
        mu_sigma_real = generated_statistics(
            corrupt_flame(base, 0.0, args.mode, rng)
        )

    results = {}
    for sigma in args.sigmas:
        flame = corrupt_flame(base, sigma, args.mode, rng)
        mu_g, s_g = generated_statistics(flame)
        fid = frechet_distance(*mu_sigma_real, mu_g, s_g)
        results[str(sigma)] = fid
        print(f"sigma {sigma}: FID {fid:.3f}")

    with open(args.out, "w") as f:
        json.dump({"mode": args.mode, "fid": results}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
