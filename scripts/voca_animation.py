#!/usr/bin/env python
"""VOCA speech-driven face animation (per-identity frame sequences + grid).

Re-creates reference plots/voca/generate_voca_animation.py (:73-140),
generate_voca_gt.py, and make_animation_grid.py:

- ``frames`` mode: drive the generator with a VOCA FLAME sequence (shape
  fixed per sequence with components 3+ zeroed, per-frame expression and
  [global|jaw] pose, zero translation — reference :38-49) for a list of
  identities, each with that identity's fixed light/texture codes; saves
  per-frame ``{i}.png`` (generated), ``mesh_textured_{i}.png`` and
  ``mesh_normal_{i}.png`` (constant-albedo 0.6 display render, :100-113)
  under ``<out>/selected_ids_<id>/``.
- ``--gt`` renders only the mesh frames (generate_voca_gt.py behaviour).
- ``grid`` mode: tile the per-identity animations into a padded 5-column
  grid animation with the textured mesh in the centre cell
  (make_animation_grid.py:8-40), written as GIF (no ffmpeg dependency).

  python scripts/voca_animation.py frames --ckpt runs/0/checkpoint \
      --identities 3 7 --out_dir voca_out
  python scripts/voca_animation.py grid --out_dir voca_out
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_voca_sequence(path: str | None, n_frames: int, seed: int) -> np.ndarray:
    """(T, 236) FLAME parameter sequence from a VOCA npz, or a synthetic
    talking-head stand-in (smooth jaw/expression oscillation)."""
    from gif_tpu import constants as cnst

    if path:
        seqs = np.load(path)
        pose = np.hstack(
            [seqs["frame_pose_params"][:, 0:3], seqs["frame_pose_params"][:, 6:9]]
        )
        shape = np.asarray(seqs["seq_shape_params"], np.float32).copy()
        shape[3:] = 0  # reference :45-46
        t = seqs["frame_exp_params"].shape[0]
        flame = np.zeros((t, 236), np.float32)
        flame[:, 0:100] = shape[None, :100]
        flame[:, 100:150] = seqs["frame_exp_params"][:, :50]
        flame[:, 150:156] = pose
        return flame
    rng = np.random.default_rng(seed)
    t = n_frames
    flame = np.zeros((t, 236), np.float32)
    flame[:, 0:3] = rng.standard_normal(3)[None] * 0.5
    phase = np.linspace(0, 6 * np.pi, t)
    flame[:, 100] = 0.8 * np.sin(phase)  # first expression component
    flame[:, 153] = 0.12 * np.abs(np.sin(phase * 1.7))  # jaw open/close
    return flame


def assemble_grid_frame(cell_images, n_col: int = 5, pad: int = 4) -> np.ndarray:
    """Tile cells row-major with black padding (make_animation_grid.py:23-38);
    shares make_image_grid.stitch."""
    from scripts.make_image_grid import stitch

    n_row = int(np.ceil(len(cell_images) / n_col))
    return stitch(cell_images, n_row, n_col, pad)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["frames", "grid"])
    p.add_argument("--run_id", type=int, default=29)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--converted_ckpt", type=str, default=None)
    p.add_argument("--flame_resources", type=str, default=None)
    p.add_argument("--voca_seq", type=str, default=None,
                   help="VOCA npz (frame_exp_params / frame_pose_params / "
                        "seq_shape_params); default: synthetic sequence")
    p.add_argument("--identities", type=int, nargs="+", default=[0, 1, 2, 3])
    p.add_argument("--n_frames", type=int, default=60)
    p.add_argument("--gt", action="store_true", help="mesh renders only")
    p.add_argument("--out_dir", type=str, default="voca_out")
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--vocab", type=int, default=69158)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.mode == "grid":
        from PIL import Image

        dirs = sorted(glob.glob(os.path.join(args.out_dir, "selected_ids_*")))
        if not dirs:
            raise SystemExit(f"no selected_ids_* dirs under {args.out_dir}")
        n_frames = len(glob.glob(os.path.join(dirs[0], "[0-9]*.png")))
        if n_frames == 0:
            raise SystemExit(
                f"no generated frames under {dirs[0]} — run the 'frames' "
                "mode without --gt first (mesh_* files alone cannot grid)"
            )
        frames = []
        for fi in range(n_frames):
            cells = [
                np.array(Image.open(os.path.join(d, f"{fi}.png")))[..., :3]
                for d in dirs
            ]
            # centre cell shows the driving mesh (make_animation_grid.py:30-32)
            mesh = os.path.join(dirs[0], f"mesh_textured_{fi}.png")
            if os.path.exists(mesh):
                cells.insert(len(cells) // 2, np.array(Image.open(mesh))[..., :3])
            frames.append(Image.fromarray(assemble_grid_frame(cells)))
        from gif_tpu.utils.viz import save_animation

        out = os.path.join(args.out_dir, "voca_selected_ids.gif")
        save_animation(frames, out, fps=args.fps)
        print(f"wrote {n_frames}-frame grid animation to {out}")
        return

    import jax.numpy as jnp

    from gif_tpu.train import get_config
    from gif_tpu.flame.resources import load_flame_resources
    from gif_tpu.flame.camera import position_to_given_location
    from gif_tpu.render.renderer import render_tex_and_normal
    from gif_tpu.eval.sampling import FlameSampler
    from gif_tpu.utils.viz import save_set_of_images, to_uint8
    from gif_tpu import constants as cnst

    cfg = get_config(args.run_id, embedding_vocab_size=args.vocab)
    res = load_flame_resources(args.flame_resources)
    rng = np.random.default_rng(args.seed)

    flame = load_voca_sequence(args.voca_seq, args.n_frames, args.seed)
    flame = np.asarray(position_to_given_location(res, jnp.asarray(flame)))

    sampler = None
    if not args.gt:
        from scripts.generate_random_samples import load_params

        g_params, buffers = load_params(args, cfg)
        sampler = FlameSampler(cfg, res, g_params, buffers, eye_center=False)

    for ident in args.identities:
        out = os.path.join(args.out_dir, f"selected_ids_{ident}")
        # Fixed per-identity light/texture codes (reference pulls them from
        # teaser params.npy per id, :86-91; here: deterministic per id).
        id_rng = np.random.default_rng(1000 + ident)
        flm = flame.copy()
        flm[:, cnst.DECA_IDX["tex"][0] : cnst.DECA_IDX["tex"][1]] = (
            id_rng.standard_normal(50)[None] * 0.5
        )
        lit = np.zeros((9, 3), np.float32)
        lit[0] = 3.0 + 0.3 * id_rng.standard_normal(3)
        flm[:, cnst.DECA_IDX["lit"][0] : cnst.DECA_IDX["lit"][1]] = lit.reshape(-1)[None]

        # Display render: constant albedo 0.6 (reference :104-106).
        maps = render_tex_and_normal(
            res,
            jnp.asarray(flm[:, 0:100]),
            jnp.asarray(flm[:, 100:150]),
            jnp.asarray(flm[:, 150:156]),
            jnp.asarray(flm[:, cnst.DECA_IDX["tex"][0] : cnst.DECA_IDX["tex"][1]]),
            jnp.asarray(flm[:, cnst.DECA_IDX["lit"][0] : cnst.DECA_IDX["lit"][1]]),
            jnp.asarray(flm[:, cnst.DECA_IDX["cam"][0] : cnst.DECA_IDX["cam"][1]]),
            image_size=cfg.max_size,
            constant_albedo=0.6,
        )
        save_set_of_images(out, "mesh_textured_", np.asarray(maps.textured))
        save_set_of_images(out, "mesh_normal_", np.asarray(maps.normal))

        if sampler is not None:
            indices = np.full(len(flm), ident, np.int32)
            images, _ = sampler.sample(flm, indices)
            save_set_of_images(out, "", (images + 1) / 2)
        print(f"identity {ident}: {len(flm)} frames -> {out}")


if __name__ == "__main__":
    main()
