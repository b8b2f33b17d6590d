#!/usr/bin/env python
"""Train GIF on TPU.

The reference entry point re-created (reference train.py:306-403):

    python train.py --run_id 0 --data /path/to/dataset.npz

With no --data, a synthetic dataset is used (smoke runs / benchmarking).
FID needs converted Inception weights (--inception_weights); without them
training still runs, logging NaN FID like the reference's --debug mode.
"""

import argparse
import faulthandler
import os

import numpy as np

# The axon tunnel can drop an RPC and leave the client futex-waiting
# forever (observed twice during round-5 longitudinal relaunches: host CPU
# time frozen, main thread in futex_do_wait, epoll thread idle).  Dump all
# thread stacks to stderr every 20 min so a hung launch.log shows WHERE it
# is stuck instead of just going silent.
faulthandler.dump_traceback_later(1200, repeat=True)


def main():
    p = argparse.ArgumentParser(description="GIF TPU training")
    p.add_argument("--run_id", type=int, default=0, help="preset id: 0/3/7/8/29")
    p.add_argument("--data", type=str, default=None, help="packed dataset .npz")
    p.add_argument("--flame_resources", type=str, default=None)
    p.add_argument("--out_dir", type=str, default="runs")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--total_iters", type=int, default=3_000_000)
    p.add_argument("--inception_weights", type=str, default=None,
                   help="npz of converted InceptionV3 FID weights, or "
                        "'random' for a random-init net (relative FID; "
                        "exercises the eval path without licensed weights)")
    p.add_argument("--fid_every", type=int, default=None,
                   help="override the preset FID cadence")
    p.add_argument("--checkpoint_every", type=int, default=None,
                   help="override the preset checkpoint cadence")
    p.add_argument("--converted_ckpt", type=str, default=None,
                   help="converted reference .model pickle "
                        "(tools/convert_checkpoint.py) to warm-start from; "
                        "the reference's fine-tune path (run_id 29)")
    p.add_argument("--no_mesh", action="store_true", help="single device")
    p.add_argument("--debug", action="store_true",
                   help="tiny synthetic setup for smoke testing")
    p.add_argument("--multihost", action="store_true",
                   help="join the multi-process JAX runtime (TPU pods: "
                        "auto-detected; reference analog: the DataParallel "
                        "boundary at train.py:344)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator address for explicit multi-process "
                        "runs (host:port)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--seed", type=int, default=None,
                   help="RNG/data-stream seed (default: run_id) — for "
                        "controlled experiments")
    p.add_argument("--fid_n_samples", type=int, default=10_000)
    p.add_argument("--fid_real_samples", type=int, default=50_000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--synthetic_images", choices=("noise", "renders"),
                   default="noise",
                   help="no-data image source: 'noise' (uniform frames; "
                        "throughput work) or 'renders' (FLAME renders over "
                        "procedural backgrounds — a learnable target, so "
                        "smoke runs show real adversarial dynamics)")
    p.add_argument("--synthetic_n", type=int, default=256,
                   help="synthetic dataset size. At 256 the discriminator "
                        "memorizes the set within a few hundred steps "
                        "(d_loss -> 0, g_loss spikes, FID rises — the r4 "
                        "longitudinal pathology); thousands of images keep "
                        "the adversarial game honest")
    p.add_argument("--r1_weight", type=float, default=None,
                   help="override the preset R1 gamma. StyleGAN2 practice "
                        "tunes gamma per dataset; the reference's 5.0 is "
                        "its FFHQ value — on low-entropy synthetic probes "
                        "D overpowers G at that strength (d_loss -> 1e-2, "
                        "limit cycles, EMA FID rises)")
    p.add_argument("--r1_interval", type=int, default=None,
                   help="override the preset lazy-R1 cadence (reference: "
                        "every 16, train.py:145)")
    p.add_argument("--d_input_noise", type=float, default=None,
                   help="instance-noise std on all D inputs (real AND "
                        "fake, fresh draw per evaluation) — stabilizer "
                        "for probe datasets whose reals are an exact "
                        "function of the condition, where D wins by "
                        "thresholding |image - condition| and R1 cannot "
                        "stop it (a saturated D has ~zero gradient at the "
                        "reals). 0/off = the reference recipe")
    args = p.parse_args()

    if args.multihost or args.coordinator:
        from gif_tpu.parallel import initialize_distributed

        initialize_distributed(
            args.coordinator, args.num_processes, args.process_id
        )

    import jax

    from gif_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from jax.sharding import Mesh

    from gif_tpu.train import get_config
    from gif_tpu.train.loop import train
    from gif_tpu.flame.resources import load_flame_resources, synthetic_flame_resources
    from gif_tpu.data.pipeline import SyntheticFlameDataset, load_packed_dataset

    if args.debug:
        cfg = get_config(
            args.run_id,
            embedding_vocab_size=64,
            max_size=32,
            init_size=32,
            render_image_size=32,
            batch_size=min(args.batch_size, 8),
            # Capped channels + short mapping: XLA:CPU executes per-sample
            # modulated-conv grads serially, so the full 512-ch model takes
            # minutes/step on host; smoke runs must stay interactive.
            max_channels=32,
            nmlp_for_z_to_w=2,
            compute_dtype="float32",
        )
        res = synthetic_flame_resources(seed=1, n_vertices=503)
        if args.synthetic_images == "renders":
            from gif_tpu.data.pipeline import SyntheticRenderDataset

            dataset = SyntheticRenderDataset(res, n=64, size=32)
        else:
            dataset = SyntheticFlameDataset(n=64, size=32)
    else:
        res = load_flame_resources(args.flame_resources)
        if args.data:
            dataset = load_packed_dataset(args.data)
        elif args.synthetic_images == "renders":
            from gif_tpu.data.pipeline import SyntheticRenderDataset

            print("WARNING: no --data given; training on synthetic renders")
            dataset = SyntheticRenderDataset(res, n=args.synthetic_n, size=256)
        else:
            print("WARNING: no --data given; training on synthetic images")
            dataset = SyntheticFlameDataset(n=args.synthetic_n, size=256)
        cfg = get_config(
            args.run_id,
            batch_size=args.batch_size,
            embedding_vocab_size=len(dataset),
        )

    if (
        args.fid_every
        or args.checkpoint_every
        or args.r1_weight is not None
        or args.r1_interval is not None
        or args.d_input_noise is not None
    ):
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            fid_every=args.fid_every or cfg.fid_every,
            checkpoint_every=args.checkpoint_every or cfg.checkpoint_every,
            r1_weight=(
                cfg.r1_weight if args.r1_weight is None else args.r1_weight
            ),
            r1_interval=(
                cfg.r1_interval if args.r1_interval is None else args.r1_interval
            ),
            d_input_noise_std=(
                cfg.d_input_noise_std
                if args.d_input_noise is None
                else args.d_input_noise
            ),
        )

    fid_computer = None
    if args.inception_weights == "random":
        # He-initialized random Inception: FID becomes a *relative* metric
        # (consistent ordering; see random_fid_params for why the default
        # init does NOT work); exercises the full eval path without the
        # licensed weight file.
        from gif_tpu.eval import FidComputer
        from gif_tpu.eval.inception import random_fid_params

        fid_computer = FidComputer(
            random_fid_params(), stats_dir=os.path.join(args.out_dir, "fid_stats")
        )
    elif args.inception_weights and not os.path.exists(args.inception_weights):
        # Loud, not silent: a typo'd path would otherwise train for days
        # logging NaN FID with no indication the flag was dropped.
        raise SystemExit(
            f"--inception_weights {args.inception_weights} does not exist"
        )
    elif args.inception_weights:
        import jax.numpy as jnp
        from gif_tpu.eval import FidComputer
        from gif_tpu.tools.convert_inception import load_converted_params

        params = load_converted_params(args.inception_weights)
        fid_computer = FidComputer(
            params, stats_dir=os.path.join(args.out_dir, "fid_stats")
        )

    # Architecture graph dumps at startup (reference train.py:339-342,
    # 354-355 draws G/D graphs via graph_writer); process 0 only.
    if jax.process_index() == 0:
        try:
            import jax.numpy as jnp
            from gif_tpu.train.state import build_models
            from gif_tpu.utils.graph import draw

            gen, disc = build_models(cfg)
            size = cfg.max_size
            os.makedirs(args.out_dir, exist_ok=True)
            draw(
                gen,
                os.path.join(args.out_dir, f"generator_run{args.run_id}.txt"),
                jnp.zeros((1, size, size, cfg.cond_channels)),
                input_indices=jnp.zeros((1,), jnp.int32),
                step=cfg.max_step,
            )
            draw(
                disc,
                os.path.join(args.out_dir, f"discriminator_run{args.run_id}.txt"),
                jnp.zeros((1, size, size, 3)),
                jnp.zeros((1, size, size, cfg.cond_channels)),
            )
        except Exception as e:  # non-fatal, like the reference's viz
            print(f"graph dump skipped: {e}")

    n_dev = len(jax.devices())
    mesh = None
    if not args.no_mesh and n_dev > 1:
        from gif_tpu.parallel.mesh import choose_data_mesh_size

        # The interp loss pairs interpolants within a shard: keep >=3
        # samples per device.  Single-process geometry shrinks; multihost
        # geometry must span all global devices and raises when it can't
        # (see choose_data_mesh_size).
        min_per_shard = 3 if cfg.apply_texture_space_interpolation_loss else 1
        use = choose_data_mesh_size(
            cfg.batch_size, n_dev, jax.process_count(), min_per_shard
        )
        if use > 1:
            mesh = Mesh(np.array(jax.devices()[:use]), ("data",))
            print(f"data-parallel mesh over {use} devices")

    if args.converted_ckpt and not os.path.exists(args.converted_ckpt):
        raise SystemExit(f"--converted_ckpt {args.converted_ckpt} does not exist")
    train(
        cfg,
        dataset,
        res,
        args.out_dir,
        total_iters=args.total_iters,
        mesh=mesh,
        fid_computer=fid_computer,
        converted_ckpt=args.converted_ckpt,
        seed=args.seed,
        fid_n_samples=args.fid_n_samples,
        fid_real_samples=args.fid_real_samples,
        log_every=args.log_every,
    )


if __name__ == "__main__":
    main()
