"""The training loop: data -> sharded step -> metrics / FID / checkpoints.

Mirrors the reference loop's observable behavior (train.py:28-303): FID on
10k accumulated FLAME params every ``fid_every`` iters, a 10x5 sample grid
with FID in the filename, checkpoints every ``checkpoint_every`` iters, and
a running status line — with structured CSV metrics on top (SURVEY.md §5.5).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gif_tpu.train.config import TrainConfig
from gif_tpu.train.state import create_train_state
from gif_tpu.train.step import make_train_step
from gif_tpu.train.checkpoint import CheckpointManager
from gif_tpu.data.pipeline import FlameDataset, data_iterator
from gif_tpu.eval.sampling import FlameSampler
from gif_tpu.utils.viz import VisualizationSaver


class MetricsLogger:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._wrote_header = os.path.exists(path)

    def log(self, step: int, metrics: dict):
        row = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if not self._wrote_header:
                w.writeheader()
                self._wrote_header = True
            w.writerow(row)


def train(
    cfg: TrainConfig,
    dataset: FlameDataset,
    res,
    out_dir: str,
    total_iters: int = 3_000_000,
    mesh: Optional[Mesh] = None,
    fid_computer=None,
    resume: bool = True,
    log_every: int = 50,
    fid_n_samples: int = 10_000,
    fid_real_samples: int = 50_000,
    converted_ckpt: Optional[str] = None,
    seed: Optional[int] = None,
):
    """Run training.  ``out_dir`` gets checkpoint/{run_id}, sample/{run_id},
    metrics.csv."""
    if cfg.apply_texture_space_interpolation_loss and (
        getattr(dataset, "horizontal_flip", False)
        or getattr(dataset, "random_crop", False)
    ):
        raise ValueError(
            "flip/crop augmentation invalidates the FLAME labels "
            "(dataset_loaders.py:314-327) that the texture-interpolation "
            "loss consumes; disable the augmentation or the loss"
        )
    from gif_tpu.parallel import host_local_tree, replicate, shard_batch

    # Multi-process (multi-host / DCN) layout: every process runs this same
    # loop SPMD; each feeds its LOCAL slice of the global batch and only
    # process 0 owns checkpoints, metrics, FID, and figures (the TPU-native
    # mapping of the reference's single-host DataParallel boundary,
    # train.py:344,356-358; exercised by tests/test_multiprocess.py).
    nproc = jax.process_count()
    is_main = jax.process_index() == 0
    if cfg.batch_size % nproc:
        raise ValueError(
            f"global batch {cfg.batch_size} not divisible by "
            f"{nproc} processes"
        )
    local_bs = cfg.batch_size // nproc

    run_dir = os.path.join(out_dir, str(cfg.run_id))
    ckpt = CheckpointManager(
        os.path.join(run_dir, "checkpoint"), save_every=cfg.checkpoint_every
    )
    logger = MetricsLogger(os.path.join(run_dir, "metrics.csv")) if is_main else None
    viz = VisualizationSaver(run_dir, cfg.run_id) if is_main else None

    # ``seed`` (default run_id) decouples the RNG/data streams from the
    # preset for controlled experiments (e.g. the raster-sensitivity
    # noise-floor arm, scripts/raster_sensitivity.py).
    seed = cfg.run_id if seed is None else seed
    state = create_train_state(cfg, jax.random.PRNGKey(seed))
    if converted_ckpt is not None and ckpt.latest_step() is None:
        # Fine-tune warm start from a converted reference ``.model``
        # (reference run_id-29 path, configurations.py:232-241); an existing
        # Orbax checkpoint in run_dir takes precedence over re-seeding.
        from gif_tpu.train.state import warm_start_from_converted

        state = warm_start_from_converted(state, converted_ckpt)
        if is_main:
            print(f"warm-started params from {converted_ckpt}")
    if resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        if is_main:
            print(f"restored checkpoint at step {int(state.step)}")

    step_fn = make_train_step(cfg, res, mesh=mesh, donate=True)
    if mesh is not None:
        state = replicate(state, mesh)

    start = int(state.step)
    # Counter-based batches + start_step make a resumed run replay exactly
    # the uninterrupted stream (tests/test_loop.py); the process index in
    # the seed gives each host an independent stream.
    it = data_iterator(
        dataset,
        local_bs,
        seed=(seed, jax.process_index()),
        start_step=start,
    )
    rng_key = jax.random.PRNGKey(1234 + seed)
    fid = float("nan")
    recon = float("nan")
    t_last = time.perf_counter()

    def run_eval(i):
        """FID + pixel-recon sweep on the EMA generator; ``i`` is the loop
        index (the artifacts are stamped ``i + 1``; ``-1`` = before any
        training step — the untrained baseline every later measurement is
        judged against)."""
        nonlocal fid, recon, t_last
        flame_10k, idx_10k = dataset.get_10k_flame_params()
        if nproc > 1:
            # Host-side allgather (SURVEY §5.8): pool every process's
            # accumulated TRUE fits so the FID conditioning protocol
            # sees the global stream, then evaluate on process 0 only.
            from gif_tpu.parallel.collectives import allgather_rows

            flame_10k, idx_10k = allgather_rows(
                (flame_10k, idx_10k), max_rows=fid_n_samples
            )
        flame_10k = flame_10k[:fid_n_samples]
        idx_10k = idx_10k[: len(flame_10k)]
        if is_main:
            # Replicated EMA params are addressable on this host; pull
            # them local so sampling stays collective-free while the
            # other processes wait at the next step's all-reduce.
            sampler = FlameSampler(
                cfg, res,
                host_local_tree(state.g_ema_params),
                host_local_tree(state.buffers),
                batch_size=min(cfg.batch_size, 16), eye_center=False,
            )
            # Streamed: generated batches flow straight through
            # Inception, keeping only 2048-d activations — host memory
            # O(batch), not O(10k images).  Real stats: cached per
            # resolution (compute_fid.py:26-46); on a cache miss they
            # come from up to 50k real frames like the reference
            # protocol (compute_fid.py:42).  The uint8 frames are
            # passed as-is (mem-mapped) and scaled per batch inside the
            # Inception sweep, so the 50k pass never materializes in
            # f32 either.
            fid = fid_computer.get_fid_streaming(
                sampler.sample_batches_device(flame_10k, idx_10k),
                real_images01=dataset.images[:fid_real_samples],
            )
            if getattr(dataset, "conditionally_exact", False):
                # Pixel-space progress metric: on datasets whose every
                # frame is a deterministic function of its own
                # conditioning (SyntheticRenderDataset), the EMA
                # generator's reconstruction MSE against ground truth is
                # direct evidence training improves the model — immune
                # to single-eval FID phase noise
                # (docs/experiments/fid_dynamics_r05.md).
                k = min(64, len(dataset))
                gt = (
                    dataset.images[:k].astype(np.float32) / 255.0
                ) * 2.0 - 1.0
                out = sampler.sample(
                    np.asarray(dataset.flame_params[:k], np.float32),
                    np.arange(k, dtype=np.int32),
                )[0]
                recon = float(np.mean((out - gt) ** 2))
            if viz.flame_params is None:
                viz.set_flame_params(flame_10k[:50], idx_10k[:50])
            viz.save_samples(
                i,
                lambda f, ix: sampler.sample(f, ix)[0],
                resolution=cfg.max_size,
                fid=fid,
            )
        # Don't charge the FID sweep to the next window's imgs/sec.
        t_last = time.perf_counter()

    if fid_computer is not None and start == 0:
        # Untrained baseline (step 0): without it a short run's curve reads
        # as "FID rises" even when every trained point is far below init —
        # exactly the r4 misread.  The accumulator is empty before the
        # first batch; seed it with the dataset's own TRUE fits (the same
        # rows the stream would accumulate).
        dataset.accumulate_batches_of_flm(
            np.asarray(dataset.flame_params[:fid_n_samples], np.float32)
        )
        # The measured values ride in the ``fid`` / ``ema_recon`` columns of
        # every row until the next sweep (same carry-forward semantics as
        # mid-run evals); the 000000 sample grid carries it in its filename.
        run_eval(-1)

    for i in range(start, total_iters):
        batch_np = next(it)
        # Accumulate the TRUE fits for FID conditioning: augmented labels
        # are crop-zeroed / flip-sentineled and would starve the buffer.
        dataset.accumulate_batches_of_flm(
            batch_np.get("flame_render", batch_np["flame"])
        )
        if mesh is not None:
            batch = shard_batch(batch_np, mesh)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        state, metrics = step_fn(state, batch, jax.random.fold_in(rng_key, i))

        if (i + 1) % log_every == 0 and is_main:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.perf_counter() - t_last
            t_last = time.perf_counter()
            m["imgs_per_sec"] = cfg.batch_size * log_every / dt
            m["fid"] = fid
            m["ema_recon"] = recon
            logger.log(i + 1, m)
            print(
                f"[{i + 1}] G {m['g_loss']:.3f} D {m['d_loss']:.3f} "
                f"fid {fid:.1f} {m['imgs_per_sec']:.1f} img/s"
            )

        if (i + 1) % cfg.fid_every == 0 and fid_computer is not None:
            run_eval(i)

        # Orbax is multihost-native: every process participates (its manager
        # runs internal sync barriers) and the primary host does the writes.
        # The python counter (not int(state.step)) keys the cadence — the
        # device readback would block the dispatch pipeline every step.
        if ckpt.maybe_save(state, step=i + 1):
            t_last = time.perf_counter()

    ckpt.save(state)
    return state
