"""Train state: one pytree carrying both networks, EMA, and optimizers.

Mirrors the reference checkpoint contents (train.py:254-265): generator,
EMA generator, discriminator, both Adam states, plus the loop counters —
checkpointed as a single Orbax pytree (SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
import flax.struct

from gif_tpu.models import StyledGenerator, Discriminator
from gif_tpu.train.config import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    g_params: Any
    d_params: Any
    g_ema_params: Any
    buffers: Any  # frozen identity-embedding table
    g_opt_state: Any
    d_opt_state: Any
    pl_mean: jnp.ndarray  # path-length running mean
    used_samples: jnp.ndarray  # scalar int32 (train.py counter)


def make_optimizers(cfg: TrainConfig):
    """Adam with StyleGAN2 reg-ratio-scaled hyperparams (train.py:365-382)."""
    g_tx = optax.adam(cfg.g_lr, b1=cfg.g_betas[0], b2=cfg.g_betas[1])
    d_tx = optax.adam(cfg.d_lr, b1=cfg.d_betas[0], b2=cfg.d_betas[1])
    return g_tx, d_tx


def build_models(cfg: TrainConfig, w_truncation_factor: float = 1.0):
    dtype = jnp.dtype(cfg.compute_dtype)
    gen = StyledGenerator(
        embedding_vocab_size=cfg.embedding_vocab_size,
        n_mlp=cfg.nmlp_for_z_to_w,
        core_tensor_res=cfg.core_tensor_res,
        channel_multiplier=cfg.channel_multiplier,
        max_channels=cfg.max_channels,
        w_truncation_factor=w_truncation_factor,
        apply_sqrt2=cfg.apply_sqrt_in_eq_linear,
        dtype=dtype,
    )
    disc = Discriminator(
        size=cfg.max_size,
        channel_multiplier=cfg.channel_multiplier,
        max_channels=cfg.max_channels,
        dtype=dtype,
    )
    return gen, disc


def create_train_state(cfg: TrainConfig, rng: jax.Array, step: int | None = None) -> TrainState:
    gen, disc = build_models(cfg)
    g_tx, d_tx = make_optimizers(cfg)
    step = cfg.max_step if step is None else step
    size = 4 * 2**step

    rng_g, rng_d = jax.random.split(rng)
    cond = jnp.zeros((1, size, size, cfg.cond_channels))
    g_vars = gen.init(
        rng_g, cond, input_indices=jnp.zeros((1,), jnp.int32), step=step
    )
    d_vars = disc.init(
        rng_d, jnp.zeros((1, size, size, 3)), cond
    )
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        g_params=g_vars["params"],
        d_params=d_vars["params"],
        g_ema_params=jax.tree_util.tree_map(jnp.copy, g_vars["params"]),
        buffers=g_vars["buffers"],
        g_opt_state=g_tx.init(g_vars["params"]),
        d_opt_state=d_tx.init(d_vars["params"]),
        pl_mean=jnp.asarray(0.0, jnp.float32),
        used_samples=jnp.asarray(0, jnp.int32),
    )


def _check_tree_shapes(got, want, what: str):
    """Every leaf of ``got`` must exist in ``want`` with the same shape;
    report ALL mismatches in one error (the fine-tune analog of the
    converter manifests)."""
    gl = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_leaves_with_path(got)}
    wl = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_leaves_with_path(want)}
    problems = [f"  {k}: checkpoint has {v}, model wants {wl[k]}"
                for k, v in gl.items() if k in wl and tuple(v) != tuple(wl[k])]
    problems += [f"  {k}: missing from checkpoint" for k in wl if k not in gl]
    problems += [f"  {k}: unexpected in checkpoint" for k in gl if k not in wl]
    if problems:
        raise ValueError(
            f"{what}: converted checkpoint does not fit this config "
            f"({len(problems)} problem(s)):\n" + "\n".join(problems)
        )


def warm_start_from_converted(state: TrainState, path: str) -> TrainState:
    """Seed a fresh TrainState with a converted reference checkpoint
    (tools/convert_checkpoint.py output) — the reference's fine-tune path
    (run_id 29 resumes a released ``.model``, configurations.py:232-241,
    train.py:389-400).  Optimizer states stay fresh (not portable across
    frameworks); counters stay zero."""
    import pickle

    with open(path, "rb") as f:
        trees = pickle.load(f)
    for src, dst, name in (
        ("g_params", "g_params", "generator"),
        ("g_ema_params", "g_ema_params", "EMA generator"),
        ("d_params", "d_params", "discriminator"),
        ("buffers", "buffers", "identity-embedding buffers"),
    ):
        if src not in trees:
            raise ValueError(f"{path}: missing tree {src!r}")
        _check_tree_shapes(trees[src], getattr(state, dst), f"{path} ({name})")
    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return state.replace(
        g_params=as_jnp(trees["g_params"]),
        g_ema_params=as_jnp(trees["g_ema_params"]),
        d_params=as_jnp(trees["d_params"]),
        buffers=as_jnp(trees["buffers"]),
    )
