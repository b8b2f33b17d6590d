"""Train-step tests: single device and 8-device CPU mesh.

Uses a tiny synthetic FLAME model and low resolution so one step compiles in
seconds; checks that both networks' parameters move, losses are finite, EMA
tracks, R1 fires on its schedule, and the sharded step runs on a mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the default smoke tier

from gif_tpu.train import get_config, create_train_state, make_train_step
from gif_tpu.flame.resources import synthetic_flame_resources

RES = synthetic_flame_resources(seed=1, n_vertices=503)


def tiny_config(**over):
    base = dict(
        embedding_vocab_size=16,
        max_size=32,
        init_size=32,
        render_image_size=32,
        batch_size=4,
        apply_texture_space_interpolation_loss=False,
        r1_interval=2,
        # XLA:CPU executes per-sample modulated-conv grads serially; capped
        # channels keep each step-compile+run in seconds while preserving
        # the full program structure (512-ch parity lives in
        # test_converter_parity / test_golden).
        max_channels=32,
        nmlp_for_z_to_w=2,
        compute_dtype="float32",
    )
    base.update(over)
    return get_config(8, **base)


def make_batch(cfg, b, key=0):
    rng = np.random.default_rng(key)
    flame = np.zeros((b, 236), np.float32)
    flame[:, :100] = rng.standard_normal((b, 100)) * 0.1
    flame[:, 156] = 8.0  # camera scale
    flame[:, 209:212] = 3.0  # constant SH band
    return {
        "real_image": jnp.asarray(
            rng.uniform(-1, 1, (b, cfg.max_size, cfg.max_size, 3)).astype(np.float32)
        ),
        "flame": jnp.asarray(flame),
        "indices": jnp.asarray(rng.integers(0, cfg.embedding_vocab_size, b), jnp.int32),
    }


def _tree_l1_diff(a, b):
    return sum(
        float(jnp.abs(x - y).sum())
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_single_device_step_updates_both_nets():
    cfg = tiny_config()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, RES, max_tris_per_tile=256)
    batch = make_batch(cfg, cfg.batch_size)

    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k in ["d_loss", "g_loss", "g_total"]:
        assert np.isfinite(float(metrics[k])), k
    assert _tree_l1_diff(state.g_params, new_state.g_params) > 0
    assert _tree_l1_diff(state.d_params, new_state.d_params) > 0
    # EMA moved but less than params.
    assert 0 < _tree_l1_diff(state.g_ema_params, new_state.g_ema_params)


def test_r1_fires_on_schedule():
    cfg = tiny_config(r1_interval=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, RES, max_tris_per_tile=256)
    batch = make_batch(cfg, cfg.batch_size)

    s1, m1 = step_fn(state, batch, jax.random.PRNGKey(1))  # step 0 -> (0+1)%2!=0
    s2, m2 = step_fn(s1, batch, jax.random.PRNGKey(2))  # step 1 -> (1+1)%2==0
    assert float(m1["r1"]) == 0.0
    assert float(m2["r1"]) > 0.0


def test_r1_shared_forward_matches_cond_path():
    """r1_interval=1 uses a vjp-shared D(real) forward; its r1 value and D
    update must equal the lax.cond r1_penalty formulation on a step where
    the cond path fires ((step+1) % interval == 0 at step 1, interval 2)."""
    state0 = create_train_state(tiny_config(), jax.random.PRNGKey(0))
    batch = make_batch(tiny_config(), 4)

    cfg_cond = tiny_config(r1_interval=2)
    s1, _ = make_train_step(cfg_cond, RES, max_tris_per_tile=256)(
        state0, batch, jax.random.PRNGKey(1)
    )
    s2_cond, m_cond = make_train_step(cfg_cond, RES, max_tris_per_tile=256)(
        s1, batch, jax.random.PRNGKey(2)
    )

    cfg_shared = tiny_config(r1_interval=1)
    s2_shared, m_shared = make_train_step(cfg_shared, RES, max_tris_per_tile=256)(
        s1, batch, jax.random.PRNGKey(2)
    )

    np.testing.assert_allclose(
        float(m_shared["r1"]), float(m_cond["r1"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_shared["d_loss"]), float(m_cond["d_loss"]), rtol=1e-5
    )
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_leaves_with_path(s2_shared.d_params),
        jax.tree_util.tree_leaves_with_path(s2_cond.d_params),
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=2e-4, atol=2e-6,
            err_msg=f"d_params diverge at {pa}",
        )


def test_interp_loss_path_runs():
    cfg = tiny_config(apply_texture_space_interpolation_loss=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, RES, max_tris_per_tile=256)
    batch = make_batch(cfg, cfg.batch_size)
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["interp"]))
    assert float(metrics["interp"]) > 0


@pytest.mark.parametrize("adaptive", [False, True])
def test_fused_interp_matches_unfused(adaptive):
    """fuse_interp batches the interp render + G forward with the main ones;
    losses, metrics, and both parameter updates must match the unfused
    two-dispatch formulation (same RNG key chain by construction)."""
    cfg = tiny_config(
        apply_texture_space_interpolation_loss=True,
        adaptive_interp_loss=adaptive,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg, cfg.batch_size)
    rng = jax.random.PRNGKey(3)

    s_f, m_f = make_train_step(cfg, RES, max_tris_per_tile=256, fuse_interp=True)(
        state, batch, rng
    )
    s_u, m_u = make_train_step(cfg, RES, max_tris_per_tile=256, fuse_interp=False)(
        state, batch, rng
    )

    assert set(m_f) == set(m_u)
    for k in m_f:
        np.testing.assert_allclose(
            float(m_f[k]), float(m_u[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
    assert float(m_f["interp"]) > 0
    for name, tf, tu in [
        ("g_params", s_f.g_params, s_u.g_params),
        ("d_params", s_f.d_params, s_u.d_params),
        ("g_ema_params", s_f.g_ema_params, s_u.g_ema_params),
    ]:
        for (pa, la), (_, lb) in zip(
            jax.tree_util.tree_leaves_with_path(tf),
            jax.tree_util.tree_leaves_with_path(tu),
        ):
            np.testing.assert_allclose(
                np.asarray(la),
                np.asarray(lb),
                rtol=2e-4,
                atol=2e-6,
                err_msg=f"{name} diverge at {pa}",
            )


def test_mesh_step_runs_and_matches_replication():
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual cpu devices"
    mesh = Mesh(np.array(jax.devices()), ("data",))
    cfg = tiny_config(batch_size=8)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, RES, mesh=mesh, max_tris_per_tile=256)
    batch = make_batch(cfg, 8)
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert int(new_state.used_samples) == 8
    # Params remain replicated-consistent (single logical value).
    leaf = jax.tree_util.tree_leaves(new_state.g_params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_gen_reg_path_len():
    cfg = tiny_config(gen_reg_type="path_len_reg")
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, RES, max_tris_per_tile=256)
    batch = make_batch(cfg, cfg.batch_size)
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(new_state.pl_mean))
    assert float(new_state.pl_mean) != 0.0


def test_shuffled_condition_negatives():
    cfg = tiny_config(shfld_cond_as_neg_smpl=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, RES, max_tris_per_tile=256)
    batch = make_batch(cfg, cfg.batch_size)
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["d_loss"]))
    assert _tree_l1_diff(state.d_params, new_state.d_params) > 0


def test_n_critic_integer_skips_g():
    cfg = tiny_config(n_critic=2.0)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, RES, max_tris_per_tile=256)
    batch = make_batch(cfg, cfg.batch_size)
    s1, m1 = step_fn(state, batch, jax.random.PRNGKey(1))  # step 0: (0+1)%2 != 0
    assert float(m1["g_total"]) == 0.0
    assert _tree_l1_diff(state.g_params, s1.g_params) == 0.0
    assert _tree_l1_diff(state.d_params, s1.d_params) > 0
    s2, m2 = step_fn(s1, batch, jax.random.PRNGKey(2))  # step 1: G trains
    assert float(m2["g_total"]) != 0.0
    assert _tree_l1_diff(s1.g_params, s2.g_params) > 0


def test_n_critic_fractional_trains_g_twice():
    cfg = tiny_config(n_critic=0.5)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, RES, max_tris_per_tile=256)
    batch = make_batch(cfg, cfg.batch_size)
    s1, m1 = step_fn(state, batch, jax.random.PRNGKey(1))
    # Single config also trains G once; double-update must move G more.
    cfg1 = tiny_config(n_critic=1.0)
    step1 = make_train_step(cfg1, RES, max_tris_per_tile=256)
    s_ref, _ = step1(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["g_total"]))
    # The double G update must land somewhere different from the single one
    # (Adam step magnitudes are near-constant, so distance ratios are not a
    # reliable signal; divergence of the trajectories is).
    d_between = _tree_l1_diff(s1.g_params, s_ref.g_params)
    assert d_between > 0
    # D update identical in both runs (same rng, same batch).
    assert _tree_l1_diff(s1.d_params, s_ref.d_params) == 0.0


def test_step_with_flip_and_crop_batch():
    """Augmented batches (dataset_loaders.py:314-327 semantics): the step
    renders conds from flame_render and applies the image's pixel transform
    to them; the run completes with finite metrics despite sentinel labels."""
    cfg = tiny_config()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, RES, max_tris_per_tile=256)
    batch = make_batch(cfg, cfg.batch_size)
    rng = np.random.default_rng(7)
    batch["flame_render"] = batch["flame"]
    batch["flame"] = jnp.full_like(batch["flame"], -9999.0)
    batch["crop"] = jnp.asarray(
        rng.integers(-5, 6, size=(cfg.batch_size, 2)), jnp.int32
    )
    batch["flip"] = jnp.asarray([True, False, True, False])
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1


def test_reused_forward_matches_recompute():
    """The D-phase forward reuse must give the same adversarial gradient as
    a full recompute (the identity the step relies on: G is deterministic
    and its params are unchanged until the G update)."""
    from gif_tpu.train.state import build_models
    from gif_tpu.train import losses as L

    cfg = tiny_config()
    res = synthetic_flame_resources(seed=1, n_vertices=503)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg, 2)
    gen, disc = build_models(cfg)

    cond = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (2, cfg.max_size, cfg.max_size, 6)
        ),
        jnp.float32,
    )
    idx = jnp.asarray([0, 1], jnp.int32)

    def gfwd(p):
        return gen.apply(
            {"params": p, "buffers": state.buffers},
            cond,
            input_indices=idx,
            step=cfg.max_step,
        )

    def adv(fake):
        return jnp.mean(
            jax.nn.softplus(-disc.apply({"params": state.d_params}, fake, cond))
        )

    fake, vjp = jax.vjp(gfwd, state.g_params)
    (g_reuse,) = vjp(jax.grad(adv)(fake))
    g_full = jax.grad(lambda p: adv(gfwd(p)))(state.g_params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_reuse), jax.tree_util.tree_leaves(g_full)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_instance_noise_off_is_reference_program():
    """d_input_noise_std=0 must leave the step bit-identical to the
    reference recipe (the knob is compile-time gated, not a runtime
    multiply-by-zero)."""
    cfg0 = tiny_config()
    cfg1 = tiny_config(d_input_noise_std=0.0)
    state = create_train_state(cfg0, jax.random.PRNGKey(0))
    batch = make_batch(cfg0, cfg0.batch_size)
    s0, m0 = make_train_step(cfg0, RES, max_tris_per_tile=256)(
        state, batch, jax.random.PRNGKey(1)
    )
    s1, m1 = make_train_step(cfg1, RES, max_tris_per_tile=256)(
        state, batch, jax.random.PRNGKey(1)
    )
    assert float(m0["d_loss"]) == float(m1["d_loss"])
    assert _tree_l1_diff(s0.g_params, s1.g_params) == 0.0


def test_instance_noise_perturbs_d_not_target():
    """With d_input_noise_std > 0 the step still trains (finite metrics,
    both nets move) and the D loss differs from the clean program — but
    the generator's forward/target pipeline (condition maps, G output) is
    untouched: only D's view is noised."""
    cfg = tiny_config(d_input_noise_std=0.05)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg, cfg.batch_size)
    step_fn = make_train_step(cfg, RES, max_tris_per_tile=256)
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    for k in ["d_loss", "g_loss", "g_total"]:
        assert np.isfinite(float(metrics[k])), k
    assert _tree_l1_diff(state.g_params, new_state.g_params) > 0
    assert _tree_l1_diff(state.d_params, new_state.d_params) > 0

    clean = tiny_config()
    _, m_clean = make_train_step(clean, RES, max_tris_per_tile=256)(
        state, batch, jax.random.PRNGKey(1)
    )
    assert float(m_clean["d_loss"]) != float(metrics["d_loss"])
