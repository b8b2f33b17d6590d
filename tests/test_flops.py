"""FLOP accounting / MFU plumbing (gif_tpu/utils/flops.py, VERDICT r4 #3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gif_tpu.train import get_config, create_train_state
from gif_tpu.train.state import build_models
from gif_tpu.utils.flops import (
    analytic_generator_forward_flops,
    compiled_flops,
    device_peak_flops,
    mfu,
)


def _tiny_cfg():
    return get_config(
        8, embedding_vocab_size=32, max_size=32, init_size=32,
        render_image_size=32, batch_size=4, max_channels=32,
        nmlp_for_z_to_w=2, compute_dtype="float32",
    )


def test_compiled_vs_analytic_generator_flops():
    """XLA's cost model and the analytic conv count must agree to within a
    small factor on the generator forward (the analytic model ignores
    resizes/demod/bias; XLA counts them) — this is the cross-check VERDICT
    r4 item 3 asks for."""
    cfg = _tiny_cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    gen, _ = build_models(cfg)
    batch = 4
    cond = jnp.zeros((batch, cfg.max_size, cfg.max_size, cfg.cond_channels))
    idx = jnp.zeros((batch,), jnp.int32)

    def g_fwd(p, b, c, i):
        return gen.apply({"params": p, "buffers": b}, c,
                         input_indices=i, step=cfg.max_step)

    got = compiled_flops(jax.jit(g_fwd), state.g_params, state.buffers, cond, idx)
    if got is None:
        pytest.skip("backend exposes no cost analysis")
    want = analytic_generator_forward_flops(cfg, batch)
    assert want > 0
    ratio = got / want
    assert 0.5 < ratio < 3.0, (got, want, ratio)


def test_analytic_scales_with_batch_and_resolution():
    cfg = _tiny_cfg()
    f1 = analytic_generator_forward_flops(cfg, 4)
    f2 = analytic_generator_forward_flops(cfg, 8)
    assert abs(f2 / f1 - 2.0) < 1e-6  # linear in batch
    import dataclasses

    cfg2 = dataclasses.replace(cfg, max_size=64, init_size=64)
    assert analytic_generator_forward_flops(cfg2, 4) > f1 * 2


def test_peak_and_mfu_helpers():
    # CPU test platform: unknown peak -> None, mfu None.
    assert device_peak_flops() is None
    assert mfu(1e12, 1.0) is None

    class FakeDev:
        device_kind = "TPU v5 lite"

    assert device_peak_flops(FakeDev()) == 197e12

    class FakeV5p:
        device_kind = "TPU v5p"

    # Longest-prefix match: v5p must not resolve to the bare "TPU v5" entry.
    assert device_peak_flops(FakeV5p()) == 459e12
    got = mfu(197e12 * 0.5, 1.0, FakeDev())
    assert abs(got - 0.5) < 1e-9
