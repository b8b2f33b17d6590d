"""Parity of the three resampling-conv formulations (ops.conv.resample_mode).

The ``even`` mode must be *bitwise* identical to ``legacy`` (it only trades
a blur pad zero for a provably-zero conv output column); the ``phase`` mode
reassociates float ops (FIR folded into the conv kernel) and is pinned to a
tight allclose, including gradients and the R1-style grad-of-grad.

Reference semantics under test: conv_transpose2d+Blur / Blur+strided-conv
(stylegan2_common_layers.py:272-286).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gif_tpu import ops
from gif_tpu.ops import conv as conv_mod


@pytest.fixture
def mode_env(monkeypatch):
    def set_mode(mode):
        monkeypatch.setenv("GIF_TPU_RESAMPLE", mode)

    return set_mode


def _mod_conv(x, w, style, mode, monkey, **kw):
    monkey.setenv("GIF_TPU_RESAMPLE", mode)
    return ops.modulated_conv2d(x, w, style, **kw)


def _rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("h", [8, 9, 16])
def test_upsample_even_mode_is_bitwise_legacy(rng, monkeypatch, h):
    x = _rand(rng, (2, h, h, 12))
    w = _rand(rng, (3, 3, 12, 20))
    s = _rand(rng, (2, 12)) * 0.3 + 1.0
    a = _mod_conv(x, w, s, "legacy", monkeypatch, upsample=True)
    b = _mod_conv(x, w, s, "even", monkeypatch, upsample=True)
    assert a.shape == (2, 2 * h, 2 * h, 20)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("k", [1, 3])
def test_downsample_even_mode_is_bitwise_legacy(rng, monkeypatch, k):
    x = _rand(rng, (2, 16, 16, 12))
    w = _rand(rng, (k, k, 12, 20))
    s = _rand(rng, (2, 12)) * 0.3 + 1.0
    a = _mod_conv(x, w, s, "legacy", monkeypatch, downsample=True)
    b = _mod_conv(x, w, s, "even", monkeypatch, downsample=True)
    assert a.shape == (2, 8, 8, 20)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("h", [8, 9, 16])
@pytest.mark.parametrize("demod", [True, False])
def test_upsample_phase_matches_legacy(rng, monkeypatch, h, demod):
    x = _rand(rng, (2, h, h, 12))
    w = _rand(rng, (3, 3, 12, 20))
    s = _rand(rng, (2, 12)) * 0.3 + 1.0
    a = _mod_conv(x, w, s, "legacy", monkeypatch, upsample=True, demodulate=demod)
    b = _mod_conv(x, w, s, "phase", monkeypatch, upsample=True, demodulate=demod)
    assert b.shape == (2, 2 * h, 2 * h, 20)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)


def test_upsample_phase_gradients_match(rng, monkeypatch):
    x = _rand(rng, (2, 8, 8, 6))
    w = _rand(rng, (3, 3, 6, 10))
    s = _rand(rng, (2, 6)) * 0.3 + 1.0
    cot = _rand(rng, (2, 16, 16, 10))

    def loss(mode):
        def f(x_, w_, s_):
            monkeypatch.setenv("GIF_TPU_RESAMPLE", mode)
            out = ops.modulated_conv2d(x_, w_, s_, upsample=True)
            return jnp.sum(out * cot)

        return jax.grad(f, argnums=(0, 1, 2))(x, w, s)

    ga = loss("legacy")
    gb = loss("phase")
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4)


def test_upsample_phase_grad_of_grad_matches(rng, monkeypatch):
    """The R1 penalty differentiates through the gradient — pin second order."""
    x = _rand(rng, (1, 8, 8, 4))
    w = _rand(rng, (3, 3, 4, 6))
    s = _rand(rng, (1, 4)) * 0.3 + 1.0

    def r1(mode):
        def inner(x_):
            monkeypatch.setenv("GIF_TPU_RESAMPLE", mode)
            out = ops.modulated_conv2d(x_, w, s, upsample=True)
            return jnp.sum(jnp.square(out))

        def penalty(x_):
            g = jax.grad(inner)(x_)
            return jnp.sum(jnp.square(g))

        return jax.grad(penalty)(x)

    np.testing.assert_allclose(
        np.asarray(r1("legacy")), np.asarray(r1("phase")), atol=1e-3, rtol=1e-4
    )


def test_even_extended_pad_policy(monkeypatch):
    monkeypatch.setenv("GIF_TPU_RESAMPLE", "even")
    # 256 + 2 + 2 - 4 + 1 = 257 odd, (257-3) even -> extend.
    assert ops.even_extended_pad(256, 2, 2, 4, 3) == (2, 3)
    # k=1 skip conv: out 255 odd, (255-1) even -> extend.
    assert ops.even_extended_pad(256, 1, 1, 4, 1) == (1, 2)
    # Already even -> untouched.
    assert ops.even_extended_pad(255, 2, 2, 4, 3) == (2, 2)
    monkeypatch.setenv("GIF_TPU_RESAMPLE", "legacy")
    assert ops.even_extended_pad(256, 2, 2, 4, 3) == (2, 2)


def test_conv_layer_downsample_even_mode_is_bitwise_legacy(rng, monkeypatch):
    from gif_tpu.models.layers import ConvLayer

    x = _rand(rng, (2, 16, 16, 8))
    layer = ConvLayer(12, 3, downsample=True)
    monkeypatch.setenv("GIF_TPU_RESAMPLE", "legacy")
    params = layer.init(jax.random.PRNGKey(0), x)
    a = layer.apply(params, x)
    monkeypatch.setenv("GIF_TPU_RESAMPLE", "even")
    b = layer.apply(params, x)
    assert a.shape == (2, 8, 8, 12)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
