"""Blur-folded resampling convs must exactly match the unfolded reference
chains (conv_transpose + blur / blur + strided conv) they replace.

The unfolded chains below are verbatim copies of the previous formulation in
``ops/conv.py`` (upsample: reference stylegan2_common_layers.py:272-278,
:322-333) and ``models/layers.py::ConvLayer`` (downsample: :280-286,
:752-799), so these tests pin the composition to the torch-parity-tested
semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from gif_tpu.ops import blur
from gif_tpu.ops.fused_resample import downsample_conv_2x, upsample_conv_2x

_DN = ("NHWC", "HWIO", "NHWC")


def _up_unfolded(x, w, taps=(1, 3, 3, 1)):
    out = lax.conv_transpose(
        x,
        jnp.swapaxes(w, 2, 3),
        strides=(2, 2),
        padding="VALID",
        dimension_numbers=_DN,
        transpose_kernel=True,
    )
    kh = w.shape[0]
    p = (len(taps) - 2) - (kh - 1)
    pad0 = (p + 1) // 2 + 1
    pad1 = p // 2 + 1
    return blur(out, pad=(pad0, pad1), taps=taps, upsample_factor=2)


def _down_unfolded(x, w, k, taps=(1, 3, 3, 1)):
    p = (len(taps) - 2) + (k - 1)
    xb = blur(x, pad=((p + 1) // 2, p // 2), taps=taps)
    return lax.conv_general_dilated(
        xb, w, window_strides=(2, 2), padding="VALID", dimension_numbers=_DN
    )


@pytest.mark.parametrize("h", [4, 8, 14])
@pytest.mark.parametrize("ci,co", [(3, 5), (8, 4)])
def test_upsample_conv_matches_unfolded(h, ci, co):
    rng = np.random.default_rng(h * 100 + ci)
    x = jnp.asarray(rng.standard_normal((2, h, h, ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32))
    ref = _up_unfolded(x, w)
    got = upsample_conv_2x(x, w)
    assert got.shape == (2, 2 * h, 2 * h, co) == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("k", [1, 3])
@pytest.mark.parametrize("h", [8, 14])
def test_downsample_conv_matches_unfolded(k, h):
    rng = np.random.default_rng(k * 10 + h)
    ci, co = 6, 5
    x = jnp.asarray(rng.standard_normal((2, h, h, ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, ci, co)).astype(np.float32))
    ref = _down_unfolded(x, w, k)
    got = downsample_conv_2x(x, w)
    assert got.shape == ref.shape == (2, h // 2, h // 2, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_upsample_conv_gradients_match():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 3)).astype(np.float32))

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(_up_unfolded(x, w)))

    def loss_new(x, w):
        return jnp.sum(jnp.sin(upsample_conv_2x(x, w)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gn = jax.grad(loss_new, argnums=(0, 1))(x, w)
    for a, b in zip(gr, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-5)


def test_downsample_conv_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 3)).astype(np.float32))

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(_down_unfolded(x, w, 3)))

    def loss_new(x, w):
        return jnp.sum(jnp.sin(downsample_conv_2x(x, w)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gn = jax.grad(loss_new, argnums=(0, 1))(x, w)
    for a, b in zip(gr, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-5)
