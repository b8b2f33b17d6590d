"""Numerical parity tests for the StyleGAN2 op zoo.

Each op is checked against an independent straightforward implementation
(numpy loops or torch CPU built-ins) of the reference semantics
(reference model/stylegan2_common_layers.py)."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from gif_tpu import ops


def _np_upfirdn2d(x_nchw, kernel, up, down, pad):
    """Direct numpy model of the reference upfirdn2d semantics."""
    n, c, h, w = x_nchw.shape
    kh, kw = kernel.shape
    # zero-stuff to h*up (trailing zeros included)
    z = np.zeros((n, c, h * up, w * up), dtype=x_nchw.dtype)
    z[:, :, ::up, ::up] = x_nchw
    p0, p1 = pad
    # pad (crop when negative)
    yp0, yp1, xp0, xp1 = p0, p1, p0, p1
    z = np.pad(
        z,
        ((0, 0), (0, 0), (max(yp0, 0), max(yp1, 0)), (max(xp0, 0), max(xp1, 0))),
    )
    z = z[
        :,
        :,
        max(-yp0, 0) : z.shape[2] - max(-yp1, 0),
        max(-xp0, 0) : z.shape[3] - max(-xp1, 0),
    ]
    # true convolution with the kernel
    hh = z.shape[2] - kh + 1
    ww = z.shape[3] - kw + 1
    out = np.zeros((n, c, hh, ww), dtype=np.float64)
    kf = kernel[::-1, ::-1]
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * z[:, :, i : i + hh, j : j + ww]
    return out[:, :, ::down, ::down]


@pytest.mark.parametrize(
    "up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (2, 2)), (2, 2, (1, 1)), (1, 1, (-1, 2))]
)
def test_upfirdn2d_parity(rng, up, down, pad):
    x = rng.standard_normal((2, 4, 7, 9)).astype(np.float32)  # NCHW for ref
    k1d = np.array([1.0, 3.0, 3.0, 1.0])
    k = np.outer(k1d, k1d)
    k = (k / k.sum()).astype(np.float32)

    ref = _np_upfirdn2d(x, k, up, down, pad)
    got = ops.upfirdn2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(k), up=up, down=down, pad=pad
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_upfirdn_nonseparable_kernel(rng):
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    k = rng.standard_normal((3, 3)).astype(np.float32)
    ref = _np_upfirdn2d(x, k, 2, 1, (1, 1))
    got = ops.upfirdn2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(k), up=2, down=1, pad=(1, 1)
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_upsample_downsample_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    up = ops.upsample_2x(x)
    assert up.shape == (2, 32, 32, 8)
    down = ops.downsample_2x(x)
    assert down.shape == (2, 8, 8, 8)
    # round-trip of a constant image is (nearly) identity
    const = jnp.ones((1, 16, 16, 1))
    rt = ops.downsample_2x(ops.upsample_2x(const))
    np.testing.assert_allclose(np.asarray(rt)[0, 2:-2, 2:-2, 0], 1.0, rtol=1e-5)


def test_equal_linear_parity(rng):
    x = rng.standard_normal((5, 16)).astype(np.float32)
    w = rng.standard_normal((8, 16)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    lr_mul = 0.01
    # reference: out = leaky_relu(x @ (w*scale).T + b*lr_mul, 0.2), no sqrt2
    scale = (1.0 / math.sqrt(16)) * lr_mul
    pre = x @ (w * scale).T + b * lr_mul
    ref = np.where(pre >= 0, pre, 0.2 * pre)
    got = ops.equal_linear(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), lr_mul=lr_mul, activation=True
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)
    # sqrt2 quirk flag
    got2 = ops.equal_linear(
        jnp.asarray(x),
        jnp.asarray(w),
        jnp.asarray(b),
        lr_mul=lr_mul,
        activation=True,
        apply_sqrt2=True,
    )
    np.testing.assert_allclose(np.asarray(got2), ref * 1.41421356237, rtol=1e-5)


def test_pixel_norm(rng):
    x = rng.standard_normal((3, 32)).astype(np.float32)
    ref = x / np.sqrt((x**2).mean(axis=-1, keepdims=True) + 1e-8)
    got = ops.pixel_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_fused_leaky_relu(rng, use_pallas):
    x = rng.standard_normal((2, 5, 5, 12)).astype(np.float32)
    b = rng.standard_normal((12,)).astype(np.float32)
    y = x + b.reshape(1, 1, 1, -1)
    ref = np.where(y >= 0, y, 0.2 * y) * math.sqrt(2.0)
    got = ops.fused_leaky_relu(jnp.asarray(x), jnp.asarray(b), use_pallas=use_pallas)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_fused_leaky_relu_grad(rng, use_pallas):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

    def loss(x, b):
        return jnp.sum(jnp.sin(ops.fused_leaky_relu(x, b, 0.2, math.sqrt(2.0), use_pallas)))

    gx, gb = jax.grad(loss, argnums=(0, 1))(x, b)

    def loss_ref(x, b):
        y = x + b.reshape(1, 1, 1, -1)
        out = jnp.where(y >= 0, y, 0.2 * y) * math.sqrt(2.0)
        return jnp.sum(jnp.sin(out))

    gx_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r), rtol=1e-5, atol=1e-5)


def _torch_modulated_conv(x_nchw, w_oikk, style_bi, demodulate, upsample, downsample):
    """Reference-semantics modulated conv using torch's grouped-conv trick."""
    batch, cin, h, w = x_nchw.shape
    cout = w_oikk.shape[0]
    k = w_oikk.shape[-1]
    scale = 1.0 / math.sqrt(cin * k * k)
    weight = scale * w_oikk[None] * style_bi.view(batch, 1, cin, 1, 1)
    if demodulate:
        demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
        weight = weight * demod.view(batch, cout, 1, 1, 1)
    weight = weight.view(batch * cout, cin, k, k)
    blur_k = torch.tensor([1.0, 3.0, 3.0, 1.0])
    blur_k = torch.outer(blur_k, blur_k)
    blur_k = blur_k / blur_k.sum()

    def t_blur(t, pad, gain=1.0):
        kk = (blur_k * gain).flip(0, 1)[None, None]
        c = t.shape[1]
        tp = F.pad(t, (max(pad[0], 0), max(pad[1], 0), max(pad[0], 0), max(pad[1], 0)))
        tp = tp[
            :,
            :,
            max(-pad[0], 0) : tp.shape[2] - max(-pad[1], 0),
            max(-pad[0], 0) : tp.shape[3] - max(-pad[1], 0),
        ]
        return F.conv2d(tp, kk.expand(c, 1, 4, 4), groups=c)

    if upsample:
        xg = x_nchw.view(1, batch * cin, h, w)
        wt = weight.view(batch, cout, cin, k, k).transpose(1, 2).reshape(
            batch * cin, cout, k, k
        )
        out = F.conv_transpose2d(xg, wt, padding=0, stride=2, groups=batch)
        out = out.view(batch, cout, out.shape[2], out.shape[3])
        p = (4 - 2) - (k - 1)
        out = t_blur(out, ((p + 1) // 2 + 1, p // 2 + 1), gain=4.0)
    elif downsample:
        p = (4 - 2) + (k - 1)
        xb = t_blur(x_nchw, ((p + 1) // 2, p // 2))
        xg = xb.reshape(1, batch * cin, xb.shape[2], xb.shape[3])
        out = F.conv2d(xg, weight, padding=0, stride=2, groups=batch)
        out = out.view(batch, cout, out.shape[2], out.shape[3])
    else:
        xg = x_nchw.view(1, batch * cin, h, w)
        out = F.conv2d(xg, weight, padding=k // 2, groups=batch)
        out = out.view(batch, cout, out.shape[2], out.shape[3])
    return out


@pytest.mark.parametrize(
    "demod,up,down,k",
    [
        (True, False, False, 3),
        (False, False, False, 1),
        (True, True, False, 3),
        (True, False, True, 3),
    ],
)
def test_modulated_conv_parity(rng, demod, up, down, k):
    batch, cin, cout, h = 3, 6, 10, 8
    x = rng.standard_normal((batch, cin, h, h)).astype(np.float32)
    w = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
    style = rng.standard_normal((batch, cin)).astype(np.float32) + 1.0

    ref = _torch_modulated_conv(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(style), demod, up, down
    ).numpy()

    got = ops.modulated_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
        jnp.asarray(style),
        demodulate=demod,
        upsample=up,
        downsample=down,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_equal_conv2d_parity(rng):
    x = rng.standard_normal((2, 5, 9, 9)).astype(np.float32)
    w = rng.standard_normal((7, 5, 3, 3)).astype(np.float32)
    b = rng.standard_normal((7,)).astype(np.float32)
    scale = 1.0 / math.sqrt(5 * 9)
    ref = F.conv2d(
        torch.from_numpy(x), torch.from_numpy(w) * scale, torch.from_numpy(b), padding=1
    ).numpy()
    got = ops.equal_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),
        jnp.asarray(b),
        padding=1,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_minibatch_stddev_parity(rng):
    n, c, h, w = 8, 6, 4, 4
    x = rng.standard_normal((n, c, h, w)).astype(np.float32)
    t = torch.from_numpy(x)
    group = 4
    std = t.view(group, -1, 1, c, h, w)
    std = torch.sqrt(std.var(0, unbiased=False) + 1e-8)
    std = std.mean([2, 3, 4], keepdims=True).squeeze(2)
    std = std.repeat(group, 1, h, w)
    ref = torch.cat([t, std], 1).numpy()

    got = ops.minibatch_stddev(jnp.asarray(x.transpose(0, 2, 3, 1)), group_size=4)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-6
    )


def test_minibatch_stddev_small_batch(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 6)).astype(np.float32))
    out = ops.minibatch_stddev(x, group_size=4)
    assert out.shape == (2, 4, 4, 7)
