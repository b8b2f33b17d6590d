"""Differentiable point sampling with a TPU-friendly backward.

``sample_at_points`` bilinearly samples images at scattered points (the
texture-steal inner op).  Autodiff of a plain gather transposes to
``scatter-add``, which XLA lowers on TPU to a *serial* while loop — profiled
at 1.8 s/step inside the texture-interpolation loss (141k sequential
dynamic-update-slices).  On TPU both directions run as the MXU
one-hot-matmul kernels from gif_tpu.render.sampler_pallas (the backward is
the exact transpose of the forward operator); elsewhere the forward is a
patch gather and the backward a vectorized sort + cumsum + searchsorted
(itself ~340 ms/step on TPU because searchsorted lowers to s32 while
loops — kept as the fallback).

Gradients flow to the image values only; point positions get zero cotangent
(they come from FLAME *data* in every GIF use, never from parameters —
matching how the reference uses grid_sample in FlameTextureSpace).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _tap_data(img_shape, pts):
    """Shared forward/backward geometry: tap ids, weights, validity.

    pts: (B, P, 2) in [-1, 1] grid coords (x, y).  Returns per-tap linear
    pixel ids (B, P, 4), weights (B, P, 4), and validity (B, P, 4).
    """
    b, h, w, c = img_shape
    gx = (pts[..., 0] + 1.0) * (w / 2.0) - 0.5
    gy = (pts[..., 1] + 1.0) * (h / 2.0) - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    dx = gx - x0
    dy = gy - y0

    taps_ids = []
    taps_w = []
    taps_ok = []
    for i in (0, 1):
        for j in (0, 1):
            xi = x0 + j
            yi = y0 + i
            ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            wij = (dx if j else (1 - dx)) * (dy if i else (1 - dy))
            lin = (
                jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
                + jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            )
            taps_ids.append(lin)
            taps_w.append(wij)
            taps_ok.append(ok)
    ids = jnp.stack(taps_ids, axis=-1)
    wgt = jnp.stack(taps_w, axis=-1)
    ok = jnp.stack(taps_ok, axis=-1)
    return ids, wgt, ok


def _use_mxu(h, w, c):
    return jax.default_backend() == "tpu" and (w * c) % 128 == 0


def _sample_fwd_impl(img, pts):
    b, h, w, c = img.shape
    if _use_mxu(h, w, c):
        from gif_tpu.render.sampler_pallas import _sampler_fwd_impl

        # Cast back to the source dtype (the MXU kernel accumulates in f32)
        # so output dtype matches the gather fallback across backends.
        out = _sampler_fwd_impl(img, pts[:, :, None, :])[:, :, 0]
        return out.astype(img.dtype)
    ids, wgt, ok = _tap_data(img.shape, pts)
    flat = img.reshape(b, h * w, c)

    def gather_one(fl, id_):
        return fl[id_]  # (P, 4, C)

    vals = jax.vmap(gather_one)(flat, ids)
    wgt = (wgt * ok.astype(img.dtype))[..., None]
    return jnp.sum(vals * wgt, axis=2)  # (B, P, C)


@jax.custom_vjp
def sample_at_points(img: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling of (B, H, W, C) images at (B, P, 2) grid points
    ([-1, 1], (x, y) order, torch grid_sample align_corners=False
    zeros-padding semantics).  Returns (B, P, C)."""
    return _sample_fwd_impl(img, pts)


def _sap_fwd(img, pts):
    # Zero-length carrier keeps the image's shape/dtype in the residuals
    # without holding data (residuals must be jax types).
    shape_token = jnp.zeros((0,) + img.shape[1:], img.dtype)
    return _sample_fwd_impl(img, pts), (shape_token, pts)


def _sap_bwd(res, g):
    shape_token, pts = res
    h, w, c = shape_token.shape[1:]
    img_shape = (pts.shape[0], h, w, c)
    img_dtype = shape_token.dtype
    if _use_mxu(h, w, c):
        from gif_tpu.render.sampler_pallas import scatter_bilinear_mxu

        d_img = scatter_bilinear_mxu(g.astype(jnp.float32), pts, h, w)
        return d_img.astype(img_dtype), jnp.zeros_like(pts)
    b = pts.shape[0]
    hw = h * w
    ids, wgt, ok = _tap_data(img_shape, pts)
    p = pts.shape[1]

    # Contributions: invalid taps routed to an overflow bin (hw).
    flat_ids = jnp.where(ok, ids, hw).reshape(b, 4 * p)
    contrib = (wgt[..., None] * g[:, :, None, :]).reshape(b, 4 * p, c)

    order = jnp.argsort(flat_ids, axis=1)
    sids = jnp.take_along_axis(flat_ids, order, axis=1)
    svals = jnp.take_along_axis(contrib, order[..., None], axis=1)

    csum = jnp.cumsum(svals.astype(jnp.float32), axis=1)
    csum = jnp.concatenate([jnp.zeros((b, 1, c), jnp.float32), csum], axis=1)

    targets = jnp.arange(hw, dtype=sids.dtype)
    lo = jax.vmap(lambda s: jnp.searchsorted(s, targets, side="left"))(sids)
    hi = jax.vmap(lambda s: jnp.searchsorted(s, targets, side="right"))(sids)

    def take_rows(cs, idx):
        return cs[idx]

    d_flat = jax.vmap(take_rows)(csum, hi) - jax.vmap(take_rows)(csum, lo)
    d_img = d_flat.reshape(b, h, w, c).astype(img_dtype)
    return d_img, jnp.zeros_like(pts)


sample_at_points.defvjp(_sap_fwd, _sap_bwd)
