"""upfirdn2d and the Blur/Upsample/Downsample resampling family.

Semantics match the reference pure-torch ``upfirdn2d`` (reference
model/stylegan2_common_layers.py:42-72): zero-stuff upsample by ``up``,
pad by ``pad`` (negative pads crop), correlate with the *flipped* FIR kernel,
then keep every ``down``-th sample.  Output size per axis:

    out = (in * up + pad0 + pad1 - kh + 1) ceildiv-by-stride down

TPU-first design: the whole chain is one ``lax.conv_general_dilated`` call —
``lhs_dilation`` performs the zero-stuffing, the padding pairs absorb both the
FIR pad and the trailing ``up - 1`` zeros the reference appends, and
``window_strides`` performs the down-slice.  XLA lowers this to a single
fused depthwise conv.  Separable kernels (every kernel GIF uses is the
[1,3,3,1] binomial outer product) run as two rank-1 passes, quartering the
tap count.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gif_tpu.ops import blur_pallas


def make_resample_kernel(k) -> jnp.ndarray:
    """Normalized 2-D FIR kernel from a 1-D or 2-D tap list.

    Reference: ``make_kernel`` (stylegan2_common_layers.py:83-91).
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / jnp.sum(k)


def _upfirdn2d_conv(x, kernel, up, down, pad):
    """One-shot depthwise conv formulation (2-D kernel)."""
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    pad_y0, pad_y1, pad_x0, pad_x1 = pad
    # The reference zero-stuffs to in*up (appending up-1 trailing zeros);
    # lhs_dilation yields in*up - (up-1), so fold the difference into the
    # high-side padding.
    pads = (
        (pad_y0, pad_y1 + (up - 1)),
        (pad_x0, pad_x1 + (up - 1)),
    )
    # True convolution == correlation with the flipped kernel.
    kflip = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    rhs = jnp.broadcast_to(kflip[:, :, None, None], (kh, kw, 1, c))
    return lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(down, down),
        padding=pads,
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _upfirdn2d_separable(x, kernel_1d, up, down, pad):
    """Two rank-1 depthwise passes for separable kernels."""
    n, h, w, c = x.shape
    k = kernel_1d.shape[0]
    pad_y0, pad_y1, pad_x0, pad_x1 = pad
    kflip = jnp.flip(kernel_1d, 0).astype(x.dtype)
    # Vertical pass.
    rhs_v = jnp.broadcast_to(kflip[:, None, None, None], (k, 1, 1, c))
    x = lax.conv_general_dilated(
        x,
        rhs_v,
        window_strides=(down, 1),
        padding=((pad_y0, pad_y1 + (up - 1)), (0, 0)),
        lhs_dilation=(up, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    # Horizontal pass.
    rhs_h = jnp.broadcast_to(kflip[None, :, None, None], (1, k, 1, c))
    return lax.conv_general_dilated(
        x,
        rhs_h,
        window_strides=(1, down),
        padding=((0, 0), (pad_x0, pad_x1 + (up - 1))),
        lhs_dilation=(1, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _separable_factor(kernel: jnp.ndarray):
    """Return the 1-D factor if ``kernel`` is (numerically) rank-1, else None.

    Only attempted on concrete (non-traced) kernels so it stays jit-safe.
    """
    try:
        k = np.asarray(kernel)
    except Exception:
        return None
    if k.ndim != 2 or k.shape[0] != k.shape[1]:
        return None
    u, s, vt = np.linalg.svd(k)
    if s[1:].max(initial=0.0) > 1e-6 * s[0]:
        return None
    f = u[:, 0] * np.sqrt(s[0])
    g = vt[0] * np.sqrt(s[0])
    if not np.allclose(np.outer(f, g), k, atol=1e-7):
        return None
    if not np.allclose(f, g, atol=1e-7):
        return None  # keep it simple: only symmetric separable kernels
    if f.sum() < 0:
        f = -f
    return jnp.asarray(f, dtype=jnp.float32)


def upfirdn2d(x, kernel, up: int = 1, down: int = 1, pad=(0, 0)):
    """Upsample-FIR-downsample on NHWC images.

    Args:
      x: ``(N, H, W, C)`` input.
      kernel: 2-D FIR kernel (usually from :func:`make_resample_kernel`).
      up / down: integer resampling factors (applied to both axes).
      pad: ``(pad0, pad1)`` applied to both axes, matching the reference
        2-tuple convention, or a 4-tuple ``(y0, y1, x0, x1)``.

    Returns:
      ``(N, H', W', C)`` with ``H' = (H*up + pad0 + pad1 - kh + 1) // down``
      (cdiv for the slice semantics of the reference down-slice).
    """
    if len(pad) == 2:
        pad4 = (pad[0], pad[1], pad[0], pad[1])
    else:
        pad4 = tuple(pad)
    factor = _separable_factor(kernel)
    if factor is not None:
        return _upfirdn2d_separable(x, factor, up, down, pad4)
    return _upfirdn2d_conv(x, jnp.asarray(kernel), up, down, pad4)


# ----------------------------------------------------------------------------
# Blur / Upsample / Downsample wrappers (reference
# stylegan2_common_layers.py:94-152).  The pad arithmetic is reproduced
# exactly; these are pure functions of static python config, so everything is
# resolved at trace time.
# ----------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _cached_kernel(taps: tuple, gain: float) -> np.ndarray:
    # Cached as host numpy: jnp arrays created inside a trace are tracers in
    # recent JAX and must not leak across traces through this cache.
    k = np.asarray(taps, dtype=np.float32)
    k = np.outer(k, k)
    return (k / k.sum()) * gain


def upsample_2x(x, taps=(1, 3, 3, 1), factor: int = 2):
    """FIR upsample by ``factor`` (reference Upsample, :94-112)."""
    kernel = _cached_kernel(tuple(taps), float(factor**2))
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=factor, down=1, pad=(pad0, pad1))


def downsample_2x(x, taps=(1, 3, 3, 1), factor: int = 2):
    """FIR downsample by ``factor`` (reference Downsample, :115-133)."""
    kernel = _cached_kernel(tuple(taps), 1.0)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def _pallas_blur_wanted(shape, taps, pad4, itemsize) -> bool:
    """Kernel-choice policy.  Round-4 hardware verdict: **XLA by default.**

    Standalone (scripts/blur_hw_check.py, v5e bf16): the Pallas kernel wins
    5.0x/7.9x/9.1x on the odd post-convT maps (257^2x128 / 129^2x256 /
    65^2x512, pad 1,1) where XLA's isolated depthwise lowering collapses,
    and ties (0.94-1.14x) on the even pre-downsample maps.

    **In-model** (bench.py run_id-8 A/B, median of 3 chains): routing the
    odd maps to the kernel drops throughput 69.3 -> 52.6 imgs/s.  Inside
    the step XLA never runs those blurs standalone — it fuses them into
    the surrounding convT/conv chains — and a custom call in the middle
    forces the 257^2-class intermediates (and their R1 grad-of-grad
    cotangents) to materialize in HBM.  The standalone win is a
    measurement artifact of de-fused execution, so the default stays XLA;
    ``GIF_TPU_PALLAS_BLUR=auto`` re-enables the odd-shape routing and
    ``1`` forces the kernel everywhere supported (both kept for
    experimentation; off-TPU ``supports()`` is always False).
    """
    mode = os.environ.get("GIF_TPU_PALLAS_BLUR", "0")
    if mode == "0":
        return False
    if not blur_pallas.supports(shape, taps, 1, 1, pad4, itemsize):
        return False
    if mode == "1":
        return True
    _, h, w, _ = shape
    return h % 2 == 1 or w % 2 == 1


def blur(x, pad, taps=(1, 3, 3, 1), upsample_factor: int = 1):
    """FIR blur with explicit pad (reference Blur, :136-152).

    Runs as two rank-1 XLA depthwise passes that fuse into the adjacent
    convs; see ``_pallas_blur_wanted`` for the measured reasons the Pallas
    stencil kernel is opt-in only.  Parity incl. second-order gradients is
    pinned by tests/test_blur_pallas.py and hardware-checked by
    scripts/blur_hw_check.py.
    """
    gain = float(upsample_factor**2) if upsample_factor > 1 else 1.0
    if len(pad) == 2:
        pad4 = (pad[0], pad[1], pad[0], pad[1])
    else:
        pad4 = tuple(pad)
    if _pallas_blur_wanted(x.shape, taps, pad4, x.dtype.itemsize):
        return blur_pallas.blur4_pallas(x, blur_pallas.taps_1d(tuple(taps), gain), pad4)
    kernel = _cached_kernel(tuple(taps), gain)
    return upfirdn2d(x, kernel, pad=pad4)
