"""Blur-folded up/down convolutions — the TPU formulation of StyleGAN2's
``conv_transpose + FIR blur`` and ``FIR blur + strided conv`` chains.

The reference (model/stylegan2_common_layers.py:272-286, :752-799) resamples
with explicit FIR passes around the conv: upsample runs
``conv_transpose(k3, s2, VALID)`` to an ODD (2H+1)-sized intermediate and
blurs it back down to 2H; downsample blurs at full resolution and then runs
a stride-2 conv.  On TPU both shapes are poison: the 4-tap depthwise blur
passes are VPU/HBM-bound (profiled ~3x off the memory roofline, ~45 ms/step
across the 150+ blur ops of a full train step), the odd intermediates defeat
the (8, 128) tiling, and the transposed conv drags activation ``reverse``
ops into the backward pass.

Because blur, zero-stuffing and convolution are all linear, each chain
collapses into ONE dense convolution with a *composed* kernel:

- ``downsample_conv_2x``:  blur(pad p) . conv(k, s2)  ==  conv(K, s2) with
  ``K = w (*) flip(blur)`` (full correlation-composition, size k+3).
- ``upsample_conv_2x``:  blur(gain 4) . conv_transpose(k3, s2)  ==  a
  3x3 conv producing the four output phases as channels, followed by
  depth-to-space:  ``out[2y+a, 2x+b] = (x * P_ab)[y, x]`` where the four
  3x3 phase kernels ``P_ab`` are slices of the composed 6-tap kernel.

Both compositions are exact (same linear map, different association) and are
applied to the *kernel* at trace time through a constant basis matrix (the
FIR taps are static python config), so the per-step cost is one tiny matmul.
The resulting convs have even shapes, dense MXU-friendly kernels, and plain
conv backward passes (no reverses).

MEASURED VERDICT (v5e, bench config): NOT wired into the train step.  The
composed kernels inflate dense-MXU FLOPs 4x (3x3 -> 6x6 down; 2.25-tap
effective convT -> 4 polyphase 3x3s up) on convs XLA already runs at ~95%
MXU utilization — the full-step benchmark regressed 69.4 -> 48.9 imgs/s.
The module is kept as the exactness-pinned composition reference
(tests/test_fused_resample.py) and for genuinely bandwidth-bound callers
(tiny-channel stems where MXU padding makes the extra taps free).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _blur_kernel_2d(taps: tuple, gain: float) -> np.ndarray:
    # Single source of truth for the FIR kernel construction: the live blur
    # path's normalization (upfirdn._cached_kernel), upcast for the f64
    # composition-basis algebra below.
    from gif_tpu.ops.upfirdn import _cached_kernel

    return np.asarray(_cached_kernel(tuple(taps), float(gain)), np.float64)


@functools.lru_cache(maxsize=None)
def _down_basis(kernel_size: int, taps: tuple) -> np.ndarray:
    """Constant matrix M ((k+L-1)^2, k^2) with ``vec(K) = M @ vec(w)`` for the
    downsample composition ``K[t] = sum_u w[u] * flip(blur)[t-u]``.

    Built numerically from basis kernels so orientation conventions are
    inherited from the op semantics rather than re-derived:
    ``blur(x, pad) = correlate(pad(x), flip(blur2d))`` and the stride-2 conv
    is a plain correlation, so the composed correlation kernel is the full
    convolution of ``w`` with ``flip(blur2d)``.
    """
    L = len(taps)
    k = kernel_size
    m = k + L - 1
    kf = _blur_kernel_2d(taps, 1.0)[::-1, ::-1]
    M = np.zeros((m * m, k * k))
    for u1 in range(k):
        for u2 in range(k):
            K = np.zeros((m, m))
            # place flip(blur) at offset (u1, u2): K[t] = kf[t - u]
            K[u1 : u1 + L, u2 : u2 + L] = kf
            M[:, u1 * k + u2] = K.reshape(-1)
    return M.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _up_basis(taps: tuple) -> np.ndarray:
    """Constant matrix M ((2*2*3*3), 9) mapping a 3x3 kernel to the four 3x3
    polyphase kernels of the composed upsample transform.

    Derivation (verified exactly against the reference chain): with
    ``y[r] = sum_m x[m] * wT[r - 2m]`` (the VALID stride-2 transposed conv,
    ``transpose_kernel=True`` — wT == w, no flip) and the gain-4 blur
    ``z[i] = sum_j B[j] * y[i + j - 1]`` (pad 1/1), the composition is
    ``z[2y+a] = sum_d x[y+d] * C[a - 2d]`` with
    ``C[t] = sum_j B[j] * w[t + j - 1]``, support t in [-2, 3].  The phase
    kernels are therefore ``P_ab[d1, d2] = C[a - 2*(d1-1), b - 2*(d2-1)]``.
    """
    if len(taps) != 4:
        raise ValueError("upsample composition derived for 4-tap FIR kernels")
    B = _blur_kernel_2d(taps, 4.0)
    M = np.zeros((2 * 2 * 3 * 3, 9))
    for u1 in range(3):
        for u2 in range(3):
            # C[t] for basis w = delta(u): C[t1,t2] = B[t1+j... ] — build the
            # full 6x6 composed kernel indexed by t+2 in [0, 5].
            C = np.zeros((6, 6))
            for j1 in range(4):
                for j2 in range(4):
                    t1 = u1 - j1 + 1  # w[t + j - 1] = delta(u) -> t = u - j + 1
                    t2 = u2 - j2 + 1
                    if -2 <= t1 <= 3 and -2 <= t2 <= 3:
                        C[t1 + 2, t2 + 2] += B[j1, j2]
            for a in range(2):
                for b in range(2):
                    for d1 in range(3):
                        for d2 in range(3):
                            row = ((a * 2 + b) * 3 + d1) * 3 + d2
                            M[row, u1 * 3 + u2] = C[a - 2 * (d1 - 1) + 2, b - 2 * (d2 - 1) + 2]
    return M.astype(np.float32)


def downsample_conv_2x(x, w, taps=(1, 3, 3, 1), pad_override=None):
    """``blur(x, pad=((p+1)//2, p//2)); conv(w, stride 2, VALID)`` as ONE
    dense stride-2 conv with the blur folded into the kernel.

    Exactly equals the reference chain (stylegan2_common_layers.py:280-286
    and :752-799 with ``downsample=True``); ``p = (L - 2) + (k - 1)``.

    Args:
      x: ``(N, H, W, Ci)``.
      w: ``(k, k, Ci, Co)`` (already He-scaled by the caller).
    """
    k = w.shape[0]
    if w.shape[1] != k:
        raise ValueError("square kernels only")
    L = len(taps)
    M = jnp.asarray(_down_basis(k, tuple(taps)))
    ci, co = w.shape[2], w.shape[3]
    K = (M @ w.reshape(k * k, ci * co)).reshape(k + L - 1, k + L - 1, ci, co)
    p = (L - 2) + (k - 1)
    p0, p1 = (p + 1) // 2, p // 2
    if pad_override is not None:
        p0, p1 = pad_override
    return lax.conv_general_dilated(
        x,
        K.astype(x.dtype),
        window_strides=(2, 2),
        padding=((p0, p1), (p0, p1)),
        dimension_numbers=_DN,
    )


def upsample_conv_2x(x, w, taps=(1, 3, 3, 1)):
    """``conv_transpose(w, s2, VALID, transpose_kernel=True); blur(gain 4)``
    as ONE 3x3 conv producing the four polyphase outputs + depth-to-space.

    Exactly equals the reference chain (stylegan2_common_layers.py:272-278,
    :322-333) for 3x3 kernels and 4-tap FIR; shapes stay even throughout and
    the backward pass is a plain conv backward (no activation reverses).

    Args:
      x: ``(N, H, W, Ci)``.
      w: ``(3, 3, Ci, Co)`` — the kernel of the *forward* conv this is the
        transpose of, laid out HWIO exactly as the non-folded path's
        ``conv_transpose(..., jnp.swapaxes(w, 2, 3), transpose_kernel=True)``
        expects before the swap (i.e. pass the same ``w``).

    Returns:
      ``(N, 2H, 2W, Co)``.
    """
    if w.shape[0] != 3 or w.shape[1] != 3:
        raise ValueError("polyphase upsample composition requires 3x3 kernels")
    n, h, wd, ci = x.shape
    co = w.shape[3]
    M = jnp.asarray(_up_basis(tuple(taps)))
    # (2,2,3,3) x (ci,co) -> phase-major kernel (3,3,ci,4co) with channel
    # order (a, b, co) so a plain reshape performs depth-to-space.
    P = (M @ w.reshape(9, ci * co)).reshape(2 * 2, 3, 3, ci, co)
    P = jnp.transpose(P, (1, 2, 3, 0, 4)).reshape(3, 3, ci, 4 * co)
    y = lax.conv_general_dilated(
        x,
        P.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=_DN,
    )
    y = y.reshape(n, h, wd, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * wd, co)
    return y
