"""Equalized and style-modulated convolutions, NHWC, TPU-first.

``modulated_conv2d`` reproduces the math of the reference ModulatedConv2d
(stylegan2_common_layers.py:250-349) but NOT its implementation: the
reference reshapes per-sample modulated weights into a grouped conv with
batch-as-groups, which on TPU would shatter the MXU matmul into B tiny
convolutions.  Because the style modulation scales *input channels* and the
demodulation scales *output channels*, both commute with the convolution:

    conv(x, scale * w * s_b) * d_b  ==  conv(x * s_b, scale * w) * d_b

so we scale the activations instead and keep ONE shared-weight conv across
the whole batch — a single large MXU contraction that XLA pipelines well.
This identity is exact (same multiplies, different association).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gif_tpu.ops.upfirdn import blur, _cached_kernel
from gif_tpu.ops.linear import equal_linear

_DN = ("NHWC", "HWIO", "NHWC")


def resample_mode() -> str:
    """Resampling-conv formulation policy (``GIF_TPU_RESAMPLE``).

    The reference's upsample path (conv_transpose2d then FIR blur,
    stylegan2_common_layers.py:272-278) produces 2H+1-sized intermediates
    (257^2/129^2/65^2 at 256px) that tile poorly on the 8x128 TPU vregs —
    the ~35 ms/step "odd-shape" pool in the round-3 profile.  Three exact
    reformulations of the same math:

    - ``legacy``: the faithful split form (odd intermediates).
    - ``even``:   one extra high-side pad column on the transposed conv —
      provably exactly zero, i.e. the very zero the blur's high pad would
      have supplied — so the intermediate is even-sized and the blur high
      pad drops by one.  Bitwise-identical outputs.  The downsample blurs
      get a matching +1 high pad whose extra column the following VALID
      stride-2 conv never reads.
    - ``phase``:  fold the FIR into the conv kernel and phase-decompose the
      stride-2 transposed conv into ONE dense kh x kw conv producing
      (2*2*Cout) channels followed by a depth-to-space interleave: a single
      large MXU contraction at even sizes, no depthwise FIR pass, no odd
      intermediate.  Same values up to float reassociation.

    Hardware A/B (bench.py run_id-8, v5e 1 chip, median of 3 chains,
    2026-08-19): legacy **70.44**, even 70.20, phase 63.06 imgs/s.  The
    composite kernel's 4x MAC increase on the upsample convs costs more
    than the fused-FIR/odd-shape savings buy, and map parity alone is
    perf-neutral — XLA's fused chains already handle the odd maps well
    (same in-model lesson as the Pallas blur, upfirdn._pallas_blur_wanted).
    ``legacy`` therefore stays the default; the others remain selectable
    for experimentation and regression tracking.
    """
    return os.environ.get("GIF_TPU_RESAMPLE", "legacy")


def even_extended_pad(h: int, pad0: int, pad1: int, taps_len: int, consumer_k: int):
    """+1 high-side blur pad when (a) the blur output would be odd-sized and
    (b) the extra column is provably never read by the following VALID
    stride-``2`` conv with ``consumer_k``-sized windows (output count
    unchanged).  Output values are bitwise-identical; only the map parity
    changes.  No-op under ``GIF_TPU_RESAMPLE=legacy``."""
    if resample_mode() == "legacy":
        return pad0, pad1
    out = h + pad0 + pad1 - taps_len + 1
    if out % 2 == 1 and (out - consumer_k) % 2 == 0:
        return pad0, pad1 + 1
    return pad0, pad1


@functools.lru_cache(maxsize=None)
def _phase_gather_index(kh: int, fh: int):
    """Static index tables for the phase decomposition (1-D, per axis).

    The composite true-convolution kernel c = w * fir has kh+fh-1 taps.
    Output sample 2p+r of the (zero-stuff-by-2 -> conv c) chain is the
    correlation of x with the flipped even/odd comb of c:

        out[2p+r] = sum_s chat_r[s] * x[p+s-S],  chat_r[s] = c[2*(S-s)+r]

    with S = (kh+fh-1)//2 - 1 phase taps per side (kh=3, fh=4 -> 3 taps,
    SAME padding 1).  Returns (idx, pad) where idx[s, r] indexes c and pad
    is the symmetric spatial padding of the phase conv.
    """
    n = kh + fh - 1  # composite tap count (6 for GIF)
    per_phase = n // 2  # taps per phase (3)
    s = np.arange(per_phase)[:, None]
    r = np.arange(2)[None, :]
    idx = 2 * (per_phase - 1 - s) + r  # flip within the phase
    assert idx.min() >= 0 and idx.max() < n
    return idx, (per_phase - 1) // 2


def _upsample_phase(xs: jnp.ndarray, wc: jnp.ndarray, blur_taps) -> jnp.ndarray:
    """Stride-2 transposed conv + FIR blur as one dense conv + pixel shuffle.

    Exact phase decomposition of the reference chain (see ``resample_mode``):
    composite kernel c[n,m] = sum_{a,b} w[a,b] fir[n-a,m-b]; output pixel
    (2py+ry, 2px+rx) is a SAME correlation of x with the (ry,rx) phase comb
    of c.  All four phases stack on the channel axis of a single conv —
    (kh,kw,Cin,4*Cout) — whose output depth-to-spaces into (2H,2W,Cout).
    """
    kh, kw, cin, cout = wc.shape
    fir = _cached_kernel(tuple(blur_taps), 4.0)  # gain 2**2, host numpy
    fh, fw = fir.shape
    # Composite kernel via a static spreading tensor: T[n,a] = fir1d-free
    # general form T[n,m,a,b] = fir[n-a, m-b] (zero outside).
    n_t = kh + fh - 1
    t2 = np.zeros((n_t, n_t, kh, kw), np.float32)
    for a in range(kh):
        for b in range(kw):
            nyv = np.arange(n_t)[:, None] - a
            nxv = np.arange(n_t)[None, :] - b
            m = (nyv >= 0) & (nyv < fh) & (nxv >= 0) & (nxv < fw)
            t2[:, :, a, b] = np.where(m, fir[np.clip(nyv, 0, fh - 1),
                                            np.clip(nxv, 0, fw - 1)], 0.0)
    c = jnp.einsum("nmab,abio->nmio", jnp.asarray(t2), wc.astype(jnp.float32))
    idx, pad = _phase_gather_index(kh, fh)
    # Phase-comb gather per axis, flipped: (s,ry, t,rx, cin, cout).
    c = c[idx]          # (s, ry, n_x, cin, cout)
    c = c[:, :, idx]    # (s, ry, t, rx, cin, cout)
    # -> (s, t, cin, ry, rx, cout) -> (kh, kw, cin, 4*cout); the (ry, rx)
    # ordering matches the depth-to-space below.
    khat = jnp.transpose(c, (0, 2, 4, 1, 3, 5)).reshape(
        idx.shape[0], idx.shape[0], cin, 4 * cout
    )
    y = lax.conv_general_dilated(
        xs,
        khat.astype(xs.dtype),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DN,
    )
    n, h, w, _ = y.shape
    y = y.reshape(n, h, w, 2, 2, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(n, 2 * h, 2 * w, cout)


def equal_conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Conv with runtime He scaling (reference EqualConv2d, :155-184).

    Args:
      x: ``(N, H, W, Cin)``.
      weight: ``(kh, kw, Cin, Cout)`` unit-normal initialized.
    """
    kh, kw, cin, cout = weight.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    out = lax.conv_general_dilated(
        x,
        (weight * scale).astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DN,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def modulated_conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    style: jnp.ndarray,
    *,
    demodulate: bool = True,
    upsample: bool = False,
    downsample: bool = False,
    blur_taps=(1, 3, 3, 1),
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Style-modulated conv (StyleGAN2) on NHWC activations.

    Args:
      x: ``(N, H, W, Cin)``.
      weight: ``(kh, kw, Cin, Cout)`` unit-normal initialized (the runtime
        ``1/sqrt(fan_in)`` He scale is applied here).
      style: ``(N, Cin)`` per-input-channel modulation (already passed through
        the modulation EqualLinear by the caller).

    Returns:
      ``(N, H', W', Cout)``; H' = 2H for upsample, H/2 for downsample, else H.
    """
    kh, kw, cin, cout = weight.shape
    fan_in = cin * kh * kw
    scale = 1.0 / math.sqrt(fan_in)
    w = weight * scale

    if demodulate:
        # d_{b,o} = rsqrt( sum_{h,w,i} (w_{hwio} * s_{bi})^2 + eps )
        sigma = jnp.einsum(
            "hwio,bi->bo",
            jnp.square(w),
            jnp.square(style),
            preferred_element_type=jnp.float32,
        )
        demod = lax.rsqrt(sigma + eps)

    xs = x * style[:, None, None, :].astype(x.dtype)
    wc = w.astype(x.dtype)

    if upsample:
        # Matches torch conv_transpose2d(stride=2, padding=0) followed by a
        # gain-4 blur with pads ((p+1)//2+1, p//2+1), p = 4-2-(k-1)
        # (reference :272-278, :322-333).  Three exact formulations selected
        # by ``resample_mode()`` — see its docstring for the TPU layout
        # rationale.
        mode = resample_mode()
        # The phase index algebra below is derived for the k=3 / 4-tap case —
        # the only upsample shape GIF uses; everything else takes the even
        # formulation.
        if mode == "phase" and kh == kw == 3 and len(blur_taps) == 4:
            out = _upsample_phase(xs, wc, tuple(blur_taps))
        else:
            p = (len(blur_taps) - 2) - (kh - 1)
            pad0 = (p + 1) // 2 + 1
            pad1 = p // 2 + 1
            extra = 1 if (mode != "legacy" and kh % 2 == 1 and pad1 >= 1) else 0
            # The extra high-side output column of the dilated conv is
            # exactly zero (its window covers only zero-stuffed/pad
            # positions), i.e. the very zero the blur's high pad supplies —
            # so trading one blur pad for one conv pad is bitwise-exact and
            # makes the intermediate even-sized.
            # Written as the explicit lhs-dilated conv (zero-stuff stride 2,
            # pad k-1, spatially flipped kernel) rather than
            # ``lax.conv_transpose``: identical forward HLO, but JAX's
            # transpose rule for the dilated conv expresses the gradient as
            # another conv with a *kernel* flip, while conv_transpose's
            # gradient reverses the (2H+1)^2 activation cotangent — ~4
            # ms/step of pure data movement at 256px batch 16.
            out = lax.conv_general_dilated(
                xs,
                wc[::-1, ::-1],
                window_strides=(1, 1),
                padding=((kh - 1, kh - 1 + extra), (kw - 1, kw - 1 + extra)),
                lhs_dilation=(2, 2),
                dimension_numbers=_DN,
            )
            out = blur(
                out, pad=(pad0, pad1 - extra), taps=blur_taps, upsample_factor=2
            )
    elif downsample:
        # Blur then stride-2 valid conv (reference :280-286, :335-341).
        p = (len(blur_taps) - 2) + (kh - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        py0, py1 = even_extended_pad(xs.shape[1], pad0, pad1, len(blur_taps), kh)
        px0, px1 = even_extended_pad(xs.shape[2], pad0, pad1, len(blur_taps), kw)
        xs = blur(xs, pad=(py0, py1, px0, px1), taps=blur_taps)
        out = lax.conv_general_dilated(
            xs, wc, window_strides=(2, 2), padding="VALID", dimension_numbers=_DN
        )
    else:
        pad = kh // 2
        out = lax.conv_general_dilated(
            xs,
            wc,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=_DN,
        )

    if demodulate:
        out = out * demod[:, None, None, :].astype(out.dtype)
    return out


def modulation_style(
    latent: jnp.ndarray,
    mod_weight: jnp.ndarray,
    mod_bias: jnp.ndarray,
    *,
    apply_sqrt2: bool = False,
) -> jnp.ndarray:
    """The modulation EqualLinear (bias_init=1) mapping w -> per-channel style.

    Reference: stylegan2_common_layers.py:296-311.
    """
    return equal_linear(
        latent, mod_weight, mod_bias, activation=False, apply_sqrt2=apply_sqrt2
    )
