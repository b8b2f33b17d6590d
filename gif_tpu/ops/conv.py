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

import math

import jax
import jax.numpy as jnp
from jax import lax

from gif_tpu.ops.upfirdn import blur
from gif_tpu.ops.linear import equal_linear

_DN = ("NHWC", "HWIO", "NHWC")


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
        # (reference :272-278, :322-333).
        # Written as the explicit lhs-dilated conv (zero-stuff stride 2, pad
        # k-1, spatially flipped kernel) rather than ``lax.conv_transpose``:
        # identical forward HLO, but JAX's transpose rule for the dilated
        # conv expresses the gradient as another conv with a *kernel* flip,
        # while conv_transpose's gradient reverses the (2H+1)^2 activation
        # cotangent — ~4 ms/step of pure data movement at 256px batch 16.
        out = lax.conv_general_dilated(
            xs,
            wc[::-1, ::-1],
            window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=_DN,
        )
        p = (len(blur_taps) - 2) - (kh - 1)
        pad0 = (p + 1) // 2 + 1
        pad1 = p // 2 + 1
        out = blur(out, pad=(pad0, pad1), taps=blur_taps, upsample_factor=2)
    elif downsample:
        # Blur then stride-2 valid conv (reference :280-286, :335-341).
        p = (len(blur_taps) - 2) + (kh - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        xs = blur(xs, pad=(pad0, pad1), taps=blur_taps)
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
