"""Equalized linear layer and pixel norm.

Reference semantics: ``EqualLinear`` (stylegan2_common_layers.py:193-235) —
runtime weight scaling ``lr_mul / sqrt(fan_in)``, bias scaled by ``lr_mul``.
With ``activation`` set, the bias is added *after* the matmul and a
leaky-relu(0.2) follows; NOTE the reference applies **no** sqrt(2) gain there
unless the ``apply_sqrt2`` quirk flag is set (a checkpoint-compat quirk for
the reference's run-29 model, stylegan2_common_layers.py:218-222).

``PixelNorm`` (stylegan2_common_layers.py:75-80): x * rsqrt(mean(x^2) + 1e-8)
over the feature axis.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

SQRT2 = 1.41421356237


@dataclasses.dataclass(frozen=True)
class EqualLinearParams:
    """Static config for an equalized linear layer."""

    lr_mul: float = 1.0
    activation: bool = False
    apply_sqrt2: bool = False


def equal_linear(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    *,
    lr_mul: float = 1.0,
    activation: bool = False,
    apply_sqrt2: bool = False,
) -> jnp.ndarray:
    """y = x @ (weight * scale)^T (+ bias * lr_mul) [+ leaky-relu].

    Args:
      x: ``(..., in_dim)``.
      weight: ``(out_dim, in_dim)`` — stored unscaled; init std should be
        ``scale_weight / lr_mul`` to match the reference init.
      bias: ``(out_dim,)`` or None.
    """
    in_dim = weight.shape[1]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    out = x @ (weight * scale).T
    if activation:
        if bias is not None:
            out = out + bias * lr_mul
        out = jax.nn.leaky_relu(out, negative_slope=0.2)
        if apply_sqrt2:
            out = out * SQRT2
    elif bias is not None:
        out = out + bias * lr_mul
    return out


def pixel_norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """x * rsqrt(mean(x^2, axis) + eps)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)
