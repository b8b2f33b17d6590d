"""Fused bias + leaky-relu + sqrt(2) gain.

Reference: ``FusedLeakyReLU`` (stylegan2_common_layers.py:22-39) — per-channel
bias add, leaky-relu(0.2), multiply by sqrt(2); and ``ScaledLeakyReLU``
(:238-247) — leaky-relu then sqrt(2), no bias.

On TPU this op is memory-bound; the Pallas kernel keeps it one VMEM pass with
a custom VJP so the backward is a single pass too.  The XLA path is kept as
the default inside larger jitted programs (XLA fuses it into the producing
conv); the Pallas path is exercised by tests and available for standalone use.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_NEG_SLOPE = 0.2
_SCALE = math.sqrt(2.0)


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = _NEG_SLOPE) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=negative_slope) * _SCALE


def _fused_xla(x, bias, negative_slope, scale):
    y = x + bias.astype(x.dtype).reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(y, negative_slope=negative_slope) * jnp.asarray(
        scale, x.dtype
    )


# ----------------------------------------------------------------------------
# Pallas kernel
# ----------------------------------------------------------------------------


def _flr_fwd_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    x = x_ref[...]
    b = b_ref[...]
    y = x + b[None, :]
    o_ref[...] = jnp.where(y >= 0, y, y * negative_slope) * scale


def _flr_bwd_kernel(x_ref, b_ref, g_ref, dx_ref, *, negative_slope, scale):
    y = x_ref[...] + b_ref[...][None, :]
    g = g_ref[...]
    dx_ref[...] = jnp.where(y >= 0, g * scale, g * (scale * negative_slope))


def _pallas_rows_call(kernel, out_dtype, x2, bias, *extra):
    """Run a row-tiled pallas kernel over a (rows, C) view."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Off-TPU (tests run on a virtual CPU mesh) use the pallas interpreter.
    interpret = jax.default_backend() != "tpu"

    rows, c = x2.shape
    row_block = max(8, min(1024, rows))
    # Pad rows to a multiple of the block so the grid is exact.
    pad_rows = (-rows) % row_block
    if pad_rows:
        x2 = jnp.pad(x2, ((0, pad_rows), (0, 0)))
        extra = tuple(
            jnp.pad(e, ((0, pad_rows), (0, 0))) if e.ndim == 2 else e for e in extra
        )
    grid = ((rows + pad_rows) // row_block,)

    def spec_for(a):
        if a.ndim == 1:
            return pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
        return pl.BlockSpec((row_block, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    operands = (x2, bias) + extra
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(((rows + pad_rows), c), out_dtype),
        grid=grid,
        in_specs=[spec_for(a) for a in operands],
        out_specs=pl.BlockSpec(
            (row_block, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*operands)
    if pad_rows:
        out = out[:rows]
    return out


def _fused_pallas_fwd(x, bias, negative_slope, scale):
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    kernel = functools.partial(
        _flr_fwd_kernel, negative_slope=negative_slope, scale=scale
    )
    return _pallas_rows_call(kernel, x.dtype, x2, bias.astype(x.dtype)).reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray,
    negative_slope: float = _NEG_SLOPE,
    scale: float = _SCALE,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """(x + bias) -> leaky_relu -> * scale, channel-last bias.

    Args:
      x: ``(..., C)``.
      bias: ``(C,)``.
      use_pallas: route through the Pallas kernel (TPU) instead of plain XLA.
    """
    if use_pallas:
        return _fused_pallas_fwd(x, bias, negative_slope, scale)
    return _fused_xla(x, bias, negative_slope, scale)


def _flr_vjp_fwd(x, bias, negative_slope, scale, use_pallas):
    out = fused_leaky_relu(x, bias, negative_slope, scale, use_pallas)
    return out, (x, bias)


def _flr_vjp_bwd(negative_slope, scale, use_pallas, res, g):
    x, bias = res
    if use_pallas:
        c = x.shape[-1]
        kernel = functools.partial(
            _flr_bwd_kernel, negative_slope=negative_slope, scale=scale
        )
        dx = _pallas_rows_call(
            kernel, x.dtype, x.reshape(-1, c), bias.astype(x.dtype), g.reshape(-1, c)
        ).reshape(x.shape)
    else:
        y = x + bias.astype(x.dtype).reshape((1,) * (x.ndim - 1) + (-1,))
        dx = jnp.where(y >= 0, g * scale, g * (scale * negative_slope)).astype(x.dtype)
    db = dx.sum(axis=tuple(range(x.ndim - 1))).astype(bias.dtype)
    return dx, db


fused_leaky_relu.defvjp(_flr_vjp_fwd, _flr_vjp_bwd)
