"""Pallas TPU kernel for the 4-tap separable FIR blur.

The reference resampling chains (model/stylegan2_common_layers.py:136-152)
surround every up/down conv with a [1,3,3,1] FIR blur.  XLA lowers these to
depthwise convolutions, which the TPU convolution emitter runs well off the
HBM roofline (depthwise work gives the MXU nothing to contract); profiled
on the full train step (v5e, 256px batch 16) the blur passes and their
odd-size convT intermediates are the single largest non-matmul pool
(~35 ms/step of the 214 ms conv-fusion total — see ROUND3.md's table).

This kernel computes BOTH separable passes in one VMEM round trip:

- grid over (batch, H-slabs); channels stay whole (every GIF blur site has
  C <= 512, so a full-C slab row is a contiguous DMA) and ride the lane dim;
- the input is zero-padded on the host (one jnp.pad, fused with the W tile
  alignment pad) so every slab is a uniform ``hb + 3``-row window at offset
  ``hi * hb`` — no edge cases in the kernel;
- the input stays in HBM and its halo'd slabs are **manually
  double-buffered across grid steps**: each step starts the DMA for the
  NEXT slab into the other buffer before waiting on its own, so the halo
  reads overlap compute (scratch and DMA semaphores persist across the
  sequential TPU grid).  The first version of this kernel issued a
  synchronous start/wait per step and measured ~100-150 GB/s on a v5e —
  well under the two-pass XLA depthwise lowering; the overlap is the fix.
  The output slab is a normal pipelined BlockSpec block (double-buffered
  by the Pallas pipeline);
- the vertical pass is 4 static leading-dim slices x taps, the horizontal
  pass is 4 static sublane slices (the host pad already covers the
  horizontal halo).

The blur is linear, so the VJP is the same kernel with flipped taps and
transposed pads (pad' = L-1-p, the full-correlation transpose), wired as a
``jax.custom_vjp`` below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget per grid step (bytes): in-slab + out-slab + the two
# pass intermediates + the pipeline's double buffering of the out block.
_VMEM_BUDGET = 6 << 20


def _blur_slab_kernel(
    x_hbm,  # (B, h_out_k + 3, Wpad, C) in HBM, fully zero-padded by the host
    out_ref,  # (1, hb, W_out_p, C) VMEM block
    xslab,  # (2, hb + 3, Wpad, C) VMEM double buffer
    sem,  # (2,) DMA semaphores
    *,
    taps: tuple,
    w_out: int,  # padded output width (the host slices back to logical)
    hb: int,
    n_h: int,
    total: int,  # b * n_h grid steps
):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    step = bi * n_h + hi

    # Slab `s` (global step order) reads the uniform hb+3-row window at
    # row (s % n_h) * hb of batch s // n_h — host padding removed every
    # edge case, so one descriptor shape covers all steps and the wait can
    # rebuild the start's descriptor exactly.
    def dma(s, slot):
        return pltpu.make_async_copy(
            x_hbm.at[s // n_h, pl.ds((s % n_h) * hb, hb + 3)],
            xslab.at[slot],
            sem.at[slot],
        )

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        dma(step, slot).start()

    # Prefetch the next slab into the other buffer before blocking on ours.
    @pl.when(step + 1 < total)
    def _():
        dma(step + 1, 1 - slot).start()

    dma(step, slot).wait()

    x = xslab[slot]
    t = [jnp.asarray(tv, x.dtype) for tv in taps]
    # Vertical pass: 4 static leading-dim slices.
    v = (
        t[0] * x[0:hb]
        + t[1] * x[1 : hb + 1]
        + t[2] * x[2 : hb + 2]
        + t[3] * x[3 : hb + 3]
    )
    # Horizontal pass: 4 static sublane slices (host pad covers the halo).
    out_ref[0] = (
        t[0] * v[:, 0:w_out]
        + t[1] * v[:, 1 : w_out + 1]
        + t[2] * v[:, 2 : w_out + 2]
        + t[3] * v[:, 3 : w_out + 3]
    )


@functools.lru_cache(maxsize=None)
def taps_1d(taps: tuple, gain: float) -> tuple:
    """Per-axis factor of the 2-D FIR kernel ``outer(t, t) * gain``:
    normalised taps scaled by sqrt(gain) per axis, so the two separable
    kernel passes compose to exactly the 2-D blur."""
    t = np.asarray(taps, dtype=np.float32)
    t = t / t.sum() * np.sqrt(gain)
    return tuple(float(v) for v in t)


def _pick_hb(h_out: int, w: int, c: int, itemsize: int) -> int:
    # VMEM rows per slab height hb: 2*(hb+3) input double buffer + hb for
    # the vertical intermediate + 2*hb pipelined output ≈ 5*hb + 6.
    per_row = w * c * itemsize
    hb = max(1, min(h_out, (_VMEM_BUDGET // per_row - 6) // 5))
    while h_out % hb:
        hb -= 1
    return hb


def _plan(shape, pads, itemsize: int):
    """(slab height, H zero-extension) for this geometry, or None.

    The grid tiles the output H exactly, so the slab height must divide
    ``h_out``; when no divisor fits the VMEM budget at a useful size (e.g.
    ``h_out`` prime, like the 257-row VJP of the 256px down-blur), the host
    zero-extends H by ``e`` rows — exact for a zero-padding FIR blur, the
    ``e`` extra output rows blur trailing zeros and are sliced off — and
    plans for ``h_out + e``.

    The host pads the full halo (see ``_blur4_fwd_impl``), so the only
    constraint is that ``hb`` divides the extended output height.
    """
    b, h, w, c = shape
    p0y, p1y, p0x, p1x = pads
    h_out = h + p0y + p1y - 3
    w_out = w + p0x + p1x - 3
    if h_out < 1 or w_out < 1:
        return None
    wpad = _round8(_round8(w_out) + 3)
    fallback = None
    for e in range(8):
        h_oute = h_out + e
        hb = _pick_hb(h_oute, wpad, c, itemsize)
        if hb == h_oute or hb >= 8:
            return hb, e
        if fallback is None:
            fallback = (hb, e)
    return fallback


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _blur4_fwd_impl(x, taps: tuple, pads: tuple):
    b, h, w, c = x.shape
    p0y, p1y, p0x, p1x = pads
    h_out = h + p0y + p1y - 3
    w_out = w + p0x + p1x - 3
    plan = _plan(x.shape, pads, x.dtype.itemsize)
    if plan is None:
        raise ValueError(f"blur4_pallas cannot cover shape={x.shape} pads={pads}")
    hb, he = plan
    h_out_k = h_out + he
    # One host pad covers everything the kernel reads: the vertical halo
    # (p0y top, p1y + he bottom — total padded H = h_out_k + 3, so every
    # hb+3-row slab window at hi*hb is in-bounds), the horizontal halo
    # (p0x left), and the Mosaic alignment of the DMA'd sublane extent
    # (W padded to a multiple of 8; HBM and VMEM memrefs are (8,128)-tiled,
    # so odd-width maps — the convT outputs, 2^k + 1 — fail to compile
    # otherwise).  The padded columns/rows blur zeros and are sliced off.
    w_out_p = _round8(w_out)
    wpad = _round8(w_out_p + 3)
    x = jnp.pad(
        x,
        ((0, 0), (p0y, p1y + he), (p0x, wpad - p0x - w), (0, 0)),
    )
    n_h = h_out_k // hb
    kernel = functools.partial(
        _blur_slab_kernel,
        taps=taps,
        w_out=w_out_p,
        hb=hb,
        n_h=n_h,
        total=b * n_h,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_h),
        # HBM explicitly, not ANY: a VMEM-placed input would turn the halo
        # copy into a VMEM->VMEM memref_slice with stricter shape rules.
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, hb, w_out_p, c), lambda bi, hi: (bi, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h_out_k, w_out_p, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, hb + 3, wpad, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x)
    if h_out_k != h_out or w_out_p != w_out:
        out = out[:, :h_out, :w_out]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def blur4_pallas(x, taps: tuple, pads: tuple):
    """4-tap separable FIR blur, both passes fused in one Pallas kernel.

    Equivalent to ``upfirdn2d(x, outer(taps, taps) * gain, up=1, down=1,
    pad=pads)`` (reference Blur, stylegan2_common_layers.py:136-152) for 4-tap
    kernels; covers every blur the GIF models issue: the down-path pad (2,1)
    and the gain-4 up-path pad (1,1) on the odd-sized convT output.

    Args:
      x: ``(B, H, W, C)``.
      taps: static 1-D taps, already normalised and sqrt(gain)-scaled per
        axis (the kernel computes exactly ``sum_s taps[s] x[.-p0+s]`` twice).
      pads: static ``(p0y, p1y, p0x, p1x)``, each in [0, 3].

    Returns:
      ``(B, H + p0y + p1y - 3, W + p0x + p1x - 3, C)``.
    """
    # Correlation with the FLIPPED kernel == the reference's true convolution.
    return _blur4_fwd_impl(x, tuple(taps)[::-1], tuple(pads))


def _blur4_vjp_fwd(x, taps, pads):
    return blur4_pallas(x, taps, pads), None


def _blur4_vjp_bwd(taps, pads, _, g):
    # Transpose of correlate(pad(x), flip(t)) is correlate(pad'(g), t) with
    # pad' = L-1-p per side (checked against jax.grad of the XLA formulation
    # in tests/test_blur_pallas.py).  Expressed through the custom_vjp
    # wrapper (flipping the taps to cancel the wrapper's own flip) rather
    # than the raw pallas impl, so EVERY differentiation order stays inside
    # the custom rule — the R1 penalty takes grad-of-grad through the
    # discriminator's blurs, and a raw pallas_call in the cotangent graph
    # has no JVP rule (trace-time AssertionError).
    p0y, p1y, p0x, p1x = pads
    tpads = (3 - p0y, 3 - p1y, 3 - p0x, 3 - p1x)
    return (blur4_pallas(g, tuple(taps)[::-1], tpads),)


blur4_pallas.defvjp(_blur4_vjp_fwd, _blur4_vjp_bwd)


def supports(shape, taps, up: int, down: int, pad4, itemsize: int | None = None) -> bool:
    """True if ``blur4_pallas`` covers this upfirdn geometry on this backend.

    ``itemsize`` is the input dtype's byte width when known; the bf16/f32
    plans are always required too, since the VJP cotangent may arrive in
    either compute dtype.
    """
    if jax.default_backend() != "tpu":
        return False
    b, h, w, c = shape
    if up != 1 or down != 1 or len(taps) != 4:
        return False
    if min(pad4) < 0 or max(pad4) > 3:
        return False
    # Small maps: the slab machinery pays off once the map outgrows VPU noise;
    # below that XLA's depthwise conv is fine.
    if h * w * c < 1 << 16:
        return False
    # Both the forward DMA plan and the VJP's (transposed pads over the
    # output shape) must be coverable, so gradients never hit the impl's
    # ValueError.
    p0y, p1y, p0x, p1x = pad4
    h_out = h + p0y + p1y - 3
    w_out = w + p0x + p1x - 3
    tpads = (3 - p0y, 3 - p1y, 3 - p0x, 3 - p1x)
    sizes = {2, 4} | ({itemsize} if itemsize else set())
    for size in sorted(sizes):  # hb depends on dtype; require all plans viable
        if _plan(shape, pad4, size) is None:
            return False
        if _plan((b, h_out, w_out, c), tpads, size) is None:
            return False
    return True
