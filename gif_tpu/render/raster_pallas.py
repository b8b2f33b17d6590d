"""Pallas TPU rasterizer kernel.

Same tile-binned gather formulation as gif_tpu.render.raster (and the same
numerical semantics as the reference CUDA kernel), but executed as a
VMEM-resident pass with one grid step per *batch element* (grid-step
overhead amortized across all tiles):

- candidate triangle data arrives candidate-major (K, 16): per-candidate
  scalars are sublane-aligned (CK, 1, 1) column slices;
- pixels live on a native (P/128, 128) sublane x lane plane, so every
  output block is hardware-tile aligned;
- an inner ``fori_loop`` over tiles wraps a dynamic ``fori_loop`` over
  candidate chunks, keeping the running (best_z, best_k, best_u, best_v) in
  VMEM scratch: no HBM intermediates (the XLA version materializes ~10
  (K, P) arrays per tile);
- per-tile candidate *counts* arrive via scalar prefetch, so background
  tiles with zero candidates cost one loop-bound check;
- the winner is picked by two min-reductions (z, then lowest candidate id
  among z-ties) — gather-free and deterministic; triangle ids and
  barycentrics are assembled outside with one small XLA gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gif_tpu.render.raster import (
    BIG_DEPTH,
    RasterOutput,
    _bin_triangles,
)

_CHUNK = 64  # candidates processed per loop iteration (sublane dim)
_LANE = 128
_BIG_K = 2**30  # python int: pallas kernels must not capture traced constants


def _raster_batch_kernel(
    counts_ref,  # scalar prefetch: (B, T) int32
    cand_ref,  # (1, TG, K, 16) VMEM: cols x0,y0,z0,x1,y1,z1,x2,y2,z2,valid,...
    bestz_ref,  # (1, TG, SUB, 128) f32
    bestk_ref,  # (1, TG, SUB, 128) int32
    bestu_ref,  # (1, TG, SUB, 128) f32
    bestv_ref,  # (1, TG, SUB, 128) f32
    *,
    tile: int,
    n_tx: int,
    tiles_per_step: int,
):
    b = pl.program_id(0)
    tg = pl.program_id(1)
    sub = (tile * tile) // _LANE

    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (sub, _LANE), 0) * _LANE
        + jax.lax.broadcasted_iota(jnp.int32, (sub, _LANE), 1)
    )
    lx = (lin % tile).astype(jnp.float32)
    ly = (lin // tile).astype(jnp.float32)
    iota_ck = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1, 1), 0)

    def col(blk, i):  # (CK, 16) -> (CK, 1, 1), sublane-aligned slice
        return blk[:, i].reshape(_CHUNK, 1, 1)

    def tile_body(tl, _):
        t = tg * tiles_per_step + tl  # global tile id
        bestz_ref[0, tl] = jnp.full((sub, _LANE), BIG_DEPTH, jnp.float32)
        bestk_ref[0, tl] = jnp.zeros((sub, _LANE), jnp.int32)
        bestu_ref[0, tl] = jnp.zeros((sub, _LANE), jnp.float32)
        bestv_ref[0, tl] = jnp.zeros((sub, _LANE), jnp.float32)

        count = counts_ref[b, t]
        ty = t // n_tx
        tx = t % n_tx
        px = (tx * tile).astype(jnp.float32) + lx[None]  # (1, SUB, 128)
        py = (ty * tile).astype(jnp.float32) + ly[None]

        def chunk_body(ci, _):
            s = ci * _CHUNK
            blk = cand_ref[0, tl, pl.ds(s, _CHUNK), :]  # (CK, 16)
            x0, y0, z0 = col(blk, 0), col(blk, 1), col(blk, 2)
            x1, y1, z1 = col(blk, 3), col(blk, 4), col(blk, 5)
            x2, y2, z2 = col(blk, 6), col(blk, 7), col(blk, 8)
            valid = col(blk, 9)

            v0x = x2 - x0
            v0y = y2 - y0
            v1x = x1 - x0
            v1y = y1 - y0
            dot00 = v0x * v0x + v0y * v0y
            dot01 = v0x * v1x + v0y * v1y
            dot11 = v1x * v1x + v1y * v1y
            det = dot00 * dot11 - dot01 * dot01
            inv = jnp.where(det == 0, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))

            v2x = px - x0  # (CK, SUB, 128)
            v2y = py - y0
            dot02 = v0x * v2x + v0y * v2y
            dot12 = v1x * v2x + v1y * v2y
            u = (dot11 * dot02 - dot01 * dot12) * inv
            v = (dot00 * dot12 - dot01 * dot02) * inv
            w0 = 1.0 - u - v

            inside = (w0 > 0) & (v >= 0) & (u >= 0) & (valid > 0)
            zp = 1.0 / (w0 * (1.0 / z0) + v * (1.0 / z1) + u * (1.0 / z2))
            zm = jnp.where(inside, zp, BIG_DEPTH)  # (CK, SUB, 128)

            zmin = jnp.min(zm, axis=0)  # (SUB, 128)
            k_global = iota_ck + s
            k_masked = jnp.where(zm == zmin[None], k_global, _BIG_K)
            kmin = jnp.min(k_masked, axis=0)  # unique winner slot (SUB, 128)
            onehot = (k_masked == kmin[None]).astype(jnp.float32)
            u_sel = jnp.sum(u * onehot, axis=0)
            v_sel = jnp.sum(v * onehot, axis=0)

            better = zmin < bestz_ref[0, tl]
            bestz_ref[0, tl] = jnp.where(better, zmin, bestz_ref[0, tl])
            bestu_ref[0, tl] = jnp.where(better, u_sel, bestu_ref[0, tl])
            bestv_ref[0, tl] = jnp.where(better, v_sel, bestv_ref[0, tl])
            bestk_ref[0, tl] = jnp.where(
                better, jnp.minimum(kmin, _BIG_K - 1), bestk_ref[0, tl]
            )
            return 0

        n_chunks = (count + _CHUNK - 1) // _CHUNK
        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        return 0

    jax.lax.fori_loop(0, tiles_per_step, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("h", "w", "tile", "max_tris_per_tile"))
def rasterize_pallas(
    face_verts_pix: jnp.ndarray,
    *,
    h: int,
    w: int,
    tile: int = 32,
    max_tris_per_tile: int = 512,
) -> RasterOutput:
    """Drop-in replacement for gif_tpu.render.raster.rasterize.

    Requires ``tile*tile % 128 == 0`` (pixels are laid out on a
    sublane x lane plane)."""
    assert h % tile == 0 and w % tile == 0
    p = tile * tile
    assert p % _LANE == 0, "tile*tile must be a multiple of 128"
    sub = p // _LANE
    n_ty, n_tx = h // tile, w // tile
    n_tiles = n_ty * n_tx
    b, f = face_verts_pix.shape[:2]
    k_bin = min(max_tris_per_tile, f)
    k = ((k_bin + _CHUNK - 1) // _CHUNK) * _CHUNK  # chunk-aligned capacity

    fvp = lax.stop_gradient(face_verts_pix)

    ids, valid, overflow = jax.vmap(
        lambda fv: _bin_triangles(fv, n_ty, n_tx, tile, k_bin, h, w)
    )(fvp)
    if k != k_bin:  # pad the bin out to the chunk boundary
        pad = k - k_bin
        ids = jnp.pad(ids, ((0, 0), (0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, 0), (0, pad)))
    counts = jnp.sum(valid, axis=-1, dtype=jnp.int32)  # (B, T)

    # Candidate tensor (B, T, K, 16): 9 coords + validity + padding.
    gathered = jnp.take_along_axis(
        fvp.reshape(b, f, 9)[:, None], ids[..., None], axis=2
    )  # (B, T, K, 9)
    cand = jnp.concatenate(
        [
            gathered,
            valid[..., None].astype(jnp.float32),
            jnp.zeros((b, n_tiles, k, 6), jnp.float32),
        ],
        axis=-1,
    )

    tiles_per_step = min(8, n_tiles)
    assert n_tiles % tiles_per_step == 0
    n_groups = n_tiles // tiles_per_step
    kernel = functools.partial(
        _raster_batch_kernel, tile=tile, n_tx=n_tx, tiles_per_step=tiles_per_step
    )
    tg_spec = lambda bi, gi, *_: (bi, gi, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_groups),
        in_specs=[
            pl.BlockSpec((1, tiles_per_step, k, 16), tg_spec),
        ],
        out_specs=[
            pl.BlockSpec((1, tiles_per_step, sub, _LANE), tg_spec),
            pl.BlockSpec((1, tiles_per_step, sub, _LANE), tg_spec),
            pl.BlockSpec((1, tiles_per_step, sub, _LANE), tg_spec),
            pl.BlockSpec((1, tiles_per_step, sub, _LANE), tg_spec),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, n_tiles, sub, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((b, n_tiles, sub, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((b, n_tiles, sub, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((b, n_tiles, sub, _LANE), jnp.float32),
    ]
    interpret = jax.default_backend() != "tpu"
    bestz, bestk, bestu, bestv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(counts, cand)

    bestz = bestz.reshape(b, n_tiles, p)
    bestk = bestk.reshape(b, n_tiles, p)
    bestu = bestu.reshape(b, n_tiles, p)
    bestv = bestv.reshape(b, n_tiles, p)

    hit = bestz < BIG_DEPTH
    tri = jnp.take_along_axis(ids, bestk, axis=2)
    tri = jnp.where(hit, tri, -1).astype(jnp.int32)
    w0 = 1.0 - bestu - bestv
    bary = jnp.stack([w0, bestv, bestu], axis=-1)
    bary = jnp.where(hit[..., None], bary, 0.0)

    def detile(x):
        # x: (b, n_tiles, tile, tile, *extra)
        extra = x.shape[4:]
        x = x.reshape((b, n_ty, n_tx, tile, tile) + extra)
        x = jnp.moveaxis(x, 3, 2)
        return x.reshape((b, h, w) + extra)

    depth = detile(bestz.reshape(b, n_tiles, tile, tile))
    tri = detile(tri.reshape(b, n_tiles, tile, tile))
    bary = detile(bary.reshape(b, n_tiles, tile, tile, 3))
    return RasterOutput(depth, tri, bary, overflow)
