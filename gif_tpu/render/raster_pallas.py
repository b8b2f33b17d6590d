"""Pallas TPU rasterizer kernel, optionally fused with attribute
interpolation.

Same tile-binned gather formulation as gif_tpu.render.raster (and the same
numerical semantics as the reference CUDA kernel), re-architected for the
hardware:

- candidate triangle data arrives candidate-major (K, 16): per-candidate
  scalars are sublane-aligned (CK, 1, 1) column slices;
- pixels live on a native (P/128, 128) sublane x lane plane, so every
  output block is hardware-tile aligned;
- the grid groups 8 tiles per step (amortizing grid-step overhead) with an
  inner ``fori_loop`` over tiles wrapping a *dynamic* ``fori_loop`` over
  candidate chunks; running (best_z, best_k, best_u, best_v) lives in the
  output VMEM blocks — no HBM intermediates;
- per-tile candidate counts arrive via scalar prefetch, so background tiles
  cost one loop-bound check;
- the winner is picked by two min-reductions (z, then lowest candidate id
  among z-ties) — gather-free and deterministic;
- **fused attributes**: profiling showed per-pixel XLA gathers (corner
  attributes + triangle ids) dominating the raster stage (~29 ms/step at
  256px b16 vs 6 ms for this kernel).  With ``face_attrs`` given, the kernel
  interpolates the winner's corner attributes in-register with the already
  computed one-hot winner mask, eliminating those gathers.  A custom VJP
  (scatter-add over the saved tri/bary buffers) keeps the attribute path
  differentiable; positions stay non-differentiable like the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
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


def _raster_group_kernel(
    counts_ref,  # scalar prefetch: (B, T) int32
    cand_ref,  # (1, TG, K, 16): cols x0,y0,z0,x1,y1,z1,x2,y2,z2,valid
    *refs,
    tile: int,
    n_tx: int,
    tiles_per_step: int,
    n_attrs: int,
):
    if n_attrs:
        attr_ref = refs[0]  # (1, TG, K, 3*D padded)
        bestz_ref, bestk_ref, bestu_ref, bestv_ref, attr_out_ref = refs[1:]
    else:
        attr_ref = None
        attr_out_ref = None
        bestz_ref, bestk_ref, bestu_ref, bestv_ref = refs

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

    def col(blk, i):  # (CK, cols) -> (CK, 1, 1), sublane-aligned slice
        return blk[:, i].reshape(_CHUNK, 1, 1)

    def tile_body(tl, _):
        t = tg * tiles_per_step + tl  # global tile id
        bestz_ref[0, tl] = jnp.full((sub, _LANE), BIG_DEPTH, jnp.float32)
        bestk_ref[0, tl] = jnp.zeros((sub, _LANE), jnp.int32)
        bestu_ref[0, tl] = jnp.zeros((sub, _LANE), jnp.float32)
        bestv_ref[0, tl] = jnp.zeros((sub, _LANE), jnp.float32)
        if n_attrs:
            attr_out_ref[0, tl] = jnp.zeros((n_attrs, sub, _LANE), jnp.float32)

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
            # Winner's GLOBAL face id, selected in-register (saves a 1M-row
            # take_along_axis outside the kernel).
            gid = jnp.sum(col(blk, 10) * onehot, axis=0)
            bestk_ref[0, tl] = jnp.where(
                better, gid.astype(jnp.int32), bestk_ref[0, tl]
            )

            if n_attrs:
                # Winner's barycentric-blended attributes, selected with the
                # same one-hot mask: no gathers anywhere.
                ablk = attr_ref[0, tl, pl.ds(s, _CHUNK), :]  # (CK, 3*D pad)
                m0 = onehot * w0
                m1 = onehot * v
                m2 = onehot * u
                for d in range(n_attrs):
                    a0 = ablk[:, d].reshape(_CHUNK, 1, 1)
                    a1 = ablk[:, n_attrs + d].reshape(_CHUNK, 1, 1)
                    a2 = ablk[:, 2 * n_attrs + d].reshape(_CHUNK, 1, 1)
                    sel = jnp.sum(m0 * a0 + m1 * a1 + m2 * a2, axis=0)
                    attr_out_ref[0, tl, d] = jnp.where(
                        better, sel, attr_out_ref[0, tl, d]
                    )
            return 0

        n_chunks = (count + _CHUNK - 1) // _CHUNK
        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        return 0

    jax.lax.fori_loop(0, tiles_per_step, tile_body, 0)


def _detile(x, b, n_ty, n_tx, tile, h, w):
    extra = x.shape[4:]
    x = x.reshape((b, n_ty, n_tx, tile, tile) + extra)
    x = jnp.moveaxis(x, 3, 2)
    return x.reshape((b, h, w) + extra)


def _raster_core(face_verts_pix, face_attrs, h, w, tile, max_tris_per_tile):
    """Shared implementation; face_attrs is None or (B, F, 3, D)."""
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
            ids[..., None].astype(jnp.float32),  # col 10: global face id
            jnp.zeros((b, n_tiles, k, 5), jnp.float32),
        ],
        axis=-1,
    )

    n_attrs = 0
    operands = [counts, cand]
    if face_attrs is not None:
        n_attrs = face_attrs.shape[-1]
        # corner-major columns [A0_0..A0_{D-1}, A1_0.., A2_0..]: plain
        # (B,F,3,D) -> (B,F,3D) reshape (index = corner*D + d).
        flat = lax.stop_gradient(face_attrs).reshape(b, f, 3 * n_attrs)
        attr_cand = jnp.take_along_axis(flat[:, None], ids[..., None], axis=2)
        pad_cols = (-3 * n_attrs) % 8
        if pad_cols:
            attr_cand = jnp.pad(
                attr_cand, ((0, 0), (0, 0), (0, 0), (0, pad_cols))
            )
        operands.append(attr_cand.astype(jnp.float32))

    tiles_per_step = min(8, n_tiles)
    assert n_tiles % tiles_per_step == 0
    n_groups = n_tiles // tiles_per_step
    kernel = functools.partial(
        _raster_group_kernel,
        tile=tile,
        n_tx=n_tx,
        tiles_per_step=tiles_per_step,
        n_attrs=n_attrs,
    )
    tg4 = lambda bi, gi, *_: (bi, gi, 0, 0)
    tg5 = lambda bi, gi, *_: (bi, gi, 0, 0, 0)
    in_specs = [pl.BlockSpec((1, tiles_per_step, k, 16), tg4)]
    if n_attrs:
        ad = operands[2].shape[-1]
        in_specs.append(pl.BlockSpec((1, tiles_per_step, k, ad), tg4))
    out_specs = [pl.BlockSpec((1, tiles_per_step, sub, _LANE), tg4)] * 4
    out_shape = [
        jax.ShapeDtypeStruct((b, n_tiles, sub, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((b, n_tiles, sub, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((b, n_tiles, sub, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((b, n_tiles, sub, _LANE), jnp.float32),
    ]
    if n_attrs:
        out_specs.append(
            pl.BlockSpec((1, tiles_per_step, n_attrs, sub, _LANE), tg5)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b, n_tiles, n_attrs, sub, _LANE), jnp.float32)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_groups),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    interpret = jax.default_backend() != "tpu"
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    bestz, bestk, bestu, bestv = outs[:4]

    bestz = bestz.reshape(b, n_tiles, p)
    bestk = bestk.reshape(b, n_tiles, p)
    bestu = bestu.reshape(b, n_tiles, p)
    bestv = bestv.reshape(b, n_tiles, p)

    hit = bestz < BIG_DEPTH
    tri = jnp.where(hit, bestk, -1).astype(jnp.int32)
    w0 = 1.0 - bestu - bestv
    bary = jnp.stack([w0, bestv, bestu], axis=-1)
    bary = jnp.where(hit[..., None], bary, 0.0)

    depth = _detile(bestz.reshape(b, n_tiles, tile, tile), b, n_ty, n_tx, tile, h, w)
    tri = _detile(tri.reshape(b, n_tiles, tile, tile), b, n_ty, n_tx, tile, h, w)
    bary = _detile(
        bary.reshape(b, n_tiles, tile, tile, 3), b, n_ty, n_tx, tile, h, w
    )
    rast = RasterOutput(depth, tri, bary, overflow)

    attr_img = None
    if n_attrs:
        attr = outs[4]  # (B, T, D, SUB, 128)
        attr = jnp.moveaxis(attr.reshape(b, n_tiles, n_attrs, p), 2, 3)
        attr_img = _detile(
            attr.reshape(b, n_tiles, tile, tile, n_attrs), b, n_ty, n_tx, tile, h, w
        )
    return rast, attr_img


@functools.partial(jax.jit, static_argnames=("h", "w", "tile", "max_tris_per_tile"))
def rasterize_pallas(
    face_verts_pix: jnp.ndarray,
    *,
    h: int,
    w: int,
    tile: int = 32,
    max_tris_per_tile: int = 512,
) -> RasterOutput:
    """Drop-in replacement for gif_tpu.render.raster.rasterize."""
    rast, _ = _raster_core(face_verts_pix, None, h, w, tile, max_tris_per_tile)
    return rast


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def rasterize_pallas_with_attrs(
    face_verts_pix: jnp.ndarray,
    face_attrs: jnp.ndarray,
    h: int,
    w: int,
    tile: int = 32,
    max_tris_per_tile: int = 512,
):
    """Rasterize and interpolate per-corner attributes in one fused kernel.

    Args:
      face_verts_pix: (B, F, 3, 3) pixel-space corners.
      face_attrs: (B, F, 3, D) per-corner attributes.

    Returns:
      (RasterOutput, attr_img (B, H, W, D)).  Differentiable w.r.t.
      ``face_attrs`` (scatter-add VJP over the winner buffers); positions
      are non-differentiable, matching the reference rasterizer.
    """
    return _raster_core(face_verts_pix, face_attrs, h, w, tile, max_tris_per_tile)


def _rwa_fwd(face_verts_pix, face_attrs, h, w, tile, max_tris_per_tile):
    rast, attr_img = _raster_core(
        face_verts_pix, face_attrs, h, w, tile, max_tris_per_tile
    )
    res = (rast.tri_id, rast.bary, face_attrs.shape)
    return (rast, attr_img), res


def _rwa_bwd(h, w, tile, max_tris_per_tile, res, cotangents):
    tri_id, bary, attr_shape = res
    _, g_attr = cotangents  # RasterOutput cotangent is symbolically zero
    b, f, _, d = attr_shape
    # d attr[face, corner, :] = sum over pixels won by `face` of
    # bary[corner] * g[pixel, :]
    flat_tri = tri_id.reshape(b, -1)
    flat_bary = bary.reshape(b, -1, 3)
    flat_g = g_attr.reshape(b, -1, d)
    contrib = flat_bary[..., :, None] * flat_g[..., None, :]  # (B, P, 3, D)
    contrib = jnp.where((flat_tri >= 0)[..., None, None], contrib, 0.0)

    def scatter_one(tri, con):
        return jax.ops.segment_sum(
            con.reshape(-1, 3 * d), jnp.maximum(tri, 0), num_segments=f
        )

    grad_attrs = jax.vmap(scatter_one)(flat_tri, contrib).reshape(b, f, 3, d)
    return jnp.zeros((b, f, 3, 3), jnp.float32), grad_attrs


rasterize_pallas_with_attrs.defvjp(_rwa_fwd, _rwa_bwd)
