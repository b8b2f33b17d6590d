"""Pallas TPU rasterizer kernel with fused attribute interpolation.

Same numerical semantics as the reference CUDA kernel
(standard_rasterize_cuda_kernel.cu: dot-product barycentrics :79-109,
``w0 > 0 && w1 >= 0 && w2 >= 0`` inside test :144, signed-area back-face
cull :31-34, perspective-correct ``1/sum(w_i/z_i)`` depth :148), but a
race-free MXU formulation re-architected for the hardware:

- **barycentrics are affine in pixel coordinates**: the reference's
  per-pixel dot-product formula is algebraically ``u = au*px + bu*py + cu``
  (and likewise v and the perspective-depth *denominator*), so the per-face
  coefficients are precomputed once on the XLA side and the kernel
  evaluates ALL candidates against ALL pixels of a tile with three tiny
  ``P(p,3) @ C(k,3)^T`` matmuls — the hot loop runs on the MXU instead of
  per-candidate vector splats;
- the z-test maximizes the depth *denominator* (monotone reciprocal of the
  perspective depth, positive for every hit), so no per-pair division;
- the winner's payload (its affine coefficients + corner attributes) is
  selected with a second matmul, ``cand(32,k) @ onehot(k,p)`` — gather-free
  and deterministic (lowest face id among exact z-ties; the reference CUDA
  kernel instead papers over its atomicMin/write race by dispatching the
  kernel twice, :252-314);
- **everything is lane-major in the big dimension**: the candidate tensor
  enters the kernel as (B, T, 32, K) and the winner table leaves it as
  (B, T, 32, P) — candidate slots / pixels on the 128-lane axis, the
  32-column payload on sublanes.  The naive (…, K, 32) / (…, P, 32)
  orientation puts the 32-wide payload on the lane axis, which XLA pads
  to 128 lanes: 4x the HBM footprint on both sides of the custom call
  plus a relayout copy each way (measured ~4 ms/pass at B=16, 256px);
- barycentrics, depth, masks and the interpolated attributes are decoded
  from the winner's payload by dense XLA elementwise ops (no gathers);
- binning is CHUNK-granular: faces are Morton-ordered once per mesh
  (``morton_face_order``) so consecutive ids are spatial neighbours, then
  grouped into chunks of 32 whose screen bboxes are intersected with the
  image tiles on the XLA side.  Each tile's candidate tensor is assembled
  by a *block* gather (one 32-row dynamic slice per selected chunk).  This
  replaced a per-FACE top_k compaction + per-tile row gathers that
  profiling showed at ~25 ms/step (an 82 MB s32 sort + three >500K-row
  take_along_axis fusions);
- 16px tiles (with per-tile candidate counts via scalar prefetch) keep the
  candidate working set per tile ~4x smaller than 32px ones.

A custom VJP (segment-sum over the saved tri/bary buffers) keeps the
attribute path differentiable; positions stay non-differentiable like the
reference.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gif_tpu.render.raster import BIG_DEPTH, RasterOutput, _front_facing

_CHUNK = 256  # candidate slots per inner loop iteration (tuned on v5e)
_BLOCK = 32  # faces per binning chunk / per gathered slice
_COLS = 32  # 9 affine coeffs + valid + gid + 15 attrs + pad
_LANE = 128
_BIG_K = 2**30  # python int: pallas kernels must not capture traced constants

# Candidate-table column layout.
_C_AU, _C_AV, _C_AZ = 0, 3, 6  # each 3 wide: (a, b, c) of an affine form
_C_VALID, _C_GID, _C_ATTR = 9, 10, 11
_C_ZD = 26  # winner's depth denominator, packed into the payload row


def morton_face_order(faces: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Spatial (Morton / z-order) permutation of the face list.

    Orders faces by the interleaved-bit code of their centroid's (x, y)
    position on the template mesh, so consecutive face ids are spatial
    neighbours and the chunk bboxes used for binning stay tight.  One-time,
    host-side; any consistent permutation of the face list leaves mesh
    semantics unchanged.
    """
    cent = verts[faces].mean(axis=1)
    bits = 10

    def quant(a):
        lo, hi = float(a.min()), float(a.max())
        return np.clip(
            ((a - lo) / (hi - lo + 1e-9) * (2**bits - 1)).astype(np.int64),
            0,
            2**bits - 1,
        )

    xi, yi = quant(cent[:, 0]), quant(cent[:, 1])
    code = np.zeros(faces.shape[0], np.int64)
    for b in range(bits):
        code |= ((xi >> b) & 1) << (2 * b) | ((yi >> b) & 1) << (2 * b + 1)
    return np.argsort(code, kind="stable").astype(np.int32)


def _affine_coeffs(fvp):
    """Per-face affine forms of the reference's barycentric formula.

    fvp: (B, F, 3, 3).  Returns (B, F, 9): for q in {u, v, zdenom},
    q(px, py) = a_q*px + b_q*py + c_q, matching the dot-product formula of
    the reference kernel (:79-109) and ``zdenom = w0/z0 + v/z1 + u/z2``
    (:148) algebraically.

    Also returns ``nondegenerate`` (B, F) bool: a triangle whose barycentric
    determinant rounds to exactly 0 in f32 gets u = v = 0 (w0 = 1) at EVERY
    pixel, which would pass the inside test across whole tiles — the
    reference kernel only visits such a sliver's own bbox pixels, so the
    caller must fold this into the alive mask.
    """
    p0, p1, p2 = fvp[..., 0, :], fvp[..., 1, :], fvp[..., 2, :]
    v0x = p2[..., 0] - p0[..., 0]
    v0y = p2[..., 1] - p0[..., 1]
    v1x = p1[..., 0] - p0[..., 0]
    v1y = p1[..., 1] - p0[..., 1]
    dot00 = v0x * v0x + v0y * v0y
    dot01 = v0x * v1x + v0y * v1y
    dot11 = v1x * v1x + v1y * v1y
    det = dot00 * dot11 - dot01 * dot01
    inv = jnp.where(det == 0, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))

    au = (dot11 * v0x - dot01 * v1x) * inv
    bu = (dot11 * v0y - dot01 * v1y) * inv
    cu = -(au * p0[..., 0] + bu * p0[..., 1])
    av = (dot00 * v1x - dot01 * v0x) * inv
    bv = (dot00 * v1y - dot01 * v0y) * inv
    cv = -(av * p0[..., 0] + bv * p0[..., 1])

    rz0 = 1.0 / p0[..., 2]
    rz1 = 1.0 / p1[..., 2]
    rz2 = 1.0 / p2[..., 2]
    du = rz2 - rz0  # u scales corner 2, v corner 1 (w = [w0, v, u])
    dv = rz1 - rz0
    az = au * du + av * dv
    bz = bu * du + bv * dv
    cz = rz0 + cu * du + cv * dv
    return jnp.stack([au, bu, cu, av, bv, cv, az, bz, cz], axis=-1), det != 0


def _chunk_bin(fvp, face_attrs, n_ty, n_tx, tile, h, w, max_chunks):
    """Chunk-granular binning + coherent candidate assembly (XLA side).

    Returns (cand (B, T, K, 32) per-tile candidate tensor with the affine
    coefficients, validity, face id, and corner-major attributes; counts
    (B, T) int32 candidate slots to process; overflow (B, T) bool).  The
    candidate tensor concatenates the tile's overlapping 32-face chunks
    (ascending chunk id, so candidate order is ascending face id); faces of
    a gathered chunk that miss the tile are culled by the inside test, dead
    faces by the valid column.
    """
    b, f = fvp.shape[:2]
    n_ch = -(-f // _BLOCK)
    f_pad = n_ch * _BLOCK
    n_tiles = n_ty * n_tx

    xs, ys = fvp[..., 0], fvp[..., 1]  # (B, F, 3)
    x_min = jnp.maximum(jnp.ceil(xs.min(-1)), 0)
    x_max = jnp.minimum(jnp.floor(xs.max(-1)), w - 1)
    y_min = jnp.maximum(jnp.ceil(ys.min(-1)), 0)
    y_max = jnp.minimum(jnp.floor(ys.max(-1)), h - 1)
    coeffs, nondegenerate = _affine_coeffs(fvp)
    alive = (
        _front_facing(fvp)
        & (x_min <= x_max)
        & (y_min <= y_max)
        & nondegenerate
    )

    # --- candidate table (B, F_pad, 32) ---
    gid = jnp.broadcast_to(
        jnp.arange(f, dtype=jnp.float32)[None, :, None], (b, f, 1)
    )
    # Dead faces are neutralized HERE (zdenom coefficients zeroed, so their
    # depth denominator evaluates to exactly 0 and they can never win a
    # z-test) instead of carrying a validity column into the kernel's hot
    # loop — the per-chunk ``valid`` matmul + mask `and` this replaces were
    # pure VPU overhead on every (pixels x candidates) block.
    coeffs = coeffs.at[..., _C_AZ : _C_AZ + 3].multiply(
        alive[..., None].astype(jnp.float32)
    )
    parts = [coeffs, alive[..., None].astype(jnp.float32), gid]
    used = 11
    if face_attrs is not None:
        flat_attrs = face_attrs.reshape(b, f, -1).astype(jnp.float32)
        used += flat_attrs.shape[-1]
        parts.append(flat_attrs)
    # The zdenom output slot rides in the pad columns: the payload must
    # stay clear of it, not just of the 32-column budget.
    assert used <= _C_ZD, "candidate payload collides with the zdenom slot"
    parts.append(jnp.zeros((b, f, _COLS - used), jnp.float32))
    tab = jnp.concatenate(parts, axis=-1)
    if f_pad != f:
        tab = jnp.pad(tab, ((0, 0), (0, f_pad - f), (0, 0)))

    # --- chunk bboxes over alive faces ---
    big = jnp.float32(BIG_DEPTH)

    def chunk_red(a, fill, op):
        a = jnp.where(alive, a, fill)
        if f_pad != f:
            a = jnp.pad(a, ((0, 0), (0, f_pad - f)), constant_values=fill)
        return op(a.reshape(b, n_ch, _BLOCK), axis=-1)

    cx0 = chunk_red(x_min, big, jnp.min)
    cx1 = chunk_red(x_max, -big, jnp.max)
    cy0 = chunk_red(y_min, big, jnp.min)
    cy1 = chunk_red(y_max, -big, jnp.max)

    ty = (jnp.arange(n_ty) * tile).astype(jnp.float32)
    tx = (jnp.arange(n_tx) * tile).astype(jnp.float32)
    oy = (cy0[:, None, :] <= (ty[None, :, None] + tile - 1)) & (
        cy1[:, None, :] >= ty[None, :, None]
    )  # (B, n_ty, n_ch)
    ox = (cx0[:, None, :] <= (tx[None, :, None] + tile - 1)) & (
        cx1[:, None, :] >= tx[None, :, None]
    )
    mask = (oy[:, :, None, :] & ox[:, None, :, :]).reshape(b, n_tiles, n_ch)

    mc = min(max_chunks, n_ch)
    score = mask.astype(jnp.int32)
    _, ids = lax.top_k(score, mc)  # stable: lowest chunk id first
    n_overlap = jnp.sum(score, axis=-1)
    overflow = n_overlap > mc
    counts = jnp.minimum(n_overlap, mc) * _BLOCK  # candidate SLOTS per tile

    # Non-overlapping slots from top_k carry ARBITRARY chunk ids; point
    # them at a dedicated all-zero pad chunk (index n_ch) so the gathered
    # rows have zdenom == 0 and cull themselves — the kernel then needs no
    # per-slot ``in_range`` mask (one less iota+compare+and over every
    # (pixels x candidates) block).
    slot_live = (
        jax.lax.broadcasted_iota(jnp.int32, (b, n_tiles, mc), 2)
        < n_overlap[..., None]
    )
    ids = jnp.where(slot_live, ids, n_ch)

    # --- coherent block gather: one contiguous row per selected chunk ---
    # The table is viewed as (n_ch + 1, _BLOCK*_COLS) contiguous rows (the
    # +1 is the zero pad chunk) and gathered with take(); both the gather
    # output and the transposed kernel operand keep the big dimension on
    # the lane axis, so nothing in this chain is lane-padded.
    tab_rows = jnp.pad(tab, ((0, 0), (0, _BLOCK), (0, 0))).reshape(
        b, n_ch + 1, _BLOCK * _COLS
    )
    # mode="clip": ids are always in [0, n_ch] by construction, and the
    # default "fill" mode materializes an in-bounds select over the whole
    # gathered tensor (~1.6 ms/pass at B=16, 256px).
    cand = jax.vmap(lambda t, i: jnp.take(t, i, axis=0, mode="clip"))(
        tab_rows, ids.reshape(b, -1)
    )  # (B, T*MC, _BLOCK*_COLS)
    # Column-major kernel operand: (B, T, _COLS, K) with candidate slots on
    # the minor (lane) axis.  The slot-major (…, K, _COLS) orientation would
    # lane-pad 32 -> 128 (4x HBM) and cost a relayout copy on top.
    cand = cand.reshape(b, n_tiles, mc, _BLOCK, _COLS)
    cand = jnp.moveaxis(cand, 4, 2).reshape(b, n_tiles, _COLS, mc * _BLOCK)
    # The kernel's inner loop reads _CHUNK-slot blocks: keep K a multiple.
    k_pad = (-cand.shape[3]) % _CHUNK
    if k_pad:
        # Zero zdenom coefficients: padded slots can never win a z-test.
        cand = jnp.pad(cand, ((0, 0), (0, 0), (0, 0), (0, k_pad)))
    return cand, counts.astype(jnp.int32), overflow


_NROW = 16  # coefficient row block fed to the fused affine dot (rows 0:16)


def _raster_group_kernel(
    counts_ref,  # scalar prefetch: (B, T) int32
    cand_ref,  # (1, TG, 32, K) candidate block, payload on sublanes
    bestd_ref,  # (1, TG, 32, P) winner payload column (+ zdenom at _C_ZD)
    *,
    tile: int,
    n_tx: int,
    tiles_per_step: int,
):
    b = pl.program_id(0)
    tg = pl.program_id(1)
    p = tile * tile

    # Fused affine operand: ONE (16, 4P) matrix evaluates u, v, zdenom AND
    # broadcasts the face id in a single MXU pass per bf16 half.  Block
    #-diagonal in 4 P-wide lane blocks: block q in {u, v, z} pairs rows
    # (3q, 3q+1, 3q+2) with (x_local, y_local, 1); block 3 pairs the
    # _C_GID row with 1 (outer-product id broadcast).  Rows 9, 11:16 are
    # zero, so feeding the payload's full 0:16 row block is harmless and
    # keeps the sublane slice tile-aligned.
    rows = jax.lax.broadcasted_iota(jnp.int32, (_NROW, 4 * p), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (_NROW, 4 * p), 1)
    blk_id = cols // p
    lx = ((cols % p) % tile).astype(jnp.float32)
    ly = ((cols % p) // tile).astype(jnp.float32)
    is_x = (blk_id < 3) & (rows == blk_id * 3)
    is_y = (blk_id < 3) & (rows == blk_id * 3 + 1)
    is_1 = ((blk_id < 3) & (rows == blk_id * 3 + 2)) | (
        (blk_id == 3) & (rows == _C_GID)
    )
    # Local pixel coords (< tile) and the "1"s are EXACT in bf16 at any
    # image size; the per-tile origin is added via ``omat`` below.
    pmat = jnp.where(is_x, lx, jnp.where(is_y, ly, jnp.where(is_1, 1.0, 0.0))).astype(
        jnp.bfloat16
    )  # (16, 4P)

    rows32 = jax.lax.broadcasted_iota(jnp.int32, (_COLS, p), 0)

    def tile_body(tl, _):
        t = tg * tiles_per_step + tl  # global tile id (counts lookup)
        count = counts_ref[b, t]
        # Tile-origin companion of ``pmat``: rows (3q, 3q+1) of column q
        # carry (tx, ty) — a multiple of the tile edge, exact in bf16 — so
        # ``coef^T @ omat`` is the affine forms' origin contribution, one
        # (CK, 4) column block broadcast over pixels.  The gid column is 0.
        tyi = (t // n_tx) * tile
        txi = (t % n_tx) * tile
        rows_o = jax.lax.broadcasted_iota(jnp.int32, (_NROW, 4), 0)
        cols_o = jax.lax.broadcasted_iota(jnp.int32, (_NROW, 4), 1)
        o_is_x = (cols_o < 3) & (rows_o == cols_o * 3)
        o_is_y = (cols_o < 3) & (rows_o == cols_o * 3 + 1)
        omat = jnp.where(
            o_is_x,
            txi.astype(jnp.float32),
            jnp.where(o_is_y, tyi.astype(jnp.float32), 0.0),
        ).astype(jnp.bfloat16)  # (16, 4)

        def chunk_body(ci, carry):
            s = ci * _CHUNK
            blk = cand_ref[0, tl, :, pl.ds(s, _CHUNK)]  # (32, CK)
            # The TPU MXU truncates f32 operands to bf16 at DEFAULT
            # precision, which corrupts the O(100) affine constants enough
            # to flip inside tests on ~15% of pixels; 6-pass HIGHEST costs
            # ~16 ms/step.  The pixel-side operands are EXACT in bf16, so
            # two DEFAULT dots against the coefficients' bf16 high/low
            # halves give 16-bit-mantissa accuracy at full MXU rate (this
            # also makes the face-id broadcast exact to 2^16).
            c16 = blk[0:_NROW, :]  # (16, CK) coeffs + gid (+ zero rows)
            c_hi = c16.astype(jnp.bfloat16)
            c_lo = (c16 - c_hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def aff(rhs):
                return lax.dot_general(
                    c_hi,
                    rhs,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + lax.dot_general(
                    c_lo,
                    rhs,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            main = aff(pmat)  # (CK, 4P): [u | v | zd | gid] lane blocks
            org = aff(omat)  # (CK, 4): per-candidate origin contributions
            u = main[:, 0:p] + org[:, 0:1]
            v = main[:, p : 2 * p] + org[:, 1:2]
            zd = main[:, 2 * p : 3 * p] + org[:, 2:3]
            gid = main[:, 3 * p : 4 * p]

            w0 = 1.0 - u - v
            # Dead faces and out-of-count slots were neutralized during
            # binning (zdenom coefficients zeroed / zero pad chunk), so the
            # inside test needs no validity or slot-range mask here.
            inside = (w0 > 0) & (v >= 0) & (u >= 0)
            # Hits have zdenom > 0; maximizing it minimizes the
            # perspective-correct depth 1/zdenom without any division.
            zm = jnp.where(inside, zd, 0.0)  # (CK, P)
            zmax = jnp.max(zm, axis=0, keepdims=True)  # (1, P)
            # When zmax == 0 (no hit in this chunk) the equality below can
            # fire for several dead candidates at once and ``sel`` sums
            # their zero/garbage payloads — harmless: ``better`` is False
            # for zmax == 0 and the carry keeps the previous winner.
            k_masked = jnp.where(zm == zmax, gid, jnp.float32(_BIG_K))
            kmin = jnp.min(k_masked, axis=0, keepdims=True)  # (1, P)
            onehot = (k_masked == kmin).astype(jnp.float32)  # (CK, P)

            best_zd, best_d = carry
            better = zmax > best_zd  # (1, P)
            # Winner-payload selection: one-hot matmuls are exact in bf16,
            # so select the payload's bf16 high and low halves with two
            # DEFAULT-precision dots and recombine.
            blk_hi = blk.astype(jnp.bfloat16)
            blk_lo = (blk - blk_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            oh_bf = onehot.astype(jnp.bfloat16)

            def sel_dot(m):
                return lax.dot_general(
                    m,
                    oh_bf,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            sel = sel_dot(blk_hi) + sel_dot(blk_lo)  # (32, P) winner payload
            return (
                jnp.where(better, zmax, best_zd),
                jnp.where(better, sel, best_d),
            )

        best_zd, best_d = jax.lax.fori_loop(
            0,
            (count + _CHUNK - 1) // _CHUNK,
            chunk_body,
            (jnp.zeros((1, p), jnp.float32), jnp.zeros((_COLS, p), jnp.float32)),
        )
        # zdenom rides in a pad row of the payload column (a separate
        # (1, P) output block would sublane-pad to 8 for nothing).
        bestd_ref[0, tl] = jnp.where(rows32 == _C_ZD, best_zd, best_d)
        return 0

    jax.lax.fori_loop(0, tiles_per_step, tile_body, 0)


def _detile_cols(x, b, n_ty, n_tx, tile, h, w):
    """(B, T, C, P) tile-major planes -> (B, C, H, W) channel-second image.

    The decode runs in tile space first so only the ~10 planes the caller
    actually consumes go through this transpose, not the winner table's
    full 32 columns (the pixel-major (…, P, 32) orientation additionally
    lane-padded the table 4x; measured ~2.5 ms/pass at B=16, 256px)."""
    c = x.shape[2]
    x = x.reshape(b, n_ty, n_tx, c, tile, tile)
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5))
    return x.reshape(b, c, h, w)


def _raster_core(face_verts_pix, face_attrs, h, w, tile, max_tris_per_tile):
    """Shared implementation; face_attrs is None or (B, F, 3, D)."""
    assert h % tile == 0 and w % tile == 0
    n_ty, n_tx = h // tile, w // tile
    n_tiles = n_ty * n_tx
    p = tile * tile
    b, f = face_verts_pix.shape[:2]
    n_ch = -(-f // _BLOCK)
    # Chunk-list capacity derived from the face capacity; gathered chunks
    # include bbox-only neighbours, so leave 2x headroom — overflow is
    # still reported per tile.
    mc = min(n_ch, max(8, -(-2 * max_tris_per_tile // _BLOCK)))

    fvp = lax.stop_gradient(face_verts_pix)
    n_attrs = 0 if face_attrs is None else face_attrs.shape[-1]
    cand, counts, overflow = _chunk_bin(
        fvp,
        None if face_attrs is None else lax.stop_gradient(face_attrs),
        n_ty,
        n_tx,
        tile,
        h,
        w,
        mc,
    )
    k = cand.shape[3]

    # Per-tile VMEM: double-buffered candidate + payload blocks (both
    # lane-dense); keep the streamed working set under ~10 MB (the kernel's
    # (CK, 4P) affine intermediates live on top of this).
    per_tile = _COLS * (k + p) * 4 * 2
    tg_budget = max(1, (10 << 20) // per_tile)
    tiles_per_step = int(os.environ.get("GIF_TPU_RASTER_TG", "0")) or min(
        8, tg_budget, n_tiles
    )
    while n_tiles % tiles_per_step:
        tiles_per_step -= 1
    n_groups = n_tiles // tiles_per_step
    kernel = functools.partial(
        _raster_group_kernel,
        tile=tile,
        n_tx=n_tx,
        tiles_per_step=tiles_per_step,
    )
    tg4 = lambda bi, gi, *_: (bi, gi, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_groups),
        in_specs=[pl.BlockSpec((1, tiles_per_step, _COLS, k), tg4)],
        out_specs=pl.BlockSpec((1, tiles_per_step, _COLS, p), tg4),
    )
    interpret = jax.default_backend() != "tpu"
    bestd = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, _COLS, p), jnp.float32),
        interpret=interpret,
    )(counts, cand)

    # --- decode the winner payload with dense XLA ops (no gathers) ---
    # Decode in TILE space (B, T, …, P): the affine forms, masks and the
    # attribute interpolation are all per-pixel, so they don't care about
    # pixel order — only the ~10 planes the caller consumes pass through
    # the tile->image transpose, not the 32-column winner table.
    pix = jnp.arange(p, dtype=jnp.int32)[None, :]
    tix = jnp.arange(n_tiles, dtype=jnp.int32)[:, None]
    px_t = ((tix % n_tx) * tile + pix % tile).astype(jnp.float32)[None]  # (1,T,P)
    py_t = ((tix // n_tx) * tile + pix // tile).astype(jnp.float32)[None]

    zd_t = bestd[:, :, _C_ZD]  # (B, T, P)
    hit_t = zd_t > 0

    def affine(base):
        return (
            bestd[:, :, base] * px_t
            + bestd[:, :, base + 1] * py_t
            + bestd[:, :, base + 2]
        )

    u_t = affine(_C_AU)
    v_t = affine(_C_AV)
    w0_t = 1.0 - u_t - v_t

    planes = [
        zd_t,
        jnp.where(hit_t, bestd[:, :, _C_GID], -1.0),
        jnp.where(hit_t, w0_t, 0.0),
        jnp.where(hit_t, v_t, 0.0),
        jnp.where(hit_t, u_t, 0.0),
    ]
    if n_attrs:
        a0 = bestd[:, :, _C_ATTR : _C_ATTR + n_attrs]
        a1 = bestd[:, :, _C_ATTR + n_attrs : _C_ATTR + 2 * n_attrs]
        a2 = bestd[:, :, _C_ATTR + 2 * n_attrs : _C_ATTR + 3 * n_attrs]
        attr_t = (
            w0_t[:, :, None] * a0 + v_t[:, :, None] * a1 + u_t[:, :, None] * a2
        )
        planes.append(jnp.where(hit_t[:, :, None], attr_t, 0.0))

    stacked = jnp.concatenate(
        [pl_[:, :, None] if pl_.ndim == 3 else pl_ for pl_ in planes], axis=2
    )  # (B, T, 5 + D, P)
    img = _detile_cols(stacked, b, n_ty, n_tx, tile, h, w)  # (B, 5 + D, H, W)

    zd_img = img[:, 0]
    hit = zd_img > 0
    depth = jnp.where(hit, 1.0 / jnp.where(hit, zd_img, 1.0), BIG_DEPTH)
    tri = img[:, 1].astype(jnp.int32)
    bary = jnp.moveaxis(img[:, 2:5], 1, -1)  # (B, H, W, 3) [w0, v, u]
    rast = RasterOutput(depth, tri, bary, overflow)

    attr_img = None
    if n_attrs:
        attr_img = jnp.moveaxis(img[:, 5 : 5 + n_attrs], 1, -1)  # NHWC
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
      ``face_attrs`` (segment-sum VJP over the winner buffers); positions
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
