"""Spherical-harmonic shading, PCA albedo, and bilinear grid sampling.

The SH formulation follows the DECA-style renderer the reference's absent
submodule provided (SURVEY.md §2.9): 9 real SH basis functions of the pixel
normal, weighted by a per-image (9, 3) light code, multiplied into the
albedo.  Albedo comes from the FLAME PCA texture space (mean + dirs @ code,
0..255 scale, normalized to [0, 1]).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_PI = np.pi

# Standard per-band constants for SH irradiance rendering
# (Ramamoorthi & Hanrahan 2001), as used by DECA's add_SHlight.
SH_CONST = np.array(
    [
        1.0 / np.sqrt(4 * _PI),
        (2 * _PI / 3.0) * np.sqrt(3.0 / (4 * _PI)),
        (2 * _PI / 3.0) * np.sqrt(3.0 / (4 * _PI)),
        (2 * _PI / 3.0) * np.sqrt(3.0 / (4 * _PI)),
        (_PI / 4.0) * 3.0 * np.sqrt(5.0 / (12 * _PI)),
        (_PI / 4.0) * 3.0 * np.sqrt(5.0 / (12 * _PI)),
        (_PI / 4.0) * 3.0 * np.sqrt(5.0 / (12 * _PI)),
        (_PI / 4.0) * (3.0 / 2.0) * np.sqrt(5.0 / (12 * _PI)),
        (_PI / 4.0) * 0.5 * np.sqrt(5.0 / (4 * _PI)),
    ],
    dtype=np.float32,
)


def sh9_basis(n: jnp.ndarray) -> jnp.ndarray:
    """9-term SH basis of unit normals.  n: (..., 3) -> (..., 9)."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    ones = jnp.ones_like(nx)
    basis = jnp.stack(
        [
            ones,
            nx,
            ny,
            nz,
            nx * ny,
            nx * nz,
            ny * nz,
            nx**2 - ny**2,
            3.0 * nz**2 - 1.0,
        ],
        axis=-1,
    )
    return basis * jnp.asarray(SH_CONST, n.dtype)


def sh9_shading(normals: jnp.ndarray, light: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel RGB irradiance.

    Args:
      normals: (B, H, W, 3) unit normals.
      light: (B, 9, 3) SH coefficients per colour channel.

    Returns:
      (B, H, W, 3) shading.
    """
    basis = sh9_basis(normals)  # (B, H, W, 9)
    return jnp.einsum("bhwk,bkc->bhwc", basis, light)


def albedo_from_tex_code(tex_mean, tex_dirs, tex_code: jnp.ndarray) -> jnp.ndarray:
    """FLAME PCA texture: (mean + dirs @ code) / 255, clipped to [0, 1].

    Args:
      tex_mean: (R, R, 3) 0..255 scale.
      tex_dirs: (R, R, 3, n_tex).
      tex_code: (B, n_tex).

    Returns:
      (B, R, R, 3) albedo in [0, 1].
    """
    mean = jnp.asarray(tex_mean, tex_code.dtype)
    dirs = jnp.asarray(tex_dirs, tex_code.dtype)
    tex = mean[None] + jnp.einsum("hwcn,bn->bhwc", dirs, tex_code)
    return jnp.clip(tex / 255.0, 0.0, 1.0)


def grid_sample_bilinear(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.functional.grid_sample semantics (bilinear, zeros padding,
    align_corners=False) on NHWC images.

    TPU-first formulation: ONE gather of 2x2xC patches per pixel instead of
    four independent scalar-tap gathers (profiling showed four ~9 ms gather
    fusions per step at 256px, batch 16 — this collapses them to one).  The
    patch anchor is the clamped floor coordinate; each tap selects its value
    from the patch by its (row, col) offset relative to the anchor, with
    out-of-bounds taps zero-masked — exactly the zeros-padding semantics.

    Args:
      img: (B, H, W, C).
      grid: (B, Ho, Wo, 2) sampling locations in [-1, 1], (x, y) order.

    Returns:
      (B, Ho, Wo, C).
    """
    b, h, w, c = img.shape
    gx = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5
    gy = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    dx = (gx - x0)[..., None]
    dy = (gy - y0)[..., None]

    x0c = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, h - 2).astype(jnp.int32)

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def gather_patches(im, ys, xs):  # (H, W, C), (P,), (P,) -> (P, 2, 2, C)
        starts = jnp.stack([ys, xs], axis=-1)
        return lax.gather(
            im,
            starts,
            dnums,
            slice_sizes=(2, 2, c),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    ho, wo = grid.shape[1], grid.shape[2]
    patches = jax.vmap(gather_patches)(
        img, y0c.reshape(b, -1), x0c.reshape(b, -1)
    ).reshape(b, ho, wo, 2, 2, c)

    # Tap (i, j) sits at patch position (y0 + i - y0c, x0 + j - x0c); the
    # position is inside {0, 1} exactly when the tap is in bounds.
    dxi = (x0 - x0c).astype(jnp.int32)  # in {-1, 0, 1}
    dyi = (y0 - y0c).astype(jnp.int32)

    def tap(i, j):
        r = dyi + i
        col = dxi + j
        valid = ((r == 0) | (r == 1)) & ((col == 0) | (col == 1))
        r2 = jnp.clip(r, 0, 1)
        c2 = jnp.clip(col, 0, 1)
        # Select among the 4 patch corners without a gather.
        p00 = patches[..., 0, 0, :]
        p01 = patches[..., 0, 1, :]
        p10 = patches[..., 1, 0, :]
        p11 = patches[..., 1, 1, :]
        top = jnp.where((c2 == 0)[..., None], p00, p01)
        bot = jnp.where((c2 == 0)[..., None], p10, p11)
        val = jnp.where((r2 == 0)[..., None], top, bot)
        return val * valid[..., None].astype(img.dtype)

    v00 = tap(0, 0)
    v01 = tap(0, 1)
    v10 = tap(1, 0)
    v11 = tap(1, 1)
    return (
        v00 * (1 - dx) * (1 - dy)
        + v01 * dx * (1 - dy)
        + v10 * (1 - dx) * dy
        + v11 * dx * dy
    )
