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
    dx = gx - x0
    dy = gy - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)

        def gather_one(im, yy, xx):
            return im[yy, xx]

        val = jax.vmap(gather_one)(img, yc, xc)  # (B, Ho, Wo, C)
        return val * inb[..., None].astype(img.dtype)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    dxe = dx[..., None]
    dye = dy[..., None]
    return (
        v00 * (1 - dxe) * (1 - dye)
        + v01 * dxe * (1 - dye)
        + v10 * (1 - dxe) * dye
        + v11 * dxe * dye
    )
