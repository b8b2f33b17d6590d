"""FLAME texture-space inverse rendering ("texture stealing").

Parity with reference ``FlameTextureSpace`` (model/stg2_generator.py:
336-421): decode the mesh from the first 159 dims of the parameter vector,
project each precomputed valid texel's 3-D surface point with the
orthographic camera (y flipped), build a sampling grid over the source image
and bilinearly sample it into UV space; visibility from the z sign of the
interpolated vertex normal of the *projected* mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gif_tpu.flame.decoder import flame_decode
from gif_tpu.flame.camera import batch_orth_proj
from gif_tpu.flame.mesh import vertex_normals
from gif_tpu.render.shading import grid_sample_bilinear


def flame_texture_space(res, source_img: jnp.ndarray, flame_params_full: jnp.ndarray):
    """Project generated images back into FLAME UV texture space.

    Args:
      res: FlameResources (carries the texture_data precompute, reference
        texture_data_256.npy keys — stg2_generator.py:348-353).
      source_img: (B, H, W, 3) images aligned with the mesh.
      flame_params_full: (B, >=159): [shape(100) | exp(50) | pose(6) | cam(3)].

    Returns:
      texture_img: (B, 256, 256, 3) stolen texture.
      vis_mask: (B, 256, 256, 1) bool texel visibility.
    """
    b = source_img.shape[0]
    shape = flame_params_full[:, 0:100]
    exp = flame_params_full[:, 100:150]
    pose = flame_params_full[:, 150:156]
    cam = flame_params_full[:, 156:159]

    verts = flame_decode(res, shape, exp, pose)

    # Vertex normals of the projected mesh (stg2_generator.py:369-372).
    trans = batch_orth_proj(verts, cam)
    trans = trans.at[:, :, 1:].multiply(-1.0)
    import numpy as np

    vnorm = vertex_normals(trans, np.asarray(res.faces))

    vf = jnp.asarray(res.texture_valid_faces)  # (P, 3) vertex ids
    bw = jnp.asarray(res.texture_valid_bary, verts.dtype)  # (P, 3)

    def blend(per_vertex):  # (B, V, D) -> (B, P, D)
        corners = per_vertex[:, vf]  # (B, P, 3, D)
        return jnp.einsum("bpcd,pc->bpd", corners, bw)

    pixel_3d = blend(verts)  # surface point per valid texel
    proj = batch_orth_proj(pixel_3d, cam)[:, :, :2]
    proj = proj.at[:, :, 1].multiply(-1.0)

    # Scatter projected points into the 256x256 UV grid
    # (stg2_generator.py:404-406); unset texels keep grid 0 -> they sample
    # the image centre but are masked out by vis_mask downstream.
    tex_res = res.tex_mean.shape[0]
    ys = jnp.asarray(res.texture_y_coords)
    xs = jnp.asarray(res.texture_x_coords)
    grid = jnp.zeros((b, tex_res, tex_res, 2), source_img.dtype)
    grid = grid.at[:, ys, xs, :].set(proj)

    texture_img = grid_sample_bilinear(source_img, grid)

    pix_norm = blend(vnorm)  # (B, P, 3)
    vis_vals = pix_norm[:, :, 2] < 0  # camera-facing under the y/z flip
    vis = jnp.zeros((b, tex_res, tex_res), bool)
    vis = vis.at[:, ys, xs].set(vis_vals)
    return texture_img, vis[..., None]
