"""The FLAME renderer façade: codes -> textured + normal conditioning maps.

Recovers the API of the absent submodule's ``render_utils.render_tex_and_
normal`` (SURVEY.md §2.9, call sites my_utils/visualize_flame_overlay.py:
17-33): decode FLAME, project with the scaled-orthographic camera (y flip as
in stg2_generator.py:369-370), rasterize once, then emit

  textured = PCA-albedo sampled at interpolated UV  *  SH9 shading    in [0,1]
  normal   = interpolated unit normals mapped to [0,1]

One rasterization serves both maps; everything is jit-compatible and runs
inside the training step — eliminating the reference's LMDB render precompute
(prepare_lmdb/create_deca_rendered_lmdb.py).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gif_tpu.flame.decoder import flame_decode
from gif_tpu.flame.camera import batch_orth_proj
from gif_tpu.flame.mesh import face_vertices, vertex_normals
from gif_tpu.render.raster import (
    rasterize,
    interpolate_face_attributes,
    to_pixel_space,
)
from gif_tpu.render.shading import sh9_shading, albedo_from_tex_code, grid_sample_bilinear


# One-time Morton permutation per resource set (keyed by identity; the
# value pins the res object so ids stay unique).  Spatially-coherent face
# ids keep the chunk-skip Pallas rasterizer's per-chunk bboxes tight.
# Bounded: a training process uses ONE resource set, so a tiny LRU covers
# real use while an unbounded dict would pin every FlameResources a
# long-lived process (serve, notebooks) ever rendered (~40 MB each).
_MORTON_CACHE: dict = {}
_MORTON_CACHE_MAX = 4


def _morton_faces(res):
    import numpy as np

    hit = _MORTON_CACHE.get(id(res))
    if hit is not None and hit[0] is res:
        return hit[1]
    from gif_tpu.render.raster_pallas import morton_face_order

    faces = np.asarray(res.faces)
    perm = morton_face_order(faces, np.asarray(res.v_template))
    sorted_faces = faces[perm]
    while len(_MORTON_CACHE) >= _MORTON_CACHE_MAX:
        _MORTON_CACHE.pop(next(iter(_MORTON_CACHE)))
    _MORTON_CACHE[id(res)] = (res, sorted_faces)
    return sorted_faces


class RenderedMaps(NamedTuple):
    textured: jnp.ndarray  # (B, H, W, 3) in [0, 1]
    normal: jnp.ndarray  # (B, H, W, 3) in [0, 1]
    mask: jnp.ndarray  # (B, H, W) bool foreground
    depth: jnp.ndarray  # (B, H, W)
    # True where a rasterizer tile dropped candidate triangles (its
    # max_tris_per_tile capacity overflowed) — geometry was silently lost
    # for that sample.  Surfaced into train metrics by the step.
    overflow: jnp.ndarray = None  # (B,) bool


def _raise_on_overflow(overflow: "jnp.ndarray"):
    import numpy as np

    if np.asarray(overflow).any():
        raise RuntimeError(
            "rasterizer tile overflow: candidate triangles were dropped; "
            "raise max_tris_per_tile (or pass max_tris_per_tile=None for "
            "mesh-derived auto-sizing)"
        )


def render_tex_and_normal(
    res,
    shapecode: jnp.ndarray,
    expcode: jnp.ndarray,
    posecode: jnp.ndarray,
    texcode: jnp.ndarray,
    lightcode: jnp.ndarray,
    cam: jnp.ndarray,
    *,
    image_size: int = 256,
    constant_albedo: float | None = None,
    tile: int = 32,
    max_tris_per_tile: int | None = 384,
    assert_no_overflow: bool = False,
    raster_backend: str = "auto",
) -> RenderedMaps:
    """Render textured + normal-map conditioning images from FLAME codes.

    Args:
      res: FlameResources.
      shapecode: (B, 100); expcode: (B, 50); posecode: (B, 6).
      texcode: (B, 50) PCA texture coefficients.
      lightcode: (B, 9, 3) or (B, 27) SH lighting.
      cam: (B, 3) orthographic (s, tx, ty).
      constant_albedo: if set, replaces the PCA albedo with this grey level
        (reference OverLayViz constant_albedo option).
      max_tris_per_tile: per-tile candidate capacity; ``None`` auto-sizes
        from the mesh (see raster.auto_max_tris_per_tile).  Overflow is
        reported per sample in ``RenderedMaps.overflow``.
      assert_no_overflow: debug switch — raise on the host (via
        jax.debug.callback) if any tile dropped triangles.

    Returns:
      RenderedMaps with channel-last images.
    """
    b = shapecode.shape[0]
    if lightcode.ndim == 2:
        lightcode = lightcode.reshape(b, 9, 3)

    verts = flame_decode(res, shapecode, expcode, posecode)
    trans = batch_orth_proj(verts, cam)
    # Screen convention: flip y (and z for depth ordering) as the reference
    # does before rasterizing (stg2_generator.py:369-370 / DECA).
    trans = trans.at[:, :, 1:].multiply(-1.0)

    import numpy as np

    # ``raster_backend``: "auto" (Pallas on TPU, XLA elsewhere), or force
    # "xla" / "pallas" — the forcing path exists for the renderer-numerics
    # sensitivity experiment (scripts/raster_sensitivity.py) and debugging;
    # GIF_TPU_RASTER overrides for entry points that don't thread the arg.
    backend = os.environ.get("GIF_TPU_RASTER", raster_backend)
    if backend == "xla":
        use_pallas = False
    elif backend == "pallas":
        if (tile * tile) % 128 != 0:
            raise ValueError(f"pallas raster needs tile^2 % 128 == 0, got {tile}")
        use_pallas = True
    else:
        use_pallas = (tile * tile) % 128 == 0 and jax.default_backend() == "tpu"
    # Pallas path: Morton-ordered face list (only the face-id labelling
    # changes; the rendered maps are identical up to z-ties).
    faces = _morton_faces(res) if use_pallas else np.asarray(res.faces)
    if max_tris_per_tile is None:
        from gif_tpu.render.raster import auto_max_tris_per_tile

        max_tris_per_tile = auto_max_tris_per_tile(
            faces.shape[0], (image_size // tile) ** 2
        )
    pix = to_pixel_space(trans, image_size, image_size)
    fv = face_vertices(pix, faces)

    # --- attributes: normals (of the projected mesh) and UV ---
    normals = vertex_normals(trans, faces)  # (B, V, 3)
    face_norm = face_vertices(normals, faces)  # (B, F, 3, 3)
    uv = jnp.asarray(res.uv_coords, verts.dtype)  # (V, 2)
    face_uv = jnp.broadcast_to(uv[faces][None], (b,) + uv[faces].shape)  # (B,F,3,2)
    attrs = jnp.concatenate([face_norm, face_uv], axis=-1)  # (B, F, 3, 5)

    # On TPU with 128-aligned tiles use the Pallas kernel with fused
    # attribute interpolation (kills the dominant per-pixel gathers);
    # otherwise the XLA raster + gather-based interpolation.
    if use_pallas:
        from gif_tpu.render.raster_pallas import rasterize_pallas_with_attrs

        rast, interp = rasterize_pallas_with_attrs(
            fv, attrs, image_size, image_size, tile, max_tris_per_tile
        )
    else:
        rast = rasterize(
            fv,
            h=image_size,
            w=image_size,
            tile=tile,
            max_tris_per_tile=max_tris_per_tile,
        )
        interp = interpolate_face_attributes(rast.tri_id, rast.bary, attrs)
    pix_norm = interp[..., :3]
    pix_uv = interp[..., 3:5]
    pix_norm = pix_norm / jnp.maximum(
        jnp.linalg.norm(pix_norm, axis=-1, keepdims=True), 1e-6
    )

    # --- albedo ---
    if constant_albedo is None:
        albedo_map = albedo_from_tex_code(res.tex_mean, res.tex_dirs, texcode)
    else:
        r = res.tex_mean.shape[0]
        albedo_map = jnp.full((b, r, r, 3), float(constant_albedo), verts.dtype)
    # UV in [0,1] -> grid in [-1,1].  On TPU the lookup runs as the MXU
    # one-hot-matmul sampler (bf16 texture, f32 accumulation — the XLA
    # patch-gather version cost ~23 ms/step at 256px); off-TPU the exact
    # f32 gather path.
    grid = pix_uv * 2.0 - 1.0
    r = albedo_map.shape[1]
    if jax.default_backend() == "tpu" and (r * 3) % 128 == 0:
        from gif_tpu.render.sampler_pallas import grid_sample_bilinear_mxu

        albedo = grid_sample_bilinear_mxu(albedo_map, grid).astype(verts.dtype)
    else:
        albedo = grid_sample_bilinear(albedo_map, grid)

    shading = sh9_shading(pix_norm, lightcode)
    textured = albedo * shading

    mask = rast.tri_id >= 0
    m3 = mask[..., None]
    textured = jnp.where(m3, textured, 0.0)
    normal_img = jnp.where(m3, pix_norm * 0.5 + 0.5, 0.0)
    overflow = jnp.any(rast.tile_overflow, axis=-1)  # (B,)
    if assert_no_overflow:
        jax.debug.callback(_raise_on_overflow, overflow)
    return RenderedMaps(textured, normal_img, mask, rast.depth, overflow)


class FlameRenderer:
    """Convenience wrapper mirroring the reference ``OverLayViz`` façade
    (my_utils/visualize_flame_overlay.py:10-40)."""

    def __init__(self, res, image_size: int = 256):
        self.res = res
        self.image_size = image_size

    def get_flame_faces(self):
        return jnp.asarray(self.res.faces)

    def get_rendered_mesh(self, flame_params, camera_params, constant_albedo=None):
        """(shape, exp, pose, light, tex), cam -> (normal, textured).

        Output quantization matches OverLayViz.get_rendered_mesh (:29-33):
        both maps floored onto the 8-bit grid in [0, 1].
        """
        shape, exp, pose, light, tex = flame_params
        maps = render_tex_and_normal(
            self.res,
            shape,
            exp,
            pose,
            tex,
            light,
            camera_params,
            image_size=self.image_size,
            constant_albedo=constant_albedo,
        )
        textured = jnp.floor(jnp.clip(maps.textured, 0.0, 1.0) * 255.0) / 255.0
        normal = jnp.floor(jnp.clip(maps.normal, 0.0, 1.0) * 255.0) / 255.0
        return normal, textured
