"""TPU-native differentiable mesh rendering.

Replaces the reference CUDA rasterizer (my_utils/standard_rasterize_cuda/)
and the absent submodule's DECA-style renderer with a scatter-free,
tile-binned barycentric rasterizer plus pure-JAX shading:

- ``rasterize``  — depth / triangle-id / barycentric buffers, gather-based
  argmin-z per pixel (no atomics: race-free by construction, unlike the
  reference kernel which is dispatched twice to paper over its atomicMin
  race, standard_rasterize_cuda_kernel.cu:252-314).
- ``interpolate_face_attributes`` — differentiable attribute interpolation.
- ``render_tex_and_normal`` — the §2.9 façade: FLAME codes -> textured +
  normal-map conditioning images, on-device, fused into the train step.
"""

from gif_tpu.render.raster import (
    rasterize,
    interpolate_face_attributes,
    to_pixel_space,
    get_visibility,
)
from gif_tpu.render.shading import sh9_shading, albedo_from_tex_code, grid_sample_bilinear
from gif_tpu.render.renderer import render_tex_and_normal, FlameRenderer

__all__ = [
    "rasterize",
    "interpolate_face_attributes",
    "to_pixel_space",
    "get_visibility",
    "sh9_shading",
    "albedo_from_tex_code",
    "grid_sample_bilinear",
    "render_tex_and_normal",
    "FlameRenderer",
]
