"""Pure-JAX FLAME 2020 morphable head model.

Replaces the reference's absent ``my_utils/photometric_optimization``
submodule (API contract recovered in SURVEY.md §2.9): shape/expression PCA
blendshapes on a 5023-vertex template, pose-corrective blendshapes, linear
blend skinning over the {root, neck, jaw, two eyeball} kinematic tree, plus
the orthographic camera and eye-centering solver.
"""

from gif_tpu.flame.resources import FlameResources, load_flame_resources
from gif_tpu.flame.decoder import (
    flame_decode,
    flame_decode_full,
    flame_decode_landmarks,
)
from gif_tpu.flame.camera import batch_orth_proj, position_to_given_location
from gif_tpu.flame.mesh import vertex_normals, face_vertices, face_normals

__all__ = [
    "FlameResources",
    "load_flame_resources",
    "flame_decode",
    "flame_decode_full",
    "flame_decode_landmarks",
    "batch_orth_proj",
    "position_to_given_location",
    "vertex_normals",
    "face_vertices",
    "face_normals",
]
