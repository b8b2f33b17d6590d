"""Parameter-vector index maps and FLAME configuration.

Mirrors the semantics of the reference ``constants.py`` (reference
``constants.py:1-23,63-79``): a GIF conditioning vector is the concatenation

    [shape(100) | exp(50) | pose(6) | cam(3) | tex(50) | light(27)]  -> 236 dims

where the first 159 dims are the "FLAME" part and the DECA extension appends
texture PCA coefficients and 9x3 spherical-harmonic lighting.
"""

from __future__ import annotations

import dataclasses

# Slices into the 159-dim FLAME parameter vector (reference constants.py:1-8).
INDICES = {
    "SHAPE": (0, 100),
    "EXP": (100, 150),
    "POSE": (150, 156),
    "TRANS": (156, 159),
    "JAW_ROT": (153, 156),
    "GLOBAL_ROT": (150, 153),
    "ROT_JAW_TRANS": (150, 159),
    "CAM": (156, 159),  # alias; the reference referenced INDICES['CAM'] from
    # dead code paths without defining it (reference constants.py bug, see
    # SURVEY.md §2.2) — defined here so those features work.
    "ALL": (0, 159),
}

# Slices into the 236-dim DECA-style parameter vector (reference
# constants.py:10-12).
DECA_IDX = {
    "cam": (156, 159),
    "tex": (159, 209),
    "lit": (209, 236),
}

TOTAL_FLAME_PARAMS = 159
TOTAL_DECA_PARAMS = 236


def get_idx_list(attr_name):
    """Index list for one attribute name or a tuple of names.

    Reference: constants.py:14-23.
    """
    if isinstance(attr_name, str):
        return list(range(*INDICES[attr_name]))
    idx = []
    for name in attr_name:
        idx += list(range(*INDICES[name]))
    return idx


@dataclasses.dataclass(frozen=True)
class FlameConfig:
    """FLAME decoder + renderer configuration (reference constants.py:63-79).

    ``resource_path`` points at an ``.npz`` produced by
    ``gif_tpu.tools.convert_flame`` from the official ``generic_model.pkl`` /
    ``FLAME_texture.npz`` (those artifacts are licensed and not shipped);
    when absent, a deterministic synthetic resource with identical shapes is
    used so every code path stays executable and testable.
    """

    flame_model_path: str = "resources/flame/flame2020_generic.npz"
    flame_lmk_embedding_path: str = "resources/flame/landmark_embedding.npz"
    tex_space_path: str = "resources/flame/flame_texture.npz"
    texture_data_path: str = "resources/flame/texture_data_256.npz"
    shape_params: int = 100
    expression_params: int = 50
    pose_params: int = 6
    tex_params: int = 50
    camera_params: int = 3
    use_face_contour: bool = True
    image_size: int = 256
    n_vertices: int = 5023
    # Eye-centre vertex ids used by the camera solver
    # (reference my_utils/eye_centering.py:42-43).
    eye_left_vertex: int = 4051
    eye_right_vertex: int = 4597


DEFAULT_FLAME_CONFIG = FlameConfig()
