"""Orthographic camera and the eye-centering camera solver.

``batch_orth_proj`` matches reference model/mesh_and_3d_helpers.py:40-51:
camera = (scale, shift_x, shift_y); xy are shifted then ALL THREE coordinates
(including z) are multiplied by scale.

``position_to_given_location`` matches reference my_utils/eye_centering.py:
35-66 but is fully batched (the reference loops per sample and calls
``torch.pinverse`` each iteration; here one vmapped least-squares solve).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from gif_tpu import constants as cnst
from gif_tpu.flame.decoder import flame_decode

# Desired normalized eye-centre positions (x1, x2, y1, y2)
# (reference eye_centering.py:52-53).  Host numpy, NOT a jnp array: a
# module-level device array would initialize the JAX backend as an import
# side effect, which breaks jax.distributed.initialize ordering on
# multi-host entry points.
_DESIRED = np.array([-0.2419, 0.2441, 0.0501 - 0.1, 0.0509 - 0.1], np.float32)


def batch_orth_proj(X: jnp.ndarray, camera: jnp.ndarray) -> jnp.ndarray:
    """Scaled orthographic projection.

    Args:
      X: (B, N, 3) points.
      camera: (B, 3) = (s, bx, by).

    Returns:
      (B, N, 3): s * [x + bx, y + by, z].
    """
    cam = camera.reshape(-1, 1, 3)
    xy = X[:, :, :2] + cam[:, :, 1:]
    Xt = jnp.concatenate([xy, X[:, :, 2:]], axis=2)
    return cam[:, :, 0:1] * Xt


def solve_eye_camera(verts: jnp.ndarray, eye_left: int, eye_right: int) -> jnp.ndarray:
    """Solve (s, bx, by) so the two eye centres project to fixed NDC coords.

    The linear system per sample (reference eye_centering.py:41-58):
        [e1x e2x e1y e2y]^T s + [1 1 0 0]^T s·bx + [0 0 1 1]^T s·by = desired
    solved by pseudo-inverse; the returned scale is negated like the
    reference (the renderer's y-flip convention).

    Args:
      verts: (B, V, 3) decoded FLAME vertices.

    Returns:
      (B, 3) camera params.
    """
    e1 = verts[:, eye_left, :]  # (B, 3)
    e2 = verts[:, eye_right, :]
    b = verts.shape[0]
    # Design matrix (B, 4, 3): columns multiply (s, s·bx, s·by).
    col_s = jnp.stack([e1[:, 0], e2[:, 0], e1[:, 1], e2[:, 1]], axis=1)
    col_bx = jnp.broadcast_to(jnp.array([1.0, 1.0, 0.0, 0.0], verts.dtype), (b, 4))
    col_by = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0, 1.0], verts.dtype), (b, 4))
    A = jnp.stack([col_s, col_bx, col_by], axis=2)  # (B, 4, 3)
    target = jnp.broadcast_to(jnp.asarray(_DESIRED, verts.dtype), (b, 4))

    pinv = jnp.vectorize(jnp.linalg.pinv, signature="(m,n)->(n,m)")(A)  # (B, 3, 4)
    sol = jnp.einsum("bji,bi->bj", pinv, target)
    s, s_bx, s_by = sol[:, 0], sol[:, 1], sol[:, 2]
    bx = s_bx / s
    by = s_by / s
    return jnp.stack([-s, bx, by], axis=1)


def position_to_given_location(res, flame_batch: jnp.ndarray) -> jnp.ndarray:
    """Overwrite the camera slice of a (B, >=159) FLAME batch in-place-style.

    Decodes the mesh and solves the eye-centering camera, returning a new
    batch with dims 156:159 replaced (reference eye_centering.py:35-66).
    """
    sh0, sh1 = cnst.INDICES["SHAPE"]
    ex0, ex1 = cnst.INDICES["EXP"]
    po0, po1 = cnst.INDICES["POSE"]
    verts = flame_decode(
        res,
        flame_batch[:, sh0:sh1],
        flame_batch[:, ex0:ex1],
        flame_batch[:, po0:po1],
    )
    from gif_tpu.constants import DEFAULT_FLAME_CONFIG as cfg

    cam = solve_eye_camera(verts, cfg.eye_left_vertex, cfg.eye_right_vertex)
    return flame_batch.at[:, 156:159].set(cam.astype(flame_batch.dtype))


# --- Legacy perspective-camera parameter dicts -------------------------------
#
# The reference's older FLAME_2020_revisited overlay path builds OpenCV-style
# camera parameter dicts (reference my_utils/flm_dynamic_fit_overlay.py:5-32).
# Carried for API parity; the shipped GIF configs use only the orthographic
# (s, bx, by) camera above.  Keys: c (principal point), k (distortion), f
# (focal), t (translation), r (rotation, Rodrigues).


def camera_ringnet(cam) -> dict:
    """RingNet camera vector (f, cx, cy) -> parameter dict (:5-11)."""
    cam = np.asarray(cam)
    return {
        "c": cam[1:3],
        "k": np.zeros(5),
        "f": cam[0] * np.ones(2),
        "t": np.zeros(3),
        "r": np.zeros(3),
    }


def camera_dynamic(h_w, translation) -> dict:
    """Resolution-scaled fixed-intrinsics camera (:14-22)."""
    h, w = h_w
    fscale = h / 256
    return {
        "c": np.array([w / 2, h / 2]),
        "k": np.array([-0.19816071, 0.92822711, 0.0, 0.0, 0.0]),
        "f": np.array([fscale * 4754.97941935, fscale * 4754.97941935]),
        "t": np.asarray(translation),
        "r": np.array([np.pi, 0.0, 0.0]),
    }


def camera_ringnetpp(h_w, trans, focal) -> dict:
    """RingNet++ camera with explicit focal length (:25-32)."""
    h, w = h_w
    return {
        "c": np.array([w / 2, h / 2]),
        "k": np.zeros(5),
        "f": focal * np.ones(2),
        "t": np.asarray(trans),
        "r": np.array([0.0, np.pi, 0.0]),
    }
