"""FLAME decode: blendshapes + pose correctives + linear blend skinning.

Pure-JAX, fully batched (no per-sample loops — everything is one einsum /
matmul so XLA maps it onto the MXU).  Matches the behavior recovered from the
reference call sites (SURVEY.md §2.9): ``flame(shape(B,100), exp(B,50),
pose(B,6)) -> (verts(B,5023,3), lmk2d, lmk3d)`` where pose is
[global(3) | jaw(3)] and neck/eyeball rotations default to zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gif_tpu.flame.resources import FlameResources


def rodrigues(rot_vecs: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3)."""
    angle = jnp.linalg.norm(rot_vecs + eps, axis=-1, keepdims=True)
    axis = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(rot_vecs.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=rot_vecs.dtype)
    return eye + sin * K + (1.0 - cos) * (K @ K)


def _rigid_transforms(rot_mats, joints, parents):
    """Forward-kinematics world transforms, SMPL/FLAME convention.

    Args:
      rot_mats: (B, J, 3, 3)
      joints: (B, J, 3) rest-pose joint locations
      parents: (J,) numpy int array (static)

    Returns:
      A: (B, J, 4, 4) skinning transforms (world transform with the rest
      joint location factored out).
    """
    b, j = rot_mats.shape[:2]
    rel_joints = joints.at[:, 1:].add(-joints[:, np.asarray(parents[1:])])

    def make_tf(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    tfs = make_tf(rot_mats, rel_joints)  # (B, J, 4, 4)
    # The kinematic chain is tiny (5 joints) and static — unrolled python loop.
    world = [tfs[:, 0]]
    for i in range(1, j):
        world.append(world[parents[i]] @ tfs[:, i])
    world = jnp.stack(world, axis=1)  # (B, J, 4, 4)

    posed_joints = world[..., :3, 3]
    # Factor out the rest joint position:  A = W - [0 | W_rot @ j_rest]
    correct = (world[..., :3, :3] @ joints[..., None])[..., 0]
    A = world.at[..., :3, 3].add(-correct)
    return A, posed_joints


def flame_decode(
    res,
    shape_params: jnp.ndarray,
    expression_params: jnp.ndarray,
    pose_params: jnp.ndarray,
    neck_pose: jnp.ndarray | None = None,
    eye_pose: jnp.ndarray | None = None,
):
    """Decode FLAME parameters to mesh vertices.

    Args:
      res: :class:`FlameResources` (numpy arrays; closed over at trace time).
      shape_params: (B, 100)
      expression_params: (B, 50)
      pose_params: (B, 6) = [global_rot(3) | jaw_rot(3)]
      neck_pose / eye_pose: optional (B, 3) / (B, 6) overrides (default 0).

    Returns:
      verts: (B, V, 3) float32.
    """
    b = shape_params.shape[0]
    dtype = shape_params.dtype
    v_template = jnp.asarray(res.v_template, dtype)
    shapedirs = jnp.asarray(res.shapedirs, dtype)
    expdirs = jnp.asarray(res.expdirs, dtype)
    posedirs = jnp.asarray(res.posedirs, dtype)
    j_regressor = jnp.asarray(res.j_regressor, dtype)
    lbs_weights = jnp.asarray(res.lbs_weights, dtype)
    parents = np.asarray(res.parents)

    if neck_pose is None:
        neck_pose = jnp.zeros((b, 3), dtype)
    if eye_pose is None:
        eye_pose = jnp.zeros((b, 6), dtype)
    full_pose = jnp.concatenate(
        [pose_params[:, :3], neck_pose, pose_params[:, 3:6], eye_pose], axis=1
    )  # (B, 15): [global, neck, jaw, eye_l, eye_r]

    # Shape + expression blendshapes — one MXU contraction each.
    v_shaped = (
        v_template[None]
        + jnp.einsum("vcs,bs->bvc", shapedirs, shape_params)
        + jnp.einsum("vcs,bs->bvc", expdirs, expression_params)
    )

    joints = jnp.einsum("jv,bvc->bjc", j_regressor, v_shaped)

    rot_mats = rodrigues(full_pose.reshape(b, 5, 3))
    eye = jnp.eye(3, dtype=dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(b, 36)
    v_posed = v_shaped + jnp.einsum("bp,pn->bn", pose_feature, posedirs).reshape(
        b, -1, 3
    )

    A, _ = _rigid_transforms(rot_mats, joints, parents)
    # Per-vertex skinning transform: (B, V, 4, 4) = lbs_weights @ A
    T = jnp.einsum("vj,bjrc->bvrc", lbs_weights, A)
    verts = (
        jnp.einsum("bvrc,bvc->bvr", T[..., :3, :3], v_posed) + T[..., :3, 3]
    )
    return verts


def flame_decode_landmarks(res, verts: jnp.ndarray):
    """3-D landmarks from decoded vertices via the (face, barycentric) embedding."""
    faces = jnp.asarray(res.faces)
    lmk_faces = jnp.asarray(res.lmk_faces)
    lmk_bary = jnp.asarray(res.lmk_bary, verts.dtype)
    tri = faces[lmk_faces]  # (L, 3) vertex ids
    corner = verts[:, tri]  # (B, L, 3, 3)
    return jnp.einsum("blcd,lc->bld", corner, lmk_bary)


def _dynamic_contour_bucket(pose_params, neck_pose, dtype):
    """Yaw bucket index per FLAME's _find_dynamic_lmk_idx_and_bcoords.

    The head yaw is read off the composed neck-chain world rotation
    (R_global @ R_neck); buckets are 1-degree steps, clamped to +/-39, laid out
    [0..39] for yaw >= 0 and [40..78] for yaw in [-1, -39].
    """
    b = pose_params.shape[0]
    rot_global = rodrigues(pose_params[:, :3])
    rot_neck = rodrigues(neck_pose)
    # Chain composed parent-first (FLAME walks [neck, root] with
    # rel = R_i @ rel, ending at R_global @ R_neck — the world rotation).
    rel = rot_global @ rot_neck
    # rot_mat_to_euler: yaw = atan2(-R[2,0], sqrt(R[0,0]^2 + R[1,0]^2))
    yaw = jnp.arctan2(
        -rel[:, 2, 0], jnp.sqrt(rel[:, 0, 0] ** 2 + rel[:, 1, 0] ** 2)
    )
    deg = jnp.round(jnp.clip(-yaw * (180.0 / np.pi), max=39.0)).astype(jnp.int32)
    neg = deg < 0
    below = deg < -39
    neg_vals = jnp.where(below, 78, 39 - deg)
    return jnp.where(neg, neg_vals, deg)  # (B,) in [0, 78]


def flame_decode_full(
    res,
    shape_params: jnp.ndarray,
    expression_params: jnp.ndarray,
    pose_params: jnp.ndarray,
    neck_pose: jnp.ndarray | None = None,
    eye_pose: jnp.ndarray | None = None,
):
    """The full reference FLAME call contract:
    ``flame(shape, exp, pose) -> (verts, lmk2d, lmk3d)``
    (my_utils/eye_centering.py:38-39, tests/test_eye_positioning.py:63).

    ``lmk3d`` is the static 68-point embedding; ``lmk2d`` replaces its 17
    jawline points with the yaw-dependent dynamic contour (the set used for
    2-D image fitting / the paper's DECA re-inference metric,
    tests/deca_inf_vs_given_cond_landmark_viz.py:40-80).  Both are 3-D
    model-space points; callers project them with the camera.
    """
    b = shape_params.shape[0]
    if neck_pose is None:
        neck_pose = jnp.zeros((b, 3), shape_params.dtype)
    verts = flame_decode(
        res, shape_params, expression_params, pose_params, neck_pose, eye_pose
    )
    lmk3d = flame_decode_landmarks(res, verts)

    if res.dynamic_lmk_faces is None:
        return verts, lmk3d, lmk3d

    bucket = _dynamic_contour_bucket(pose_params, neck_pose, verts.dtype)
    dyn_faces = jnp.asarray(res.dynamic_lmk_faces)[bucket]  # (B, 17)
    dyn_bary = jnp.asarray(res.dynamic_lmk_bary, verts.dtype)[bucket]  # (B,17,3)
    faces = jnp.asarray(res.faces)
    tri = faces[dyn_faces]  # (B, 17, 3) vertex ids

    def one(v, t):  # (V, 3), (17, 3) -> (17, 3, 3)
        return v[t]

    corner = jax.vmap(one)(verts, tri)  # (B, 17, 3, 3)
    contour = jnp.einsum("blcd,blc->bld", corner, dyn_bary)
    lmk2d = jnp.concatenate([contour, lmk3d[:, 17:]], axis=1)
    return verts, lmk2d, lmk3d
