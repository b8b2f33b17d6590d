"""Mesh math: face gathers, face/vertex normals, OBJ IO.

``vertex_normals`` matches reference model/mesh_and_3d_helpers.py:5-37
(area-weighted accumulation of the per-corner cross products, then
normalize), implemented with ``segment_sum`` instead of ``index_add_``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def face_vertices(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Gather per-face corner positions.  (B,V,3),(F,3) -> (B,F,3,3)."""
    return vertices[:, faces]


def face_normals(vertices: jnp.ndarray, faces: jnp.ndarray, normalize: bool = True):
    """(B, F, 3) face normals via the cross product of two edges."""
    tri = face_vertices(vertices, faces)
    n = jnp.cross(tri[:, :, 1] - tri[:, :, 0], tri[:, :, 2] - tri[:, :, 0])
    if normalize:
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-10)
    return n


def vertex_normals(vertices: jnp.ndarray, faces: jnp.ndarray, eps: float = 1e-6):
    """Area-weighted vertex normals.

    Args:
      vertices: (B, V, 3).
      faces: (F, 3) int (shared across the batch — the reference expands a
        single topology across the batch, stg2_generator.py:371-372).

    Returns:
      (B, V, 3) unit normals.

    The reference accumulates, per corner k, cross(v_{k+1}-v_k, v_{k-1}-v_k)
    into vertex k — all three corner contributions equal twice the face area
    times the face normal, so this equals area-weighted face-normal
    accumulation; reproduced corner-for-corner for bitwise-equivalent math.
    """
    faces = np.asarray(faces)  # must be a host constant (segment ids are static)
    b, v, _ = vertices.shape
    tri = face_vertices(vertices, faces)  # (B, F, 3, 3)
    c0 = jnp.cross(tri[:, :, 1] - tri[:, :, 0], tri[:, :, 2] - tri[:, :, 0])
    c1 = jnp.cross(tri[:, :, 2] - tri[:, :, 1], tri[:, :, 0] - tri[:, :, 1])
    c2 = jnp.cross(tri[:, :, 0] - tri[:, :, 2], tri[:, :, 1] - tri[:, :, 2])
    contrib = jnp.stack([c0, c1, c2], axis=2).reshape(b, -1, 3)  # (B, F*3, 3)
    seg_ids = np.asarray(faces).reshape(-1)  # (F*3,)

    def accumulate(x):
        return jax.ops.segment_sum(x, seg_ids, num_segments=v)

    normals = jax.vmap(accumulate)(contrib)
    norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    return normals / jnp.maximum(norm, eps)


def load_obj(path: str):
    """Minimal OBJ loader: vertices, faces, optional UV (host-side)."""
    verts, uvs, faces, uv_faces = [], [], [], []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(p) for p in parts[1:4]])
            elif parts[0] == "vt":
                uvs.append([float(p) for p in parts[1:3]])
            elif parts[0] == "f":
                fv, ft = [], []
                for p in parts[1:4]:
                    comps = p.split("/")
                    fv.append(int(comps[0]) - 1)
                    if len(comps) > 1 and comps[1]:
                        ft.append(int(comps[1]) - 1)
                faces.append(fv)
                if ft:
                    uv_faces.append(ft)
    return (
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int32),
        np.asarray(uvs, np.float32) if uvs else None,
        np.asarray(uv_faces, np.int32) if uv_faces else None,
    )


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as f:
        for v in np.asarray(vertices):
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in np.asarray(faces):
            f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
