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


def save_obj(
    path: str,
    vertices: np.ndarray,
    faces: np.ndarray,
    vertex_colors: np.ndarray | None = None,
    texture: np.ndarray | None = None,
    uvcoords: np.ndarray | None = None,
    uvfaces: np.ndarray | None = None,
) -> None:
    """Write a mesh as OBJ (host-side, eval convenience).

    Covers the reference Mesh save paths (standard_rasterize_cuda/
    helpers.py:6-60, :352-381):
      - plain geometry:           save_obj(p, v, f)
      - per-vertex colors:        save_obj(p, v, f, vertex_colors=rgb01)
        (the MeshLab 'v x y z r g b' extension)
      - textured surface:         save_obj(p, v, f, texture=img01,
                                           uvcoords=vt, uvfaces=ft)
        which also writes a sibling ``.mtl`` and ``.png``.
    """
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    textured = texture is not None
    if textured and (uvcoords is None or uvfaces is None):
        raise ValueError("texture output needs uvcoords and uvfaces")

    mtl_path = png_path = None
    if textured:
        import os

        from PIL import Image

        base = path[:-4] if path.endswith(".obj") else path
        mtl_path, png_path = base + ".mtl", base + ".png"
        img = (np.clip(np.asarray(texture), 0.0, 1.0) * 255).astype(np.uint8)
        Image.fromarray(img).save(png_path)
        with open(mtl_path, "w") as f:
            f.write("newmtl material_1\n")
            f.write(f"map_Kd {os.path.basename(png_path)}\n")

    with open(path, "w") as f:
        if textured:
            import os

            f.write(f"mtllib {os.path.basename(mtl_path)}\n")
        if vertex_colors is not None:
            for v, c in zip(vertices, np.asarray(vertex_colors)):
                f.write(
                    f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f} "
                    f"{c[0]:.6f} {c[1]:.6f} {c[2]:.6f}\n"
                )
        else:
            for v in vertices:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if textured:
            for uv in np.asarray(uvcoords).reshape(-1, 2):
                f.write(f"vt {uv[0]:.6f} {uv[1]:.6f}\n")
            f.write("usemtl material_1\n")
            for face, uvf in zip(faces, np.asarray(uvfaces)):
                f.write(
                    f"f {face[0]+1}/{uvf[0]+1} {face[1]+1}/{uvf[1]+1} "
                    f"{face[2]+1}/{uvf[2]+1}\n"
                )
        else:
            for face in faces:
                f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
