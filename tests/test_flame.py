"""FLAME decoder / camera / mesh math tests.

Parity targets: torch-based reference formulas from
model/mesh_and_3d_helpers.py and my_utils/eye_centering.py, plus analytic
invariants of the LBS decode (zero params -> template, global rotation is
rigid, etc.)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import torch

from gif_tpu.flame import (
    flame_decode,
    flame_decode_landmarks,
    batch_orth_proj,
    vertex_normals,
)
from gif_tpu.flame.camera import solve_eye_camera
from gif_tpu.flame.decoder import rodrigues
from gif_tpu.flame.resources import synthetic_flame_resources


RES = synthetic_flame_resources()


def test_zero_params_give_template():
    b = 2
    verts = flame_decode(
        RES, jnp.zeros((b, 100)), jnp.zeros((b, 50)), jnp.zeros((b, 6))
    )
    np.testing.assert_allclose(np.asarray(verts[0]), RES.v_template, atol=1e-5)
    np.testing.assert_allclose(np.asarray(verts[1]), RES.v_template, atol=1e-5)


def test_global_rotation_is_rigid():
    """A pure global rotation must rotate the whole mesh about the root joint."""
    b = 1
    angle = np.array([[0.3, -0.2, 0.5, 0, 0, 0]], dtype=np.float32)
    verts = flame_decode(
        RES, jnp.zeros((b, 100)), jnp.zeros((b, 50)), jnp.asarray(angle)
    )
    R = np.asarray(rodrigues(jnp.asarray(angle[:, :3])))[0]
    root = RES.j_regressor[0] @ RES.v_template  # rest root joint
    expected = (RES.v_template - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(verts[0]), expected, atol=2e-4)


def test_shape_blendshape_linearity():
    b = 1
    s1 = jnp.zeros((b, 100)).at[0, 3].set(1.0)
    v1 = flame_decode(RES, s1, jnp.zeros((b, 50)), jnp.zeros((b, 6)))
    v2 = flame_decode(RES, 2 * s1, jnp.zeros((b, 50)), jnp.zeros((b, 6)))
    d1 = np.asarray(v1[0]) - RES.v_template
    d2 = np.asarray(v2[0]) - RES.v_template
    np.testing.assert_allclose(d2, 2 * d1, atol=1e-5)


def test_rodrigues_matches_scipy():
    from scipy.spatial.transform import Rotation

    vecs = np.random.default_rng(1).standard_normal((5, 3)).astype(np.float32)
    got = np.asarray(rodrigues(jnp.asarray(vecs)))
    ref = Rotation.from_rotvec(vecs).as_matrix()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_batch_orth_proj_parity(rng):
    X = rng.standard_normal((2, 7, 3)).astype(np.float32)
    cam = rng.standard_normal((2, 3)).astype(np.float32)
    # torch reference formula (mesh_and_3d_helpers.py:40-51)
    tX, tc = torch.from_numpy(X), torch.from_numpy(cam).view(-1, 1, 3)
    Xt = torch.cat([tX[:, :, :2] + tc[:, :, 1:], tX[:, :, 2:]], 2)
    ref = (tc[:, :, 0:1] * Xt).numpy()
    got = batch_orth_proj(jnp.asarray(X), jnp.asarray(cam))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_vertex_normals_parity(rng):
    verts = rng.standard_normal((2, 10, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6], [6, 7, 8], [8, 9, 0]], np.int32)
    got = np.asarray(vertex_normals(jnp.asarray(verts), jnp.asarray(faces)))

    # torch reference (mesh_and_3d_helpers.py:5-37)
    tv = torch.from_numpy(verts)
    tf = torch.from_numpy(faces)[None].expand(2, -1, -1)
    bs, nv = tv.shape[:2]
    normals = torch.zeros(bs * nv, 3)
    f = tf + (torch.arange(bs, dtype=tf.dtype) * nv)[:, None, None]
    vf = tv.reshape(-1, 3)[f.long()].view(-1, 3, 3)
    f = f.view(-1, 3)
    normals.index_add_(
        0, f[:, 1].long(), torch.cross(vf[:, 2] - vf[:, 1], vf[:, 0] - vf[:, 1], dim=1)
    )
    normals.index_add_(
        0, f[:, 2].long(), torch.cross(vf[:, 0] - vf[:, 2], vf[:, 1] - vf[:, 2], dim=1)
    )
    normals.index_add_(
        0, f[:, 0].long(), torch.cross(vf[:, 1] - vf[:, 0], vf[:, 2] - vf[:, 0], dim=1)
    )
    normals = torch.nn.functional.normalize(normals, eps=1e-6, dim=1)
    ref = normals.reshape(2, nv, 3).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_eye_centering_places_eyes():
    """With symmetric eye vertices (consistent system) the solve is exact.

    Real FLAME eye centres are left/right symmetric at equal height, which
    makes the reference's 4-equation / 3-unknown system (nearly) consistent;
    the synthetic mesh's vertices 4051/4597 are arbitrary, so exactness is
    checked on constructed vertices here and only finiteness on the mesh.
    """
    from gif_tpu.constants import DEFAULT_FLAME_CONFIG as cfg

    # Constructed: e1 = (-w, h, z), e2 = (+w, h, z) -> solvable exactly in x
    # after accounting for the unequal desired x magnitudes via the shift.
    verts = np.zeros((2, 5000, 3), dtype=np.float32)
    verts[0, 10] = [-0.04, 0.02, 0.05]
    verts[0, 20] = [0.04, 0.02, 0.05]
    verts[1, 10] = [-0.03, 0.01, 0.04]
    verts[1, 20] = [0.03, 0.01, 0.04]
    cam = solve_eye_camera(jnp.asarray(verts), 10, 20)
    proj = np.asarray(
        batch_orth_proj(jnp.asarray(verts), cam.at[:, 0].set(-cam[:, 0]))
    )
    desired_y = ((0.0501 - 0.1) + (0.0509 - 0.1)) / 2  # ls average of the two rows
    for bi in range(2):
        np.testing.assert_allclose(proj[bi, 10, 0], -0.2419, atol=1e-3)
        np.testing.assert_allclose(proj[bi, 20, 0], 0.2441, atol=1e-3)
        np.testing.assert_allclose(proj[bi, 10, 1], desired_y, atol=1e-3)

    # Smoke: full decode + solve stays finite on the synthetic mesh.
    mesh_verts = flame_decode(
        RES, jnp.zeros((1, 100)), jnp.zeros((1, 50)), jnp.zeros((1, 6))
    )
    c2 = solve_eye_camera(mesh_verts, cfg.eye_left_vertex, cfg.eye_right_vertex)
    assert np.isfinite(np.asarray(c2)).all()


def test_landmarks_shape():
    verts = flame_decode(RES, jnp.zeros((1, 100)), jnp.zeros((1, 50)), jnp.zeros((1, 6)))
    lmk = flame_decode_landmarks(RES, verts)
    assert lmk.shape == (1, RES.lmk_faces.shape[0], 3)


def test_decode_jit_and_grad():
    """The decoder must be jittable and differentiable end-to-end."""

    @jax.jit
    def loss(shape, exp, pose):
        v = flame_decode(RES, shape, exp, pose)
        return jnp.sum(v**2)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.ones((2, 100)) * 0.01, jnp.zeros((2, 50)), jnp.ones((2, 6)) * 0.1
    )
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()


@pytest.mark.slow
def test_synthetic_face_region_mask_nontrivial_and_roundtrips(tmp_path):
    """The resources carry a texture-space face mask (reference
    constants.py:48) that is neither all-ones nor all-zeros and survives
    the save/load cycle."""
    from gif_tpu.flame.resources import (
        synthetic_flame_resources,
        save_flame_resources,
        load_flame_resources,
    )

    res = synthetic_flame_resources(seed=3, n_vertices=203)
    m = res.face_region_mask
    assert m is not None and m.shape == res.tex_mean.shape[:2]
    assert 0.05 < m.mean() < 0.95  # a real region, not a degenerate mask

    path = str(tmp_path / "res.npz")
    save_flame_resources(res, path)
    loaded = load_flame_resources(path)
    np.testing.assert_array_equal(loaded.face_region_mask, m)


@pytest.mark.slow
def test_interp_loss_face_mask_changes_value():
    """The face-region mask must actually gate the texture-interp loss
    (reference losses.py:170-176); with a fake generator the masked and
    unmasked losses differ."""
    import jax
    import jax.numpy as jnp
    from gif_tpu.flame.resources import synthetic_flame_resources
    from gif_tpu.train.losses import texture_interpolation_loss

    res = synthetic_flame_resources(seed=3, n_vertices=203)
    rng = np.random.default_rng(0)
    flame = np.zeros((3, 236), np.float32)
    flame[:, :100] = rng.standard_normal((3, 100)) * 0.1
    flame[:, 156] = 8.0
    flame[:, 209:212] = 3.0

    def fake_gen(cond, idx):
        # Images correlated with the condition maps, per-sample shifted so
        # textures differ across the batch.
        return jnp.tanh(cond[..., :3]) + 0.1 * idx[:, None, None, None]

    common = dict(
        image_size=64,
        max_tris_per_tile=128,
    )
    key = jax.random.PRNGKey(0)
    unmasked = float(
        texture_interpolation_loss(
            res, jnp.asarray(flame), fake_gen, key,
            face_region_mask=jnp.ones(res.tex_mean.shape[:2]), **common,
        )
    )
    masked = float(
        texture_interpolation_loss(
            res, jnp.asarray(flame), fake_gen, key,
            face_region_mask=jnp.asarray(res.face_region_mask), **common,
        )
    )
    assert np.isfinite(masked) and np.isfinite(unmasked)
    assert abs(masked - unmasked) > 1e-4


def test_load_face_region_mask_png(tmp_path):
    from PIL import Image
    from gif_tpu.tools.convert_flame import load_face_region_mask

    arr = np.zeros((8, 8, 3), np.uint8)
    arr[2:6, 2:6] = 255
    p = str(tmp_path / "mask.png")
    Image.fromarray(arr).save(p)
    m = load_face_region_mask(p)
    assert m.shape == (8, 8) and m.dtype == np.float32
    assert m[3, 3] == 1.0 and m[0, 0] == 0.0


def test_flame_decode_full_contract():
    """(verts, lmk2d, lmk3d) contract with yaw-dependent dynamic contour."""
    from gif_tpu.flame.decoder import flame_decode_full, flame_decode_landmarks

    res = synthetic_flame_resources()
    b = 3
    shape = jnp.zeros((b, 100))
    exp = jnp.zeros((b, 50))
    pose = jnp.zeros((b, 6))
    verts, lmk2d, lmk3d = flame_decode_full(res, shape, exp, pose)
    assert verts.shape == (b, res.n_vertices, 3)
    assert lmk2d.shape == (b, 68, 3) and lmk3d.shape == (b, 68, 3)
    np.testing.assert_allclose(
        np.asarray(lmk3d), np.asarray(flame_decode_landmarks(res, verts)), rtol=1e-6
    )
    # Frontal pose: bucket 39 tables equal the static jawline by
    # construction -> lmk2d == lmk3d.
    np.testing.assert_allclose(np.asarray(lmk2d), np.asarray(lmk3d), rtol=1e-5, atol=1e-6)

    # A yawed head selects a different contour bucket -> jawline changes,
    # the 51 static points still match the static embedding.
    pose_yaw = pose.at[:, 1].set(0.35)  # ~20 degrees about y
    verts_y, lmk2d_y, lmk3d_y = flame_decode_full(res, shape, exp, pose_yaw)
    np.testing.assert_allclose(
        np.asarray(lmk2d_y[:, 17:]), np.asarray(lmk3d_y[:, 17:]), rtol=1e-5, atol=1e-6
    )
    assert np.abs(np.asarray(lmk2d_y[:, :17]) - np.asarray(lmk3d_y[:, :17])).max() > 1e-4


def test_dynamic_contour_bucket_mapping():
    from gif_tpu.flame.decoder import _dynamic_contour_bucket

    b = 5
    neck = jnp.zeros((b, 3))
    # yaw buckets: the FLAME convention maps -deg(yaw) clamped to 39,
    # negatives to [40..78].
    import numpy as _np

    for deg, expect in [(0.0, 0), (-10.0, 10), (-45.0, 39), (10.0, 40 + 9), (45.0, 78)]:
        pose = jnp.zeros((b, 6)).at[:, 1].set(_np.deg2rad(deg))
        got = _np.asarray(_dynamic_contour_bucket(pose, neck, jnp.float32))
        assert (got == expect).all(), (deg, got, expect)


def test_converter_per_vertex_uv_seamed_obj():
    """FLAME's template OBJ has MORE vt entries than vertices (UV seams) and
    vt order is uv-face order, not vertex order — the converter must map
    each vertex to its corner UV via uv_faces, not truncate the vt list
    (review finding: uv[:n_verts] scrambles nearly every face's texture)."""
    from gif_tpu.tools.convert_flame import _per_vertex_uv

    # 4 vertices, 5 vt entries (vertex 3 is a seam with two charts), two
    # faces indexing vt out of vertex order.
    uvs = np.array(
        [[0.1, 0.2], [0.9, 0.8], [0.5, 0.5], [0.3, 0.7], [0.2, 0.1]],
        np.float32,
    )
    faces = np.array([[0, 1, 3], [1, 2, 3]], np.int32)
    uv_faces = np.array([[2, 0, 1], [0, 4, 3]], np.int32)
    out = _per_vertex_uv(uvs, uv_faces, faces, 4)
    assert out.shape == (4, 2)
    flip = lambda u: [u[0], 1.0 - u[1]]  # converter flips v to image rows
    np.testing.assert_allclose(out[0], flip(uvs[2]))  # v0 <- vt2
    np.testing.assert_allclose(out[1], flip(uvs[0]))  # v1 <- vt0 (first occurrence)
    np.testing.assert_allclose(out[2], flip(uvs[4]))  # v2 <- vt4
    np.testing.assert_allclose(out[3], flip(uvs[1]))  # v3 seam: first chart wins


def test_converter_box_downsample():
    from gif_tpu.tools.convert_flame import _box_down2

    a = np.arange(4 * 4 * 3, dtype=np.float32).reshape(4, 4, 3)
    d = _box_down2(a)
    assert d.shape == (2, 2, 3)
    np.testing.assert_allclose(d[0, 0], a[:2, :2].mean(axis=(0, 1)))
    # Linearity: downsampling the PCA basis == downsampling rendered textures.
    dirs = np.random.default_rng(0).standard_normal((4, 4, 3, 5)).astype(np.float32)
    code = np.random.default_rng(1).standard_normal(5).astype(np.float32)
    np.testing.assert_allclose(
        _box_down2(dirs) @ code, _box_down2(dirs @ code), rtol=1e-5, atol=1e-5
    )


def test_legacy_camera_param_dicts():
    """Legacy perspective-camera dicts (reference flm_dynamic_fit_overlay.py:5-32)."""
    from gif_tpu.flame.camera import camera_dynamic, camera_ringnet, camera_ringnetpp

    rn = camera_ringnet(np.array([12.0, 3.0, 4.0]))
    np.testing.assert_allclose(rn["f"], [12.0, 12.0])
    np.testing.assert_allclose(rn["c"], [3.0, 4.0])
    assert rn["k"].shape == (5,) and not rn["k"].any()
    assert not rn["t"].any() and not rn["r"].any()

    dyn = camera_dynamic((512, 512), np.array([0.0, 0.0, 2.0]))
    np.testing.assert_allclose(dyn["c"], [256.0, 256.0])
    # Focal scales with h/256 off the reference's fitted 4754.97941935 base.
    np.testing.assert_allclose(dyn["f"], [2 * 4754.97941935] * 2)
    np.testing.assert_allclose(dyn["k"][:2], [-0.19816071, 0.92822711])
    np.testing.assert_allclose(dyn["r"], [np.pi, 0.0, 0.0])
    np.testing.assert_allclose(dyn["t"], [0.0, 0.0, 2.0])

    pp = camera_ringnetpp((256, 192), np.array([0.1, 0.2, 0.3]), focal=5000.0)
    np.testing.assert_allclose(pp["c"], [96.0, 128.0])
    np.testing.assert_allclose(pp["f"], [5000.0, 5000.0])
    np.testing.assert_allclose(pp["r"], [0.0, np.pi, 0.0])


def test_save_obj_roundtrip_and_texture(tmp_path):
    """save_obj covers the reference Mesh save paths (helpers.py:6-60,
    :352-381): geometry roundtrip, vertex colors, textured + mtl/png."""
    from gif_tpu.flame.mesh import load_obj, save_obj

    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)

    p = str(tmp_path / "plain.obj")
    save_obj(p, v, f)
    v2, f2, uv2, uvf2 = load_obj(p)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)
    assert uv2 is None

    # Vertex-color extension still loads as geometry.
    pc = str(tmp_path / "colors.obj")
    save_obj(pc, v, f, vertex_colors=np.ones_like(v) * 0.5)
    v3, f3, _, _ = load_obj(pc)
    np.testing.assert_allclose(v3, v, atol=1e-6)

    # Textured path: obj + mtl + png; uv faces roundtrip.
    uv = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    pt = str(tmp_path / "tex.obj")
    save_obj(pt, v, f, texture=np.zeros((8, 8, 3)), uvcoords=uv, uvfaces=f)
    v4, f4, uv4, uvf4 = load_obj(pt)
    np.testing.assert_allclose(uv4, uv, atol=1e-6)
    np.testing.assert_array_equal(uvf4, f)
    assert (tmp_path / "tex.mtl").exists() and (tmp_path / "tex.png").exists()
