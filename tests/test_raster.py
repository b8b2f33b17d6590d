"""Rasterizer correctness vs a brute-force numpy reference implementing the
CUDA kernel semantics (standard_rasterize_cuda_kernel.cu), plus renderer
smoke/invariant tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gif_tpu.render import (
    rasterize,
    interpolate_face_attributes,
    to_pixel_space,
    get_visibility,
    grid_sample_bilinear,
    render_tex_and_normal,
)
from gif_tpu.render.shading import sh9_basis, SH_CONST
from gif_tpu.flame.mesh import face_vertices
from gif_tpu.flame.resources import synthetic_flame_resources


def _np_rasterize(fv, h, w):
    """Brute force per-pixel loop with the reference kernel's math."""
    f = fv.shape[0]
    depth = np.full((h, w), 1e6, np.float64)
    tri = np.full((h, w), -1, np.int32)
    bary = np.zeros((h, w, 3), np.float64)
    for fi in range(f):
        p0, p1, p2 = fv[fi, 0], fv[fi, 1], fv[fi, 2]
        front = (p2[1] - p0[1]) * (p1[0] - p0[0]) < (p1[1] - p0[1]) * (p2[0] - p0[0])
        if not front:
            continue
        x_min = max(int(np.ceil(min(p0[0], p1[0], p2[0]))), 0)
        x_max = min(int(np.floor(max(p0[0], p1[0], p2[0]))), w - 1)
        y_min = max(int(np.ceil(min(p0[1], p1[1], p2[1]))), 0)
        y_max = min(int(np.floor(max(p0[1], p1[1], p2[1]))), h - 1)
        v0 = p2[:2] - p0[:2]
        v1 = p1[:2] - p0[:2]
        dot00, dot01, dot11 = v0 @ v0, v0 @ v1, v1 @ v1
        det = dot00 * dot11 - dot01 * dot01
        inv = 0.0 if det == 0 else 1.0 / det
        for y in range(y_min, y_max + 1):
            for x in range(x_min, x_max + 1):
                v2 = np.array([x, y], np.float64) - p0[:2]
                dot02, dot12 = v0 @ v2, v1 @ v2
                u = (dot11 * dot02 - dot01 * dot12) * inv
                v = (dot00 * dot12 - dot01 * dot02) * inv
                wgt = np.array([1 - u - v, v, u])
                if wgt[0] > 0 and wgt[1] >= 0 and wgt[2] >= 0:
                    zp = 1.0 / (wgt[0] / p0[2] + wgt[1] / p1[2] + wgt[2] / p2[2])
                    if zp < depth[y, x]:
                        depth[y, x] = zp
                        tri[y, x] = fi
                        bary[y, x] = wgt
    return depth, tri, bary


def _random_faces(rng, n_faces, h, w):
    """Random triangles in pixel space with positive depth."""
    centers = rng.uniform(5, min(h, w) - 5, size=(n_faces, 1, 2))
    offsets = rng.uniform(-8, 8, size=(n_faces, 3, 2))
    xy = centers + offsets
    z = rng.uniform(1.0, 20.0, size=(n_faces, 3, 1))
    return np.concatenate([xy, z], axis=-1).astype(np.float32)


def test_rasterize_matches_bruteforce(rng):
    h = w = 64
    fv = _random_faces(rng, 40, h, w)
    ref_d, ref_t, ref_b = _np_rasterize(fv, h, w)

    out = rasterize(jnp.asarray(fv)[None], h=h, w=w, tile=16, max_tris_per_tile=40)
    got_d = np.asarray(out.depth[0])
    got_t = np.asarray(out.tri_id[0])
    got_b = np.asarray(out.bary[0])

    assert not np.asarray(out.tile_overflow).any()
    np.testing.assert_array_equal(got_t, ref_t)
    hit = ref_t >= 0
    np.testing.assert_allclose(got_d[hit], ref_d[hit], rtol=1e-4)
    np.testing.assert_allclose(got_b[hit], ref_b[hit], rtol=1e-3, atol=1e-4)


def test_rasterize_backface_culled(rng):
    h = w = 32
    # One clockwise (front per the kernel's test) and its flipped twin.
    tri = np.array(
        [[[5, 5, 2.0], [25, 6, 2.0], [15, 25, 2.0]]], np.float32
    )
    flipped = tri[:, [0, 2, 1], :]
    out_f = rasterize(jnp.asarray(tri)[None], h=h, w=w, tile=16, max_tris_per_tile=4)
    out_b = rasterize(jnp.asarray(flipped)[None], h=h, w=w, tile=16, max_tris_per_tile=4)
    n_f = int((np.asarray(out_f.tri_id[0]) >= 0).sum())
    n_b = int((np.asarray(out_b.tri_id[0]) >= 0).sum())
    assert (n_f > 0) != (n_b > 0)  # exactly one orientation rasterizes


def test_rasterize_depth_ordering():
    h = w = 32
    # Two overlapping triangles; the nearer (smaller z) must win everywhere.
    near = np.array([[[2, 2, 1.0], [30, 3, 1.0], [15, 30, 1.0]]], np.float32)
    far = np.array([[[2, 2, 5.0], [30, 3, 5.0], [15, 30, 5.0]]], np.float32)
    # ensure front-facing ordering consistent with the near triangle.
    fv = np.concatenate([far, near], axis=0)
    out = rasterize(jnp.asarray(fv)[None], h=h, w=w, tile=16, max_tris_per_tile=4)
    t = np.asarray(out.tri_id[0])
    assert (t[t >= 0] == 1).all()


def test_tile_overflow_flag():
    h = w = 32
    rng = np.random.default_rng(3)
    fv = _random_faces(rng, 64, h, w)
    out = rasterize(jnp.asarray(fv)[None], h=h, w=w, tile=32, max_tris_per_tile=8)
    assert np.asarray(out.tile_overflow).any()


def test_interpolate_face_attributes_grad():
    h = w = 32
    rng = np.random.default_rng(4)
    fv = _random_faces(rng, 10, h, w)
    out = rasterize(jnp.asarray(fv)[None], h=h, w=w, tile=16, max_tris_per_tile=16)

    attrs = jnp.asarray(rng.standard_normal((1, 10, 3, 4)).astype(np.float32))

    def loss(a):
        img = interpolate_face_attributes(out.tri_id, out.bary, a)
        return jnp.sum(img**2)

    g = jax.grad(loss)(attrs)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_grid_sample_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    img = rng.standard_normal((2, 3, 9, 11)).astype(np.float32)  # NCHW
    grid = rng.uniform(-1.2, 1.2, size=(2, 5, 6, 2)).astype(np.float32)
    ref = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid), align_corners=False
    ).numpy()
    got = grid_sample_bilinear(
        jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid)
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_sh_basis_constant_light():
    """Light with only the constant band shades uniformly."""
    n = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    basis = np.asarray(sh9_basis(n))
    np.testing.assert_allclose(basis[:, 0], SH_CONST[0], rtol=1e-6)


@pytest.mark.slow
def test_render_tex_and_normal_end_to_end():
    res = synthetic_flame_resources()
    b = 2
    key = jax.random.PRNGKey(0)
    shape = 0.1 * jax.random.normal(key, (b, 100))
    light = jnp.zeros((b, 9, 3)).at[:, 0, :].set(3.0)
    cam = jnp.tile(jnp.asarray([[8.0, 0.0, 0.0]]), (b, 1))
    maps = render_tex_and_normal(
        res,
        shape,
        jnp.zeros((b, 50)),
        jnp.zeros((b, 6)),
        jnp.zeros((b, 50)),
        light,
        cam,
        image_size=128,
        max_tris_per_tile=2048,
    )
    assert maps.textured.shape == (b, 128, 128, 3)
    assert maps.normal.shape == (b, 128, 128, 3)
    t = np.asarray(maps.textured)
    nrm = np.asarray(maps.normal)
    m = np.asarray(maps.mask)
    assert m.any(), "mesh projected off-screen"
    assert (t >= 0).all() and np.isfinite(t).all()
    assert (nrm >= 0).all() and (nrm <= 1).all()
    # Background exactly zero.
    assert (t[~m] == 0).all() and (nrm[~m] == 0).all()


@pytest.mark.slow
def test_render_gradients_flow_to_codes():
    res = synthetic_flame_resources()
    b = 1
    cam = jnp.asarray([[8.0, 0.0, 0.0]])
    light = jnp.zeros((b, 9, 3)).at[:, 0, :].set(3.0)

    def loss(tex, lit):
        maps = render_tex_and_normal(
            res,
            jnp.zeros((b, 100)),
            jnp.zeros((b, 50)),
            jnp.zeros((b, 6)),
            tex,
            lit,
            cam,
            image_size=64,
            max_tris_per_tile=1024,
        )
        return jnp.sum(maps.textured)

    gt, gl = jax.grad(loss, argnums=(0, 1))(jnp.zeros((b, 50)), light)
    assert float(jnp.abs(gt).sum()) > 0
    assert float(jnp.abs(gl).sum()) > 0


@pytest.mark.slow
def test_get_visibility():
    res = synthetic_flame_resources()
    verts = jnp.asarray(res.v_template[None] * 8.0)  # fill [-1,1] ndc roughly
    vis = get_visibility(verts, jnp.asarray(res.faces), 64, 64)
    v = np.asarray(vis[0])
    # Roughly half the sphere should be visible, never all or none.
    assert 0.1 < v.mean() < 0.9


@pytest.mark.slow
def test_get_visibility_z():
    """Bilinear depth-buffer visibility (reference visibility.py:62-100):
    front-quad vertices pass, a vertex clearly occluded behind the front
    surface fails, and a vertex within 2% of the z-range of the surface
    passes (the reference's tolerance band)."""
    from gif_tpu.render.raster import get_visibility_z

    # Front quad covering the image center at z=-0.5; three probe vertices
    # behind it at the center: barely-behind (within band), deep-behind
    # (occluded), plus one off to the side with nothing in front (visible).
    quad = np.array(
        [[-0.8, -0.8, -0.5], [0.8, -0.8, -0.5], [0.8, 0.8, -0.5], [-0.8, 0.8, -0.5]],
        np.float32,
    )
    probes = np.array(
        [[0.0, 0.0, -0.49], [0.0, 0.0, 0.5], [0.95, 0.95, 0.5]], np.float32
    )
    verts = jnp.asarray(np.concatenate([quad, probes])[None])
    faces = jnp.asarray(
        np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    )
    vis = np.asarray(get_visibility_z(verts, faces, 64, 64)[0])
    assert vis[:4].min() == 1.0, "front-quad corners must be visible"
    assert vis[4] == 1.0, "vertex within the 2% z-band must pass"
    assert vis[5] == 0.0, "deep-occluded vertex must fail"
    assert vis[6] == 1.0, "unoccluded side vertex must pass"


@pytest.mark.slow
def test_pallas_rasterizer_matches_xla(rng):
    """The Pallas kernel (interpret mode on CPU) must match the XLA raster."""
    from gif_tpu.render.raster_pallas import rasterize_pallas

    h = w = 64
    fv = _random_faces(rng, 60, h, w)
    ref = rasterize(jnp.asarray(fv)[None], h=h, w=w, tile=16, max_tris_per_tile=64)
    got = rasterize_pallas(
        jnp.asarray(fv)[None], h=h, w=w, tile=16, max_tris_per_tile=64
    )
    np.testing.assert_array_equal(np.asarray(got.tri_id), np.asarray(ref.tri_id))
    hit = np.asarray(ref.tri_id[0]) >= 0
    # The kernel evaluates the (algebraically identical) affine form of the
    # barycentric/depth formulas; fp re-association leaves ~1e-4 relative
    # noise vs the per-pixel dot-product evaluation.
    np.testing.assert_allclose(
        np.asarray(got.depth[0])[hit], np.asarray(ref.depth[0])[hit], rtol=1e-3
    )
    # bary tolerates fp-association differences between the two formulations
    # (the kernel's affine evaluation carries ~2^-16-mantissa coefficients)
    np.testing.assert_allclose(
        np.asarray(got.bary[0])[hit], np.asarray(ref.bary[0])[hit], rtol=5e-3, atol=2e-3
    )


@pytest.mark.slow
def test_pallas_fused_attrs_match_interpolation(rng):
    """Fused attr output must equal rasterize + interpolate_face_attributes."""
    from gif_tpu.render.raster_pallas import (
        rasterize_pallas_with_attrs,
        rasterize_pallas,
    )

    h = w = 64
    fv = _random_faces(rng, 60, h, w)
    attrs = rng.standard_normal((1, 60, 3, 5)).astype(np.float32)
    rast, attr_img = rasterize_pallas_with_attrs(
        jnp.asarray(fv)[None], jnp.asarray(attrs), h, w, 16, 64
    )
    ref = interpolate_face_attributes(rast.tri_id, rast.bary, jnp.asarray(attrs))
    np.testing.assert_allclose(
        np.asarray(attr_img), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
    # And the raster outputs match the plain kernel.
    plain = rasterize_pallas(jnp.asarray(fv)[None], h=h, w=w, tile=16,
                             max_tris_per_tile=64)
    np.testing.assert_array_equal(np.asarray(rast.tri_id), np.asarray(plain.tri_id))


@pytest.mark.slow
def test_pallas_fused_attrs_grad(rng):
    from gif_tpu.render.raster_pallas import rasterize_pallas_with_attrs

    h = w = 32
    fv = jnp.asarray(_random_faces(rng, 20, h, w))[None]
    attrs = jnp.asarray(rng.standard_normal((1, 20, 3, 4)).astype(np.float32))

    def loss(a):
        _, img = rasterize_pallas_with_attrs(fv, a, h, w, 16, 64)
        return jnp.sum(img**2)

    def loss_ref(a):
        out = rasterize(fv, h=h, w=w, tile=16, max_tris_per_tile=64)
        img = interpolate_face_attributes(out.tri_id, out.bary, a)
        return jnp.sum(img**2)

    g = jax.grad(loss)(attrs)
    g_ref = jax.grad(loss_ref)(attrs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


def test_sample_at_points_forward_matches_grid_sample(rng):
    from gif_tpu.render.sampling_ops import sample_at_points

    img = jnp.asarray(rng.standard_normal((2, 9, 11, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 40, 2)).astype(np.float32))
    got = sample_at_points(img, pts)
    ref = grid_sample_bilinear(img, pts[:, :, None, :])[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sample_at_points_grad_matches_autodiff(rng):
    """The sort/cumsum/searchsorted backward must equal the plain autodiff
    gradient of the same sampling math."""
    from gif_tpu.render.sampling_ops import sample_at_points, _sample_fwd_impl

    img = jnp.asarray(rng.standard_normal((2, 7, 8, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1.1, 1.1, (2, 25, 2)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((2, 25, 3)).astype(np.float32))

    def loss(im):
        return jnp.sum(sample_at_points(im, pts) * cot)

    def loss_ref(im):
        return jnp.sum(_sample_fwd_impl(im, pts) * cot)

    g = jax.grad(loss)(img)
    g_ref = jax.grad(loss_ref)(img)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_tile_overflow_reported_and_auto_sizing():
    """Overflowing a tiny per-tile cap must be visible, not silent
    (SURVEY 'no silent caps'); auto sizing clears it for this mesh."""
    from gif_tpu.render.raster import rasterize, auto_max_tris_per_tile
    from gif_tpu.flame.mesh import face_vertices
    from gif_tpu.render.raster import to_pixel_space

    res = synthetic_flame_resources(seed=1, n_vertices=503)
    rng = np.random.default_rng(0)
    verts = jnp.asarray(res.v_template[None] * 8.0)  # fills the frame
    pix = to_pixel_space(verts, 32, 32)
    fv = face_vertices(pix, np.asarray(res.faces))

    tiny = rasterize(fv, h=32, w=32, tile=32, max_tris_per_tile=8)
    assert bool(jnp.any(tiny.tile_overflow))

    cap = auto_max_tris_per_tile(res.faces.shape[0], 1)
    assert 256 <= cap <= res.faces.shape[0]
    auto = rasterize(fv, h=32, w=32, tile=32, max_tris_per_tile=cap)
    assert not bool(jnp.any(auto.tile_overflow))


@pytest.mark.slow
def test_renderer_overflow_flag_and_assert():
    import pytest
    from gif_tpu.render.renderer import render_tex_and_normal

    res = synthetic_flame_resources(seed=1, n_vertices=503)
    b = 2
    shape = jnp.zeros((b, 100))
    exp = jnp.zeros((b, 50))
    pose = jnp.zeros((b, 6))
    tex = jnp.zeros((b, 50))
    light = jnp.zeros((b, 9, 3)).at[:, 0, :].set(3.0)
    cam = jnp.asarray([[8.0, 0.0, 0.0]] * b)

    ok = render_tex_and_normal(
        res, shape, exp, pose, tex, light, cam, image_size=32,
        max_tris_per_tile=None,  # mesh-derived auto sizing
    )
    assert ok.overflow.shape == (b,)
    assert not bool(jnp.any(ok.overflow))

    bad = render_tex_and_normal(
        res, shape, exp, pose, tex, light, cam, image_size=32,
        max_tris_per_tile=8,
    )
    assert bool(jnp.all(bad.overflow))

    with pytest.raises(Exception, match="tile overflow"):
        render_tex_and_normal(
            res, shape, exp, pose, tex, light, cam, image_size=32,
            max_tris_per_tile=8, assert_no_overflow=True,
        )
        import jax

        jax.effects_barrier()


def test_mxu_sampler_matches_reference(rng):
    """The MXU one-hot-matmul sampler must match grid_sample_bilinear."""
    from gif_tpu.render.sampler_pallas import grid_sample_bilinear_mxu

    # W*C = 128 lanes; includes out-of-range points (zeros padding).
    img = rng.standard_normal((2, 64, 64, 2)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(2, 16, 16, 2)).astype(np.float32)
    ref = grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid))
    got = grid_sample_bilinear_mxu(jnp.asarray(img), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_mxu_sampler_grad_matches_reference(rng):
    from gif_tpu.render.sampler_pallas import grid_sample_bilinear_mxu

    img = jnp.asarray(rng.standard_normal((1, 64, 64, 2)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, size=(1, 8, 8, 2)).astype(np.float32))

    g_img_m, g_grid_m = jax.grad(
        lambda i, g: jnp.sum(grid_sample_bilinear_mxu(i, g) ** 2), argnums=(0, 1)
    )(img, grid)
    g_img_r, g_grid_r = jax.grad(
        lambda i, g: jnp.sum(grid_sample_bilinear(i, g) ** 2), argnums=(0, 1)
    )(img, grid)
    np.testing.assert_allclose(np.asarray(g_img_m), np.asarray(g_img_r), rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(g_grid_m), np.asarray(g_grid_r), rtol=5e-2, atol=5e-1)


def test_mxu_scatter_matches_sampling_vjp(rng):
    """scatter_bilinear_mxu must equal the autodiff VJP of bilinear sampling."""
    from gif_tpu.render.sampler_pallas import scatter_bilinear_mxu
    from gif_tpu.render.sampling_ops import _tap_data

    b, h, w, c = 2, 64, 64, 2
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, size=(b, 300, 2)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, 300, c)).astype(np.float32))

    got = scatter_bilinear_mxu(g, pts, h, w)

    # reference: dense accumulation via the tap data
    ids, wgt, ok = _tap_data((b, h, w, c), pts)
    ref = np.zeros((b, h * w, c), np.float32)
    idn, wn, okn, gn = map(np.asarray, (ids, wgt, ok, g))
    for bi in range(b):
        for pi in range(300):
            for t in range(4):
                if okn[bi, pi, t]:
                    ref[bi, idn[bi, pi, t]] += wn[bi, pi, t] * gn[bi, pi]
    np.testing.assert_allclose(
        np.asarray(got), ref.reshape(b, h, w, c), rtol=2e-2, atol=2e-2
    )


def test_degenerate_triangle_never_inside():
    """A triangle whose barycentric determinant rounds to exactly 0 must be
    rejected by BOTH raster paths: the reference CUDA kernel only visits a
    sliver's own bbox pixels, while the gather/matmul formulations test every
    pixel of every overlapped tile — an unguarded det==0 candidate evaluates
    u = v = 0 (w0 = 1) everywhere and would stamp whole tiles."""
    from gif_tpu.render.raster import _barycentric
    from gif_tpu.render.raster_pallas import _affine_coeffs

    # Exactly collinear corners -> det == 0 in f32.
    fv = jnp.asarray(
        [[[1.0, 1.0, 1.0], [3.0, 3.0, 1.0], [5.0, 5.0, 1.0]]], jnp.float32
    )
    w = _barycentric(jnp.arange(4.0), jnp.arange(4.0), fv)  # (1, P, 3)
    assert not bool(jnp.any(w[..., 0] > 0)), "degenerate face passed inside test"

    coeffs, nondeg = _affine_coeffs(fv[None])  # (1, 1, 9), (1, 1)
    assert coeffs.shape == (1, 1, 9)
    assert not bool(nondeg[0, 0])


def test_visibility_uses_mesh_sized_capacity():
    """get_visibility must not silently drop faces of a FLAME-sized mesh
    through the fixed rasterize default (review finding: dropped candidates
    mark their vertices invisible with no overflow signal)."""
    res = synthetic_flame_resources(seed=3, n_vertices=203)
    v = jnp.asarray(res.v_template)[None]
    # NDC-normalize the template to fill the screen.
    v = (v - v.mean(axis=1, keepdims=True)) / (
        jnp.abs(v - v.mean(axis=1, keepdims=True)).max() + 1e-6
    )
    vis = get_visibility(v, jnp.asarray(res.faces), 64, 64)
    assert vis.shape == (1, res.n_vertices)
    assert bool(jnp.any(vis > 0))  # something is visible front-on
