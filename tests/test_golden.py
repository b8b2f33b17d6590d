"""Golden-value tests against COMMITTED expected arrays.

Pattern of reference tests/stg_with_known_weights.py: fixed seeds, one
forward, compare against stored values — guards against silent numerical
drift in the op stack across refactors.  The expected arrays live in
tests/golden/golden.npz; regenerate with ``python tests/golden/regen.py``
ONLY for intentional numerical changes (see that script's header).  Also
the render-consistency check (pattern of tests/dataset_re_rendering_
check.py): the condition maps the sampler renders must equal the ones the
train step renders for the same parameters.
"""

import os

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from gif_tpu.flame.resources import synthetic_flame_resources
from gif_tpu.train import get_config
from gif_tpu.train.step import render_condition_maps

RES = synthetic_flame_resources(seed=1, n_vertices=503)
GOLDEN = np.load(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "golden.npz")
)
# Same-platform (CPU, conftest-pinned) reruns are deterministic; the
# tolerance absorbs cross-jax-version fusion/reassociation only.
GOLD_TOL = dict(atol=2e-5, rtol=2e-5)


def test_generator_golden_forward():
    from gif_tpu.models import StyledGenerator

    gen = StyledGenerator(embedding_vocab_size=4)
    cond = jnp.full((1, 16, 16, 6), 0.25)
    idx = jnp.asarray([1], jnp.int32)
    vars_ = gen.init(jax.random.PRNGKey(42), cond, input_indices=idx, step=2)
    out = np.asarray(gen.apply(vars_, cond, input_indices=idx, step=2))
    np.testing.assert_allclose(
        out, GOLDEN["generator_forward"], **GOLD_TOL,
        err_msg="generator forward drifted from the committed golden "
        "(tests/golden/regen.py)",
    )
    out2 = np.asarray(gen.apply(vars_, cond, input_indices=idx, step=2))
    np.testing.assert_array_equal(out, out2)
    # Structure: values must depend on the identity index.
    out_other = np.asarray(
        gen.apply(vars_, cond, input_indices=jnp.asarray([2], jnp.int32), step=2)
    )
    assert not np.allclose(out, out_other)


@pytest.mark.slow
def test_render_consistency_across_entry_points():
    """The in-step renderer and the sampler's renderer must agree exactly
    (the reference's dataset_re_rendering_check asserts its re-render matches
    the LMDB precompute 'close to zero')."""
    cfg = get_config(
        8,
        embedding_vocab_size=8,
        max_size=32,
        init_size=32,
        render_image_size=32,
        compute_dtype="float32",
    )
    rng = np.random.default_rng(0)
    flame = np.zeros((2, 236), np.float32)
    flame[:, :100] = rng.standard_normal((2, 100)) * 0.1
    flame[:, 156] = 8.0
    flame[:, 209:212] = 3.0
    f = jnp.asarray(flame)

    a = render_condition_maps(RES, f, cfg, max_tris_per_tile=256)
    b = jax.jit(lambda x: render_condition_maps(RES, x, cfg, max_tris_per_tile=256))(f)
    # jit fusion reassociates fp ops; agreement within one 8-bit quantization
    # bin is the contract.
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.01 / 255.0)
    # Values are floor-quantized to the 8-bit grid in [-1, 1].
    vals = (np.asarray(a) + 1.0) / 2.0 * 255.0
    np.testing.assert_allclose(vals, np.round(vals), atol=1e-2)
    # Committed golden: the full rendered maps (geometry + shading + texture
    # + quantization all at once).
    np.testing.assert_allclose(
        np.asarray(a), GOLDEN["condition_maps"], **GOLD_TOL,
        err_msg="rendered condition maps drifted from the committed golden "
        "(tests/golden/regen.py)",
    )


def test_flame_decode_golden():
    from gif_tpu.flame import flame_decode

    shape = jnp.full((1, 100), 0.1)
    exp = jnp.full((1, 50), -0.05)
    pose = jnp.asarray([[0.1, -0.2, 0.05, 0.1, 0.0, 0.0]])
    v1 = np.asarray(flame_decode(RES, shape, exp, pose))
    v2 = np.asarray(flame_decode(RES, shape, exp, pose))
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(
        v1, GOLDEN["flame_verts"], **GOLD_TOL,
        err_msg="FLAME decode drifted from the committed golden "
        "(tests/golden/regen.py)",
    )
    # Articulation must move vertices.
    v0 = np.asarray(flame_decode(RES, shape, exp, jnp.zeros((1, 6))))
    assert np.abs(v1 - v0).max() > 1e-4
