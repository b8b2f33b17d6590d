"""Regenerate the committed golden arrays for tests/test_golden.py.

Run on CPU (the test platform pinned by tests/conftest.py):

    cd /root/repo && JAX_PLATFORMS=cpu python tests/golden/regen.py

Regenerate ONLY when an intentional numerical change lands (new FLAME
decode math, renderer quantization change, generator op change) and
record why in the commit message.  The stored values are what makes
cross-refactor numerical drift fail loudly (the point of the reference's
tests/stg_with_known_weights.py pattern).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    from gif_tpu.flame.resources import synthetic_flame_resources
    from gif_tpu.flame import flame_decode
    from gif_tpu.models import StyledGenerator
    from gif_tpu.train import get_config
    from gif_tpu.train.step import render_condition_maps

    res = synthetic_flame_resources(seed=1, n_vertices=503)

    # 1) generator forward (fixed init seed, 16px, step 2)
    gen = StyledGenerator(embedding_vocab_size=4)
    cond = jnp.full((1, 16, 16, 6), 0.25)
    idx = jnp.asarray([1], jnp.int32)
    vars_ = gen.init(jax.random.PRNGKey(42), cond, input_indices=idx, step=2)
    gen_out = np.asarray(gen.apply(vars_, cond, input_indices=idx, step=2))

    # 2) FLAME decode
    shape = jnp.full((1, 100), 0.1)
    exp = jnp.full((1, 50), -0.05)
    pose = jnp.asarray([[0.1, -0.2, 0.05, 0.1, 0.0, 0.0]])
    verts = np.asarray(flame_decode(res, shape, exp, pose))

    # 3) rendered condition maps (32px, both map kinds)
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
    maps = np.asarray(
        render_condition_maps(res, jnp.asarray(flame), cfg, max_tris_per_tile=256)
    )

    out = os.path.join(HERE, "golden.npz")
    np.savez_compressed(
        out, generator_forward=gen_out, flame_verts=verts, condition_maps=maps
    )
    print(f"wrote {out}")
    for k, v in dict(
        generator_forward=gen_out, flame_verts=verts, condition_maps=maps
    ).items():
        print(f"  {k}: {v.shape} {v.dtype} mean={v.mean():.6f} std={v.std():.6f}")


if __name__ == "__main__":
    main()
