"""Checkpoint-converter structural tests: a synthetic torch-style state dict
with reference shapes must convert to trees that exactly match the flax
models' init structure (names, shapes)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the default smoke tier

import numpy as np
import jax
import jax.numpy as jnp

from gif_tpu.models import StyledGenerator, Discriminator
from gif_tpu.models.generator import synthesis_channels
from gif_tpu.tools.convert_checkpoint import convert_generator, convert_discriminator


def _fake_generator_sd(step=6, n_mlp=8, vocab=16, cond_ch=6):
    rng = np.random.default_rng(0)
    sd = {}
    sd["generator.const_input.input"] = rng.standard_normal((1, 512, 4, 4)).astype(
        np.float32
    )
    chans = synthesis_channels()
    cin = 512

    def styled_conv(prefix, ci, co, k=3):
        c = cond_ch
        sd[f"{prefix}.conv.weight"] = rng.standard_normal((1, co, ci, k, k)).astype(
            np.float32
        )
        sd[f"{prefix}.conv.modulation.weight"] = rng.standard_normal((ci, 512)).astype(
            np.float32
        )
        sd[f"{prefix}.conv.modulation.bias"] = np.ones(ci, np.float32)
        sd[f"{prefix}.noise.noise_conv.0.weight"] = rng.standard_normal(
            (2 * c, c, 3, 3)
        ).astype(np.float32)
        sd[f"{prefix}.noise.noise_conv.0.bias"] = np.zeros(2 * c, np.float32)
        sd[f"{prefix}.noise.noise_conv.2.weight"] = rng.standard_normal(
            (4 * c, 2 * c, 3, 3)
        ).astype(np.float32)
        sd[f"{prefix}.noise.noise_conv.2.bias"] = np.zeros(4 * c, np.float32)
        sd[f"{prefix}.noise.noise_conv.4.weight"] = rng.standard_normal(
            (co, 4 * c, 3, 3)
        ).astype(np.float32)
        sd[f"{prefix}.noise.noise_conv.4.bias"] = np.zeros(co, np.float32)
        sd[f"{prefix}.activate.bias"] = np.zeros((1, co, 1, 1), np.float32)

    for i in range(step + 1):
        co = chans[i]
        styled_conv(f"generator.progression.{i}.st_cv1", cin, co)
        if i > 0:
            styled_conv(f"generator.progression.{i}.st_cv2", co, co)
        sd[f"generator.to_rgb.{i}.conv.weight"] = rng.standard_normal(
            (1, 3, co, 1, 1)
        ).astype(np.float32)
        sd[f"generator.to_rgb.{i}.conv.modulation.weight"] = rng.standard_normal(
            (co, 512)
        ).astype(np.float32)
        sd[f"generator.to_rgb.{i}.conv.modulation.bias"] = np.ones(co, np.float32)
        sd[f"generator.to_rgb.{i}.bias"] = np.zeros((1, 3, 1, 1), np.float32)
        cin = co

    for i in range(n_mlp):
        sd[f"z_to_w.{i + 1}.weight"] = rng.standard_normal((512, 512)).astype(
            np.float32
        )
        sd[f"z_to_w.{i + 1}.bias"] = np.zeros(512, np.float32)
    sd["image_embedding.embd_weight"] = rng.standard_normal((vocab, 512)).astype(
        np.float32
    )
    return sd


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x).shape, tree)


def test_generator_conversion_structure():
    step = 4
    gen = StyledGenerator(embedding_vocab_size=16)
    cond = jnp.zeros((1, 4 * 2**step, 4 * 2**step, 6))
    ref_vars = gen.init(
        jax.random.PRNGKey(0), cond, input_indices=jnp.zeros((1,), jnp.int32), step=step
    )
    params, buffers = convert_generator(_fake_generator_sd(step=step))
    assert _tree_shapes(params) == _tree_shapes(
        jax.tree_util.tree_map(np.asarray, ref_vars["params"])
    )
    assert buffers["embedding"].shape == (16, 512)
    # Converted params must actually run.
    out = gen.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "buffers": {"embedding": jnp.asarray(buffers["embedding"])}},
        cond,
        input_indices=jnp.zeros((1,), jnp.int32),
        step=step,
    )
    assert out.shape == (1, 4 * 2**step, 4 * 2**step, 3)


def _fake_discriminator_sd(size=64, in_ch=9):
    import math

    rng = np.random.default_rng(1)
    chans = {4: 512, 8: 512, 16: 512, 32: 512, 64: 512, 128: 256, 256: 128}
    sd = {}
    sd["convs.0.0.weight"] = rng.standard_normal((chans[size], in_ch, 1, 1)).astype(
        np.float32
    )
    sd["convs.0.1.bias"] = np.zeros((1, chans[size], 1, 1), np.float32)
    cin = chans[size]
    log_size = int(math.log2(size))
    for j, i in enumerate(range(log_size, 2, -1)):
        cout = chans[2 ** (i - 1)]
        p = f"convs.{j + 1}"
        sd[f"{p}.conv1.0.weight"] = rng.standard_normal((cin, cin, 3, 3)).astype(
            np.float32
        )
        sd[f"{p}.conv1.1.bias"] = np.zeros((1, cin, 1, 1), np.float32)
        sd[f"{p}.conv2.1.weight"] = rng.standard_normal((cout, cin, 3, 3)).astype(
            np.float32
        )
        sd[f"{p}.conv2.2.bias"] = np.zeros((1, cout, 1, 1), np.float32)
        sd[f"{p}.skip.1.weight"] = rng.standard_normal((cout, cin, 1, 1)).astype(
            np.float32
        )
        cin = cout
    sd["final_conv.0.weight"] = rng.standard_normal((512, 513, 3, 3)).astype(np.float32)
    sd["final_conv.1.bias"] = np.zeros((1, 512, 1, 1), np.float32)
    sd["final_linear.0.weight"] = rng.standard_normal((512, 512 * 16)).astype(
        np.float32
    )
    sd["final_linear.0.bias"] = np.zeros(512, np.float32)
    sd["final_linear.1.weight"] = rng.standard_normal((1, 512)).astype(np.float32)
    sd["final_linear.1.bias"] = np.zeros(1, np.float32)
    return sd


def test_discriminator_conversion_structure():
    size = 64
    disc = Discriminator(size=size)
    ref_vars = disc.init(
        jax.random.PRNGKey(0),
        jnp.zeros((4, size, size, 3)),
        jnp.zeros((4, size, size, 6)),
    )
    params = convert_discriminator(_fake_discriminator_sd(size=size), size=size)
    assert _tree_shapes(params) == _tree_shapes(
        jax.tree_util.tree_map(np.asarray, ref_vars["params"])
    )
    out = disc.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.zeros((4, size, size, 3)),
        jnp.zeros((4, size, size, 6)),
    )
    assert out.shape == (4, 1)
