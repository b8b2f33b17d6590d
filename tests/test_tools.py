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


def test_manifest_reports_all_problems_at_once():
    from gif_tpu.tools.manifest import ManifestError, check_manifest, require_keys

    data = {"a": np.zeros((3, 4)), "b": np.zeros((2,))}
    with pytest.raises(ManifestError) as ei:
        check_manifest(
            data, {"a": (3, 5), "b": (2,), "c": (1,)}, "test artifact"
        )
    msg = str(ei.value)
    assert "'a'" in msg and "'c'" in msg and "'b'" not in msg
    # Alternatives: any matching shape passes; None entries are free.
    check_manifest(data, {"a": ((9, 9), (None, 4))}, "alt")
    with pytest.raises(ManifestError):
        require_keys(data, ["a", "missing"], "keys artifact")


def test_checkpoint_converter_fails_loudly_on_wrong_model():
    from gif_tpu.tools.convert_checkpoint import convert_generator
    from gif_tpu.tools.manifest import ManifestError

    sd = {"module.image_embedding.embd_weight": np.zeros((16, 256))}  # wrong width
    with pytest.raises(ManifestError) as ei:
        convert_generator(sd)
    # Every anchor problem named in one shot.
    assert "embd_weight" in str(ei.value) and "const_input" in str(ei.value)


def test_warm_start_from_converted_pickle(tmp_path):
    """train --converted_ckpt seeds params/EMA/D/buffers, keeps counters and
    optimizer state fresh, and fails loudly on a shape mismatch."""
    import pickle

    from gif_tpu.train import get_config
    from gif_tpu.train.state import create_train_state, warm_start_from_converted

    cfg = get_config(
        8, embedding_vocab_size=8, max_size=16, init_size=16,
        render_image_size=16, batch_size=4, max_channels=16, nmlp_for_z_to_w=2,
        compute_dtype="float32",
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    bump = lambda t: jax.tree_util.tree_map(lambda x: np.asarray(x) + 1.0, t)
    trees = {
        "g_params": bump(state.g_params),
        "g_ema_params": bump(state.g_ema_params),
        "d_params": bump(state.d_params),
        "buffers": bump(state.buffers),
    }
    path = tmp_path / "conv.pkl"
    with open(path, "wb") as f:
        pickle.dump(trees, f)

    out = warm_start_from_converted(state, str(path))
    g0 = jax.tree_util.tree_leaves(state.g_params)[0]
    g1 = jax.tree_util.tree_leaves(out.g_params)[0]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0) + 1.0)
    assert int(out.step) == 0 and int(out.used_samples) == 0
    # Optimizer state untouched (fresh Adam moments stay zero).
    m0 = jax.tree_util.tree_leaves(out.g_opt_state)[0]
    assert not np.asarray(jax.tree_util.tree_leaves(m0)[0]).any()

    # Loud error naming the offending leaf on shape mismatch.
    trees["buffers"] = {"embedding": np.zeros((3, 7), np.float32)}
    with open(path, "wb") as f:
        pickle.dump(trees, f)
    with pytest.raises(ValueError, match="embedding"):
        warm_start_from_converted(state, str(path))
