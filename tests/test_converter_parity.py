"""Checkpoint-converter differential tests against the ACTUAL reference code.

The reference torch layer zoo is in-tree and CPU-importable
(/root/reference/model/stylegan2_common_layers.py, stg2_generator.py,
stg2_discriminator.py) once its eval-only conveniences are stubbed (the
graph_writer tracer needs pyvis; stg2_generator imports the absent
photometric_optimization submodule at module level for FlameTextureSpace
only).  We build tiny reference networks with their own random init, push
the state_dicts through gif_tpu.tools.convert_checkpoint, and assert
forward parity — pinning the ``apply_sqrt2_fac_in_eq_lin`` quirk
(stylegan2_common_layers.py:218-222), blur pads, the modulated-conv layout,
the noise-injection condition nets, and the discriminator dense
CHW->HWC permutation exactly.

The reference tree is imported read-only purely as a test oracle.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the default smoke tier
import torch

import jax
import jax.numpy as jnp

from gif_tpu.models import StyledGenerator, Discriminator
from gif_tpu.tools.convert_checkpoint import convert_generator, convert_discriminator
from reference_oracle import import_reference as _import_reference


@pytest.mark.parametrize("apply_sqrt2", [False, True])
def test_generator_converted_forward_parity(apply_sqrt2):
    ref_gen, _ = _import_reference()
    torch.manual_seed(0)
    tg = ref_gen.StyledGenerator(
        n_mlp=8,
        embedding_vocab_size=16,
        rendered_flame_ascondition=True,
        normal_maps_as_cond=True,
        core_tensor_res=4,
        apply_sqrt2_fac_in_eq_lin=apply_sqrt2,
    ).eval()

    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    params, buffers = convert_generator(sd)

    step = 4  # 64px: covers first-block single conv, up+plain pairs, skip RGB
    rng = np.random.default_rng(0)
    cond = rng.uniform(-1, 1, (2, 64, 64, 6)).astype(np.float32)
    idx = np.asarray([3, 11], np.int64)

    with torch.no_grad():
        ref = tg(
            torch.from_numpy(cond.transpose(0, 3, 1, 2)),
            pose=None,
            step=step,
            alpha=1,
            input_indices=torch.from_numpy(idx),
        )[-1].numpy()

    gen = StyledGenerator(
        embedding_vocab_size=16, n_mlp=8, apply_sqrt2=apply_sqrt2
    )
    got = np.asarray(
        gen.apply(
            {"params": params, "buffers": buffers},
            jnp.asarray(cond),
            input_indices=jnp.asarray(idx, jnp.int32),
            step=step,
        )
    ).transpose(0, 3, 1, 2)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.heavy
def test_generator_converted_forward_parity_256px_full_scale():
    """Full 9-block generator at step=6 (256px), full channel widths — the
    complete flagship synthesis stack vs the actual reference torch code."""
    ref_gen, _ = _import_reference()
    torch.manual_seed(2)
    tg = ref_gen.StyledGenerator(
        n_mlp=8,
        embedding_vocab_size=8,
        rendered_flame_ascondition=True,
        normal_maps_as_cond=True,
        core_tensor_res=4,
    ).eval()

    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    params, buffers = convert_generator(sd)

    step = 6  # 256px: every shipped config's max_step (configurations.py:253)
    rng = np.random.default_rng(2)
    cond = rng.uniform(-1, 1, (1, 256, 256, 6)).astype(np.float32)
    idx = np.asarray([5], np.int64)

    with torch.no_grad():
        ref = tg(
            torch.from_numpy(cond.transpose(0, 3, 1, 2)),
            pose=None,
            step=step,
            alpha=1,
            input_indices=torch.from_numpy(idx),
        )[-1].numpy()

    gen = StyledGenerator(embedding_vocab_size=8, n_mlp=8)
    got = np.asarray(
        gen.apply(
            {"params": params, "buffers": buffers},
            jnp.asarray(cond),
            input_indices=jnp.asarray(idx, jnp.int32),
            step=step,
        )
    ).transpose(0, 3, 1, 2)

    assert got.shape == ref.shape == (1, 3, 256, 256)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.heavy
def test_discriminator_converted_forward_parity_256px_full_scale():
    """Full 256px discriminator (9-ch conditional input, every resblock +
    minibatch stddev + the CHW->HWC dense permutation) vs the reference."""
    _, ref_disc = _import_reference()
    torch.manual_seed(3)
    size = 256
    td = ref_disc.Discriminator(size=size, num_color_chnls=9).eval()
    sd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    params = convert_discriminator(sd, size=size)

    rng = np.random.default_rng(3)
    img = rng.uniform(-1, 1, (2, size, size, 3)).astype(np.float32)
    cond = rng.uniform(-1, 1, (2, size, size, 6)).astype(np.float32)

    with torch.no_grad():
        ref = td(
            [torch.from_numpy(img.transpose(0, 3, 1, 2))],
            torch.from_numpy(cond.transpose(0, 3, 1, 2)),
        )
        ref = (ref[0] if isinstance(ref, tuple) else ref).numpy().reshape(-1)

    disc = Discriminator(size=size)
    got = np.asarray(
        disc.apply({"params": params}, jnp.asarray(img), jnp.asarray(cond))
    ).reshape(-1)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_discriminator_converted_forward_parity():
    _, ref_disc = _import_reference()
    torch.manual_seed(1)
    size = 64
    td = ref_disc.Discriminator(size=size, num_color_chnls=9).eval()
    sd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    params = convert_discriminator(sd, size=size)

    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (4, size, size, 3)).astype(np.float32)
    cond = rng.uniform(-1, 1, (4, size, size, 6)).astype(np.float32)

    with torch.no_grad():
        ref = td(
            [torch.from_numpy(img.transpose(0, 3, 1, 2))],
            torch.from_numpy(cond.transpose(0, 3, 1, 2)),
        )
        ref = (ref[0] if isinstance(ref, tuple) else ref).numpy().reshape(-1)

    disc = Discriminator(size=size)
    got = np.asarray(
        disc.apply({"params": params}, jnp.asarray(img), jnp.asarray(cond))
    ).reshape(-1)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
