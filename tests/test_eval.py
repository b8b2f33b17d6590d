"""FID statistics / conversion-unit tests.

Full-network FID-Inception parity (the FID variant, end-to-end against
plain-torch reference blocks) lives in tests/test_inception_parity.py;
this file covers the Frechet-distance math, the single-conv conversion
unit, and the FidComputer pipeline."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the default smoke tier
import jax
import jax.numpy as jnp

from gif_tpu.eval import (
    InceptionV3FID,
    convert_torch_inception,
    FidComputer,
    frechet_distance,
    activation_statistics,
)


def test_frechet_distance_identity():
    rng = np.random.default_rng(0)
    acts = rng.standard_normal((500, 16))
    mu, sigma = activation_statistics(acts)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_mean_shift():
    """For equal covariance, FID == |mu1 - mu2|^2."""
    rng = np.random.default_rng(1)
    sigma = np.eye(8)
    mu1 = rng.standard_normal(8)
    mu2 = mu1 + 0.5
    d = frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(d, np.sum((mu1 - mu2) ** 2), atol=1e-6)


def test_frechet_distance_matches_reference_formula():
    rng = np.random.default_rng(2)
    a1 = rng.standard_normal((300, 12))
    a2 = rng.standard_normal((300, 12)) * 1.3 + 0.2
    mu1, s1 = activation_statistics(a1)
    mu2, s2 = activation_statistics(a2)
    from scipy import linalg

    covmean = linalg.sqrtm(s1 @ s2).real
    expected = (mu1 - mu2) @ (mu1 - mu2) + np.trace(s1 + s2 - 2 * covmean)
    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_basic_conv_conversion_parity():
    """_convert_basic must fold a torch conv+bn(eval) exactly."""
    import torch

    torch.manual_seed(0)
    conv = torch.nn.Conv2d(5, 7, 3, stride=2, bias=False)
    bn = torch.nn.BatchNorm2d(7, eps=0.001)
    bn.running_mean.normal_()
    bn.running_var.uniform_(0.5, 2.0)
    bn.weight.data.normal_()
    bn.bias.data.normal_()
    conv.eval(), bn.eval()

    sd = {
        "blk.conv.weight": conv.weight.detach().numpy(),
        "blk.bn.weight": bn.weight.detach().numpy(),
        "blk.bn.bias": bn.bias.detach().numpy(),
        "blk.bn.running_mean": bn.running_mean.numpy(),
        "blk.bn.running_var": bn.running_var.numpy(),
    }
    from gif_tpu.eval.inception import _convert_basic, BasicConv2d

    params = _convert_basic(sd, "blk")
    x = np.random.default_rng(0).standard_normal((2, 11, 11, 5)).astype(np.float32)
    got = np.asarray(
        BasicConv2d(7, (3, 3), stride=2).apply({"params": params}, jnp.asarray(x))
    )
    with torch.no_grad():
        ref = torch.relu(bn(conv(torch.from_numpy(x.transpose(0, 3, 1, 2))))).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5)


def test_fid_computer_end_to_end_small():
    """Relative-metric sanity with random inception weights: FID(same dist)
    << FID(different dist)."""
    model = InceptionV3FID()
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
    )["params"]
    fc = FidComputer(params, batch_size=8)

    imgs_a = rng.uniform(0, 1, (16, 64, 64, 3)).astype(np.float32)
    imgs_b = rng.uniform(0, 1, (16, 64, 64, 3)).astype(np.float32)
    imgs_c = np.clip(
        rng.uniform(0, 1, (16, 64, 64, 3)) ** 4, 0, 1
    ).astype(np.float32)

    fid_same = fc.get_fid(imgs_b * 2 - 1, real_images01=imgs_a)
    fid_diff = fc.get_fid(imgs_c * 2 - 1, real_images01=imgs_a)
    assert np.isfinite(fid_same) and np.isfinite(fid_diff)
    assert fid_diff > fid_same


def test_random_fid_params_features_are_live():
    """He re-init keeps pool3 features alive (the default LeCun init
    collapses them to a constant: measured std ~4e-6, making FID(any, any)
    ~0 — see random_fid_params)."""
    from gif_tpu.eval.inception import random_fid_params

    model = InceptionV3FID()
    params = random_fid_params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 299, 299, 3)).astype(np.float32))
    pool = np.asarray(model.apply({"params": params}, x))
    assert pool.std(axis=0).mean() > 1e-3, pool.std(axis=0).mean()
    # And the resulting relative metric separates distinct distributions.
    fc = FidComputer(params, batch_size=8)
    a = rng.uniform(0, 1, (16, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (16, 64, 64, 3)).astype(np.float32)
    c = np.clip(rng.uniform(0, 1, (16, 64, 64, 3)) ** 4, 0, 1).astype(np.float32)
    fid_same = fc.get_fid(b * 2 - 1, real_images01=a)
    fid_diff = fc.get_fid(c * 2 - 1, real_images01=a)
    assert fid_diff > 3 * fid_same, (fid_diff, fid_same)


def test_fid_streaming_matches_materialized():
    """get_fid_streaming over batches == get_fid over the concatenation
    (bit-identical activations; only host-memory behavior differs)."""
    model = InceptionV3FID()
    rng = np.random.default_rng(1)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
    )["params"]
    fc = FidComputer(params, batch_size=4)

    real = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    gen = rng.uniform(-1, 1, (10, 32, 32, 3)).astype(np.float32)

    fid_mat = fc.get_fid(gen, real_images01=real)
    fid_stream = fc.get_fid_streaming(
        (gen[i : i + 3] for i in range(0, len(gen), 3)), real_images01=real
    )
    np.testing.assert_allclose(fid_stream, fid_mat, rtol=1e-6)


def test_fid_device_path_matches_host_path():
    """The device-resident (padded batch, n_valid) streaming path — no image
    readback — must agree with the host numpy path to float tolerance."""
    model = InceptionV3FID()
    rng = np.random.default_rng(2)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
    )["params"]
    fc = FidComputer(params, batch_size=4)

    real = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    gen = rng.uniform(-1, 1, (10, 32, 32, 3)).astype(np.float32)

    def device_batches():
        for i in range(0, len(gen), 4):
            chunk = gen[i : i + 4]
            pad = 4 - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, 32, 32, 3), np.float32)])
            yield jnp.asarray(chunk), 4 - pad

    fid_host = fc.get_fid_streaming(
        (gen[i : i + 4] for i in range(0, len(gen), 4)), real_images01=real
    )
    fid_dev = fc.get_fid_streaming(device_batches(), real_images01=real)
    np.testing.assert_allclose(fid_dev, fid_host, rtol=1e-4)


def test_activations_uint8_matches_float():
    """uint8 chunks (4x smaller uploads, on-device scaling) == the f32
    host-scaled path."""
    model = InceptionV3FID()
    rng = np.random.default_rng(3)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
    )["params"]
    fc = FidComputer(params, batch_size=4)
    u8 = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)
    a = fc.activations(u8)
    b = fc.activations(u8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_real_stats_cache(tmp_path):
    model = InceptionV3FID()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]
    fc = FidComputer(params, stats_dir=str(tmp_path), batch_size=8)
    rng = np.random.default_rng(0)
    real = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    mu1, s1 = fc.real_statistics(real, 32)
    assert (tmp_path / "ffhq_32X32_fid_stats.npz").exists()
    mu2, s2 = fc.real_statistics(None, 32)  # from cache
    np.testing.assert_allclose(mu1, mu2)
