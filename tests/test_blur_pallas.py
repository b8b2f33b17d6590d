"""Parity tests for the fused Pallas 4-tap blur kernel.

The kernel (gif_tpu/ops/blur_pallas.py) must match the XLA upfirdn2d
formulation (reference semantics: model/stylegan2_common_layers.py:42-72,
Blur :136-152) exactly — forward AND gradient — for every pad geometry the
GIF models issue.  On CPU the kernel runs in Pallas interpret mode, so these
tests exercise the real kernel logic (slab DMA plan, halo handling, edge
zero-fill) without TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gif_tpu.ops import blur_pallas, upfirdn

TAPS = (1, 3, 3, 1)


def _xla_blur(x, pads, gain):
    kernel = upfirdn._cached_kernel(TAPS, gain)
    return upfirdn.upfirdn2d(x, kernel, up=1, down=1, pad=pads)


def _pallas_blur(x, pads, gain):
    t1 = blur_pallas.taps_1d(TAPS, gain)
    return blur_pallas.blur4_pallas(x, t1, pads)


# Every blur geometry the models issue (see ConvLayer downsample and the
# modulated-conv upsample chain) plus asymmetric/edge cases.
PAD_CASES = [
    ((2, 2, 2, 2), 1.0),  # ConvLayer k=3 downsample pre-blur
    ((1, 1, 1, 1), 4.0),  # modconv upsample post-blur (gain 4)
    ((2, 1, 2, 1), 1.0),  # ConvLayer k=2-ish asymmetric split
    ((0, 3, 3, 0), 1.0),  # fully asymmetric
    ((0, 0, 0, 0), 1.0),  # pure shrink
    ((3, 3, 3, 3), 1.0),  # max pads
]


@pytest.mark.parametrize("pads,gain", PAD_CASES)
def test_forward_matches_upfirdn(pads, gain):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 10, 8)).astype(np.float32)
    got = _pallas_blur(x, pads, gain)
    want = _xla_blur(x, pads, gain)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("pads,gain", PAD_CASES)
def test_gradient_matches_upfirdn(pads, gain):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 10, 9, 4)).astype(np.float32)
    ct = rng.standard_normal(_xla_blur(x, pads, gain).shape).astype(np.float32)

    def loss_pallas(v):
        return jnp.sum(_pallas_blur(v, pads, gain) * ct)

    def loss_xla(v):
        return jnp.sum(_xla_blur(v, pads, gain) * ct)

    gp = jax.grad(loss_pallas)(x)
    gx = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4)


def test_multi_slab_halo(monkeypatch):
    """Force a tiny VMEM budget so the grid splits H into many slabs — the
    top/middle/bottom halo DMA paths must all reproduce the XLA result."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 24, 16, 8)).astype(np.float32)
    for pads in [(2, 2, 2, 2), (1, 1, 1, 1), (0, 3, 0, 3)]:
        want = _xla_blur(x, pads, 1.0)
        # per_row = 16*8*4*4 = 2048 bytes; budget 16 KiB -> hb = 8 (3+ slabs).
        monkeypatch.setattr(blur_pallas, "_VMEM_BUDGET", 16 << 10)
        got = _pallas_blur(x, pads, 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_h_extension_matches(monkeypatch):
    """Force the planner's H zero-extension (prime h_out, so the only
    unextended divisor is the hb=1 fallback): (1, 32, 16, 8) pads (1,1,1,1)
    gives h_out=31 under a 40 KiB budget — the +1 extension makes h_out 32
    with hb=8.  Values must still match XLA exactly (the extra rows blur
    zeros and are sliced off)."""
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 32, 16, 8)).astype(np.float32)
    monkeypatch.setattr(blur_pallas, "_VMEM_BUDGET", 40 << 10)
    plan = blur_pallas._plan(x.shape, (1, 1, 1, 1), 4)
    assert plan is not None and plan[1] > 0, plan  # extension actually used
    got = _pallas_blur(x, (1, 1, 1, 1), 1.0)
    want = _xla_blur(x, (1, 1, 1, 1), 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_single_slab_matches(monkeypatch):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    want = _xla_blur(x, (2, 1, 1, 2), 1.0)
    got = _pallas_blur(x, (2, 1, 1, 2), 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_bf16_matches_xla_bf16():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    got = np.asarray(_pallas_blur(xb, (2, 2, 2, 2), 1.0), np.float32)
    want = np.asarray(_xla_blur(xb, (2, 2, 2, 2), 1.0), np.float32)
    # Both paths round taps and accumulate in bf16; allow one-ulp wiggle.
    np.testing.assert_allclose(got, want, atol=3e-2)


def test_supports_gate():
    big = (2, 64, 64, 64)  # 262144 elements >= 1<<16
    assert not blur_pallas.supports(big, TAPS, 2, 1, (1, 1, 1, 1))
    assert not blur_pallas.supports(big, TAPS, 1, 2, (1, 1, 1, 1))
    assert not blur_pallas.supports(big, (1, 2, 1), 1, 1, (1, 1, 1, 1))
    assert not blur_pallas.supports(big, TAPS, 1, 1, (4, 1, 1, 1))
    assert not blur_pallas.supports((1, 8, 8, 4), TAPS, 1, 1, (1, 1, 1, 1))
    if jax.default_backend() == "tpu":
        assert blur_pallas.supports(big, TAPS, 1, 1, (2, 2, 2, 2))


# Every Pallas-eligible blur geometry the 256px GIF models issue at batch 16
# (generator conv_transpose outputs, pad (1,1) gain 4; discriminator
# ConvLayer pre-blurs, pads (2,2) for k=3 / (1,1) for the k=1 skip).  The
# supports() gate requires BOTH the forward plan and the VJP plan (transposed
# pads over the output shape) to be coverable so gradients never hit the
# impl's ValueError — pin that here, off-device.
MODEL_GEOMETRIES = [
    ((16, 17, 17, 512), (1, 1, 1, 1)),
    ((16, 33, 33, 512), (1, 1, 1, 1)),
    ((16, 65, 65, 512), (1, 1, 1, 1)),
    ((16, 129, 129, 256), (1, 1, 1, 1)),
    ((16, 257, 257, 128), (1, 1, 1, 1)),
    ((16, 16, 16, 512), (2, 2, 2, 2)),
    ((16, 32, 32, 512), (2, 2, 2, 2)),
    ((16, 64, 64, 512), (2, 2, 2, 2)),
    ((16, 128, 128, 256), (2, 2, 2, 2)),
    ((16, 256, 256, 128), (2, 2, 2, 2)),
    ((16, 256, 256, 64), (1, 1, 1, 1)),  # k=1 skip-path downsample blur
]


@pytest.mark.parametrize("shape,pads", MODEL_GEOMETRIES)
def test_plan_covers_model_geometries(shape, pads):
    b, h, w, c = shape
    p0y, p1y, p0x, p1x = pads
    out_shape = (b, h + p0y + p1y - 3, w + p0x + p1x - 3, c)
    tpads = tuple(3 - p for p in pads)
    for itemsize in (2, 4):
        assert blur_pallas._plan(shape, pads, itemsize) is not None
        assert blur_pallas._plan(out_shape, tpads, itemsize) is not None


def test_plan_rejects_only_degenerate_outputs(monkeypatch):
    # Host-side full padding removed the old halo bounds, so the only
    # uncoverable geometries left are degenerate outputs (fewer than one
    # output row/column).  Anything else stays coverable even under a
    # starvation budget (hb=1 fallback), keeping supports() honest about
    # when blur() may call the kernel.
    assert blur_pallas._plan((1, 2, 16, 8), (0, 0, 1, 1), 4) is None  # h_out<1
    assert blur_pallas._plan((1, 16, 2, 8), (1, 1, 0, 0), 4) is None  # w_out<1
    shape = (1, 64, 16, 8)
    assert blur_pallas._plan(shape, (3, 3, 3, 3), 4) is not None
    monkeypatch.setattr(blur_pallas, "_VMEM_BUDGET", 4 << 10)
    plan = blur_pallas._plan(shape, (3, 3, 3, 3), 4)
    assert plan is not None and plan[0] >= 1  # starved but still coverable


@pytest.mark.parametrize("pads,gain", [((2, 2, 2, 2), 1.0), ((1, 1, 1, 1), 4.0)])
def test_second_order_gradients_match(pads, gain):
    """The R1 penalty differentiates the norm of an input gradient w.r.t.
    parameters — grad-of-grad THROUGH the blur.  The custom VJP must stay
    differentiable to every order (its bwd recurses through the custom_vjp
    wrapper, not the raw pallas impl, which has no JVP rule)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 10, 9, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4,)), jnp.float32)

    def r1_like(blur_fn):
        def inner(w):
            def d_out(x):
                return jnp.sum(blur_fn(x * w[None, None, None, :], pads, gain) ** 2)

            gx = jax.grad(d_out)(x)
            return jnp.sum(gx**2)

        return jax.grad(inner)(w)

    got = r1_like(_pallas_blur)
    want = r1_like(_xla_blur)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
