"""Native batch-loader parity (C++ vs numpy fallback)."""

import numpy as np
import pytest

from gif_tpu.data.native import assemble_batch, native_available


def test_assemble_batch_matches_numpy(rng):
    imgs = rng.integers(0, 256, (20, 16, 16, 3), dtype=np.uint8)
    idx = np.array([3, 7, 0, 19])
    flip = np.array([0, 1, 0, 1], np.uint8)
    got = assemble_batch(imgs, idx, flip)
    ref = imgs[idx].astype(np.float32) / 127.5 - 1.0
    ref[[1, 3]] = ref[[1, 3], :, ::-1]
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_assemble_batch_no_flip(rng):
    imgs = rng.integers(0, 256, (5, 8, 8, 3), dtype=np.uint8)
    idx = np.array([4, 4, 1])
    got = assemble_batch(imgs, idx)
    ref = imgs[idx].astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_rejects_bad_index(rng):
    imgs = rng.integers(0, 256, (5, 8, 8, 3), dtype=np.uint8)
    with pytest.raises(IndexError):
        assemble_batch(imgs, np.array([99]))
