"""Pure-helper tests for the entry-point scripts (the scripts themselves are
exercised end-to-end on TPU; these cover their logic on CPU)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_interchange_params_progressive_copy():
    from role_of_different_parameters import interchange_params_and_make_batch

    rng = np.random.default_rng(0)
    f1 = rng.standard_normal(236).astype(np.float32)
    f2 = rng.standard_normal(236).astype(np.float32)
    rows = interchange_params_and_make_batch(f1, f2)
    assert rows.shape == (6, 236)
    np.testing.assert_array_equal(rows[0], f1)
    np.testing.assert_array_equal(rows[-1], f2)
    # Row 1: shape copied, everything else still f1.
    np.testing.assert_array_equal(rows[1][:100], f2[:100])
    np.testing.assert_array_equal(rows[1][100:], f1[100:])
    # Row 2 adds expression.
    np.testing.assert_array_equal(rows[2][100:150], f2[100:150])
    np.testing.assert_array_equal(rows[2][150:156], f1[150:156])
    # Row 4 adds texture, but camera stays f1's.
    np.testing.assert_array_equal(rows[4][159:209], f2[159:209])
    np.testing.assert_array_equal(rows[4][156:159], f1[156:159])


def test_corrupt_flame_groups():
    from compute_fid_for_models import corrupt_flame

    rng = np.random.default_rng(0)
    base = np.zeros((8, 236), np.float32)
    out = corrupt_flame(base, 1.0, "shape", rng)
    assert (out[:, 0:100] != 0).any()
    assert (out[:, 100:] == 0).all()
    out = corrupt_flame(base, 1.0, "exp_jaw", rng)
    assert (out[:, 100:150] != 0).any() and (out[:, 153:156] != 0).any()
    assert (out[:, 0:100] == 0).all()
    np.testing.assert_array_equal(corrupt_flame(base, 0.0, "pose", rng), base)


def test_keyframe_interpolation():
    from generate_gif import interpolate_keyframes

    keys = np.stack([np.zeros(236), np.ones(236)]).astype(np.float32)
    seq = interpolate_keyframes(keys, steps_per_seg=4)
    assert seq.shape == (5, 236)
    np.testing.assert_allclose(seq[0], 0.0)
    np.testing.assert_allclose(seq[-1], 1.0)
    np.testing.assert_allclose(seq[2], 0.5)


def test_teaser_rows():
    from teaser import build_variation_rows

    base = np.zeros(236, np.float32)
    rows = build_variation_rows(base)
    names = [n for n, _ in rows]
    assert names[0] == "mean"
    assert any("shape" in n for n in names)
    assert any("albedo" in n for n in names)
    assert any("light" in n for n in names)
    # Every row differs from the base except 'mean'.
    for name, v in rows[1:]:
        assert not np.array_equal(v, base), name
