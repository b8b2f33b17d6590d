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


def test_voca_sequence_and_grid_helpers(tmp_path):
    from scripts.voca_animation import load_voca_sequence, assemble_grid_frame

    seq = load_voca_sequence(None, 24, seed=0)
    assert seq.shape == (24, 236)
    assert np.abs(seq[:, 153]).max() > 0  # jaw moves

    # VOCA-format npz round trip (reference :38-49 layout)
    npz = tmp_path / "voca.npz"
    np.savez(
        npz,
        frame_pose_params=np.random.default_rng(0).standard_normal((7, 9)).astype(np.float32),
        frame_exp_params=np.zeros((7, 50), np.float32),
        seq_shape_params=np.arange(100, dtype=np.float32),
    )
    seq2 = load_voca_sequence(str(npz), 0, 0)
    assert seq2.shape == (7, 236)
    assert (seq2[:, 3:100] == 0).all()  # shape components 3+ zeroed
    assert (seq2[0, 0:3] == [0, 1, 2]).all()

    cells = [np.full((8, 8, 3), i, np.uint8) for i in range(10)]
    frame = assemble_grid_frame(cells, n_col=5, pad=2)
    assert frame.shape == (18, 48, 3)
    assert frame[0, 0, 0] == 0 and frame[10, 0, 0] == 5


def test_stitch_grid():
    from scripts.make_image_grid import stitch

    imgs = [np.full((4, 4, 3), i, np.uint8) for i in range(6)]
    out = stitch(imgs, n_row=2, n_col=3)
    assert out.shape == (8, 12, 3)
    assert out[0, 0, 0] == 0 and out[4, 4, 0] == 4


def test_teaser_sweep_sequence():
    from scripts.animate_teaser import build_sweep_sequence

    base = np.zeros(236, np.float32)
    seq = build_sweep_sequence(base, sigma=2.0, steps=8)
    assert seq.shape == (7 * 8, 236)
    assert np.abs(seq[:8, 0]).max() > 1.9  # first segment sweeps shape[0]
    assert seq[32:40, 153].max() > 0.25  # jaw segment opens the jaw


def test_mturk_csv_and_scoring(tmp_path):
    from scripts.mturk_results import (
        comparison_rows,
        score_comparison,
        likert_modal_scores,
        LIKERT,
    )

    rng = np.random.default_rng(2)
    rows, swapped = comparison_rows(["a.png", "b.png", "c.png"], "u/", rng)
    assert len(rows) == 3 and set(rows[0]) == {"GT", "OPTION1", "OPTION2"}
    for r, sw in zip(rows, swapped):
        assert ("model_a" in r["OPTION2"]) == sw

    # perfect rater: always picks the model_a side
    results = [
        {"OPTION1": r["OPTION1"], "answer1": "1" if "model_a" in r["OPTION1"] else "0"}
        for r in rows
    ]
    assert score_comparison(results) == 1.0

    lik = [
        {"image_url": "u/3_x.png", "label": LIKERT[4]},
        {"image_url": "u/3_y.png", "label": LIKERT[4]},
        {"image_url": "u/5_x.png", "label": LIKERT[0]},
    ]
    assert likert_modal_scores(lik) == {"3": 5, "5": 1}


def test_landmark_projection_and_overlay():
    from scripts.landmark_overlay import project_landmarks, draw_points
    from gif_tpu.flame.resources import synthetic_flame_resources
    from gif_tpu.flame.camera import position_to_given_location
    import jax.numpy as jnp

    res = synthetic_flame_resources(seed=1, n_vertices=503)
    rng = np.random.default_rng(0)
    flame = np.zeros((2, 236), np.float32)
    flame[:, :100] = rng.standard_normal((2, 100)) * 0.1
    flame = np.asarray(position_to_given_location(res, jnp.asarray(flame)))
    pts = project_landmarks(res, flame, 64)
    assert pts.shape == (2, 68, 2)
    # Eye-centred cameras put landmarks on screen.
    on = ((pts >= 0) & (pts < 64)).all(-1).mean()
    assert on > 0.5

    img = np.zeros((64, 64, 3), np.uint8)
    out = draw_points(img, pts[0])
    assert (out[..., 1] == 255).any() and (img == 0).all()


def test_landmark_reinference_error_known_offset():
    """The re-inference pixel-error metric (scripts/landmark_overlay.py
    --reinferred path) against an analytically known case: shifting the
    orthographic camera x-translation by d moves every projected landmark
    by exactly scale*d*(size/2) pixels, so the mean error equals that
    value (VERDICT r2 #9 stored-value check)."""
    from scripts.landmark_overlay import project_landmarks
    from gif_tpu.flame.resources import synthetic_flame_resources
    from gif_tpu import constants as cnst

    res = synthetic_flame_resources(seed=1, n_vertices=503)
    rng = np.random.default_rng(0)
    flame = np.zeros((3, 236), np.float32)
    flame[:, :100] = rng.standard_normal((3, 100)).astype(np.float32) * 0.1
    cam0 = cnst.DECA_IDX["cam"][0]
    flame[:, cam0] = 8.0  # scale
    size = 64
    delta = 0.01

    other = flame.copy()
    other[:, cam0 + 1] += delta  # x translation

    pts = project_landmarks(res, flame, size)
    pts_other = project_landmarks(res, other, size)
    err = np.linalg.norm(pts - pts_other, axis=-1).mean()
    expected = 8.0 * delta * (size / 2)
    np.testing.assert_allclose(err, expected, rtol=1e-3)
