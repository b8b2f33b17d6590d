"""Auxiliary subsystem tests: graph dump, eye-camera regressor, viz,
FID-plot tooling, profiling timer."""

import os
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from gif_tpu.flame.resources import synthetic_flame_resources

RES = synthetic_flame_resources(seed=1, n_vertices=503)


def test_graph_draw_and_param_summary(tmp_path):
    from gif_tpu.models import Discriminator
    from gif_tpu.utils.graph import draw, param_summary

    disc = Discriminator(size=32)
    out = draw(
        disc,
        str(tmp_path / "disc.txt"),
        jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 32, 32, 6)),
    )
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "disc.html"))
    text = open(out).read()
    assert "Discriminator" in text

    vars_ = disc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 6))
    )
    counts = param_summary(vars_["params"])
    assert counts["TOTAL"] > 0
    assert any(k != "TOTAL" for k in counts)


@pytest.mark.slow
def test_eye_regressor_learns_solver():
    """With symmetric eye vertices (real-FLAME-like geometry) the regressor
    must beat the predict-the-mean baseline on held-out samples."""
    import dataclasses

    from gif_tpu.flame.eye_regressor import train_regressor, generate_training_data

    # Symmetric "eyes" make the least-squares camera well-conditioned (the
    # 503-vertex synthetic mesh's arbitrary vertices produce heavy-tailed
    # cameras that need far more training to fit).
    vt = RES.v_template.copy()
    e1, e2 = 100, 200
    vt[e1] = [-0.03, 0.03, 0.08]
    vt[e2] = [0.03, 0.03, 0.08]
    res = dataclasses.replace(RES, v_template=vt)

    rng = np.random.default_rng(0)
    n = 512
    flame = np.zeros((n, 236), np.float32)
    flame[:, :3] = rng.standard_normal((n, 3)) * 0.3
    flame[:, 100:103] = rng.standard_normal((n, 3)) * 0.2

    reg = train_regressor(
        res, flame, epochs=40, batch_size=128, lr=1e-3, eye_left=e1, eye_right=e2
    )
    _, y = generate_training_data(res, flame[-64:], eye_left=e1, eye_right=e2)
    pred = np.asarray(reg.get_camera(jnp.asarray(flame[-64:])))
    mse = np.mean(((pred - y) / y.std(0)) ** 2)
    base = np.mean(((y - y.mean(0)) / y.std(0)) ** 2)
    assert mse < base * 0.5, (mse, base)

    out = reg.substitute_camera(jnp.asarray(flame[:4]))
    assert out.shape == (4, 236)
    assert not np.allclose(np.asarray(out[:, 156:159]), 0)


def test_eye_regressor_rejects_bad_ids():
    import pytest
    from gif_tpu.flame.eye_regressor import generate_training_data

    with pytest.raises(ValueError):
        generate_training_data(RES, np.zeros((4, 236), np.float32))


def test_viz_grid_and_filename(tmp_path):
    from gif_tpu.utils.viz import VisualizationSaver, make_grid, to_uint8

    imgs = np.random.default_rng(0).uniform(-1, 1, (6, 8, 8, 3)).astype(np.float32)
    grid = make_grid(to_uint8(imgs), 2, 3)
    assert grid.shape == (2 * 10 - 2, 3 * 10 - 2, 3)

    saver = VisualizationSaver(str(tmp_path), run_id=7, gen_i=2, gen_j=3)
    saver.set_flame_params(np.zeros((6, 236)), np.zeros(6, np.int32))
    path = saver.save_samples(
        499, lambda f, i: imgs, resolution=8, fid=12.345
    )
    assert os.path.basename(path) == "000500_res8_fid_12.35.png"


def test_plot_fid_parses_both_sources(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from plot_fid import fid_from_sample_names, fid_from_metrics_csv

    d = tmp_path / "sample" / "0"
    d.mkdir(parents=True)
    (d / "000500_res256_fid_30.10.png").touch()
    (d / "001000_res256_fid_21.55.png").touch()
    pts = fid_from_sample_names(str(d))
    assert pts == [(500, 30.10), (1000, 21.55)]

    csv_path = tmp_path / "metrics.csv"
    csv_path.write_text("step,fid\n500,30.1\n1000,21.55\n1500,nan\n")
    pts2 = fid_from_metrics_csv(str(csv_path))
    assert pts2 == [(500, 30.1), (1000, 21.55)]


def test_step_timer():
    from gif_tpu.utils.profiling import StepTimer

    @jax.jit
    def fn(x, i):
        return x + 1.0

    dt = StepTimer().time(fn, jnp.zeros((8, 8)), iters=3)
    assert dt >= 0


def test_choose_data_mesh_size():
    """Mesh-geometry policy (train.py CLI): single-process shrinks to a
    dividing device count with the per-shard minimum; multihost must span
    ALL global devices or raise (a prefix mesh orphans remote processes'
    devices; one device = independent diverging copies)."""
    import pytest
    from gif_tpu.parallel.mesh import choose_data_mesh_size

    # Single process: largest divisor of the batch within the device count.
    assert choose_data_mesh_size(16, 8) == 8
    assert choose_data_mesh_size(16, 5) == 4      # 5 doesn't divide 16
    assert choose_data_mesh_size(16, 8, min_per_shard=3) == 4  # >=3/shard
    assert choose_data_mesh_size(3, 8, min_per_shard=3) == 1
    assert choose_data_mesh_size(16, 1) == 1

    # Multihost: all devices or a loud error.
    assert choose_data_mesh_size(16, 8, n_proc=2) == 8
    assert choose_data_mesh_size(24, 8, n_proc=2, min_per_shard=3) == 8
    with pytest.raises(ValueError):
        choose_data_mesh_size(16, 5, n_proc=2)     # not divisible
    with pytest.raises(ValueError):
        choose_data_mesh_size(16, 8, n_proc=2, min_per_shard=3)  # 2/shard


def test_raster_sensitivity_artifact_within_tolerance():
    """The committed renderer-numerics experiment (VERDICT r3 #5) must show
    backend-induced training divergence at or below seed-level noise.
    Regenerate with scripts/raster_sensitivity.py on hardware; this pins
    the tolerance on the committed artifact."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "docs", "experiments",
        "raster_sensitivity_r04.json",
    )
    with open(path) as f:
        res = json.load(f)
    assert res["rows"] >= 30
    # Tolerance: backend swap must perturb trajectories no more than 1.5x
    # what a seed change does (measured 0.44x).
    assert res["ratio"] <= 1.5
    for arm in res["arms"].values():
        assert arm["d_last10_mean"] < 1.0 and arm["g_last10_mean"] < 30.0
