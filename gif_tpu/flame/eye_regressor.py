"""MLP camera regressor: FLAME (shape3+exp3+pose6) -> orthographic camera.

Re-creates the reference ``EyeCenteringByRegression``
(my_utils/eye_centering.py:96-318): a residual MLP (input 12 -> 512 with
batchnorm/ReLU, N skip blocks of 2 layers, -> 3) trained with MSE on
input/output z-scored data against cameras produced by the exact
eye-centering solver; at inference it replaces the slower pinverse solve.
The z-scoring statistics are learned from the data rather than hard-coded
(the reference bakes dataset-specific constants at :124-133).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from gif_tpu import constants as cnst
from gif_tpu.flame.decoder import flame_decode
from gif_tpu.flame.camera import solve_eye_camera

# Feature columns: first 3 shape, first 3 expression, full 6 pose
# (reference eye_centering.py:11-13).
FEATURE_IDX = [0, 1, 2, 100, 101, 102, 150, 151, 152, 153, 154, 155]


class SkipBlock(nn.Module):
    neurons: int
    layers_per_block: int = 2

    @nn.compact
    def __call__(self, x, train: bool):
        h = x
        for i in range(self.layers_per_block):
            h = nn.Dense(self.neurons, name=f"dense{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, name=f"bn{i}")(h)
            h = nn.relu(h)
        return x + h


class CameraRegressor(nn.Module):
    neurons: int = 512
    num_skip_blocks: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.neurons, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn")(x)
        x = nn.relu(x)
        for i in range(self.num_skip_blocks):
            x = SkipBlock(self.neurons, name=f"skip{i}")(x, train)
        return nn.Dense(3, name="head")(x)


@dataclasses.dataclass
class EyeCameraRegressor:
    """Train/infer wrapper with learned z-scoring."""

    variables: dict
    mean_in: np.ndarray
    std_in: np.ndarray
    mean_out: np.ndarray
    std_out: np.ndarray
    model: CameraRegressor = dataclasses.field(default_factory=CameraRegressor)
    val_mse: float = float("nan")  # held-out MSE in camera units (train_regressor)

    def predict(self, feats: jnp.ndarray) -> jnp.ndarray:
        """Camera from raw (B, 12) feature rows (z-scoring applied here)."""
        x = (feats - self.mean_in) / self.std_in
        out = self.model.apply(self.variables, x, train=False)
        return out * self.std_out + self.mean_out

    def get_camera(self, flame_batch: jnp.ndarray) -> jnp.ndarray:
        return self.predict(flame_batch[:, jnp.asarray(FEATURE_IDX)])

    def substitute_camera(self, flame_batch: jnp.ndarray) -> jnp.ndarray:
        cam = self.get_camera(flame_batch)
        return flame_batch.at[:, 156:159].set(cam.astype(flame_batch.dtype))


def generate_training_data(
    res, flame_params: np.ndarray, batch_size: int = 256,
    eye_left: Optional[int] = None, eye_right: Optional[int] = None,
):
    """Targets from the exact solver (the reference trains on the same
    pinverse-produced cameras)."""
    from gif_tpu.constants import DEFAULT_FLAME_CONFIG as cfg

    eye_left = cfg.eye_left_vertex if eye_left is None else eye_left
    eye_right = cfg.eye_right_vertex if eye_right is None else eye_right
    if eye_left >= res.n_vertices or eye_right >= res.n_vertices:
        raise ValueError(
            f"eye vertex ids ({eye_left}, {eye_right}) out of range for a "
            f"{res.n_vertices}-vertex mesh; pass explicit ids"
        )
    xs, ys = [], []
    fn = jax.jit(
        lambda s, e, p: solve_eye_camera(
            flame_decode(res, s, e, p), eye_left, eye_right
        )
    )
    for i in range(0, len(flame_params), batch_size):
        fb = jnp.asarray(flame_params[i : i + batch_size], jnp.float32)
        cam = fn(fb[:, 0:100], fb[:, 100:150], fb[:, 150:156])
        xs.append(np.asarray(fb[:, np.asarray(FEATURE_IDX)]))
        ys.append(np.asarray(cam))
    return np.concatenate(xs), np.concatenate(ys)


def train_regressor(
    res,
    flame_params: np.ndarray,
    epochs: int = 20,
    batch_size: int = 256,
    lr: float = 1e-4,
    seed: int = 0,
    val_frac: float = 0.1,
    verbose: bool = False,
    eye_left: Optional[int] = None,
    eye_right: Optional[int] = None,
) -> EyeCameraRegressor:
    """Fit the regressor on solver targets (reference fit_to_data,
    eye_centering.py:186-318; Adam(1e-4, betas (0, 0.99)))."""
    x, y = generate_training_data(res, flame_params, batch_size, eye_left, eye_right)
    n_val = max(1, int(len(x) * val_frac))
    x_tr, y_tr = x[:-n_val], y[:-n_val]

    mean_in, std_in = x_tr.mean(0), x_tr.std(0) + 1e-6
    mean_out, std_out = y_tr.mean(0), y_tr.std(0) + 1e-6
    xn = (x_tr - mean_in) / std_in
    yn = (y_tr - mean_out) / std_out

    model = CameraRegressor()
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((2, len(FEATURE_IDX))), train=True)
    tx = optax.adam(lr, b1=0.0, b2=0.99)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, xb, yb):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                xb,
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean((out - yb) ** 2), updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    params = variables["params"]
    batch_stats = variables["batch_stats"]
    rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        order = rng.permutation(len(xn))
        losses = []
        for i in range(0, len(xn) - batch_size + 1, batch_size):
            sel = order[i : i + batch_size]
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, jnp.asarray(xn[sel]), jnp.asarray(yn[sel])
            )
            losses.append(float(loss))
        if verbose:
            print(f"epoch {epoch}: mse {np.mean(losses):.5f}")

    # Held-out validation on the carved-off tail (normalized like training),
    # so val_frac actually buys an eval instead of just discarding data.
    x_val, y_val = x[-n_val:], y[-n_val:]
    reg = EyeCameraRegressor(
        variables={"params": params, "batch_stats": batch_stats},
        mean_in=mean_in.astype(np.float32),
        std_in=std_in.astype(np.float32),
        mean_out=mean_out.astype(np.float32),
        std_out=std_out.astype(np.float32),
    )
    val_mse = float(np.mean((np.asarray(reg.predict(x_val)) - y_val) ** 2))
    if verbose:
        print(f"val mse (unnormalized cam units): {val_mse:.6f}")
    reg.val_mse = val_mse
    return reg
