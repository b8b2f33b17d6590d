"""InceptionV3 (FID variant) in flax, inference-only.

Architecture per the TF-compatible FID port the reference uses
(my_utils/pytorch_fid/inception.py): torchvision's Inception v3 stem and
mixed blocks, with the FID-specific deviations — average pools that exclude
padding in blocks A/C/E-1 and a max pool in the E-2 pool branch — selected
by ``fid_variant``.  Outputs the 2048-d pool3 feature.

Weights: ``convert_torch_inception`` maps a torch ``state_dict`` (either
torchvision's ``inception_v3`` or the pt_inception-2015-12-05 FID weights)
onto this module's params; nothing is downloaded here.  BatchNorm runs in
inference form (folded running stats), as FID always evaluates in eval mode.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax


def _avg_pool(x, window, stride, pad, count_include_pad=True):
    """NHWC average pool with torch count_include_pad semantics."""
    sums = lax.reduce_window(
        x,
        0.0,
        lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    if count_include_pad:
        return sums / (window * window)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(
        ones,
        0.0,
        lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return sums / counts


def _max_pool(x, window, stride, pad=0):
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: tuple
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(
            self.out_ch,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=False,
            name="conv",
        )(x)
        # Inference batchnorm: scale/shift with folded running stats.
        c = self.out_ch
        gamma = self.param("bn_gamma", nn.initializers.ones, (c,))
        beta = self.param("bn_beta", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * lax.rsqrt(var + 1e-3) * gamma + beta
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool(x, 3, 1, 1, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool(x, 3, 1, 1, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # 'avg' (E_1) or 'max' (E_2, FID variant)
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = _max_pool(x, 3, 1, pad=1)
        else:
            bp = _avg_pool(x, 3, 1, 1, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Pool3 (2048-d) feature extractor.  Input: (B, 299, 299, 3) in [-1, 1]."""

    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        fv = self.fid_variant
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, fid_variant=fv, name="Mixed_5b")(x)
        x = InceptionA(64, fid_variant=fv, name="Mixed_5c")(x)
        x = InceptionA(64, fid_variant=fv, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, fid_variant=fv, name="Mixed_6b")(x)
        x = InceptionC(160, fid_variant=fv, name="Mixed_6c")(x)
        x = InceptionC(160, fid_variant=fv, name="Mixed_6d")(x)
        x = InceptionC(192, fid_variant=fv, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool_mode="avg", fid_variant=fv, name="Mixed_7b")(x)
        x = InceptionE(pool_mode="max" if fv else "avg", fid_variant=fv, name="Mixed_7c")(x)
        # Global average pool -> 2048.
        return jnp.mean(x, axis=(1, 2))


def random_fid_params(seed: int = 0) -> dict:
    """He-initialized random weights for relative-FID mode.

    Flax's default LeCun init loses half the activation variance at every
    ReLU, so across ~90 conv layers the pool3 features collapse to a
    constant (measured std ~4e-6) and the Fréchet distance between ANY two
    image sets is ~0 — useless even as a relative metric.  Re-sampling every
    kernel He-style (std sqrt(2/fan_in), variance-preserving under ReLU)
    keeps the features live: distinct distributions score ~2300x the
    split-half noise floor on a 64-image probe (2026-08-19).

    Construction is host-side numpy over eval_shape'd structure — zero
    device programs.  (An eager ``net.init`` + per-leaf ``jax.random``
    draws costs hundreds of tiny dispatches, each a multi-second remote
    compile on a remote-compile tunnel.)"""
    net = InceptionV3FID(fid_variant=True)
    shapes = jax.eval_shape(
        net.init, jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
    )["params"]
    rng = np.random.default_rng(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    out = []
    for path, leaf in flat:
        name = path[-1].key if hasattr(path[-1], "key") else ""
        if name == "kernel" and len(leaf.shape) >= 2:
            fan_in = int(np.prod(leaf.shape[:-1]))
            arr = rng.standard_normal(leaf.shape).astype(leaf.dtype) * np.sqrt(
                2.0 / fan_in
            )
        elif name in ("bn_gamma", "bn_var"):
            arr = np.ones(leaf.shape, leaf.dtype)
        else:  # conv/dense bias, bn_beta, bn_mean
            arr = np.zeros(leaf.shape, leaf.dtype)
        out.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, out)


def preprocess_for_fid(images01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] NHWC images -> 299x299 in [-1,1] (pytorch_fid/fid_score.py:
    126-139 resize + InceptionV3 input scaling)."""
    x = jax.image.resize(
        images01,
        (images01.shape[0], 299, 299, images01.shape[3]),
        method="linear",
        antialias=False,
    )
    return x * 2.0 - 1.0


# ----------------------------------------------------------------------------
# torch state_dict conversion
# ----------------------------------------------------------------------------


def _convert_basic(sd: dict, torch_prefix: str) -> dict:
    w = np.asarray(sd[f"{torch_prefix}.conv.weight"])
    return {
        "conv": {"kernel": w.transpose(2, 3, 1, 0)},
        "bn_gamma": np.asarray(sd[f"{torch_prefix}.bn.weight"]),
        "bn_beta": np.asarray(sd[f"{torch_prefix}.bn.bias"]),
        "bn_mean": np.asarray(sd[f"{torch_prefix}.bn.running_mean"]),
        "bn_var": np.asarray(sd[f"{torch_prefix}.bn.running_var"]),
    }


_BLOCK_CONVS = {
    "InceptionA": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                   "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "InceptionB": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
    "InceptionC": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                   "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                   "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "InceptionD": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
                   "branch7x7x3_3", "branch7x7x3_4"],
    "InceptionE": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                   "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                   "branch3x3dbl_3b", "branch_pool"],
}

_LAYOUT = [
    ("Conv2d_1a_3x3", None),
    ("Conv2d_2a_3x3", None),
    ("Conv2d_2b_3x3", None),
    ("Conv2d_3b_1x1", None),
    ("Conv2d_4a_3x3", None),
    ("Mixed_5b", "InceptionA"),
    ("Mixed_5c", "InceptionA"),
    ("Mixed_5d", "InceptionA"),
    ("Mixed_6a", "InceptionB"),
    ("Mixed_6b", "InceptionC"),
    ("Mixed_6c", "InceptionC"),
    ("Mixed_6d", "InceptionC"),
    ("Mixed_6e", "InceptionC"),
    ("Mixed_7a", "InceptionD"),
    ("Mixed_7b", "InceptionE"),
    ("Mixed_7c", "InceptionE"),
]


def convert_torch_inception(sd: dict) -> dict:
    """torch Inception-v3 state_dict (torchvision or pt_inception FID port)
    -> flax params for :class:`InceptionV3FID`."""
    params: dict = {}
    for name, block in _LAYOUT:
        if block is None:
            params[name] = _convert_basic(sd, name)
        else:
            params[name] = {
                conv: _convert_basic(sd, f"{name}.{conv}")
                for conv in _BLOCK_CONVS[block]
            }
    return params
