"""flax.linen wrappers around the functional op zoo.

Parameter shapes/initializers match the reference layer zoo
(model/stylegan2_common_layers.py) so checkpoints convert 1:1; all
activations are NHWC.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from gif_tpu import ops


def _randn(std: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class EqualLinear(nn.Module):
    """Reference EqualLinear (:193-235)."""

    out_dim: int
    bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: bool = False
    scale_weight: float = 1.0
    apply_sqrt2: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param(
            "weight", _randn(self.scale_weight / self.lr_mul), (self.out_dim, in_dim)
        )
        b = (
            self.param(
                "bias", nn.initializers.constant(self.bias_init), (self.out_dim,)
            )
            if self.bias
            else None
        )
        return ops.equal_linear(
            x,
            w,
            b,
            lr_mul=self.lr_mul,
            activation=self.activation,
            apply_sqrt2=self.apply_sqrt2,
        )


class EqualConv2d(nn.Module):
    """Reference EqualConv2d (:155-184); weight stored HWIO."""

    out_ch: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param(
            "weight", _randn(), (self.kernel_size, self.kernel_size, in_ch, self.out_ch)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_ch,))
            if self.use_bias
            else None
        )
        return ops.equal_conv2d(x, w, b, stride=self.stride, padding=self.padding)


class ModulatedConv2d(nn.Module):
    """Reference ModulatedConv2d (:250-349) with the TPU formulation
    (see gif_tpu.ops.conv)."""

    out_ch: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_taps: Sequence[int] = (1, 3, 3, 1)
    apply_sqrt2: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latent):
        in_ch = x.shape[-1]
        w = self.param(
            "weight", _randn(), (self.kernel_size, self.kernel_size, in_ch, self.out_ch)
        )
        # Modulation styles and demodulation stay f32; the conv itself runs
        # in ``dtype`` (bf16 on TPU hits the MXU at full rate).
        style = EqualLinear(
            in_ch, bias_init=1.0, apply_sqrt2=self.apply_sqrt2, name="modulation"
        )(latent)
        return ops.modulated_conv2d(
            x.astype(self.dtype),
            w,
            style,
            demodulate=self.demodulate,
            upsample=self.upsample,
            downsample=self.downsample,
            blur_taps=tuple(self.blur_taps),
        )


class ConditionInjection(nn.Module):
    """The GIF condition-as-noise injection net (reference NoiseInjection,
    :388-431): a 3-conv net (c -> 2c -> 4c -> out, 3x3, ReLU) over the
    resized condition maps, added to the features.  Tiny init (std 0.01,
    bias 1e-4)."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, cond):
        c = cond.shape[-1]
        cond = cond.astype(self.dtype)
        h = nn.Conv(
            2 * c,
            (3, 3),
            padding=1,
            kernel_init=_randn(0.01),
            bias_init=nn.initializers.constant(1e-4),
            dtype=self.dtype,
            name="conv0",
        )(cond)
        h = nn.relu(h)
        h = nn.Conv(
            4 * c,
            (3, 3),
            padding=1,
            kernel_init=_randn(0.01),
            bias_init=nn.initializers.constant(1e-4),
            dtype=self.dtype,
            name="conv1",
        )(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.out_ch,
            (3, 3),
            padding=1,
            kernel_init=_randn(0.01),
            bias_init=nn.initializers.constant(1e-4),
            dtype=self.dtype,
            name="conv2",
        )(h)
        return features + h.astype(features.dtype)


class StyledConv(nn.Module):
    """ModulatedConv2d -> ConditionInjection -> fused bias+lrelu
    (reference StyledConv, :447-486)."""

    out_ch: int
    kernel_size: int = 3
    upsample: bool = False
    demodulate: bool = True
    apply_sqrt2: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latent, cond):
        x = ModulatedConv2d(
            self.out_ch,
            self.kernel_size,
            demodulate=self.demodulate,
            upsample=self.upsample,
            apply_sqrt2=self.apply_sqrt2,
            dtype=self.dtype,
            name="conv",
        )(x, latent)
        x = ConditionInjection(self.out_ch, dtype=self.dtype, name="noise")(x, cond)
        bias = self.param("act_bias", nn.initializers.zeros, (self.out_ch,))
        x = ops.fused_leaky_relu(x, bias)
        if x.dtype != jnp.float32:
            # StyleGAN2-ADA-style clamp keeps low-precision activations sane.
            x = jnp.clip(x, -256.0, 256.0)
        return x


class ToRGB(nn.Module):
    """1x1 demod-free modulated conv + bias + upsampled skip accumulation
    (reference ToRGB, :489-511)."""

    upsample: bool = True
    apply_sqrt2: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latent, skip=None):
        out = ModulatedConv2d(
            3, 1, demodulate=False, apply_sqrt2=self.apply_sqrt2, dtype=self.dtype,
            name="conv"
        )(x, latent)
        bias = self.param("bias", nn.initializers.zeros, (3,))
        # RGB skip accumulation stays f32 for quality.
        out = out.astype(jnp.float32) + bias
        if skip is not None:
            skip = ops.upsample_2x(skip)
            out = out + skip
        return out


class ConvLayer(nn.Module):
    """[Blur] + EqualConv2d + activation (reference ConvLayer, :752-799)."""

    out_ch: int
    kernel_size: int
    downsample: bool = False
    use_bias: bool = True
    activate: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        if self.downsample:
            p = (4 - 2) + (self.kernel_size - 1)
            pad0, pad1 = (p + 1) // 2, p // 2
            # Even-sized blur output when the extra column is provably
            # unread by the VALID stride-2 conv (see ops.conv.resample_mode).
            py0, py1 = ops.even_extended_pad(x.shape[1], pad0, pad1, 4,
                                             self.kernel_size)
            px0, px1 = ops.even_extended_pad(x.shape[2], pad0, pad1, 4,
                                             self.kernel_size)
            x = ops.blur(x, pad=(py0, py1, px0, px1))
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        x = EqualConv2d(
            self.out_ch,
            self.kernel_size,
            stride=stride,
            padding=padding,
            use_bias=self.use_bias and not self.activate,
            name="conv",
        )(x)
        if self.activate:
            if self.use_bias:
                bias = self.param("act_bias", nn.initializers.zeros, (self.out_ch,))
                x = ops.fused_leaky_relu(x, bias)
            else:
                x = ops.scaled_leaky_relu(x)
            if x.dtype != jnp.float32:
                x = jnp.clip(x, -256.0, 256.0)
        return x


class ResBlock(nn.Module):
    """Two ConvLayers + 1x1 skip, /sqrt(2) (reference ResBlock, :802-820)."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ConvLayer(x.shape[-1], 3, dtype=self.dtype, name="conv1")(x)
        out = ConvLayer(self.out_ch, 3, downsample=True, dtype=self.dtype,
                        name="conv2")(out)
        skip = ConvLayer(
            self.out_ch, 1, downsample=True, activate=False, use_bias=False,
            dtype=self.dtype, name="skip"
        )(x)
        return ((out + skip) * (1.0 / jnp.sqrt(2.0))).astype(self.dtype)


class MappingNetwork(nn.Module):
    """PixelNorm + n_mlp EqualLinear(lr_mul, fused-lrelu) z->w mapping
    (reference get_w_frm_z, :514-533)."""

    n_mlp: int = 8
    style_dim: int = 512
    lr_mul: float = 0.01
    scale_weight: float = 1.0

    @nn.compact
    def __call__(self, z):
        if self.n_mlp <= 0:
            return z
        h = ops.pixel_norm(z)
        for i in range(self.n_mlp):
            h = EqualLinear(
                self.style_dim,
                lr_mul=self.lr_mul,
                activation=True,
                scale_weight=self.scale_weight,
                name=f"dense{i}",
            )(h)
        return h
