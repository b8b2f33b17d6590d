"""The GIF conditional StyleGAN2 generator.

Architecture parity with the reference (model/stg2_generator.py):

- ``SynthesisNetwork``: ConstantInput(512, core_res) + 9 progression blocks
  (first is a single non-upsampling StyledConv; the rest are up + plain
  StyledConv pairs) with per-block skip-accumulated ToRGB
  (stg2_generator.py:69-209).  Channels (ex_cha_mult=1, cm=2):
  512,512,512,512,512,256*2->512?  — concretely per block out:
  [512, 512, 512, 512, 512, 256, 128, 64, 32] at sizes 4..1024.
- ``StyledGenerator``: frozen random identity-embedding buffer
  (stg2_generator.py:34-46), 8-layer z->w mapping, conditioning maps resized
  to every scale and injected through ConditionInjection at each conv
  (stg2_generator.py:301-314).

The progressive-growing ``step``/``alpha`` machinery is vestigial in the
reference (fixed step 6, alpha 1 for every shipped config — SURVEY.md §2.1);
here ``step`` is a static python int selecting how many blocks run.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gif_tpu.models.layers import StyledConv, ToRGB, MappingNetwork
from gif_tpu.utils.image import resize_bilinear


def synthesis_channels(
    channel_multiplier: int = 2, max_channels: int = 512
) -> list[int]:
    """Per-block output channels (reference stg2_generator.py:86-114).

    ``max_channels`` caps every block (512 = reference parity).  Tiny caps
    exist for fast CPU tests and the driver's virtual-mesh dryrun: XLA:CPU
    executes the per-sample modulated-conv gradients through a naive serial
    path whose cost scales with C_in*C_out, so 512-channel blocks take
    minutes per step on host even at 32px.
    """
    chans = [
        512,
        512,
        512,
        512,
        256 * channel_multiplier,
        128 * channel_multiplier,
        64 * channel_multiplier,
        32 * channel_multiplier,
        16 * channel_multiplier,
    ]
    return [min(c, max_channels) for c in chans]


class SynthesisBlock(nn.Module):
    """StyledConvStyleGAN2: one upsampling + one plain StyledConv, or a
    single plain conv for the first block (stg2_generator.py:48-66)."""

    out_ch: int
    one_conv_block: bool = False
    apply_sqrt2: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latent, cond):
        x = StyledConv(
            self.out_ch,
            3,
            upsample=not self.one_conv_block,
            apply_sqrt2=self.apply_sqrt2,
            dtype=self.dtype,
            name="conv1",
        )(x, latent, cond)
        if not self.one_conv_block:
            x = StyledConv(
                self.out_ch, 3, upsample=False, apply_sqrt2=self.apply_sqrt2,
                dtype=self.dtype, name="conv2"
            )(x, latent, cond)
        return x


class SynthesisNetwork(nn.Module):
    core_tensor_res: int = 4
    channel_multiplier: int = 2
    max_channels: int = 512
    apply_sqrt2: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        latent,
        conds,
        step: int = 6,
        inject_index: Optional[Sequence[int]] = None,
        mixing_range: tuple = (-1, -1),
    ):
        """latent: (B, 512) or a sequence of them (style mixing); conds:
        list of per-scale condition maps (B, 4*2^i, 4*2^i, C) for i in
        0..step.  Returns (B, H, H, 3).

        Style mixing follows reference stg2_generator.py:166-190: with
        ``mixing_range == (-1, -1)`` a crossover walk over ``inject_index``
        switches to the next style once the block index passes each
        injection point; otherwise blocks inside ``[mixing_range[0],
        mixing_range[1]]`` use style 1 and all others style 0.  Both
        controls are static (python ints) — the reference samples
        ``inject_index`` with python ``random`` outside the graph too.
        """
        styles = list(latent) if isinstance(latent, (list, tuple)) else [latent]
        if len(styles) < 2:
            inject_index = [step + 2]  # never crosses (reference :167)
        elif mixing_range == (-1, -1):
            if inject_index is None:
                raise ValueError(
                    "multiple styles need inject_index (static crossover "
                    "block ids) or an explicit mixing_range"
                )
            inject_index = list(inject_index)
            if len(inject_index) != len(styles) - 1:
                raise ValueError(
                    f"{len(styles)} styles need {len(styles) - 1} injection "
                    f"points, got {len(inject_index)}"
                )
        chans = synthesis_channels(self.channel_multiplier, self.max_channels)
        batch = styles[0].shape[0]
        const = self.param(
            "const_input",
            lambda key, shape: jax.random.normal(key, shape),
            (1, self.core_tensor_res, self.core_tensor_res, min(512, self.max_channels)),
        )
        start_step = int(np.log2(self.core_tensor_res)) - 2
        x = jnp.tile(const, (batch, 1, 1, 1))
        skip = None
        crossover = 0
        for i in range(start_step, step + 1):
            # Per-block style selection (reference :176-190).
            if mixing_range == (-1, -1):
                if crossover < len(inject_index) and i > inject_index[crossover]:
                    crossover = min(crossover + 1, len(styles) - 1)
                style_i = styles[crossover]
            else:
                in_range = mixing_range[0] <= i <= mixing_range[1]
                style_i = styles[1 if in_range and len(styles) > 1 else 0]
            x = SynthesisBlock(
                chans[i],
                one_conv_block=(i == start_step),
                apply_sqrt2=self.apply_sqrt2,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, style_i, conds[i])
            skip = ToRGB(
                upsample=(i > start_step), apply_sqrt2=self.apply_sqrt2,
                dtype=self.dtype, name=f"to_rgb{i}"
            )(x, style_i, skip)
        return skip


class StyledGenerator(nn.Module):
    """Top-level generator (reference StyledGenerator, stg2_generator.py:
    212-333).

    Call with either integer ``input_indices`` (identity-embedding lookup)
    or a float ``z`` (direct latent), plus the 6-channel condition map.
    """

    embedding_vocab_size: int = 70000
    n_mlp: int = 8
    core_tensor_res: int = 4
    channel_multiplier: int = 2
    max_channels: int = 512
    w_truncation_factor: float = 1.0
    apply_sqrt2: bool = False
    dtype: jnp.dtype = jnp.float32  # compute dtype of the synthesis stack

    def setup(self):
        self.mapping = MappingNetwork(n_mlp=self.n_mlp, style_dim=512)
        self.synthesis = SynthesisNetwork(
            core_tensor_res=self.core_tensor_res,
            channel_multiplier=self.channel_multiplier,
            max_channels=self.max_channels,
            apply_sqrt2=self.apply_sqrt2,
            dtype=self.dtype,
        )
        # Frozen random identity codes — deliberately a non-trainable buffer
        # (reference ImgEmbedding, stg2_generator.py:34-46).
        self.embedding = self.variable(
            "buffers",
            "embedding",
            lambda: jax.random.normal(
                jax.random.PRNGKey(11), (self.embedding_vocab_size, 512)
            ),
        )

    def get_embeddings(self):
        return self.embedding.value

    def __call__(
        self,
        cond: jnp.ndarray,
        input_indices: Optional[jnp.ndarray] = None,
        z: Optional[jnp.ndarray] = None,
        step: int = 6,
        mean_w: Optional[jnp.ndarray] = None,
        inject_index: Optional[Sequence[int]] = None,
        mixing_range: tuple = (-1, -1),
    ) -> jnp.ndarray:
        """Generate images.

        Args:
          cond: (B, H, W, C) condition maps (textured ++ normal channels),
            value range [-1, 1].
          input_indices: (B,) int32 identity indices into the frozen
            embedding; mutually exclusive with ``z``.
          z: (B, 512) latent fed straight to the mapping net (the
            reference's float-indices path, stg2_generator.py:272-273), or
            a sequence of latents for style mixing (stg2_generator.py:
            166-190; the reference's multi-style list input).
          step: static; images come out at 4 * 2**step.
          mean_w: (512,) mean latent for w-truncation
            (stg2_generator.py:278-283); required if w_truncation_factor
            deviates from 1.
          inject_index: static crossover block ids for style mixing (one
            per extra style); the reference samples these with python
            ``random`` (stg2_generator.py:169).
          mixing_range: static (lo, hi); blocks in [lo, hi] use style 1,
            the rest style 0 (stg2_generator.py:186-190).

        Returns:
          (B, 4*2**step, 4*2**step, 3) images.
        """
        if z is not None:
            zs = list(z) if isinstance(z, (list, tuple)) else [z]
            ws = [self.mapping(zz) for zz in zs]
        else:
            if input_indices is None:
                input_indices = jnp.zeros((cond.shape[0],), jnp.int32)
            codes = self.embedding.value[input_indices]
            w = self.mapping(codes)
            if abs(self.w_truncation_factor - 1.0) > 0.01:
                if mean_w is None:
                    raise ValueError(
                        "w_truncation_factor set but no mean_w supplied; "
                        "compute it with StyledGenerator.mean_latent()."
                    )
                w = w + (mean_w - w) * (1.0 - self.w_truncation_factor)
            ws = [w]

        conds = [
            resize_bilinear(cond, 4 * 2**i, 4 * 2**i) for i in range(step + 1)
        ]
        return self.synthesis(
            ws if len(ws) > 1 else ws[0],
            conds,
            step=step,
            inject_index=inject_index,
            mixing_range=mixing_range,
        )

    def mean_latent(self) -> jnp.ndarray:
        """Mean w over the whole identity-embedding table
        (stg2_generator.py:279-280)."""
        return jnp.mean(self.mapping(self.embedding.value), axis=0)
