"""TPU-first StyleGAN2 op zoo.

Functional (no module state) NHWC ops mirroring the semantics of the
reference layer zoo (reference model/stylegan2_common_layers.py), re-designed
for the TPU MXU/VPU rather than translated from torch:

- ``upfirdn2d`` is one ``lax.conv_general_dilated`` (depthwise, separable
  fast-path) instead of zero-stuff/pad/conv/slice chains.
- ``modulated_conv2d`` uses the input-scale/output-scale identity so the conv
  stays a single large batched MXU matmul instead of torch's
  batch-as-groups grouped conv (reference stylegan2_common_layers.py:307-349).
- ``fused_leaky_relu`` has a Pallas kernel with a custom VJP.
"""

from gif_tpu.ops.upfirdn import (
    upfirdn2d,
    make_resample_kernel,
    upsample_2x,
    downsample_2x,
    blur,
)
from gif_tpu.ops.linear import equal_linear, pixel_norm, EqualLinearParams
from gif_tpu.ops.conv import (
    equal_conv2d,
    even_extended_pad,
    modulated_conv2d,
    resample_mode,
)
from gif_tpu.ops.activations import fused_leaky_relu, scaled_leaky_relu
from gif_tpu.ops.stddev import minibatch_stddev

__all__ = [
    "upfirdn2d",
    "make_resample_kernel",
    "upsample_2x",
    "downsample_2x",
    "blur",
    "equal_linear",
    "pixel_norm",
    "EqualLinearParams",
    "equal_conv2d",
    "modulated_conv2d",
    "fused_leaky_relu",
    "scaled_leaky_relu",
    "minibatch_stddev",
]
