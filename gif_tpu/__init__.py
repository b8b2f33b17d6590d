"""gif_tpu — a TPU-native rebuild of GIF (Generative Interpretable Faces).

GIF (3DV 2020, arXiv:2009.00149) is a FLAME-conditioned StyleGAN2 face
generator: FLAME 3D morphable-model parameters are decoded to a mesh,
differentiably rendered into textured + normal-map conditioning images, and
those maps drive a StyleGAN2 generator/discriminator pair trained on FFHQ-256.

This package re-designs the whole pipeline TPU-first:

- ``gif_tpu.ops``     — StyleGAN2 layer zoo (upfirdn2d, modulated conv,
  equalized linear/conv, fused bias+leaky-relu) as XLA-friendly functional ops
  with Pallas kernels on the hot paths.  NHWC layout throughout.
- ``gif_tpu.flame``   — pure-JAX FLAME 2020 decoder (blendshapes + pose
  correctives + LBS), orthographic camera, eye-centering solver.
- ``gif_tpu.render``  — scatter-free, tile-binned barycentric rasterizer
  (the TPU equivalent of the reference CUDA ``standard_rasterize`` kernel),
  spherical-harmonic shading and UV texturing; rendering is a pure function
  that fuses into the training step (no LMDB render precompute).
- ``gif_tpu.models``  — conditional StyleGAN2 generator / discriminator and
  the FLAME texture-space inverse renderer.
- ``gif_tpu.train``   — losses (non-saturating GAN, R1, path length,
  texture-space interpolation), a single jitted train step under
  ``shard_map`` data parallelism, EMA, Orbax checkpointing.
- ``gif_tpu.eval``    — InceptionV3 FID and the sampling entry points.

Reference (behavioral spec only, no code copied): ParthaEth/GIF at
/root/reference — see SURVEY.md at the repo root for the layer map.
"""

__version__ = "0.1.0"
