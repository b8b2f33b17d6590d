"""GAN losses and regularizers.

Parity with reference loss_functions/losses.py and train.py:

- non-saturating softplus GAN loss (train.py:144, :172, :203);
- R1 gradient penalty, weight 5.0, on the real images only
  (train.py:145-149, losses.py:87-99);
- path-length regularization (losses.py:102-124).  NOTE two reference bugs
  fixed and documented: (a) the reference feeds a 159-dim style into a
  512-dim mapping net (dead code path — would crash); we draw a proper
  512-dim z.  (b) its EMA update at losses.py:119 algebraically reduces to
  ``mean = decay * len``; we use a true EMA.
- texture-space interpolation loss (losses.py:127-236) with rendering and
  texture stealing fused into the same XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gif_tpu.models.texture_space import flame_texture_space
from gif_tpu.render.renderer import render_tex_and_normal
from gif_tpu import constants as cnst


def d_ns_loss(real_scores: jnp.ndarray, fake_scores: jnp.ndarray) -> jnp.ndarray:
    """softplus(-real).mean() + softplus(fake).mean()."""
    return jax.nn.softplus(-real_scores).mean() + jax.nn.softplus(fake_scores).mean()


def g_ns_loss(fake_scores: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softplus(-fake_scores).mean()


def r1_penalty(d_apply, d_params, real_image, condition, weight: float = 5.0):
    """R1: weight * ||d D(x)/d x||^2 per sample, meaned.

    ``d_apply(params, image, condition) -> (B, 1)``.  Differentiable a second
    time (the caller backprops this through ``d_params``)."""

    def score_sum(img):
        return d_apply(d_params, img, condition).sum()

    g = jax.grad(score_sum)(real_image)
    per_sample = jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1)
    return weight * per_sample.mean()


def path_length_penalty(
    g_apply_z, z, pl_mean, decay: float = 0.01, rng=None, axis_name=None
):
    """StyleGAN2 PPL on the z->image jacobian.

    Args:
      g_apply_z: z -> images (B, H, W, 3); closure over params/cond.
      z: (B, 512) latent (requires grad).
      pl_mean: scalar running mean of path lengths.
      axis_name: mapped mesh axis to average the path length over (pass
        "data" inside the sharded step): ``pl_mean`` lives in the
        replicated train state, so the update must be identical on every
        shard.

    Returns:
      (penalty, new_pl_mean).
    """
    images, vjp = jax.vjp(g_apply_z, z)
    noise = jax.random.normal(rng, images.shape) / jnp.sqrt(
        jnp.prod(jnp.asarray(images.shape, jnp.float32))
    )
    (grads,) = vjp(noise)
    lengths = jnp.mean(jnp.sqrt(jnp.sum(grads**2, axis=1)))
    if axis_name is not None:
        lengths = jax.lax.pmean(lengths, axis_name)
    new_mean = pl_mean + decay * (lengths - pl_mean)
    penalty = (lengths - new_mean) ** 2
    return penalty, new_mean


def wgan_gp_loss(predictions: jnp.ndarray) -> jnp.ndarray:
    """-(p - 0.001 p^2) (reference losses.py:81-84; unused by shipped
    configs but part of the API surface)."""
    return -(predictions - 0.001 * predictions**2)


def derangement_indices(rng, n: int) -> jnp.ndarray:
    """A fixed-point-free permutation of range(n) via a random cyclic shift
    (reference get_unique_shuffle_indices, generic_utils.py:20-30 — used by
    the shuffled-condition negative-sample path, train.py:161-167)."""
    if n < 2:
        # randint(1, 1) has an empty range and the identity is a fixed
        # point — the "shuffled" negative would equal the positive pair,
        # silently training on positives as negatives.
        raise ValueError(
            f"derangement needs n >= 2 (got per-shard batch {n}); raise the "
            "global batch or use fewer mesh devices"
        )
    shift = jax.random.randint(rng, (), 1, n)
    return (jnp.arange(n) + shift) % n


def disentanglement_penalty(d_apply_flm, d_params, image, flame_params):
    """Factor-wise gradient penalty on a multi-decision discriminator
    (reference get_disentanglement_pen, losses.py:37-78).  The reference
    version crashes on the undefined INDICES['CAM'] (SURVEY.md §2.2); this
    is the working form for a discriminator emitting 5 decision columns
    [real, shape-match, exp-match, pose-match, cam-match].

    ``d_apply_flm(params, image, flame) -> (B, 5)``.
    """
    from gif_tpu import constants as c

    sh = c.INDICES["SHAPE"]
    ex = c.INDICES["EXP"]
    po = c.INDICES["POSE"]
    ca = c.INDICES["CAM"]

    def col_grad(col):
        g = jax.grad(
            lambda f: d_apply_flm(d_params, image, f)[:, col].sum()
        )(flame_params)
        return g

    def norm(g, lo=None, hi=None):
        part = g if lo is None else g[:, lo:hi]
        return jnp.linalg.norm(part.reshape(part.shape[0], -1), axis=1)

    d_img = norm(col_grad(0))
    d_shape = norm(col_grad(1), ex[0], 236)  # everything past shape
    g2 = col_grad(2)
    d_exp = norm(
        jnp.concatenate([g2[:, sh[0] : sh[1]], g2[:, po[0] : ca[1]]], axis=1)
    )
    g3 = col_grad(3)
    d_pose = norm(jnp.concatenate([g3[:, sh[0] : sh[1]], g3[:, ex[0] : ex[1]]], axis=1))
    g4 = col_grad(4)
    d_cam = norm(jnp.concatenate([g4[:, sh[0] : sh[1]], g4[:, ex[0] : ex[1]]], axis=1))
    return 0.5 * (d_img + d_shape + d_exp + d_pose + d_cam)


def l2_param_norm(params) -> jnp.ndarray:
    """Sum of parameter L2 norms (reference l2_reg, losses.py:16-20)."""
    return sum(
        jnp.linalg.norm(p.reshape(-1)) for p in jax.tree_util.tree_leaves(params)
    )


def interpolate_flame_batch(flame_labels: jnp.ndarray, rng) -> jnp.ndarray:
    """Interpolate consecutive FLAME label rows with one shared uniform t,
    keeping tex/light fixed (train.py:224-227)."""
    t = jax.random.uniform(rng)
    head = flame_labels[:-1, :159] + t * (
        flame_labels[1:, :159] - flame_labels[:-1, :159]
    )
    return jnp.concatenate([head, flame_labels[:-1, 159:]], axis=-1)


def interp_render_flame(flame_batch: jnp.ndarray) -> jnp.ndarray:
    """Substitute row 0's tex/light into every row — the interpolation loss
    renders all interpolants under ONE shared texture + lighting code
    (losses.py:180-189)."""
    n = flame_batch.shape[0]
    ti, tj = cnst.DECA_IDX["tex"]
    li, lj = cnst.DECA_IDX["lit"]
    out = flame_batch
    out = out.at[:, ti:tj].set(jnp.tile(flame_batch[0:1, ti:tj], (n, 1)))
    out = out.at[:, li:lj].set(jnp.tile(flame_batch[0:1, li:lj], (n, 1)))
    return out


def interp_condition_channels(
    textured: jnp.ndarray,
    normal: jnp.ndarray,
    *,
    rendered_flame_as_condition: bool,
    normal_maps_as_cond: bool,
) -> jnp.ndarray:
    """Raw render maps -> generator conditioning for the interp branch.
    NB: unlike the real-data conditioning there is NO 8-bit floor
    quantization here — the reference feeds the live render straight in
    (losses.py:190-196)."""
    rend = jnp.clip(textured, 0.0, 1.0) * 2.0 - 1.0
    norm = jnp.clip(normal, 0.0, 1.0) * 2.0 - 1.0
    if rendered_flame_as_condition and normal_maps_as_cond:
        return jnp.concatenate([rend, norm], axis=-1)
    if rendered_flame_as_condition:
        return rend
    return norm


def interp_penalty_from_images(
    res,
    images: jnp.ndarray,
    flame_batch: jnp.ndarray,
    rng_pairs,
    face_region_mask: jnp.ndarray | None = None,
):
    """Pairwise texture-consistency penalty given the generated interpolant
    images: steal textures back and penalize masked pairwise differences.
    Split from :func:`texture_interpolation_loss` so the fused train step
    can batch the generator forward with the main one."""
    n = flame_batch.shape[0]
    textures, vis = flame_texture_space(res, images, flame_batch[:, :159])

    if face_region_mask is None:
        face_region_mask = jnp.ones(textures.shape[1:3], textures.dtype)
    if face_region_mask.shape != textures.shape[1:3]:
        # Reference resizes the mask to the texture resolution on the fly
        # (losses.py:150-153 fast_image_reshape).
        from gif_tpu.utils.image import resize_bilinear

        face_region_mask = resize_bilinear(
            face_region_mask[None, :, :, None],
            textures.shape[1],
            textures.shape[2],
        )[0, :, :, 0]
    mask2d = face_region_mask[None, :, :, None]

    # All (i, j) pairs over n samples; pick n random ones (losses.py:140-176
    # builds pairs over max_num = batch-1 and samples max_num of them).
    import numpy as np

    if n < 2:
        raise ValueError(
            "texture_interpolation_loss needs >= 2 interpolated samples "
            f"(= per-shard batch >= 3), got n={n}; raise the per-device "
            "batch size or disable apply_texture_space_interpolation_loss"
        )
    pairs = np.array([(i, j) for i in range(n) for j in range(i + 1, n)])
    n_pick = min(n, len(pairs))
    sel = jax.random.choice(rng_pairs, len(pairs), (n_pick,), replace=False)
    pi = jnp.asarray(pairs[:, 0])[sel]
    pj = jnp.asarray(pairs[:, 1])[sel]

    vis_f = vis.astype(textures.dtype)
    common = vis_f[pi] * vis_f[pj]
    tx_i = textures[pi] * common
    tx_j = textures[pj] * common
    per_pair = jnp.mean(jax.nn.sigmoid((tx_i - tx_j) ** 2) * mask2d, axis=(1, 2, 3))
    return 16.0 * jnp.sum(per_pair) / n_pick


def texture_interpolation_loss(
    res,
    flame_batch: jnp.ndarray,
    generator_apply,
    rng,
    *,
    rendered_flame_as_condition: bool = True,
    normal_maps_as_cond: bool = True,
    max_ids: int = 1,
    face_region_mask: jnp.ndarray | None = None,
    image_size: int = 256,
    max_tris_per_tile: int | None = None,
):
    """Texture must be invariant to FLAME articulation (losses.py:160-236).

    Renders the (already interpolated) DECA-format flame batch with a shared
    light/texture code, generates images for ONE random fixed identity,
    steals their textures, and penalizes pairwise texture differences inside
    the face region under the common visibility mask.

    Composed from :func:`interp_render_flame` / :func:`interp_condition_channels`
    / :func:`interp_penalty_from_images`; the fused train step calls those
    pieces directly so the render and generator forward batch with the main
    ones (one raster + one G program per step instead of two of each).

    Args:
      flame_batch: (N, 236) un-normalized DECA params (N = batch - 1).
      generator_apply: (cond_maps, indices) -> images, closure over params.

    Returns scalar loss.
    """
    n = flame_batch.shape[0]
    fp = interp_render_flame(flame_batch)
    maps = render_tex_and_normal(
        res,
        fp[:, 0:100],
        fp[:, 100:150],
        fp[:, 150:156],
        fp[:, cnst.DECA_IDX["tex"][0] : cnst.DECA_IDX["tex"][1]],
        fp[:, cnst.DECA_IDX["lit"][0] : cnst.DECA_IDX["lit"][1]].reshape(n, 9, 3),
        fp[:, cnst.DECA_IDX["cam"][0] : cnst.DECA_IDX["cam"][1]],
        image_size=image_size,
        max_tris_per_tile=max_tris_per_tile,
    )
    gen_in = interp_condition_channels(
        maps.textured,
        maps.normal,
        rendered_flame_as_condition=rendered_flame_as_condition,
        normal_maps_as_cond=normal_maps_as_cond,
    )

    rng_id, rng_pairs = jax.random.split(rng)
    fixed_identity = jax.random.randint(rng_id, (), 0, max_ids)
    indices = jnp.full((n,), fixed_identity, jnp.int32)
    images = generator_apply(gen_in, indices)
    return interp_penalty_from_images(
        res, images, flame_batch, rng_pairs, face_region_mask
    )
