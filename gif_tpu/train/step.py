"""The jitted GAN train step: D update + G update + EMA, one XLA program,
data-parallel over a device mesh via ``shard_map``.

TPU-first re-design of the reference iteration (train.py:80-252):

- the whole iteration — including the on-device FLAME render of the
  conditioning maps and the texture-interpolation loss's render + second
  generator pass — compiles into ONE XLA program (no LMDB precompute, no
  host round-trips);
- data parallelism is explicit ``shard_map`` over a 1-D ``data`` mesh axis
  with ``lax.pmean`` gradient all-reduce over ICI, replacing
  ``nn.DataParallel`` (train.py:344,356,358);
- minibatch-stddev and the interpolation loss operate per shard, matching
  DataParallel's per-replica semantics (SURVEY.md §5.8);
- R1 runs every ``r1_interval`` steps inside ``lax.cond`` (train.py:145-149);
- EMA is a pure pytree op on replicated params (train.py:250).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gif_tpu import constants as cnst
from gif_tpu.train.config import TrainConfig
from gif_tpu.train.state import TrainState, build_models, make_optimizers
from gif_tpu.train import losses as L
from gif_tpu.render.renderer import render_tex_and_normal


def render_flame_maps(res, flame_params: jnp.ndarray, image_size: int,
                      max_tris_per_tile: int | None = None):
    """Raster the 236-d DECA layout (shape/exp/pose/cam/tex/lit slices of
    constants.DECA_IDX) into raw textured + normal maps, one dispatch."""
    b = flame_params.shape[0]
    return render_tex_and_normal(
        res,
        flame_params[:, 0:100],
        flame_params[:, 100:150],
        flame_params[:, 150:156],
        flame_params[:, cnst.DECA_IDX["tex"][0] : cnst.DECA_IDX["tex"][1]],
        flame_params[:, cnst.DECA_IDX["lit"][0] : cnst.DECA_IDX["lit"][1]].reshape(
            b, 9, 3
        ),
        flame_params[:, cnst.DECA_IDX["cam"][0] : cnst.DECA_IDX["cam"][1]],
        image_size=image_size,
        max_tris_per_tile=max_tris_per_tile,
    )


def quantize_condition(textured, normal, cfg: TrainConfig):
    """Raw render maps -> quantized [-1, 1] condition maps.

    The reference's DECA-rendered LMDB precompute round-trips the render
    through an 8-bit PNG (prepare_lmdb/create_deca_rendered_lmdb.py); the
    OverLayViz floor-quantization onto the 8-bit grid reproduces that
    exactly, followed by the dataset's (x - 0.5)/0.5 normalization
    (dataset_loaders.py / torchvision transform).

    When ``render_image_size != max_size`` the maps are bilinearly resized
    to the training resolution before quantization — the reference's
    render-at-512, train-at-256 path (losses.py:215-216,
    create_deca_rendered_lmdb.py render->resize->PNG).
    """
    from gif_tpu.utils.image import resize_bilinear

    if cfg.render_image_size != cfg.max_size:
        textured = resize_bilinear(textured, cfg.max_size, cfg.max_size)
        normal = resize_bilinear(normal, cfg.max_size, cfg.max_size)
    rend = jnp.floor(jnp.clip(textured, 0.0, 1.0) * 255.0) / 255.0
    norm = jnp.floor(jnp.clip(normal, 0.0, 1.0) * 255.0) / 255.0
    parts = []
    if cfg.rendered_flame_as_condition:
        parts.append(rend * 2.0 - 1.0)
    if cfg.normal_maps_as_cond:
        parts.append(norm * 2.0 - 1.0)
    return jnp.concatenate(parts, axis=-1)


def render_condition_maps(
    res,
    flame_params: jnp.ndarray,
    cfg: TrainConfig,
    max_tris_per_tile: int | None = None,
    return_overflow: bool = False,
):
    """FLAME 236-d params -> quantized [-1, 1] condition maps, on device.

    Composition of :func:`render_flame_maps` + :func:`quantize_condition`
    (split so the fused train step can batch this render with the
    interpolation-loss render in one raster dispatch).

    With ``return_overflow`` returns (cond, overflow (B,) bool) — True where
    the rasterizer dropped candidate triangles for a sample (SURVEY "no
    silent caps").
    """
    maps = render_flame_maps(
        res, flame_params, cfg.render_image_size, max_tris_per_tile
    )
    cond = quantize_condition(maps.textured, maps.normal, cfg)
    if return_overflow:
        return cond, maps.overflow
    return cond


def apply_condition_augment(cond, batch):
    """Give rendered condition maps the same pixel transforms the real image
    received, in the reference order: crop FIRST, then flip
    (dataset_loaders.py:314-327 crops its pre-rendered maps before the
    h-flip coin; the asymmetric edge-fill rules do not commute, and
    pipeline.sample_batch applies the same order to the image)."""
    if "crop" in batch:
        from gif_tpu.data.augment import same_padding_crop_jax

        cond = same_padding_crop_jax(cond, batch["crop"])
    if "flip" in batch:
        cond = jnp.where(
            batch["flip"][:, None, None, None], cond[:, :, ::-1, :], cond
        )
    return cond


def make_train_step(
    cfg: TrainConfig,
    res,
    mesh: Optional[Mesh] = None,
    step_res: Optional[int] = None,
    face_region_mask: Optional[np.ndarray] = None,
    max_tris_per_tile: Optional[int] = None,
    donate: bool = False,
    fuse_interp: bool = True,
):
    """Build the jitted train step.

    Returns ``train_step(state, batch, rng) -> (state, metrics)`` where
    ``batch`` is a dict with:
      real_image: (B, S, S, 3) in [-1, 1]
      flame: (B, 236)
      indices: (B,) int32 identity indices
      cond: (B, S, S, C) optional precomputed maps (when not rendering
        in-step).
    With a mesh, arrays in ``batch`` must be sharded along axis 0.

    ``fuse_interp`` batches the texture-interpolation loss's render and
    generator forward with the main ones (one raster dispatch + one G
    program per step instead of two of each); numerically equivalent to the
    unfused formulation (``tests/test_train_step.py::
    test_fused_interp_matches_unfused``) and applied automatically only
    where it is (interp loss on, G trained once every step).
    """
    gen, disc = build_models(cfg)
    g_tx, d_tx = make_optimizers(cfg)
    step_idx = cfg.max_step if step_res is None else step_res
    # max_tris_per_tile=None flows through to the renderer, which owns the
    # mesh-derived auto-sizing (the fixed 512 default silently dropped
    # triangles for dense meshes / big camera scales; overflow shows in
    # the render_overflow metric).
    if face_region_mask is None:
        # Texture-space face-only mask shipped with the FLAME resources
        # (reference losses.py:132-134, constants.py:48).
        face_region_mask = getattr(res, "face_region_mask", None)
    frm = (
        jnp.asarray(face_region_mask, jnp.float32)
        if face_region_mask is not None
        else None
    )

    def d_apply(d_params, image, condition):
        return disc.apply({"params": d_params}, image, condition)

    def g_apply(g_params, buffers, cond, indices):
        return gen.apply(
            {"params": g_params, "buffers": buffers},
            cond,
            input_indices=indices,
            step=step_idx,
        )

    nc = cfg.n_critic
    if nc >= 1:
        g_interval, g_iters = int(round(nc)), 1
    else:
        g_interval, g_iters = 1, int(round(1.0 / nc))
    # Fuse the interpolation-loss render + generator forward into the main
    # ones (VERDICT r4 item 4): ONE raster dispatch over B + (B-1) flame rows
    # and ONE generator program over 2B-1 conditions per step, with the
    # interp-penalty gradient flowing through the same saved VJP as the
    # adversarial gradient.  Values are unchanged: the fused path replays the
    # unfused path's exact RNG key derivation, and the unfused interp G
    # forward was a bitwise recomputation of the shared one anyway (same
    # params — G only updates afterwards).  Requires the G update to run
    # every step with one iteration (run ids 0/3/29 qualify: n_critic=1) and
    # one conditioning resolution: the data conds are resized to ``max_size``
    # before quantization while the interp branch feeds the live render
    # straight in (losses.py:190-196), so a render-512/train-256 config has
    # two spatial sizes and stays on the unfused two-dispatch path (every
    # shipped preset renders at the training size).
    do_fuse = (
        fuse_interp
        and cfg.apply_texture_space_interpolation_loss
        and g_interval == 1
        and g_iters == 1
        and cfg.render_image_size == cfg.max_size
    )

    def _step(state: TrainState, batch, rng):
        if mesh is not None:
            rng = jax.random.fold_in(rng, lax.axis_index("data"))
        rng_d, rng_g, rng_interp, rng_pl = jax.random.split(rng, 4)

        real = batch["real_image"]
        flame = batch["flame"]
        indices = batch["indices"]
        b = real.shape[0]

        if do_fuse:
            if b < 3:
                raise ValueError(
                    "texture-space interpolation loss pairs interpolants "
                    "WITHIN a data shard and needs >=3 samples per shard; "
                    f"got per-shard batch {b} — raise the global batch or "
                    "use fewer mesh devices"
                )
            # Replay the unfused path's key chain: g_update(it=0) splits
            # fold_in(rng_g, 0) -> (rng_pl, rng_interp); g_loss_terms splits
            # rng_interp -> (rng_lerp, rng_tex); texture_interpolation_loss
            # splits rng_tex -> (rng_id, rng_pairs).
            _, rng_int_0 = jax.random.split(jax.random.fold_in(rng_g, 0))
            rng_lerp, rng_tex = jax.random.split(rng_int_0)
            rng_id, rng_pairs = jax.random.split(rng_tex)
            flm_interp = L.interpolate_flame_batch(flame, rng_lerp)
            interp_fp = L.interp_render_flame(flm_interp)
            fixed_identity = jax.random.randint(
                rng_id, (), 0, cfg.embedding_vocab_size
            )
            interp_indices = jnp.full((b - 1,), fixed_identity, jnp.int32)

        if cfg.render_in_step:
            # Augmented batches carry the true fit separately: the label may
            # be crop-zeroed / flip-sentineled (dataset_loaders.py:314-327)
            # but the condition maps render from the real parameters and then
            # receive the SAME pixel transform the image got (the reference
            # transformed its pre-rendered LMDB maps).
            fp_main = batch.get("flame_render", flame)
            if do_fuse:
                maps = render_flame_maps(
                    res,
                    jnp.concatenate([fp_main, interp_fp], axis=0),
                    cfg.render_image_size,
                    max_tris_per_tile,
                )
                cond = quantize_condition(maps.textured[:b], maps.normal[:b], cfg)
                # Overflow metric covers the data batch only, matching the
                # unfused step (the interp render never tracked it).
                render_overflow = maps.overflow[:b]
                interp_gen_in = L.interp_condition_channels(
                    maps.textured[b:],
                    maps.normal[b:],
                    rendered_flame_as_condition=cfg.rendered_flame_as_condition,
                    normal_maps_as_cond=cfg.normal_maps_as_cond,
                )
            else:
                cond, render_overflow = render_condition_maps(
                    res, fp_main, cfg, max_tris_per_tile, return_overflow=True
                )
            cond = apply_condition_augment(cond, batch)
        else:
            cond = batch["cond"]
            render_overflow = jnp.zeros((b,), bool)
            if do_fuse:
                imaps = render_flame_maps(
                    res, interp_fp, cfg.render_image_size, max_tris_per_tile
                )
                interp_gen_in = L.interp_condition_channels(
                    imaps.textured,
                    imaps.normal,
                    rendered_flame_as_condition=cfg.rendered_flame_as_condition,
                    normal_maps_as_cond=cfg.normal_maps_as_cond,
                )

        # ------------------------------------------------------------------
        # D update (train.py:82-178)
        # ------------------------------------------------------------------
        # The fakes D scores here are ALSO the G adversarial forward: G is
        # deterministic and its params don't change until the G update, so
        # value and VJP residuals are kept and reused in the first G
        # iteration below.  (The reference runs the forward twice,
        # train.py:157,203, with identical values; XLA's CSE usually merges
        # the duplicate already — the explicit vjp makes the sharing
        # guaranteed rather than compiler-dependent.)  When G only trains
        # every n-th step the residuals would be carried through the D
        # update for nothing on skipped steps — use a plain detached
        # forward there and let the G branch recompute.
        if do_fuse:
            # One generator program over the data conditions AND the
            # interpolants; rows [b:] exist only for the interp penalty.
            # Per-sample semantics make the concatenation exact: G has no
            # cross-batch coupling (no batch norm; minibatch stddev lives in
            # D only).
            fake_all_live, g_fwd_vjp = jax.vjp(
                lambda p: g_apply(
                    p,
                    state.buffers,
                    jnp.concatenate([cond, interp_gen_in], axis=0),
                    jnp.concatenate([indices, interp_indices], axis=0),
                ),
                state.g_params,
            )
            fake_images_live = fake_all_live[:b]
            fake_images = lax.stop_gradient(fake_images_live)
        elif g_interval == 1:
            fake_all_live = None
            fake_images_live, g_fwd_vjp = jax.vjp(
                lambda p: g_apply(p, state.buffers, cond, indices),
                state.g_params,
            )
            fake_images = lax.stop_gradient(fake_images_live)
        else:
            fake_images_live = g_fwd_vjp = None
            fake_images = lax.stop_gradient(
                g_apply(state.g_params, state.buffers, cond, indices)
            )
        if cfg.shfld_cond_as_neg_smpl:
            # Shuffled conditions as extra negatives (train.py:161-167):
            # the same fakes paired with deranged conditions must score low.
            rng_shuf = jax.random.fold_in(rng_d, 1)
            perm = L.derangement_indices(rng_shuf, cond.shape[0])
            d_fake_images = jnp.concatenate([fake_images, fake_images], axis=0)
            d_fake_cond = jnp.concatenate([cond, cond[perm]], axis=0)
        else:
            d_fake_images = fake_images
            d_fake_cond = cond

        # Instance noise (Sønderby et al. 2017): the SAME iid perturbation
        # distribution on every image D sees — real, fake, and the fakes G
        # is scored on — smears both distributions off their manifolds so
        # D cannot separate them by a measure-zero feature.  Motivated by
        # the synthetic probe, where the real frame EQUALS the condition
        # render on the face region and D (which receives the render as
        # input channels) wins by thresholding |image - render| == 0 —
        # perfect separation until G is pixel-exact, R1-proof because a
        # saturated D has near-zero gradients AT the reals (measured r1
        # ~0.02 at gamma=50; docs/experiments/fid_dynamics_r05.md).  Off
        # by default: the reference recipe has no analogue.
        ins_std = cfg.d_input_noise_std

        def d_in(img, key):
            if not ins_std:
                return img
            return img + jax.random.normal(key, img.shape, img.dtype) * ins_std

        real_d = d_in(real, jax.random.fold_in(rng_d, 2))
        d_fake_images = d_in(d_fake_images, jax.random.fold_in(rng_d, 3))
        do_r1 = (state.step + 1) % cfg.r1_interval == 0

        if cfg.r1_interval == 1:
            # R1 every step (the reference's 17 s/iter configuration,
            # train.py:145 comment): share the D(real) forward between the
            # adversarial loss and the penalty.  Inside a ``lax.cond``
            # branch XLA cannot CSE the duplicated forward with the one
            # outside, so the cond formulation below pays a full extra
            # D(real) forward per step; ``jax.vjp`` keeps one forward whose
            # residuals serve both the input-gradient (R1) and, via the
            # outer ``value_and_grad``, the parameter gradient
            # (second-order, same pattern as ``L.path_length_penalty``).
            def d_loss_fn(d_params):
                real_scores, in_vjp = jax.vjp(
                    lambda img: d_apply(d_params, img, cond), real_d
                )
                fake_scores = d_apply(d_params, d_fake_images, d_fake_cond)
                loss = L.d_ns_loss(real_scores, fake_scores)
                (g_in,) = in_vjp(jnp.ones_like(real_scores))
                per_sample = jnp.sum(
                    g_in.reshape(g_in.shape[0], -1) ** 2, axis=1
                )
                r1 = cfg.r1_weight * per_sample.mean()
                return loss + r1, (loss, r1)
        else:
            def d_loss_fn(d_params):
                real_scores = d_apply(d_params, real_d, cond)
                fake_scores = d_apply(d_params, d_fake_images, d_fake_cond)
                loss = L.d_ns_loss(real_scores, fake_scores)
                r1 = lax.cond(
                    do_r1,
                    lambda: L.r1_penalty(
                        d_apply, d_params, real_d, cond, cfg.r1_weight
                    ),
                    lambda: jnp.asarray(0.0, jnp.float32),
                )
                return loss + r1, (loss, r1)

        (d_total, (d_loss, r1_val)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params)
        if mesh is not None:
            d_grads = lax.pmean(d_grads, "data")
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.d_params, d_updates
        )

        # ------------------------------------------------------------------
        # G update (train.py:180-250); n_critic semantics per train.py:
        # 181-193 — fractional values train G int(1/n) times per D step,
        # integer values > 1 train G only every n-th step.
        # ------------------------------------------------------------------
        def g_adv_loss(fake, key):
            # Instance noise: G is scored through the same noised view of
            # its output that D trains on (fresh draw per evaluation).
            return L.g_ns_loss(d_apply(d_params, d_in(fake, key), cond))

        def g_loss_terms(g_params, pl_mean_in, rng_pl, rng_interp, g_adv):
            """All G-loss terms except the adversarial one (whose forward
            may be reused from the D phase); ``g_adv`` only scales the
            adaptive interpolation loss."""
            loss = jnp.float32(0.0)
            aux = {"g_adv": g_adv}

            pl_mean = pl_mean_in
            if cfg.gen_reg_type.lower() == "path_len_reg":
                # Independent keys for z and the projection noise: PPL's
                # estimator E[|J^T n|] needs n independent of z, and
                # threefry's normal(key, shape) reuses the same counter
                # stream regardless of shape.
                rng_z, rng_noise = jax.random.split(rng_pl)
                z = jax.random.normal(rng_z, (real.shape[0], 512))

                def gen_from_z(zz):
                    return gen.apply(
                        {"params": g_params, "buffers": state.buffers},
                        cond,
                        z=zz,
                        step=step_idx,
                    )

                ppl, pl_mean = L.path_length_penalty(
                    gen_from_z,
                    z,
                    pl_mean_in,
                    rng=rng_noise,
                    # Per-shard z/noise differ; pl_mean is carried in the
                    # REPLICATED train state, so the running mean must be
                    # updated from the cross-shard mean length or each
                    # device silently carries a divergent copy (and the
                    # checkpoint saves an arbitrary shard's).
                    axis_name="data" if mesh is not None else None,
                )
                loss = loss + 2.0 * ppl
                aux["ppl"] = ppl
            elif cfg.gen_reg_type.lower() == "direct_grad_reg":
                def img_pow_sum(c):
                    out = gen.apply(
                        {"params": g_params, "buffers": state.buffers},
                        c,
                        input_indices=indices,
                        step=step_idx,
                    )
                    return jnp.sum(out**2)

                g_c = jax.grad(img_pow_sum)(cond)
                per_sample = jnp.sum(g_c.reshape(g_c.shape[0], -1) ** 2, axis=1)
                loss = loss + 8e-8 * per_sample.mean()

            if cfg.embedding_reg_weight > 0:
                # Reference regularizes the z->w mapping weights
                # (train.py:217-219).
                loss = loss + cfg.embedding_reg_weight * L.l2_param_norm(
                    g_params["mapping"]
                )

            if cfg.apply_texture_space_interpolation_loss and not do_fuse:
                if flame.shape[0] < 3:
                    raise ValueError(
                        "texture-space interpolation loss pairs interpolants "
                        "WITHIN a data shard and needs >=3 samples per shard; "
                        f"got per-shard batch {flame.shape[0]} — raise the "
                        "global batch or use fewer mesh devices"
                    )
                # Independent keys for the interpolation weights and the
                # loss's own draws (identity pick + pair sampling) — one
                # key consumed twice yields correlated streams.
                rng_lerp, rng_tex = jax.random.split(rng_interp)
                flm_interp = L.interpolate_flame_batch(flame, rng_lerp)

                def gen_for_interp(cond_maps, idx):
                    return gen.apply(
                        {"params": g_params, "buffers": state.buffers},
                        cond_maps,
                        input_indices=idx,
                        step=step_idx,
                    )

                interp = L.texture_interpolation_loss(
                    res,
                    flm_interp,
                    gen_for_interp,
                    rng_tex,
                    rendered_flame_as_condition=cfg.rendered_flame_as_condition,
                    normal_maps_as_cond=cfg.normal_maps_as_cond,
                    max_ids=cfg.embedding_vocab_size,
                    face_region_mask=frm,
                    image_size=cfg.render_image_size,
                    max_tris_per_tile=max_tris_per_tile,
                )
                if cfg.adaptive_interp_loss:
                    # Scale by the ACCUMULATED detached G loss so far —
                    # adversarial + regularizer + embedding terms — exactly
                    # the reference's `0.25*fake_gen_loss.detach()/
                    # interp_loss.detach()` where fake_gen_loss has
                    # accumulated every prior term (train.py:235-237; the
                    # interp term is always added last there too).
                    interp = interp * 0.25 * lax.stop_gradient(
                        aux["g_adv"] + loss
                    ) / lax.stop_gradient(interp)
                loss = loss + interp
                aux["interp"] = interp

            aux["pl_mean"] = pl_mean
            return loss, aux

        def g_loss_fn(g_params, pl_mean_in, rng_pl, rng_interp, rng_adv):
            fake = g_apply(g_params, state.buffers, cond, indices)
            g_adv = g_adv_loss(fake, rng_adv)
            rest, aux = g_loss_terms(g_params, pl_mean_in, rng_pl, rng_interp, g_adv)
            return g_adv + rest, aux

        def g_update(g_params, g_opt_state, ema, pl_mean_in, rng_i, reuse_fwd):
            rng_pl_i, rng_int_i, rng_adv_i = jax.random.split(rng_i, 3)
            if do_fuse:
                # g_params == state.g_params here: both image-space losses —
                # adversarial on rows [:b], interp penalty on rows [b:] —
                # chain through the ONE saved forward.
                def image_losses(fake_all):
                    g_adv = g_adv_loss(fake_all[:b], rng_adv_i)
                    interp_raw = L.interp_penalty_from_images(
                        res, fake_all[b:], flm_interp, rng_pairs, frm
                    )
                    return g_adv, interp_raw

                (g_adv, interp_raw), img_vjp = jax.vjp(
                    image_losses, fake_all_live
                )
                (rest, g_aux), rest_grads = jax.value_and_grad(
                    g_loss_terms, has_aux=True
                )(g_params, pl_mean_in, rng_pl_i, rng_int_i, g_adv)
                if cfg.adaptive_interp_loss:
                    # Reference train.py:235-237: scale by the ACCUMULATED
                    # detached G loss (adversarial + every regularizer term
                    # added so far); the interp term is always added last.
                    scale = (
                        0.25
                        * lax.stop_gradient(g_adv + rest)
                        / lax.stop_gradient(interp_raw)
                    )
                else:
                    scale = jnp.float32(1.0)
                interp = interp_raw * scale
                g_aux = dict(g_aux, interp=interp)
                # d(g_adv + scale*interp)/d(images); scale carries no grad.
                (dfake_all,) = img_vjp(
                    (jnp.float32(1.0), lax.stop_gradient(scale))
                )
                (img_grads,) = g_fwd_vjp(dfake_all)
                g_total = g_adv + rest + interp
                g_grads = jax.tree_util.tree_map(jnp.add, img_grads, rest_grads)
            elif reuse_fwd:
                # g_params == state.g_params here: chain the adversarial
                # gradient through the saved D-phase forward.
                g_adv, dfake = jax.value_and_grad(
                    lambda f: g_adv_loss(f, rng_adv_i)
                )(fake_images_live)
                (adv_grads,) = g_fwd_vjp(dfake)
                (rest, g_aux), rest_grads = jax.value_and_grad(
                    g_loss_terms, has_aux=True
                )(g_params, pl_mean_in, rng_pl_i, rng_int_i, g_adv)
                g_total = g_adv + rest
                g_grads = jax.tree_util.tree_map(jnp.add, adv_grads, rest_grads)
            else:
                (g_total, g_aux), g_grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True
                )(g_params, pl_mean_in, rng_pl_i, rng_int_i, rng_adv_i)
            if mesh is not None:
                g_grads = lax.pmean(g_grads, "data")
            g_updates, g_opt_state = g_tx.update(g_grads, g_opt_state, g_params)
            g_params = jax.tree_util.tree_map(lambda p, u: p + u, g_params, g_updates)
            ema = jax.tree_util.tree_map(
                lambda e, p: e * cfg.ema_decay + p * (1.0 - cfg.ema_decay),
                ema,
                g_params,
            )
            return g_params, g_opt_state, ema, g_aux["pl_mean"], g_total, g_aux

        zero_aux = {"g_adv": jnp.float32(0.0), "pl_mean": state.pl_mean}
        if cfg.gen_reg_type.lower() == "path_len_reg":
            zero_aux["ppl"] = jnp.float32(0.0)
        if cfg.apply_texture_space_interpolation_loss:
            zero_aux["interp"] = jnp.float32(0.0)

        carry = (
            state.g_params,
            state.g_opt_state,
            state.g_ema_params,
            state.pl_mean,
        )
        if g_interval == 1:
            g_total = jnp.float32(0.0)
            g_aux = zero_aux
            for it in range(g_iters):
                *carry, g_total, g_aux = g_update(
                    *carry, jax.random.fold_in(rng_g, it), it == 0
                )
                carry = tuple(carry)
        else:
            do_g = (state.step + 1) % g_interval == 0

            def run(c):
                *c2, gt, ga = g_update(*c, rng_g, False)
                return tuple(c2), gt, ga

            def skip(c):
                return c, jnp.float32(0.0), zero_aux

            carry, g_total, g_aux = lax.cond(do_g, run, skip, carry)

        g_params, g_opt_state, ema, pl_mean = carry

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_ema_params=ema,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            pl_mean=pl_mean,
            used_samples=state.used_samples
            + real.shape[0] * (1 if mesh is None else mesh.devices.size),
        )
        metrics = {
            "d_loss": d_loss,
            "g_loss": g_aux["g_adv"],
            "r1": r1_val,
            "g_total": g_total,
            # Fraction of samples whose condition render dropped triangles
            # (tile capacity overflow) — must stay 0 in healthy runs.
            "render_overflow": jnp.mean(render_overflow.astype(jnp.float32)),
        }
        if "interp" in g_aux:
            metrics["interp"] = g_aux["interp"]
        if mesh is not None:
            metrics = lax.pmean(metrics, "data")
        return new_state, metrics

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        # With donate=True the old state buffers are reused (training loops
        # never touch the previous state); keep False when the caller needs
        # the old state after the call (tests, analysis).
        return jax.jit(_step, **donate_kw)

    state_spec = P()
    batch_spec = {
        k: P("data")
        for k in ["real_image", "flame", "indices", "cond", "flame_render", "crop", "flip"]
    }

    def wrapped(state, batch, rng):
        specs = {k: batch_spec[k] for k in batch}
        return shard_map(
            _step,
            mesh=mesh,
            in_specs=(state_spec, specs, P()),
            out_specs=(state_spec, P()),
            check_vma=False,
        )(state, batch, rng)

    return jax.jit(wrapped, **donate_kw)
