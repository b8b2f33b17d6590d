"""FID computation matching the reference protocol.

Reference: my_utils/compute_fid.py + my_utils/pytorch_fid/fid_score.py —
activations are Inception pool3 (2048-d) on images scaled to [0, 1] and
resized to 299; statistics (mu, sigma) per set; Fréchet distance with the
scipy matrix sqrt on host (the one part that stays CPU, fid_score.py:
142-196).  Real-image stats are cached per resolution as
``ffhq_{res}X{res}_fid_stats.npz`` (compute_fid.py:26-46).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from gif_tpu.eval.inception import InceptionV3FID, preprocess_for_fid


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d^2 = |mu1 - mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))
    (pytorch_fid/fid_score.py:142-196, including the eps-jitter retry and the
    imaginary-component check)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def activation_statistics(acts: np.ndarray):
    """(mu (D,), sigma (D, D)) of a (N, D) activation matrix."""
    mu = np.mean(acts, axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


class FidComputer:
    """FID with cached real-image statistics (reference FidComputer,
    compute_fid.py:20-87).

    Args:
      params: InceptionV3FID flax params (converted pretrained weights for
        real FID numbers; any params give a *consistent relative* metric).
      stats_dir: directory for the per-resolution real-stat cache npz.
    """

    def __init__(
        self,
        params,
        stats_dir: Optional[str] = None,
        batch_size: int = 32,
        fid_variant: bool = True,
    ):
        self.model = InceptionV3FID(fid_variant=fid_variant)
        self.params = params
        self.batch_size = batch_size
        self.stats_dir = stats_dir
        self._apply = jax.jit(
            lambda p, x: self.model.apply({"params": p}, preprocess_for_fid(x))
        )
        # Device-resident variants: over a dispatch tunnel the naive loop
        # (read back generated images, rescale on host, re-upload) moves
        # ~50 MB/batch; these keep images on-device end-to-end so only the
        # (batch, 2048) activations ever cross the wire.
        self._apply_m1p1 = jax.jit(
            lambda p, x: self.model.apply(
                {"params": p},
                preprocess_for_fid(
                    jnp.clip((x.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)
                ),
            )
        )
        # uint8 store chunks upload 4x smaller and scale on device.
        self._apply_u8 = jax.jit(
            lambda p, x: self.model.apply(
                {"params": p}, preprocess_for_fid(x.astype(jnp.float32) / 255.0)
            )
        )

    def activations(self, images01: np.ndarray) -> np.ndarray:
        """Pool3 activations for (N, H, W, 3) images, batched
        (compute_fid.py:48-76 uses batches of 32).

        Accepts float arrays in [0, 1] or uint8 in [0, 255]; uint8 input
        (e.g. a mem-mapped 50k real-image store) is scaled per chunk so the
        full set never materializes in float32."""
        outs = []
        n = len(images01)
        bs = self.batch_size
        for i in range(0, n, bs):
            chunk = np.asarray(images01[i : i + bs])
            is_u8 = chunk.dtype == np.uint8
            if not is_u8:
                chunk = np.asarray(chunk, np.float32)
            pad = 0
            if len(chunk) < bs:  # pad to keep one compiled shape
                pad = bs - len(chunk)
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            apply = self._apply_u8 if is_u8 else self._apply
            act = np.asarray(apply(self.params, jnp.asarray(chunk)))
            outs.append(act[: bs - pad])
        return np.concatenate(outs, axis=0)

    def activations_device(self, images_m1p1) -> np.ndarray:
        """Pool3 activations for a DEVICE-resident [-1, 1] image batch:
        rescale + Inception run on-chip, only the (batch, 2048) result is
        read back.  Same numbers as :meth:`activations` on the host copy."""
        return np.asarray(self._apply_m1p1(self.params, images_m1p1))

    def statistics(self, images01: np.ndarray):
        return activation_statistics(self.activations(images01))

    def _real_stats_path(self, res: int) -> Optional[str]:
        if self.stats_dir is None:
            return None
        return os.path.join(self.stats_dir, f"ffhq_{res}X{res}_fid_stats.npz")

    def real_statistics(self, real_images01: Optional[np.ndarray], res: int):
        """Cached real stats, computing and caching them on miss
        (compute_fid.py:26-46)."""
        path = self._real_stats_path(res)
        if path and os.path.exists(path):
            data = np.load(path)
            return data["mu"], data["sigma"]
        if real_images01 is None:
            raise ValueError("no cached real stats and no real images given")
        mu, sigma = self.statistics(real_images01)
        if path:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            np.savez(path, mu=mu, sigma=sigma)
        return mu, sigma

    def get_fid(
        self,
        generated_m1p1: np.ndarray,
        real_images01: Optional[np.ndarray] = None,
    ) -> float:
        """FID of generated images (value range [-1, 1], per the generator
        output — normalized to [0, 1] like compute_fid.py:54-57) against the
        cached/real stats."""
        return self.get_fid_streaming(
            [np.asarray(generated_m1p1)], real_images01=real_images01
        )

    def get_fid_streaming(
        self,
        generated_batches_m1p1,
        real_images01: Optional[np.ndarray] = None,
    ) -> float:
        """FID from an ITERATOR of generated [-1, 1] batches: each batch is
        pushed straight through Inception and only the 2048-d pool3
        activations are retained, so host memory stays O(batch) instead of
        O(N images) (the materializing path held ~7.9 GB for the reference
        10k x 256px protocol).  Numbers are identical to :meth:`get_fid` —
        same preprocessing, same batching inside :meth:`activations`."""
        acts, res = [], None
        for batch in generated_batches_m1p1:
            n_valid = None
            if isinstance(batch, tuple):  # (padded batch, n_valid rows)
                batch, n_valid = batch
            if isinstance(batch, jax.Array):
                # Device-resident fast path: no image readback, no
                # re-upload — only the activations come home.
                act = self.activations_device(batch)
                res = int(batch.shape[1])
            else:
                gen01 = np.clip((np.asarray(batch) + 1.0) / 2.0, 0.0, 1.0)
                res = gen01.shape[1]
                act = self.activations(gen01)
            acts.append(act if n_valid is None else act[:n_valid])
        if not acts:
            raise ValueError("no generated batches")
        mu_g, sig_g = activation_statistics(np.concatenate(acts, axis=0))
        mu_r, sig_r = self.real_statistics(real_images01, res)
        return frechet_distance(mu_r, sig_r, mu_g, sig_g)
