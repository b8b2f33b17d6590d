"""Array-backed FFHQ+FLAME dataset and a prefetching batch iterator.

TPU-first re-design of the reference ``FFHQ`` dataset (dataset_loaders.py:
94-397): because condition maps are rendered on-device inside the train step,
the host pipeline only supplies (real image, 236-d FLAME parameter vector,
identity index).  Storage is memory-mapped npy/npz arrays (images uint8
NHWC), converted from the reference's LMDBs by :mod:`gif_tpu.data.
lmdb_import`; a deterministic synthetic dataset stands in when no real data
is present.

Reference behaviors preserved:
- bad DECA fits are skipped by resampling (dataset_loaders.py:243-246);
- optional horizontal flip marks the FLAME label with the -9999 sentinel
  (the fit no longer matches the mirrored image; loud if consumed —
  dataset_loaders.py:322-327);
- optional random same-pad crop zeroes the label and shifts the image
  (dataset_loaders.py:314-320); the true params travel as ``flame_render``
  plus per-row ``flip``/``crop`` keys so the train step can render the
  condition maps from the true fit and apply the SAME pixel transform the
  image received (the reference cropped/flipped its pre-rendered LMDB maps);
- a rolling 10k-parameter accumulator feeds the FID conditioning protocol
  (dataset_loaders.py:200-223), skipping sentinel-marked rows.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional

import numpy as np


class FlameDataset:
    """images: (N, S, S, 3) uint8; flame: (N, 236) float32."""

    def __init__(
        self,
        images: np.ndarray,
        flame_params: np.ndarray,
        bad_images: Optional[np.ndarray] = None,
        horizontal_flip: bool = False,
        random_crop: bool = False,
        crop_max_in_px: int = 10,
    ):
        assert len(images) == len(flame_params)
        self.images = images
        self.flame_params = np.asarray(flame_params, np.float32)
        self.horizontal_flip = horizontal_flip
        self.random_crop = random_crop
        self.crop_max_in_px = crop_max_in_px
        n = len(images)
        good = np.ones(n, bool)
        if bad_images is not None and len(bad_images):
            good[np.asarray(bad_images, np.int64)] = False
        self.good_indices = np.nonzero(good)[0]
        # FID conditioning accumulator (rolling, capacity 10k).
        self._flm_buffer: list[np.ndarray] = []
        self._flm_count = 0

    def __len__(self) -> int:
        return len(self.good_indices)

    @property
    def image_size(self) -> int:
        return self.images.shape[1]

    def sample_batch(self, rng: np.random.Generator, batch_size: int):
        """Uniform batch over good samples -> dict of host arrays.

        Gather + normalize + flip run through the native C++ loader when
        built (gif_tpu.data.native), with a transparent numpy fallback."""
        from gif_tpu.data.native import assemble_batch
        from gif_tpu.data.augment import same_padding_crop, FLIPPED_LABEL_SENTINEL

        idx = rng.choice(self.good_indices, size=batch_size, replace=False)
        flip = (
            (rng.random(batch_size) < 0.5) if self.horizontal_flip else None
        )
        # Reference order (dataset_loaders.py:314-327): crop FIRST, then
        # flip — the asymmetric edge-fill rules do not commute.  The native
        # fused gather+flip is only usable when no crop precedes the flip.
        native_flip = flip if not self.random_crop else None
        imgs = assemble_batch(self.images, idx, native_flip)
        flame = self.flame_params[idx].copy()
        batch = {
            "real_image": imgs,
            "flame": flame,
            "indices": idx.astype(np.int32),
        }
        if self.random_crop or flip is not None:
            # The true fit still renders the condition maps; the step applies
            # the same pixel transforms to them that the image received.
            batch["flame_render"] = flame.copy()
        if self.random_crop:
            # dataset_loaders.py:314-320: zero the label, shift image with
            # edge replication.  imgs is normalized float NHWC here.
            crops = rng.integers(
                -self.crop_max_in_px, self.crop_max_in_px, size=(batch_size, 2)
            ).astype(np.int32)
            for b in range(batch_size):
                imgs[b] = same_padding_crop(imgs[b], int(crops[b, 0]), int(crops[b, 1]))
            flame[:] = 0.0
            batch["crop"] = crops
        if flip is not None:
            if native_flip is None:  # crop ran first; flip after, like the reference
                imgs[flip] = imgs[flip, :, ::-1]
            # dataset_loaders.py:322-325 sentinels the label for EVERY
            # sample whenever h-flip augmentation is enabled (zero - 9999
            # happens BEFORE the 50% coin), so downstream FLAME use is
            # loudly wrong rather than plausibly wrong.
            flame[:] = FLIPPED_LABEL_SENTINEL
            batch["flip"] = flip
        return batch

    # --- FID conditioning accumulator (dataset_loaders.py:200-223) ---

    def accumulate_batches_of_flm(self, flame_batch: np.ndarray) -> None:
        flame_batch = np.asarray(flame_batch)
        # Skip flip-sentinel / crop-zeroed rows: they are not valid fits and
        # must not condition the FID protocol.
        valid = (flame_batch[:, 0] > -9000) & (np.abs(flame_batch).sum(1) > 0)
        flame_batch = flame_batch[valid]
        if not len(flame_batch):
            return
        self._flm_buffer.append(flame_batch)
        self._flm_count += len(flame_batch)
        while self._flm_count - len(self._flm_buffer[0]) >= 10_000:
            self._flm_count -= len(self._flm_buffer[0])
            self._flm_buffer.pop(0)

    def get_10k_flame_params(self, rng: Optional[np.random.Generator] = None):
        """(params (<=10k, 236), indices) for the FID protocol."""
        if not self._flm_buffer:
            raise RuntimeError("no FLAME parameters accumulated yet")
        params = np.concatenate(self._flm_buffer, axis=0)[:10_000]
        rng = rng or np.random.default_rng(0)
        indices = rng.integers(0, max(len(self), 1), size=len(params)).astype(np.int32)
        return params, indices


def sample_flame_params(rng: np.random.Generator, n: int) -> np.ndarray:
    """(n, 236) FLAME vectors with GIF-shaped statistics (the DECA-fit
    layout of constants.DECA_IDX: shape/exp/pose/cam/tex/lit)."""
    flame = np.zeros((n, 236), np.float32)
    flame[:, :100] = rng.standard_normal((n, 100)) * 0.5  # shape
    flame[:, 100:150] = rng.standard_normal((n, 50)) * 0.3  # exp
    flame[:, 150:156] = rng.standard_normal((n, 6)) * 0.05  # pose
    flame[:, 156] = 8.0 + rng.standard_normal(n) * 0.3  # cam scale
    flame[:, 157:159] = rng.standard_normal((n, 2)) * 0.02
    flame[:, 159:209] = rng.standard_normal((n, 50)) * 0.5  # tex
    flame[:, 209:212] = 3.0  # constant SH band
    flame[:, 212:236] = rng.standard_normal((n, 24)) * 0.2
    return flame


class SyntheticFlameDataset(FlameDataset):
    """Deterministic random dataset with GIF-shaped statistics for tests and
    benchmarking without the licensed FFHQ/DECA artifacts."""

    def __init__(self, n: int = 256, size: int = 256, seed: int = 0):
        rng = np.random.default_rng(seed)
        images = rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)
        flame = sample_flame_params(rng, n)
        bad = rng.choice(n, size=n // 50, replace=False) if n >= 50 else None
        super().__init__(images, flame, bad_images=bad)


class SyntheticRenderDataset(FlameDataset):
    """Learnable synthetic dataset: each 'real' image is the FLAME render of
    its own parameter vector, composited over a smooth procedural background.
    Every pixel is a deterministic function of the sample's own conditioning
    inputs (flame params -> condition maps; background -> per-sample identity
    embedding), so the target distribution lies inside the deterministic
    conditional generator's reachable set — the property that makes short
    adversarial runs converge instead of diverge (see noise_std below).

    ``SyntheticFlameDataset``'s uniform-noise frames are trivially separable
    from any generator output, so on them the discriminator saturates
    (D -> 0) and the generator's adversarial loss grows without bound —
    fine for benchmarking throughput, useless as evidence that the GAN
    *trains*.  Here the target distribution sits inside the generator's
    reachable set (it is conditioned on the very same render), so short
    smoke/longitudinal runs exhibit genuine adversarial dynamics: D and G
    hover near equilibrium and FID trends downward.

    Rendering happens once at construction, batched on the active JAX
    backend (seconds on TPU; use small ``size`` on CPU), then cached on
    disk keyed by (n, size, seed, noise_std, mesh) — pass ``cache_dir=""``
    to force a rebuild, or a directory to relocate the cache (default
    ``~/.cache/gif_tpu/synth``)."""

    # ``conditionally_exact`` (set in __init__): every frame is a
    # deterministic function of its own conditioning row unless the
    # noise_std A/B knob is on — the training loop uses it to log an exact
    # EMA-reconstruction progress metric.

    def __init__(
        self,
        res,
        n: int = 256,
        size: int = 256,
        seed: int = 0,
        render_batch: int = 16,
        noise_std: float = 0.0,
        cache_dir: str | None = None,
    ):
        import jax
        import jax.numpy as jnp

        from gif_tpu import constants as cnst
        from gif_tpu.render.renderer import render_tex_and_normal

        self.conditionally_exact = not noise_std
        rng = np.random.default_rng(seed)
        flame = sample_flame_params(rng, n)

        # Smooth two-corner gradient background per image (never confusable
        # with the face: the foreground is masked in exactly).
        c0 = rng.uniform(0.1, 0.9, (n, 1, 1, 3)).astype(np.float32)
        c1 = rng.uniform(0.1, 0.9, (n, 1, 1, 3)).astype(np.float32)
        yy = np.linspace(0.0, 1.0, size, dtype=np.float32)[None, :, None, None]
        xx = np.linspace(0.0, 1.0, size, dtype=np.float32)[None, None, :, None]
        bg = c0 + (c1 - c0) * (yy + xx) * 0.5  # (n, S, S, 3) in [0.1, 0.9]

        ti, tj = cnst.DECA_IDX["tex"]
        li, lj = cnst.DECA_IDX["lit"]
        ci, cj = cnst.DECA_IDX["cam"]

        @jax.jit
        def _render(fp, bg_b, key):
            b = fp.shape[0]
            maps = render_tex_and_normal(
                res,
                fp[:, 0:100],
                fp[:, 100:150],
                fp[:, 150:156],
                fp[:, ti:tj],
                fp[:, li:lj].reshape(b, 9, 3),
                fp[:, ci:cj],
                image_size=size,
                max_tris_per_tile=None,  # mesh-derived auto-sizing
            )
            fg = jnp.clip(maps.textured, 0.0, 1.0)
            img = jnp.where(maps.mask[..., None], fg, bg_b)
            # noise_std defaults to ZERO: GIF's generator is fully
            # deterministic given (condition maps, identity index) — the
            # reference replaces StyleGAN2's per-pixel noise injection with
            # condition injection (stylegan2_common_layers.py:388-431), so
            # iid sensor noise on the real images sits OUTSIDE the
            # generator's support and hands the discriminator an
            # unconditioned spectral tell it separates on at ANY dataset
            # size (measured: runs/longitudinal_r05_noisytell, n=8192,
            # relative FID 17.3@250 -> 51.7@500 with d_loss collapsing to
            # ~1e-2 at <0.5 epochs).  A learnable probe target must lie in
            # the reachable set; keep the knob for A/B only.
            if noise_std:
                img = img + jax.random.normal(key, img.shape) * noise_std
            return jnp.clip(img, 0.0, 1.0)

        # Disk cache keyed by the full recipe: the n/16 sequential render
        # dispatches are the longest unprotected device interaction in a
        # launch (hundreds of RPCs over the axon tunnel, any of which can
        # hang a relaunch if the pool drops one), and the result is a pure
        # function of the key — so build once, mmap thereafter.
        cache = None
        if cache_dir is None:
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "gif_tpu", "synth"
            )
        if cache_dir:
            import hashlib

            res_tag = hashlib.sha1(
                np.ascontiguousarray(res.v_template).tobytes()
            ).hexdigest()[:10]
            cache = os.path.join(
                cache_dir,
                f"renders_n{n}_s{size}_seed{seed}_ns{noise_std:g}_{res_tag}.npz",
            )
        if cache and os.path.exists(cache):
            with np.load(cache) as d:
                super().__init__(d["images"], d["flame"])
                return

        key = jax.random.PRNGKey(seed)
        images = np.empty((n, size, size, 3), np.uint8)
        for s in range(0, n, render_batch):
            e = min(s + render_batch, n)
            img = _render(
                jnp.asarray(flame[s:e]), jnp.asarray(bg[s:e]), jax.random.fold_in(key, s)
            )
            images[s:e] = np.asarray(
                np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255), np.uint8
            )
            if s % (64 * render_batch) == 0:
                print(f"SyntheticRenderDataset: {e}/{n} rendered", flush=True)
        if cache:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            tmp = cache + ".tmp.npz"
            np.savez(tmp, images=images, flame=flame)
            os.replace(tmp, cache)
        super().__init__(images, flame)


def load_packed_dataset(path: str, **kwargs) -> FlameDataset:
    """Load an ``.npz`` produced by gif_tpu.data.lmdb_import (keys:
    flame_params, optional bad_images, and EITHER an inline ``images``
    array OR an ``images_path`` key naming a separate mem-mapped ``.npy``
    — the importer writes the latter so the uint8 frames never enter the
    zip archive)."""
    data = np.load(path, allow_pickle=False, mmap_mode="r")
    if "images" in data:
        images = data["images"]
    elif "images_path" in data:
        # The recorded path (importer-time) first; else the sibling .npy
        # next to the npz, so a relocated dataset directory keeps working.
        img_path = str(data["images_path"])
        if not os.path.exists(img_path):
            img_path = os.path.join(
                os.path.dirname(os.path.abspath(path)), os.path.basename(img_path)
            )
        images = np.load(img_path, mmap_mode="r")
    else:
        raise KeyError(
            f"{path} carries neither an 'images' array nor an 'images_path' "
            "reference"
        )
    return FlameDataset(
        images=images,
        flame_params=data["flame_params"],
        bad_images=data["bad_images"] if "bad_images" in data else None,
        **kwargs,
    )


def data_iterator(
    dataset: FlameDataset,
    batch_size: int,
    seed=0,
    prefetch: int = 2,
    start_step: int = 0,
) -> Iterator[dict]:
    """Infinite prefetching iterator (replaces the 16-worker torch DataLoader,
    dataset_loaders.py:390-397) — a daemon thread keeps ``prefetch`` batches
    ready so host assembly overlaps device compute.

    Batches are COUNTER-BASED: batch ``i`` is drawn from a fresh
    ``default_rng([*seed, i])`` stream, so a run resumed at step ``s``
    (``start_step=s``) sees exactly the batches an uninterrupted run saw
    from step ``s`` on — deterministic resume by construction (the
    reference restarts its DataLoader stream on resume, train.py:112-116).
    ``seed`` may be an int or a sequence of ints (e.g. (run_id,
    process_index) for per-host streams in multi-process training).
    """
    seed_seq = [int(seed)] if np.isscalar(seed) else [int(s) for s in seed]
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def producer():
        consecutive_failures = 0
        step = start_step
        while not stop.is_set():
            # Failure recovery (reference train.py:112-116 recreates its
            # DataLoader on OSError/StopIteration): a transient read error
            # retries the batch (fresh attempt-folded stream) instead of
            # killing the thread and hanging the training loop; persistent
            # failure re-raises through the queue so the loop surfaces the
            # real error.
            try:
                rng = np.random.default_rng(
                    seed_seq + [step, consecutive_failures]
                )
                batch = dataset.sample_batch(rng, batch_size)
                step += 1
                consecutive_failures = 0
            except Exception as e:  # noqa: BLE001 - deliberate broad retry
                consecutive_failures += 1
                if consecutive_failures >= 10:
                    while not stop.is_set():
                        try:
                            q.put(e, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    return
                print(f"data pipeline: batch failed ({e!r}); resampling")
                continue
            while not stop.is_set():
                try:
                    q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()
