"""Dataset augmentations with reference-exact semantics.

``same_padding_crop`` reproduces dataset_loaders.py:61-91: shift the image
by (row_crop, col_crop) pixels; for a positive crop the content shifts
up/left and the vacated band is filled with the ORIGINAL row/column at index
``size - crop`` (a quirk of the reference, kept exactly); for a negative
crop the content shifts down/right and the band is filled with row/col 0.

Because this framework renders condition maps on-device inside the train
step (no pre-rendered LMDB), the same pixel transform must be applied to
the rendered maps in-graph — ``same_padding_crop_jax`` is the batched jnp
twin used by the train step, and horizontal flips are plain ``[..., ::-1, :]``
selects gated per sample.
"""

from __future__ import annotations

import numpy as np


def same_padding_crop(img: np.ndarray, row_crop: int, col_crop: int) -> np.ndarray:
    """(H, W, C) -> (H, W, C), reference dataset_loaders.py:61-91 semantics."""
    rows, cols = img.shape[:2]
    out = img.copy()
    if row_crop > 0:  # shift up
        out[: rows - row_crop] = img[row_crop:]
        out[rows - row_crop :] = img[rows - row_crop : rows - row_crop + 1]
    elif row_crop < 0:  # shift down
        rc = -row_crop
        out[rc:] = img[: rows - rc]
        out[:rc] = img[0:1]
    img = out.copy()
    if col_crop > 0:  # shift left
        out[:, : cols - col_crop] = img[:, col_crop:]
        out[:, cols - col_crop :] = img[:, cols - col_crop : cols - col_crop + 1]
    elif col_crop < 0:  # shift right
        cc = -col_crop
        out[:, cc:] = img[:, : cols - cc]
        out[:, :cc] = img[:, 0:1]
    return out


def _shift_indices_jax(n: int, crop):
    """Per-sample source indices implementing the reference shift+fill rule.

    crop: (B,) int32.  Returns (B, n) int32 gather indices.
    """
    import jax.numpy as jnp

    r = jnp.arange(n)[None, :]  # (1, n)
    c = crop[:, None]  # (B, 1)
    pos = jnp.where(r + c <= n - 1, r + c, n - c)  # fill with row n-c
    neg = jnp.maximum(r + c, 0)  # fill with row 0
    idx = jnp.where(c > 0, pos, neg)
    return jnp.clip(idx, 0, n - 1).astype(jnp.int32)


def same_padding_crop_jax(x, crops):
    """Batched jnp same-padding crop.

    x: (B, H, W, C); crops: (B, 2) int32 (row_crop, col_crop).
    """
    import jax.numpy as jnp

    b, h, w, _ = x.shape
    row_idx = _shift_indices_jax(h, crops[:, 0])  # (B, H)
    col_idx = _shift_indices_jax(w, crops[:, 1])  # (B, W)
    x = jnp.take_along_axis(x, row_idx[:, :, None, None], axis=1)
    x = jnp.take_along_axis(x, col_idx[:, None, :, None], axis=2)
    return x


FLIPPED_LABEL_SENTINEL = -9999.0  # dataset_loaders.py:322-327
