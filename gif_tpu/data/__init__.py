"""Input pipelines: FFHQ + FLAME parameter datasets.

The reference reads JPEG frames from a multiscale LMDB plus pre-rendered
DECA condition maps from a second LMDB (dataset_loaders.py).  The TPU
rebuild renders conditions on-device, so the pipeline only has to supply
(real image, 236-d FLAME params, identity index) — see
:mod:`gif_tpu.data.pipeline`.  :mod:`gif_tpu.data.lmdb_import` converts the
reference's LMDBs into the packed array format (requires the optional
``lmdb`` package).
"""

from gif_tpu.data.pipeline import FlameDataset, SyntheticFlameDataset, data_iterator

__all__ = ["FlameDataset", "SyntheticFlameDataset", "data_iterator"]
