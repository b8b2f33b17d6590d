"""Convert FID InceptionV3 torch weights to flax params.

The canonical weights are pt_inception-2015-12-05 (the TF-compatible FID
port, URL in reference my_utils/pytorch_fid/inception.py:14).  Run where the
file is available:

  python -m gif_tpu.tools.convert_inception --torch_weights pt_inception.pth \
      --out resources/inception_fid.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def _inception_manifest() -> dict:
    """Expected keys/shapes of the pt_inception-2015 FID state dict,
    derived from the same layout tables the converter consumes."""
    from gif_tpu.eval.inception import _BLOCK_CONVS, _LAYOUT

    manifest = {}
    for name, block in _LAYOUT:
        convs = [name] if block is None else [
            f"{name}.{c}" for c in _BLOCK_CONVS[block]
        ]
        for prefix in convs:
            manifest[f"{prefix}.conv.weight"] = (None, None, None, None)
            for stat in ("weight", "bias", "running_mean", "running_var"):
                manifest[f"{prefix}.bn.{stat}"] = (None,)
    # Anchor shapes: the FID port's stem and pool3 width.
    manifest["Conv2d_1a_3x3.conv.weight"] = (32, 3, 3, 3)
    manifest["Mixed_7c.branch_pool.conv.weight"] = (192, 2048, 1, 1)
    return manifest


def convert(torch_weights_path: str, out_path: str) -> str:
    import torch

    from gif_tpu.eval.inception import convert_torch_inception
    from gif_tpu.tools.manifest import check_manifest

    sd = torch.load(torch_weights_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    check_manifest(sd, _inception_manifest(), f"{torch_weights_path} (FID InceptionV3)")
    params = convert_torch_inception(sd)

    flat = {}

    def _flatten(prefix, tree):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                _flatten(key, v)
            else:
                flat[key] = np.asarray(v)

    _flatten("", params)
    np.savez_compressed(out_path, **flat)
    return out_path


def load_converted_params(path: str) -> dict:
    """Load an npz produced by :func:`convert` back into a nested dict."""
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


def main():  # pragma: no cover
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_weights", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()
    print(convert(a.torch_weights, a.out))


if __name__ == "__main__":
    main()
