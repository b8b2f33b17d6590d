"""LMDB importer test against a stubbed ``lmdb`` module.

The real ``lmdb`` package is not installed here (VERDICT r1, 2.5), so the
importer is exercised end-to-end with a minimal fake environment that
reproduces the reference's key schema (``f'{res}-{idx:05d}'`` JPEG values +
a ``length`` key, prepare_lmdb/prepare_ffhq_multiscale_dataset.py) — the
importer's logic (key iteration, decode, FLAME vector assembly, bad-image
passthrough, npz layout) is what's under test, not libmdb itself.
"""

import io
import sys
import types

import numpy as np
import pytest


class _FakeTxn:
    def __init__(self, store):
        self._store = store

    def get(self, key):
        return self._store[key]

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeEnv:
    def __init__(self, store):
        self._store = store

    def begin(self, write=False):
        return _FakeTxn(self._store)


def _fake_lmdb_module(store):
    mod = types.ModuleType("lmdb")
    mod.open = lambda path, **kw: _FakeEnv(store)
    return mod


def test_import_ffhq_lmdb_with_stub(tmp_path, monkeypatch):
    from PIL import Image

    res = 32
    n = 4
    rng = np.random.default_rng(0)
    store = {b"length": str(n).encode()}
    truth = []
    for i in range(n):
        arr = rng.integers(0, 255, (res, res, 3), dtype=np.uint8)
        truth.append(arr)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")  # lossless for equality
        store[f"{res}-{str(i).zfill(5)}".encode()] = buf.getvalue()

    params = np.array(
        [
            {
                "shape": rng.standard_normal(100),
                "exp": rng.standard_normal(50),
                "pose": rng.standard_normal(6),
                "cam": rng.standard_normal(3),
                "tex": rng.standard_normal(50),
                "lit": rng.standard_normal((9, 3)),
            }
            for _ in range(n)
        ],
        dtype=object,
    )
    params_file = tmp_path / "flame.npy"
    np.save(params_file, params, allow_pickle=True)

    bad_file = tmp_path / "bad.npz"
    np.savez(bad_file, bad_images=np.asarray([2]))

    monkeypatch.setitem(sys.modules, "lmdb", _fake_lmdb_module(store))
    from gif_tpu.data.lmdb_import import import_ffhq_lmdb

    out = import_ffhq_lmdb(
        "ignored",
        str(params_file),
        str(tmp_path / "out"),
        resolution=res,
        bad_images_file=str(bad_file),
    )
    data = np.load(out)
    assert data["flame_params"].shape == (n, 236)
    assert data["bad_images"].tolist() == [2]
    imgs = np.load(str(data["images_path"]))
    assert imgs.shape == (n, res, res, 3)
    np.testing.assert_array_equal(imgs[1], truth[1])
    # FLAME vector layout [shape|exp|pose|cam|tex|lit] (dataset_loaders.py:306-310)
    np.testing.assert_allclose(
        data["flame_params"][0, :100],
        np.asarray(params[0]["shape"], np.float32),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        data["flame_params"][0, 209:236],
        np.asarray(params[0]["lit"], np.float32).reshape(-1),
        rtol=1e-6,
    )
    # The loader must open the importer's own output (review finding: it
    # previously required an inline 'images' key the importer never writes).
    from gif_tpu.data.pipeline import load_packed_dataset

    ds = load_packed_dataset(out)
    assert ds.images.shape == (n, res, res, 3)
    assert len(ds) == n - 1  # one bad image excluded
    np.testing.assert_array_equal(np.asarray(ds.images[1]), truth[1])


def test_import_image_dir(tmp_path):
    """Raw image-folder import (no LMDB stage): sorted-name order, resize
    to target, loader round-trip."""
    from PIL import Image

    res = 16
    n = 3
    rng = np.random.default_rng(1)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    truth = []
    for i in range(n):
        arr = rng.integers(0, 255, (res, res, 3), dtype=np.uint8)
        truth.append(arr)
        Image.fromarray(arr).save(img_dir / f"{str(i).zfill(5)}.png")
    # An oversized frame exercises the resize path.
    big = rng.integers(0, 255, (res * 2, res * 2, 3), dtype=np.uint8)
    Image.fromarray(big).save(img_dir / f"{str(n).zfill(5)}.png")

    params = np.array(
        [
            {
                "shape": rng.standard_normal(100),
                "exp": rng.standard_normal(50),
                "pose": rng.standard_normal(6),
                "cam": rng.standard_normal(3),
                "tex": rng.standard_normal(50),
                "lit": rng.standard_normal((9, 3)),
            }
            for _ in range(n + 1)
        ],
        dtype=object,
    )
    params_file = tmp_path / "flame.npy"
    np.save(params_file, params, allow_pickle=True)

    from gif_tpu.data.lmdb_import import import_image_dir
    from gif_tpu.data.pipeline import load_packed_dataset

    out = import_image_dir(
        str(img_dir), str(params_file), str(tmp_path / "out"), resolution=res
    )
    ds = load_packed_dataset(out)
    assert ds.images.shape == (n + 1, res, res, 3)
    np.testing.assert_array_equal(np.asarray(ds.images[1]), truth[1])
    np.testing.assert_allclose(
        ds.flame_params[2, :100], np.asarray(params[2]["shape"], np.float32),
        rtol=1e-6,
    )


def test_import_image_dir_multiscale(tmp_path):
    """Multi-size import (the reference multiscale-LMDB builder equivalent,
    prepare_ffhq_multiscale_dataset.py:18-75): one pass emits per-size
    packed datasets, each loader-round-trippable."""
    from PIL import Image

    rng = np.random.default_rng(2)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    truth = []
    for i in range(3):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        truth.append(arr)
        Image.fromarray(arr).save(img_dir / f"{str(i).zfill(5)}.png")
    params = np.array(
        [
            {
                "shape": rng.standard_normal(100),
                "exp": rng.standard_normal(50),
                "pose": rng.standard_normal(6),
                "cam": rng.standard_normal(3),
                "tex": rng.standard_normal(50),
                "lit": rng.standard_normal((9, 3)),
            }
            for _ in range(3)
        ],
        dtype=object,
    )
    params_file = tmp_path / "flame.npy"
    np.save(params_file, params, allow_pickle=True)

    from gif_tpu.data.lmdb_import import import_image_dir
    from gif_tpu.data.pipeline import load_packed_dataset

    out = import_image_dir(
        str(img_dir), str(params_file), str(tmp_path / "out"),
        resolution=(16, 32),
    )
    assert out.endswith("dataset_32.npz")
    for s in (16, 32):
        ds = load_packed_dataset(str(tmp_path / "out" / f"dataset_{s}.npz"))
        assert ds.images.shape == (3, s, s, 3)
    # Native size passes through unresized.
    ds32 = load_packed_dataset(str(tmp_path / "out" / "dataset_32.npz"))
    np.testing.assert_array_equal(np.asarray(ds32.images[0]), truth[0])
