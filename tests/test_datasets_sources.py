"""Dataset-source contract tests: tomography HDF5 layout + FMD splits.

The tomography fixture is written in the EXACT schema deepinv's
``generate_dataset`` produces (deepinv v0.2.0 ``datasets/datagenerator.py``:
one HDF5 file with float datasets ``x_train``/``y_train``/``x_test``/
``y_test`` and an ``operator`` attribute; ``HDF5Dataset(path, train=...)``
indexes ``x_train``/``y_train`` when train else ``x_test``/``y_test`` and
returns ``(x, y)`` tuples).  The reference's TomographyDataset wraps that
reader and keeps only x (ref src/datasets/tomography.py:15-27).

FMD layout per ref src/datasets/fmd.py:26-33: ``Split_FMD/train/*.png`` must
hold exactly 216 images and ``Split_FMD/test/*.png`` exactly 24; unique ids
are train: index, val: 216+index (ref :57-58).
"""

import os

import numpy as np
import pytest

from sei_tpu.data.sources import FMD, TomographyDataset


@pytest.fixture(scope="module")
def ct_h5_tree(tmp_path_factory):
    """A datasets_dir containing CT/dinv_dataset0.h5 in deepinv's schema."""
    import h5py

    root = tmp_path_factory.mktemp("datasets")
    os.makedirs(root / "CT")
    h, w = 8, 8
    rng = np.random.default_rng(0)
    x_train = rng.random((4992, 1, h, w)).astype(np.float32)
    x_test = rng.random((100, 1, h, w)).astype(np.float32)
    with h5py.File(root / "CT" / "dinv_dataset0.h5", "w") as hf:
        # generate_dataset stores the operator name as a file attribute and
        # the four splits as float datasets (deepinv datagenerator.py)
        hf.attrs["operator"] = "Tomography"
        hf.create_dataset("x_train", data=x_train)
        hf.create_dataset("y_train", data=x_train * 0.5)
        hf.create_dataset("x_test", data=x_test)
        hf.create_dataset("y_test", data=x_test * 0.5)
    return str(root), x_train, x_test


def test_tomography_reads_deepinv_h5_layout(ct_h5_tree):
    root, x_train, x_test = ct_h5_tree
    train = TomographyDataset("train", root)
    val = TomographyDataset("val", root)
    # split sizes asserted exactly as ref src/datasets/tomography.py:30-35
    assert len(train) == 4992
    assert len(val) == 100
    # grayscale -> 3 replicated channels (ref :22-27)
    x0 = train.load(0)
    assert x0.shape == (3, 8, 8)
    np.testing.assert_array_equal(x0[0], x_train[0, 0])
    np.testing.assert_array_equal(x0[1], x_train[0, 0])
    v5 = val.load(5)
    np.testing.assert_array_equal(v5[0], x_test[5, 0])
    # unique ids: train = index, val = index + 4992 (ref :37-42)
    assert train.unique_id(7) == 7
    assert val.unique_id(7) == 4992 + 7


def test_tomography_single_channel_mode(ct_h5_tree):
    root, x_train, _ = ct_h5_tree
    train = TomographyDataset("train", root, channels=1)
    assert train.load(3).shape == (1, 8, 8)


def test_tomography_rejects_unknown_keys(tmp_path):
    import h5py

    os.makedirs(tmp_path / "CT")
    with h5py.File(tmp_path / "CT" / "dinv_dataset0.h5", "w") as hf:
        hf.create_dataset("images", data=np.zeros((4, 1, 8, 8), np.float32))
    with pytest.raises(KeyError):
        TomographyDataset("train", str(tmp_path))


@pytest.fixture(scope="module")
def fmd_tree(tmp_path_factory):
    """A datasets_dir with a 216/24 Split_FMD stand-in of tiny PNGs."""
    from sei_tpu.data.loader import write_image

    root = tmp_path_factory.mktemp("datasets_fmd")
    rng = np.random.default_rng(1)
    for split, n in (("train", 216), ("test", 24)):
        for i in range(n):
            im = rng.random((3, 16, 16)).astype(np.float32)
            write_image(str(root / "Split_FMD" / split / f"img_{i:03d}.png"), im)
    return str(root)


def test_fmd_split_semantics(fmd_tree):
    train = FMD("train", fmd_tree)
    val = FMD("val", fmd_tree)
    # integrity asserts per ref src/datasets/fmd.py:31-33
    assert len(train) == 216
    assert len(val) == 24
    # unique ids: train = index, val = 216 + index (ref :57-58)
    assert train.unique_id(0) == 0
    assert train.unique_id(215) == 215
    assert val.unique_id(0) == 216
    assert val.unique_id(23) == 239
    # images decode to float32 CHW in [0,1], 3 channels (ref read_image)
    x = val.load(0)
    assert x.shape == (3, 16, 16) and x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0


def test_fmd_rejects_wrong_split_sizes(tmp_path):
    from sei_tpu.data.loader import write_image

    for split, n in (("train", 10), ("test", 24)):
        for i in range(n):
            write_image(
                str(tmp_path / "Split_FMD" / split / f"{i}.png"),
                np.zeros((3, 4, 4), np.float32),
            )
    with pytest.raises(AssertionError):
        FMD("train", str(tmp_path))
