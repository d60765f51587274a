"""OISSTv2 datamodule tests: box loading, date slicing, windows, npz cache."""
import numpy as np
import pytest

from dyffusion_tpu.data.oisstv2 import OISSTv2DataModule, write_fake_oisst_dir


@pytest.fixture(scope="module")
def oisst_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("oisst"))
    return write_fake_oisst_dir(root, boxes=(84, 85, 86), n_days_per_year=20)


def test_splits_are_date_sliced(oisst_root):
    dm = OISSTv2DataModule(data_dir=oisst_root, boxes=[84, 85], horizon=5, window=1)
    dm.setup()
    L = 6
    n_ex = 20 - L + 1  # per box per year-slice
    assert len(dm.split("train")) == 2 * n_ex  # 2018 days only
    assert len(dm.split("val")) == 2 * n_ex  # 2019
    assert len(dm.split("test")) == 2 * n_ex  # 2020
    assert dm.split("train").tensors["dynamics"].shape == (2 * n_ex, L, 60, 60, 1)


def test_boxes_all_discovers_files(oisst_root):
    dm = OISSTv2DataModule(data_dir=oisst_root, boxes="all", horizon=3)
    assert dm._resolve_boxes("all") == [84, 85, 86]


def test_window_content_matches_source(oisst_root):
    dm = OISSTv2DataModule(data_dir=oisst_root, boxes=[84], horizon=4, window=2)
    dm.setup()
    dyn = dm.split("val").tensors["dynamics"]  # 2019 slice
    from dyffusion_tpu.data.oisstv2 import _load_box

    sst, time = _load_box(dm.data_dir / "sst.day.mean.box84")
    sel = (time >= np.datetime64("2019-01-01")) & (time <= np.datetime64("2019-12-31"))
    src = sst[sel]
    for i in range(dyn.shape[0]):
        np.testing.assert_array_equal(dyn[i, :, :, :, 0], src[i : i + 6])


def test_numpy_cache_roundtrip(oisst_root):
    dm = OISSTv2DataModule(
        data_dir=oisst_root, boxes=[84], horizon=3, save_and_load_as_numpy=True
    )
    dm.setup()
    first = dm.split("train").tensors["dynamics"].copy()
    cache = dm._numpy_cache_file("train")
    assert cache.exists()
    dm2 = OISSTv2DataModule(
        data_dir=oisst_root, boxes=[84], horizon=3, save_and_load_as_numpy=True
    )
    dm2.setup()
    np.testing.assert_array_equal(first, dm2.split("train").tensors["dynamics"])


def test_predict_slice(oisst_root):
    dm = OISSTv2DataModule(
        data_dir=oisst_root, boxes=[84], predict_boxes=[85],
        predict_slice=("2020-01-01", "2020-01-20"), horizon=3,
    )
    dm.setup()
    assert len(dm.split("predict")) == 20 - 4 + 1


def test_numpy_cache_key_depends_on_build_inputs(oisst_root):
    """Changing prediction_horizon / train_start_date / validation_boxes /
    window must MISS the npz cache instead of silently loading stale data
    (the reference keys only on boxes+horizon, ref oisstv2.py:86-94)."""
    base = dict(data_dir=oisst_root, boxes=[84, 85], horizon=3, save_and_load_as_numpy=True)
    dm = OISSTv2DataModule(**base)
    variants = [
        ("test", OISSTv2DataModule(**base, prediction_horizon=5)),
        ("train", OISSTv2DataModule(**{**base, "window": 2})),
        ("val", OISSTv2DataModule(**base, validation_boxes=[84])),
    ]
    for split, other in variants:
        assert dm._numpy_cache_file(split) != other._numpy_cache_file(split), split
    # identical configs share the cache file
    same = OISSTv2DataModule(**base)
    for split in ("train", "val", "test"):
        assert dm._numpy_cache_file(split) == same._numpy_cache_file(split)
