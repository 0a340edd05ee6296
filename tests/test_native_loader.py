"""Native C++ npz reader: parity with numpy, fallback behavior, speed."""

import time

import numpy as np
import pytest

from deer_vla_tpu.data import native_loader


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("npz")
    paths = []
    r = np.random.RandomState(0)
    for i in range(8):
        p = d / f"episode_{i:07d}.npz"
        np.savez(p,  # STORED members (np.savez does not compress)
                 rgb_static=r.randint(0, 256, (24, 24, 3), np.uint8),
                 rel_actions=r.randn(7).astype(np.float32),
                 robot_obs=r.randn(15).astype(np.float64))
        paths.append(str(p))
    return paths


def test_native_builds():
    assert native_loader.available(), "g++ build of npz_reader failed"


def test_read_key_matches_numpy(files):
    for key in ("rgb_static", "rel_actions", "robot_obs"):
        ref = np.load(files[0])[key]
        got = native_loader.read_key(files[0], key)
        assert got is not None, key
        assert got.dtype == ref.dtype and got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)


def test_read_window_matches_numpy(files):
    got = native_loader.read_window(files, "rgb_static", n_threads=4)
    ref = np.stack([np.load(p)["rgb_static"] for p in files])
    np.testing.assert_array_equal(got, ref)
    got_f = native_loader.read_window(files, "rel_actions")
    ref_f = np.stack([np.load(p)["rel_actions"] for p in files])
    np.testing.assert_array_equal(got_f, ref_f)


def test_compressed_members_inflate(tmp_path, files):
    """savez_compressed members inflate through zlib natively."""
    p = tmp_path / "compressed.npz"
    a = np.random.RandomState(1).randint(0, 256, (4, 4, 3), np.uint8)
    np.savez_compressed(p, rgb_static=a,
                        rel_actions=np.arange(7, dtype=np.float32))
    np.testing.assert_array_equal(native_loader.read_key(str(p), "rgb_static"), a)
    w = native_loader.read_window([str(p), str(p)], "rel_actions")
    np.testing.assert_array_equal(w, np.tile(np.arange(7, np.float32) if False
                                             else np.arange(7, dtype=np.float32),
                                             (2, 1)))


def test_missing_key_and_file(files):
    assert native_loader.read_key(files[0], "nope") is None
    assert native_loader.read_key("/does/not/exist.npz", "rgb_static") is None


def test_dataset_uses_native_and_matches(tmp_path):
    from deer_vla_tpu.data.calvin import CalvinDataConfig, DiskCalvinDataset
    from deer_vla_tpu.data.debug_data import make_synthetic_calvin
    split = make_synthetic_calvin(str(tmp_path), n_episodes=2, ep_len=12)
    cfg = CalvinDataConfig(dataset_dir=split, window_size=4)
    ds = DiskCalvinDataset(cfg, validation=False)
    s = ds[0]
    # cross-check a frame against direct numpy
    f0 = np.load(ds._episode_path(int(ds.episode_lookup[0])))
    np.testing.assert_array_equal(s["rgb_static"][0], f0["rgb_static"])
    np.testing.assert_allclose(s["actions"][0], f0["rel_actions"])

def test_read_window_keys_matches_numpy(files):
    """v2 mmap multi-key path: all keys in one map/parse per file match
    per-key numpy loads."""
    keys = ("rgb_static", "rel_actions", "robot_obs")
    got = native_loader.read_window_keys(files, keys, n_threads=4)
    assert got is not None and set(got) == set(keys)
    for k in keys:
        ref = np.stack([np.load(p)[k] for p in files])
        assert got[k].dtype == ref.dtype and got[k].shape == ref.shape
        np.testing.assert_array_equal(got[k], ref)


def test_read_window_keys_compressed(tmp_path):
    """DEFLATE members inflate through the mmap path too."""
    r = np.random.RandomState(3)
    paths = []
    for i in range(3):
        p = tmp_path / f"c{i}.npz"
        np.savez_compressed(p, a=r.randn(5, 4).astype(np.float32),
                            b=r.randint(0, 9, (6,), np.int64))
        paths.append(str(p))
    got = native_loader.read_window_keys(paths, ("a", "b"))
    for k in ("a", "b"):
        ref = np.stack([np.load(p)[k] for p in paths])
        np.testing.assert_array_equal(got[k], ref)


def test_read_window_keys_missing(files):
    assert native_loader.read_window_keys(files, ("rgb_static", "nope")) is None
    assert native_loader.read_window_keys(["/no/file.npz"], ("a",)) is None
    assert native_loader.read_window_keys([], ()) is None


def test_probe_keys(files):
    infos = native_loader.probe_keys(files[0], ["rgb_static", "robot_obs"])
    assert infos[0][0] == (24, 24, 3) and infos[0][1] == np.uint8
    assert infos[1][0] == (15,) and infos[1][1] == np.float64
