"""Real-robot HDF5 dataset + rotation math tests."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from deer_vla_tpu.data.real_hdf5 import (RealDatasetHDF5, binary_gripper_from_pos,
                                         euler2rotm, make_synthetic_real_hdf5,
                                         quat2rotm, relative_ee_action,
                                         rotm2euler)


def test_euler_rotm_roundtrip():
    r = np.random.RandomState(0)
    for _ in range(20):
        e = r.uniform(-np.pi + 0.1, np.pi - 0.1, 3)
        e[1] = r.uniform(-np.pi / 2 + 0.1, np.pi / 2 - 0.1)  # avoid gimbal
        R = euler2rotm(e)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(rotm2euler(R), e, atol=1e-8)


def test_quat2rotm_identity_and_orthogonal():
    np.testing.assert_allclose(quat2rotm(np.array([0, 0, 0, 1.0])), np.eye(3),
                               atol=1e-12)
    q = np.array([0.1, 0.2, -0.3, 0.9])
    R = quat2rotm(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    assert np.isclose(np.linalg.det(R), 1.0)


def test_relative_ee_action_local_inverts():
    """Applying the local action to state_t must recover state_{t+1}."""
    r = np.random.RandomState(1)
    s0 = np.concatenate([r.randn(3), r.uniform(-1, 1, 3), [1.0]])
    s1 = np.concatenate([s0[:3] + r.randn(3) * 0.02,
                         s0[3:6] + r.uniform(-0.05, 0.05, 3), [0.0]])
    a = relative_ee_action(s0, s1, "ee_rel_pose_local")
    r_t = euler2rotm(s0[3:6])
    xyz_rec = s0[:3] + r_t @ (a[:3] / 50.0)
    np.testing.assert_allclose(xyz_rec, s1[:3], atol=1e-6)
    r_rel = euler2rotm(a[3:6] / 33.0)
    np.testing.assert_allclose(r_t @ r_rel, euler2rotm(s1[3:6]), atol=1e-6)
    assert a[6] == 0.0


def test_binary_gripper():
    pos = np.array([0.0, 0.0, 0.0, 0.02, 0.05, 0.05, 0.05])
    cmd = np.array([0, 0, 1, 1, 1, 1, 1], float)  # close command at frame 2
    st = binary_gripper_from_pos(pos, cmd, close_cmd=1.0)
    np.testing.assert_array_equal(st, [1, 1, 1, 0, 0, 0, 0])


def test_dataset_windows(tmp_path):
    d = make_synthetic_real_hdf5(str(tmp_path), n_trajs=2, n_frames=16)
    ds = RealDatasetHDF5(str(tmp_path), "train", seq_len=6)
    assert len(ds) == 2 * (16 - 6)
    s = ds[0]
    assert s["rgb_static"].shape == (6, 32, 32, 3)
    assert s["actions"].shape == (6, 7)
    assert s["robot_obs"].shape == (6, 7)
    from deer_vla_tpu.data.text import HashTokenizer
    tok = HashTokenizer(max_length=16)
    b = ds.collate([ds[0], ds[1]], tok)
    assert b["rgb_static"].shape == (2, 6, 32, 32, 3)
    assert b["input_ids"].shape[0] == 2
