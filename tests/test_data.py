"""Data pipeline: synthetic CALVIN disk dataset through the real loader."""

import numpy as np
import pytest

from deer_vla_tpu.data.calvin import (CalvinDataConfig, CalvinLoader,
                                      DiskCalvinDataset,
                                      get_validation_window_size)
from deer_vla_tpu.data.debug_data import make_synthetic_calvin
from deer_vla_tpu.data.text import HashTokenizer


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("calvin"))
    split = make_synthetic_calvin(root, n_episodes=3, ep_len=20)
    return split


def test_dataset_index_and_sample(synth):
    cfg = CalvinDataConfig(dataset_dir=synth, window_size=6)
    ds = DiskCalvinDataset(cfg, validation=False)
    # 3 episodes, spans (0,19): starts = range(start, end+1-min_ws) -> 14 each
    # (data.py:735-741)
    assert len(ds) == 3 * 14
    s = ds[0]
    assert s["rgb_static"].shape == (6, 32, 32, 3)
    assert s["rgb_gripper"].shape == (6, 24, 24, 3)
    assert s["actions"].shape == (6, 7)
    assert s["robot_obs"].shape == (6, 15)
    assert isinstance(s["lang"], str) and len(s["lang"]) > 0


def test_window_padding_rules(synth):
    """Windows reaching past the episode end: repeat frames, zero-pad arm
    actions, repeat gripper action (data.py:494-516)."""
    cfg = CalvinDataConfig(dataset_dir=synth, window_size=6)
    ds = DiskCalvinDataset(cfg, validation=False)
    # emulate a short window by calling the padder directly
    s = ds[0]
    short = {k: (v[:4].copy() if isinstance(v, np.ndarray) else v)
             for k, v in s.items() if k in ("rgb_static", "rgb_gripper",
                                            "actions", "robot_obs")}
    padded = ds._pad_sample(short, 2)
    assert padded["rgb_static"].shape[0] == 6
    np.testing.assert_array_equal(padded["rgb_static"][-1],
                                  padded["rgb_static"][-2])
    # arm zero-padded
    assert np.all(padded["actions"][-2:, :6] == 0)
    # gripper repeated
    assert padded["actions"][-1, 6] == padded["actions"][3, 6]


def test_validation_window_deterministic():
    assert get_validation_window_size(7, 5, 12) == get_validation_window_size(7, 5, 12)
    sizes = {get_validation_window_size(i, 5, 12) for i in range(100)}
    assert sizes <= set(range(5, 13)) and len(sizes) > 3


def test_loader_batches_and_sharding(synth):
    cfg = CalvinDataConfig(dataset_dir=synth, window_size=6)
    ds = DiskCalvinDataset(cfg, validation=False)
    tok = HashTokenizer(max_length=16)
    loader = CalvinLoader(ds, tok, batch_size=4, shuffle=True)
    batches = list(loader)
    assert len(batches) == len(loader) == len(ds) // 4
    b = batches[0]
    assert b["rgb_static"].shape == (4, 6, 32, 32, 3)
    assert b["actions"].shape == (4, 6, 7)
    assert b["input_ids"].shape[0] == 4
    assert b["input_ids"][0, 0] == tok.media_token_id

    # two ranks see disjoint, equally-sized shards
    l0 = CalvinLoader(ds, tok, batch_size=2, rank=0, world_size=2, shuffle=False)
    l1 = CalvinLoader(ds, tok, batch_size=2, rank=1, world_size=2, shuffle=False)
    assert len(l0) == len(l1)
    o0, o1 = set(l0._order().tolist()), set(l1._order().tolist())
    assert not (o0 & o1)

    # epoch reshuffle is deterministic
    loader.set_epoch(1)
    a = loader._order()
    loader.set_epoch(1)
    np.testing.assert_array_equal(a, loader._order())
    loader.set_epoch(2)
    assert not np.array_equal(a, loader._order())


def test_multi_step_action_collation(synth):
    cfg = CalvinDataConfig(dataset_dir=synth, window_size=6, act_step=3)
    ds = DiskCalvinDataset(cfg, validation=False)
    assert cfg.min_window_size == 8
    tok = HashTokenizer(max_length=16)
    s = [ds[0], ds[1]]
    batch = ds.collate(s, tok)
    assert batch["actions"].shape == (2, 6, 3, 7)
    assert batch["rgb_static"].shape[1] == 6
    # action at (t, k) equals action at (t+k, 0)
    np.testing.assert_array_equal(batch["actions"][0, 1, 1],
                                  batch["actions"][0, 2, 0])


def test_text_aug_enrichment(synth, tmp_path):
    import json
    enrich = {"rotate_blue_block_right": ["spin the blue cube clockwise"]}
    p = tmp_path / "enrich.json"
    p.write_text(json.dumps(enrich))
    cfg = CalvinDataConfig(dataset_dir=synth, window_size=6, text_aug=True,
                           enrich_lang_path=str(p))
    ds = DiskCalvinDataset(cfg, validation=False)
    texts = {ds[i]["lang"] for i in range(10)}
    assert len(texts) >= 1  # enrichment path exercised without crashing


def test_loader_early_break_terminates_producer(synth):
    """Breaking out of iteration mid-epoch (calibration max_batches caps)
    must unblock and terminate the prefetch thread instead of leaving it
    parked on q.put forever."""
    import threading
    import time
    cfg = CalvinDataConfig(dataset_dir=synth, window_size=6)
    ds = DiskCalvinDataset(cfg, validation=False)
    tok = HashTokenizer(max_length=16)
    loader = CalvinLoader(ds, tok, batch_size=2, prefetch=1, workers=2)
    assert len(loader) > 3
    before = threading.active_count()
    for _ in range(3):
        it = iter(loader)
        next(it)
        it.close()  # consumer stops early (generator finalizer -> cancel)
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer threads leaked"


def test_variable_window_training(synth):
    """dif_ws (data.py:250-255,406-441): train windows drawn uniformly in
    [min, max] clamped at episode boundaries; every sample padded to
    max_window_size; validation windows hash-deterministic per index."""
    cfg = CalvinDataConfig(dataset_dir=synth, window_size=8, dif_ws=True,
                           var_min_window=5, var_max_window=8)
    assert cfg.min_window_size == 5 and cfg.max_window_size == 8
    ds = DiskCalvinDataset(cfg, validation=False)
    # episodes of 20 frames -> 15 starts each (ep_len - min_ws)
    assert len(ds) == 3 * 15

    # train: window sizes vary but every sample is padded to max
    seen = set()
    for i in range(len(ds)):
        seen.add(ds._window_size(i))
        s = ds[i]
        assert s["rgb_static"].shape[0] == 8
        assert s["actions"].shape[0] == 8
    assert len(seen) > 1 and seen <= set(range(5, 9))

    # boundary clamp: the last start of an episode has only min_ws frames
    # left -> window size is exactly min_ws, never crossing into the next
    # episode (data.py:420-434)
    last_start_idx = 14  # episode 0 spans lookup [0, 15)
    assert ds._window_size(last_start_idx) == 5
    # padded frames at the tail repeat the episode's LAST frame, not the
    # next episode's first
    s = ds[last_start_idx]
    np.testing.assert_array_equal(s["rgb_static"][-1], s["rgb_static"][4])

    # validation: deterministic per idx across epochs/instances
    dsv = DiskCalvinDataset(cfg, validation=True)
    sizes1 = [dsv._window_size(i) for i in range(len(dsv))]
    dsv2 = DiskCalvinDataset(cfg, validation=True)
    sizes2 = [dsv2._window_size(i) for i in range(len(dsv2))]
    assert sizes1 == sizes2
    assert len(set(sizes1)) > 1  # the hash actually varies (VERDICT r1 #3)

    # loader end to end: batches come out at the padded max window
    tok = HashTokenizer(vocab_size=128, max_length=8)
    loader = CalvinLoader(ds, tok, batch_size=4, workers=1)
    batch = next(iter(loader))
    assert batch["rgb_static"].shape[1] == 8
    assert batch["actions"].shape[1] == 8
