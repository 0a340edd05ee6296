"""Debug / synthetic data: cluster-free smoke backends.

  * DebugBatcher — random-tensor batches in the exact training format
    (DebugDataset equivalent, data.py:588-597 + get_calvin_dataset_debug
    :1191-1246)
  * make_synthetic_calvin — writes a miniature CALVIN-format dataset to disk
    (episode_XXXXXXX.npz + auto_lang_ann.npy) so DiskCalvinDataset and the
    full loader path are testable without the real 100GB dataset.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Dict, Iterator, Optional

import numpy as np

from deer_vla_tpu.core.config import DeerConfig


TASKS = ["rotate_blue_block_right", "lift_red_block", "open_drawer",
         "move_slider_left", "turn_on_lightbulb"]
INSTRUCTIONS = {
    "rotate_blue_block_right": "rotate the blue block to the right",
    "lift_red_block": "pick up the red block",
    "open_drawer": "open the drawer",
    "move_slider_left": "push the slider to the left",
    "turn_on_lightbulb": "turn on the light bulb",
}


class DebugBatcher:
    """Yields random batches shaped exactly like CalvinLoader output."""

    def __init__(self, cfg: DeerConfig, text_fn: Callable, batch_size: int = 2,
                 num_batches: int = 4, img_hw: int = 64, grip_hw: int = 48,
                 seed: int = 0):
        self.cfg = cfg
        self.text_fn = text_fn
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.img_hw = img_hw
        self.grip_hw = grip_hw
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.num_batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        r = np.random.RandomState(self.seed + self.epoch)
        w = self.cfg.window_size
        # multi_step_action k>1: the real collation emits (B, w, k, 7)
        # labels restacked from a (w + k - 1)-frame window
        # (data/calvin.py collate = reference data.py:796-812) — the debug
        # batches must match or the loss shapes diverge
        k = self.cfg.head.multi_step_action
        for _ in range(self.num_batches):
            texts = [INSTRUCTIONS[TASKS[r.randint(len(TASKS))]]
                     for _ in range(self.batch_size)]
            ids, mask = self.text_fn(texts)
            acts = np.clip(r.randn(self.batch_size, w + k - 1, 7)
                           .astype(np.float32) * 0.3, -1, 1)
            acts[..., 6] = np.sign(acts[..., 6]) + (acts[..., 6] == 0)
            if k != 1:
                acts = np.stack([acts[:, i:i + k] for i in range(w)], axis=1)
            yield {
                "rgb_static": r.randint(0, 256, (self.batch_size, w, self.img_hw,
                                                 self.img_hw, 3), np.uint8),
                "rgb_gripper": r.randint(0, 256, (self.batch_size, w, self.grip_hw,
                                                  self.grip_hw, 3), np.uint8),
                "actions": acts,
                "robot_obs": r.randn(self.batch_size, w, 15).astype(np.float32),
                "input_ids": ids, "attention_mask": mask,
                "robot_obs_multi": np.zeros(1, np.float32),
            }


def make_synthetic_calvin(root: str, n_episodes: int = 3, ep_len: int = 24,
                          img_hw: int = 32, grip_hw: int = 24,
                          split: str = "training", seed: int = 0) -> str:
    """Write a tiny CALVIN-format dataset; returns the split dir path."""
    r = np.random.RandomState(seed)
    d = Path(root) / split
    (d / "lang_annotations").mkdir(parents=True, exist_ok=True)
    spans, anns, tasks = [], [], []
    frame = 0
    for e in range(n_episodes):
        start = frame
        for _ in range(ep_len):
            np.savez(
                d / f"episode_{frame:07d}.npz",
                rgb_static=r.randint(0, 256, (img_hw, img_hw, 3), np.uint8),
                rgb_gripper=r.randint(0, 256, (grip_hw, grip_hw, 3), np.uint8),
                rel_actions=np.clip(r.randn(7).astype(np.float32) * 0.3, -1, 1),
                robot_obs=r.randn(15).astype(np.float32),
                scene_obs=r.randn(24).astype(np.float32),
            )
            frame += 1
        spans.append((start, frame - 1))
        task = TASKS[e % len(TASKS)]
        tasks.append(task)
        anns.append(INSTRUCTIONS[task])
    lang_data = {"info": {"indx": spans},
                 "language": {"ann": anns, "task": tasks}}
    np.save(d / "lang_annotations" / "auto_lang_ann.npy", lang_data,
            allow_pickle=True)
    return str(d)
