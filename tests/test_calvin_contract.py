"""Import-level contract test for the real-CALVIN eval branch (VERDICT r2,
'What's missing' #4).

`cli/eval._make_calvin_env` wires hydra/omegaconf/calvin_env exactly like
the reference (eval_utils.py:144-150, eval_calvin.py:14,508-527).  The real
packages are not installable here, so these tests stub them at the
sys.modules level with modules that ENFORCE the call contract (config
paths, instantiate target, get_env signature) — the first run against a
real CALVIN install should not be this code's first execution.
"""

import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest


class _FakeDictConfig(dict):
    def items(self):
        return super().items()


def _install_stubs(monkeypatch, record):
    """sys.modules stubs for hydra / omegaconf / calvin_env that assert the
    reference contract and record the calls."""
    omegaconf = types.ModuleType("omegaconf")

    class OmegaConf:
        @staticmethod
        def load(path):
            p = str(path)
            record["loaded"].append(p)
            if p.endswith("new_playtable_tasks.yaml"):
                return {"_target_": "calvin_agent.rollout.rollout.Tasks",
                        "tasks": {"push_red_block": ["..."]}}
            if p.endswith("new_playtable_validation.yaml"):
                # task -> list of instruction strings (eval_utils.py:513)
                return _FakeDictConfig(
                    {"push_red_block": ["push the red block"],
                     "lift_blue_block": ["lift the blue block"]})
            raise AssertionError(f"unexpected OmegaConf.load({p})")

    omegaconf.OmegaConf = OmegaConf

    hydra = types.ModuleType("hydra")
    hydra.utils = types.SimpleNamespace()

    class _Oracle:
        def __init__(self, cfg):
            self.cfg = cfg

        def get_task_info_for_set(self, start_info, current_info, subtasks):
            # the rollout calls with dict infos and a set of subtask names
            # (eval_utils.py:684-686; our rollout.py:272)
            assert isinstance(subtasks, (set, frozenset))
            return set()

    def instantiate(cfg):
        assert cfg.get("_target_", "").endswith("Tasks"), cfg
        record["instantiated"] = cfg
        return _Oracle(cfg)

    hydra.utils.instantiate = instantiate

    calvin_env = types.ModuleType("calvin_env")
    envs = types.ModuleType("calvin_env.envs")
    pte = types.ModuleType("calvin_env.envs.play_table_env")

    class _Env:
        def __init__(self, dataset_path):
            self.dataset_path = dataset_path

        def get_info(self):
            return {}

        def reset(self, robot_obs=None, scene_obs=None):
            return {}

    def get_env(dataset_path, show_gui=False, **kw):
        # the reference calls get_env(<dataset>/validation, show_gui=False)
        # (eval_utils.py:144-150)
        record["env_path"] = str(dataset_path)
        assert show_gui is False
        return _Env(dataset_path)

    pte.get_env = get_env
    calvin_env.envs = envs
    envs.play_table_env = pte

    for name, mod in [("omegaconf", omegaconf), ("hydra", hydra),
                      ("calvin_env", calvin_env),
                      ("calvin_env.envs", envs),
                      ("calvin_env.envs.play_table_env", pte)]:
        monkeypatch.setitem(sys.modules, name, mod)


def _conf_tree(tmp_path: Path) -> Path:
    conf = tmp_path / "conf"
    (conf / "callbacks/rollout/tasks").mkdir(parents=True)
    (conf / "annotations").mkdir(parents=True)
    (conf / "callbacks/rollout/tasks/new_playtable_tasks.yaml").write_text("x")
    (conf / "annotations/new_playtable_validation.yaml").write_text("x")
    return conf


def test_make_calvin_env_contract(monkeypatch, tmp_path):
    record = {"loaded": []}
    _install_stubs(monkeypatch, record)
    _conf_tree(tmp_path)
    seqs = [[{"robot_obs": [0.0] * 15}, ["push_red_block"]]]
    seq_path = tmp_path / "eval_sequences.json"
    seq_path.write_text(json.dumps(seqs))
    (tmp_path / "calvin/validation").mkdir(parents=True)

    from deer_vla_tpu.cli.eval import _make_calvin_env

    args = types.SimpleNamespace(
        calvin_conf_path=str(tmp_path / "conf"),
        calvin_dataset=str(tmp_path / "calvin"),
        eval_sequences=str(seq_path))
    env, oracle, sequences, annotations = _make_calvin_env(args)

    # hydra oracle instantiated from the tasks yaml
    assert record["instantiated"]["_target_"].endswith("Tasks")
    # env points at <dataset>/validation
    assert record["env_path"].endswith("validation")
    # annotations keep the FIRST instruction per task (eval_utils.py:513-516)
    assert annotations["push_red_block"] == "push the red block"
    # frozen sequences loaded
    assert len(sequences) == 1
    # EGL rendering selected for the sim (eval_calvin.py:14)
    import os
    assert os.environ.get("PYOPENGL_PLATFORM") == "egl"

    # the pieces satisfy the rollout loop's protocol surface
    assert callable(getattr(oracle, "get_task_info_for_set"))
    assert oracle.get_task_info_for_set(env.get_info(), env.get_info(),
                                        {"push_red_block"}) == set()


def test_rollout_drives_stub_oracle(monkeypatch, tmp_path):
    """evaluate_sequence runs against the stubbed oracle/env contract: the
    reset path accepts a chain initial_state and the oracle is queried with
    set-typed subtasks."""
    record = {"loaded": []}
    _install_stubs(monkeypatch, record)

    from deer_vla_tpu.eval.rollout import (DebugEnv, evaluate_sequence,
                                           reset_env_to_initial_state)

    calls = []

    class StrictOracle:
        def get_task_info_for_set(self, start_info, current_info, subtasks):
            assert isinstance(subtasks, (set, frozenset))
            calls.append(subtasks)
            return set(subtasks)  # immediate success

    class _Adapter:
        policy = types.SimpleNamespace(set_timestep=lambda t: None)
        current_exit_layer = 1
        llm_time = 0.0

        def reset(self):
            pass

        def step(self, obs, goal):
            return np.zeros(7, np.float32)

    env = DebugEnv()
    reset_env_to_initial_state(env, {"robot_obs": np.zeros(15),
                                     "scene_obs": np.zeros(24)})
    n, s_exits, f_exits, s_steps, s_times = evaluate_sequence(
        env, _Adapter(), StrictOracle(), {},
        ["push_red_block", "lift_blue_block"],
        {"push_red_block": "p", "lift_blue_block": "l"}, ep_len=5)
    assert n == 2 and calls and all(isinstance(c, set) for c in calls)
