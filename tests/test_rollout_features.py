"""Rollout extras: multi-step action queues, diverse-inst annotations,
sequence/annotation generators, grad accumulation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import init_deer


def test_sequence_and_annotation_generators(tmp_path):
    from deer_vla_tpu.eval.sequences import (generate_annotation_cache,
                                             generate_sequences,
                                             save_annotation_cache,
                                             save_sequences)
    tasks = ["open_drawer", "lift_red_block"]
    seqs = generate_sequences(tasks, n=6, seed=1)
    assert len(seqs) == 6 and len(seqs[0][1]) == 5
    assert generate_sequences(tasks, n=6, seed=1) == seqs  # deterministic
    cache = generate_annotation_cache(
        seqs, {"open_drawer": ["pull the drawer open"]},
        {"lift_red_block": "pick up the red block"})
    assert len(cache) == 6 and len(cache[0]) == 5
    p = tmp_path / "seq.json"
    save_sequences(str(p), seqs)
    from deer_vla_tpu.eval.rollout import load_eval_sequences
    assert load_eval_sequences(str(p))[0][1] == seqs[0][1]
    save_annotation_cache(str(tmp_path / "cache.json"), cache)


def test_resolve_annotation_diverse():
    from deer_vla_tpu.eval.rollout import resolve_annotation
    assert resolve_annotation({"t": "do t"}, "t") == "do t"
    cache = [["a0", "a1"], ["b0", "b1"]]
    assert resolve_annotation(cache, "whatever", seq_i=1, subtask_i=0) == "b0"


def test_multi_step_action_queue():
    """A policy returning (k, 7) plans must be stepped only every k env
    steps (planned_actions queue)."""
    from deer_vla_tpu.eval.rollout import DebugEnv, DebugTaskOracle, rollout

    calls = {"n": 0}

    class FakePolicy:
        cfg = deer_tiny()
        last_exit_layer = 3

        def set_timestep(self, t):
            pass

        def reset(self):
            pass

    class FakeAdapter:
        policy = FakePolicy()
        current_exit_layer = 3
        llm_time = 0.0

        def reset(self):
            pass

        def step(self, obs, goal):
            calls["n"] += 1
            return np.tile(np.array([0.2, 0, 0, 0, 0, 0, 1.0], np.float32),
                           (3, 1))  # plan of 3 actions

    env = DebugEnv(img_hw=28, grip_hw=28)
    oracle = DebugTaskOracle(threshold=1e9)  # never succeed
    ok, exits, n_steps, _ = rollout(env, FakeAdapter(), oracle, "t", "do t",
                                    ep_len=9)
    assert not ok and n_steps == 9
    assert calls["n"] == 3  # one policy call per 3 env steps
    # metrics are per ENV STEP (reference accounting, eval_utils.py:664-666)
    assert len(exits) == 9


def test_grad_accum_matches_full_batch():
    from deer_vla_tpu.models.flamingo import trainable_mask
    from deer_vla_tpu.train.optimizer import make_optimizer
    from deer_vla_tpu.train.train_step import init_train_state, make_train_step

    cfg = deer_tiny()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    mask_t = trainable_mask(params, cfg, "joint")
    opt = make_optimizer(params, cfg, phase="joint", learning_rate=1e-3,
                         warmup_steps=0, total_steps=10, trainable=mask_t)

    r = np.random.RandomState(0)
    bs, w, s = 4, cfg.window_size, cfg.text_len
    ids = np.full((bs * w, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    batch = {
        "image": jnp.asarray(r.randn(bs * w, 1, 1, 3, 28, 28), jnp.float32),
        "gripper": jnp.asarray(r.randn(bs * w, 1, 1, 3, 28, 28), jnp.float32),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((bs * w, s), jnp.int32),
        "labels": jnp.asarray(np.clip(r.randn(bs, w, 7), -1, 1), jnp.float32),
    }

    step1 = make_train_step(cfg, opt, donate=False, grad_accum=1)
    step2 = make_train_step(cfg, opt, donate=False, grad_accum=2)
    # NOTE: forward_train samples random exit indices per microbatch, so
    # grads differ statistically; compare with a fixed rng by folding — here
    # we check the mechanism (finite loss, params move, grad norms close).
    s1, m1 = step1(init_train_state(params, opt), batch, jax.random.PRNGKey(5))
    s2, m2 = step2(init_train_state(params, opt), batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(m2["loss"]))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 0.2
    d = np.max(np.abs(
        np.asarray(s2.params["extra_exit"]["rnn"]["layers"][0]["wi"])
        - np.asarray(params["extra_exit"]["rnn"]["layers"][0]["wi"])))
    assert d > 0


def test_eval_policy_feeds_state():
    """State-trained models get proprio at eval: state_fc token + head
    embed_state change the action; the adapter forwards robot_obs."""
    import jax.numpy as jnp
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.eval.rollout import CalvinPolicyAdapter, DebugEnv

    base = deer_tiny()
    tok = HashTokenizer(vocab_size=base.mpt.vocab_size,
                        max_length=base.text_len)
    cfg = dataclasses.replace(
        base, use_state=True, media_token_id=tok.media_token_id,
        head=dataclasses.replace(base.head, use_state=True))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    pol = DeerPolicy(params, cfg, exit_id=3)
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(1, 1, 1, 3, 28, 28), jnp.float32)
    ids = np.full((1, cfg.text_len), 3, np.int32)
    ids[0, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((1, cfg.text_len), jnp.int32)
    state = jnp.asarray(r.randn(1, 1, 1, cfg.state_dim), jnp.float32)
    a0 = pol.step(img, img, ids, mask)
    pol.reset()
    a1 = pol.step(img, img, ids, mask, state=state)
    assert np.all(np.isfinite(a0)) and np.all(np.isfinite(a1))
    assert not np.allclose(a0, a1), "state must influence the action"

    adapter = CalvinPolicyAdapter(pol, tok, text_len=cfg.text_len)
    env = DebugEnv(img_hw=28, grip_hw=28)
    act = adapter.step(env.get_obs(), "do something")  # robot_obs forwarded
    assert act.shape == (7,) and np.all(np.isfinite(act))


def test_visualize_saves_rollout_gifs(tmp_path):
    """--visualize writes one GIF per subtask episode, tagged ok/fail, with
    one frame per env step plus the initial observation (the reference
    collects an img_queue it never saves, eval_utils.py:649-678)."""
    from deer_vla_tpu.eval.rollout import (DebugEnv, DebugTaskOracle,
                                           evaluate_sequence)

    class FakePolicy:
        cfg = deer_tiny()
        last_exit_layer = 1

        def set_timestep(self, t):
            pass

        def reset(self):
            pass

    class FakeAdapter:
        policy = FakePolicy()
        current_exit_layer = 1
        llm_time = 0.0

        def reset(self):
            pass

        def step(self, obs, goal):
            # big arm motion -> every frame differs (PIL merges identical
            # consecutive GIF frames, which would undercount n_frames)
            return np.array([1.0, 0, 0, 0, 0, 0, 1.0], np.float32)

    env = DebugEnv(img_hw=28, grip_hw=28)
    oracle = DebugTaskOracle(threshold=1e9)  # never succeed: fail at ep_len
    evaluate_sequence(env, FakeAdapter(), oracle, {}, ["task_a"],
                      {"task_a": "do a"}, ep_len=5,
                      visualize_dir=str(tmp_path))
    files = sorted(tmp_path.glob("*.gif"))
    assert len(files) == 1 and files[0].name.endswith("_fail.gif")
    from PIL import Image
    with Image.open(files[0]) as im:
        # initial obs + 5 steps = up to 6 frames; GIF palette quantization
        # may merge near-identical consecutive frames, so assert animation
        # exists rather than the exact count
        assert 3 <= im.n_frames <= 6
        assert im.size == (28, 28)

    # success episodes are tagged ok
    oracle_ok = DebugTaskOracle(threshold=0.0)
    evaluate_sequence(env, FakeAdapter(), oracle_ok, {}, ["task_b"],
                      {"task_b": "do b"}, ep_len=5,
                      visualize_dir=str(tmp_path))
    assert any(f.name.endswith("_ok.gif") for f in tmp_path.glob("*.gif"))


def test_reset_mode_resets_env_per_subtask():
    """--reset (eval_utils.py:603-606): the env returns to the chain's
    initial state before EVERY subtask, not just at chain start."""
    from deer_vla_tpu.eval.rollout import (DebugEnv, DebugTaskOracle,
                                           evaluate_sequence)

    resets = []

    class CountingEnv(DebugEnv):
        def reset(self, robot_obs=None, scene_obs=None):
            resets.append((robot_obs is not None) or (scene_obs is not None))
            return super().reset(robot_obs, scene_obs)

    class FakePolicy:
        cfg = deer_tiny()
        last_exit_layer = 1

        def set_timestep(self, t):
            pass

        def reset(self):
            pass

    class FakeAdapter:
        policy = FakePolicy()
        current_exit_layer = 1
        llm_time = 0.0

        def reset(self):
            pass

        def step(self, obs, goal):
            return np.array([0.2, 0, 0, 0, 0, 0, 1.0], np.float32)

    env = CountingEnv(img_hw=28, grip_hw=28)
    oracle = DebugTaskOracle(threshold=0.0)  # succeed instantly
    initial_state = {"robot_obs": np.zeros(15), "scene_obs": np.zeros(24)}
    seq = ["a", "b", "c"]
    ann = {"a": ["do a"], "b": ["do b"], "c": ["do c"]}

    resets.clear()
    n, *_ = evaluate_sequence(env, FakeAdapter(), oracle, initial_state,
                              seq, ann, ep_len=4, reset=False)
    assert n == 3 and len(resets) == 1  # chain start only

    resets.clear()
    n, *_ = evaluate_sequence(env, FakeAdapter(), oracle, initial_state,
                              seq, ann, ep_len=4, reset=True)
    assert n == 3 and len(resets) == 3  # before every subtask
