"""Online Bayesian-optimization threshold search — bayesian_optimization.py
equivalent.

Procedure (reference :53-165):
  1. initial point: one eval run with exp-distribution-solved thresholds;
     the exp solution's avg exit layer becomes the compute budget
  2. gp-minimize 5 thresholds in a box around the init point
     (+-0.02 for t0, +-0.002 for t1..t4; last threshold fixed at 1e5)
  3. objective = -avg_success_len + (avg_exit - budget)^+   (:19-24)

Evaluations run the eval CLI in-process and parse its last three stdout
lines (the same contract the reference parses from log files :10-17).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os


def run_eval(eval_args) -> tuple:
    """Run cli.eval capturing stdout; return (thresholds, avg_len, avg_exit)."""
    from deer_vla_tpu.cli import eval as eval_cli
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_cli.main(eval_args)
    lines = [l for l in buf.getvalue().strip().splitlines() if l.strip()]
    thresholds = [float(x) for x in lines[-3].split(",")] if lines[-3] else []
    return thresholds, float(lines[-2]), float(lines[-1])


from deer_vla_tpu.utils.errors import record


def run_parallel_bo(args, base, init_th, init_len, init_exit, bounds,
                    score):
    """q candidates per GP round, ALL evaluated in ONE batched rollout:
    lanes split into q blocks, each block running its candidate's
    thresholds through the engine's (B, n_layers) per-stream threshold
    array (eval/batched_rollout.py candidates=).  The reference evaluates
    each candidate as a separate serial torchrun eval
    (bayesian_optimization.py:130-144) — here one device program advances
    every candidate's streams together."""
    import dataclasses

    from deer_vla_tpu.cli.eval import _make_calvin_env, load_model
    from deer_vla_tpu.cli.train import make_tokenizer
    from deer_vla_tpu.eval.batched_rollout import evaluate_policy_batched
    from deer_vla_tpu.eval.rollout import (DebugEnv, DebugTaskOracle,
                                           make_debug_sequences)
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.utils.gp_opt import gp_minimize_lite_batch

    q = args.parallel
    b = q * args.lanes_per_candidate
    cfg, params = load_model(args)
    tok = make_tokenizer(args, cfg)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    policy = ScanDeerPolicy(params, cfg,
                            max_layer=args.max_layer if args.max_layer > 0
                            else None)
    if cfg.head_type == "diffusion":
        # batched DDPM plan sampling around the candidates' lanes (the
        # thresholds being optimized act on the feature deltas; the plan
        # wrapper is downstream of the exit decision)
        from deer_vla_tpu.eval.diffusion_policy import BatchedDiffusionSampler
        policy = BatchedDiffusionSampler(policy, params, seed=args.seed)
    if args.debug or not args.calvin_conf_path:
        envs = [DebugEnv(img_hw=cfg.vit.image_size,
                         grip_hw=cfg.vit.image_size) for _ in range(b)]
        oracle = DebugTaskOracle(threshold=0.05)
        sequences = make_debug_sequences(args.num_seq)
        annotations = {}
        ep_len = 40
    else:
        env0, oracle, sequences, annotations = _make_calvin_env(args)
        envs = [env0] + [_make_calvin_env(args)[0] for _ in range(b - 1)]
        ep_len = 360
    sequences = sequences[:args.num_seq]

    n_free = len(init_th) - 1

    def objective_batch(points):
        cands = [list(p) + [1e5] for p in points]
        reports = evaluate_policy_batched(
            policy, envs, sequences, annotations, oracle, tok,
            text_len=cfg.text_len, ep_len=ep_len, n_layers=cfg.n_layers,
            pipeline=args.pipeline, candidates=cands)
        out = []
        for th, rep in zip(cands, reports):
            s = score(rep["avg_seq_len"], rep["avg_exit_layer"] - 1)
            print(f"BO eval thresholds={['%.5f' % t for t in th]} "
                  f"len={rep['avg_seq_len']:.4f} "
                  f"exit={rep['avg_exit_layer'] - 1:.3f} score={s:.4f}")
            out.append(s)
        return out

    result = gp_minimize_lite_batch(
        objective_batch, bounds, q=q, x0=[init_th[:n_free]],
        y0=[score(init_len, init_exit)], n_calls=args.n_calls,
        acq_func=args.acq_func, random_state=args.seed)
    print("Optimal thresholds:", [round(t, 6) for t in result.x] + [1e5])
    print("Best score:", result.fun)
    return result


@record
def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--evaluate_from_checkpoint", default="")
    p.add_argument("--num_seq", type=int, default=56)
    p.add_argument("--acq_func", default="EI", choices=["EI", "LCB", "PI"])
    p.add_argument("--n_calls", type=int, default=20)
    p.add_argument("--init_exit_ratio", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--t0_box", type=float, default=0.02)
    p.add_argument("--t_box", type=float, default=0.002)
    p.add_argument("--parallel", type=int, default=1,
                   help=">1: evaluate this many BO candidates per GP round "
                        "in ONE batched rollout (constant-liar q-batch "
                        "acquisition; lanes split across candidates)")
    p.add_argument("--lanes_per_candidate", type=int, default=4)
    p.add_argument("--pipeline", type=int, default=1)
    p.add_argument("--model", default="tiny")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--max_layer", type=int, default=-1)
    p.add_argument("--tokenizer_path", default="")
    p.add_argument("--calvin_conf_path", default="")
    p.add_argument("--calvin_dataset",
                   default=os.environ.get("calvin_dataset_path", ""))
    p.add_argument("--eval_sequences", default="eval_sequences.json")
    args = p.parse_args(argv)

    base = []
    if args.evaluate_from_checkpoint:
        base += ["--evaluate_from_checkpoint", args.evaluate_from_checkpoint]
    if args.debug:
        base += ["--debug"]
    base += ["--num_seq", str(args.num_seq)]
    # model/config flags forwarded so every eval (incl. the init/budget
    # anchor for --parallel) sees the same model the objective runs —
    # a mismatched --max_layer would produce more init thresholds than
    # the truncated policy has exits
    base += ["--model", args.model, "--precision", args.precision,
             "--seed", str(args.seed)]
    if args.max_layer > 0:
        base += ["--max_layer", str(args.max_layer)]
    if args.tokenizer_path:
        base += ["--tokenizer_path", args.tokenizer_path]
    if args.calvin_conf_path:
        base += ["--calvin_conf_path", args.calvin_conf_path,
                 "--calvin_dataset", args.calvin_dataset,
                 "--eval_sequences", args.eval_sequences]

    # 1) initial point from exp-solved thresholds
    init_th, init_len, init_exit = run_eval(
        base + ["--exit_ratio", str(args.init_exit_ratio)])
    budget = init_exit
    print(f"init thresholds={init_th} avg_len={init_len} avg_exit={init_exit}")

    n_free = len(init_th) - 1  # last threshold stays 1e5 (catch-all)
    if n_free < 1:
        print("nothing to optimize (single exit)")
        return
    boxes = [args.t0_box] + [args.t_box] * (n_free - 1)
    bounds = [(init_th[i] - boxes[i], init_th[i] + boxes[i])
              for i in range(n_free)]

    def score(avg_len, avg_exit):
        return -avg_len + max(0.0, avg_exit - budget)  # :19-24

    if args.parallel > 1:
        return run_parallel_bo(args, base, init_th, init_len, init_exit,
                               bounds, score)

    def objective(ts):
        th = list(ts) + [1e5]
        _, avg_len, avg_exit = run_eval(
            base + ["--thresholds"] + [str(t) for t in th])
        s = score(avg_len, avg_exit)
        print(f"BO eval thresholds={['%.5f' % t for t in th]} "
              f"len={avg_len:.4f} exit={avg_exit:.3f} score={s:.4f}")
        return s

    from deer_vla_tpu.utils.gp_opt import gp_minimize_lite
    result = gp_minimize_lite(
        objective, bounds, x0=[init_th[:n_free]],
        y0=[score(init_len, init_exit)], n_calls=args.n_calls,
        acq_func=args.acq_func, random_state=args.seed)
    print("Optimal thresholds:", [round(t, 6) for t in result.x] + [1e5])
    print("Best score:", result.fun)
    return result


if __name__ == "__main__":
    main()
