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
    args = p.parse_args(argv)

    base = []
    if args.evaluate_from_checkpoint:
        base += ["--evaluate_from_checkpoint", args.evaluate_from_checkpoint]
    if args.debug:
        base += ["--debug"]
    base += ["--num_seq", str(args.num_seq)]

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
