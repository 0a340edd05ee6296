"""Checkpoint-sweep evaluation — eval_ckpts.py + pt_eval_ckpts.bash
equivalent.

Iterates (checkpoint x exit_ratio), skips combinations whose log file already
exists (restartable sweeps, eval_ckpts.py:58-60), and runs the eval CLI
in-process (one JAX runtime drives the chips; no torchrun respawn per run).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


from deer_vla_tpu.utils.errors import record


@record
def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--log_dir", default="")
    p.add_argument("--exit_ratio", type=float, nargs="+", default=[1.0])
    p.add_argument("--max_layer", type=int, default=-1)
    p.add_argument("--num_seq", type=int, default=224)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--pattern", default="*_[0-9]*.ckpt")
    p.add_argument("--include_ema", action="store_true",
                   help="also sweep <name>_ema.ckpt siblings (--ema_decay "
                        "training); excluded by default so epoch ckpts "
                        "aren't double-counted")
    p.add_argument("extra", nargs=argparse.REMAINDER,
                   help="extra args forwarded to cli.eval")
    args = p.parse_args(argv)

    log_dir = args.log_dir or os.path.join("log_" + args.ckpt_dir.strip("/").replace("/", "_"))
    os.makedirs(log_dir, exist_ok=True)

    ckpts = sorted(glob.glob(os.path.join(args.ckpt_dir, args.pattern)))
    if not args.include_ema:
        ckpts = [c for c in ckpts if not c.endswith("_ema.ckpt")]
    if not ckpts:
        print(f"no checkpoints matching {args.pattern} in {args.ckpt_dir}")
        return 1

    from deer_vla_tpu.cli import eval as eval_cli

    for ckpt in ckpts:
        for ratio in args.exit_ratio:
            name = os.path.basename(ckpt).replace(".ckpt", "")
            log_file = os.path.join(log_dir, f"{name}_ratio{ratio}.log")
            if os.path.exists(log_file) and os.path.getsize(log_file) > 0:
                print(f"skip (done): {log_file}")
                continue
            print(f"eval {ckpt} exit_ratio={ratio} -> {log_file}")
            eval_args = ["--evaluate_from_checkpoint", ckpt,
                         "--exit_ratio", str(ratio),
                         "--num_seq", str(args.num_seq),
                         "--max_layer", str(args.max_layer)]
            if args.debug:
                eval_args.append("--debug")
            eval_args += [a for a in args.extra if a != "--"]
            if not any(a == "--report_json" or a.startswith("--report_json=")
                       for a in eval_args):
                # machine-readable sweep results beside the logs
                eval_args += ["--report_json", log_file[:-4] + ".json"]
            # capture stdout to the log file (tail is the BO contract)
            old = sys.stdout
            try:
                with open(log_file, "w") as f:
                    sys.stdout = f
                    eval_cli.main(eval_args)
            finally:
                sys.stdout = old
            with open(log_file) as f:
                tail = f.readlines()[-3:]
            print("  result:", " | ".join(x.strip() for x in tail))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
