#!/usr/bin/env python
"""Elastic multi-host launcher: supervise the training processes, restart on
crash or heartbeat stall.

The reference relies on torchrun + @record for error surfacing only
(SURVEY §5.3 — "error propagation to torchrun, not elastic restarts").
This launcher adds the missing restart loop, built on two pieces the
framework already has:
  * the trainer's heartbeat file (utils/heartbeat.py, written every few
    seconds from the step loop),
  * checkpoint auto-resume (train/checkpoint.find_latest_checkpoint), which
    makes a restart continue from the last saved epoch with exact optimizer
    state.

Usage (single host supervising its local process; run one launcher per host):
  python scripts/launch_elastic.py \
      --heartbeat runs/deer/heartbeat.json --timeout 600 --max_restarts 3 \
      -- python -m deer_vla_tpu.cli.train --run_name runs/deer \
         --coordinator host0:1234 --num_processes 2 --process_id 0 ...

Exit code: the child's final exit code (0 on success), or 17 if restarts
were exhausted on stall/crash.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESTARTS_EXHAUSTED = 17


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="supervise + restart a training command",
        usage="launch_elastic.py [options] -- cmd ...")
    p.add_argument("--heartbeat", required=True,
                   help="heartbeat file the trainer writes (run_dir/heartbeat.json)")
    p.add_argument("--timeout", type=float, default=600.0,
                   help="seconds without a heartbeat before the child is "
                        "declared hung and restarted (first beat gets "
                        "--startup_grace)")
    p.add_argument("--startup_grace", type=float, default=3600.0,
                   help="allowance before the FIRST heartbeat (compiles are slow)")
    p.add_argument("--max_restarts", type=int, default=3)
    p.add_argument("--poll", type=float, default=5.0)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- separated command to supervise")
    args = p.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no command given (pass it after --)")
    args.cmd = cmd
    return args


def run_supervised(args) -> int:
    from deer_vla_tpu.utils.heartbeat import age_seconds

    restarts = 0
    while True:
        start = time.time()
        proc = subprocess.Popen(args.cmd)
        print(f"[elastic] started pid={proc.pid} (attempt {restarts + 1})",
              flush=True)
        stalled = False
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            age = age_seconds(args.heartbeat)
            ran = time.time() - start
            if age is None or age > ran:
                # no beat from THIS incarnation yet
                if ran > args.startup_grace:
                    stalled = True
            elif age > args.timeout:
                stalled = True
            if stalled:
                print(f"[elastic] heartbeat stall "
                      f"(age={age if age is not None else 'none'}); "
                      f"killing pid={proc.pid}", flush=True)
                proc.send_signal(signal.SIGTERM)
                try:
                    proc.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait()
                rc = proc.returncode
                break
            time.sleep(args.poll)
        if rc == 0 and not stalled:
            print("[elastic] clean exit", flush=True)
            return 0
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[elastic] restarts exhausted (rc={rc})", flush=True)
            return RESTARTS_EXHAUSTED
        print(f"[elastic] child rc={rc}; restarting "
              f"({restarts}/{args.max_restarts})", flush=True)


def main(argv=None) -> int:
    return run_supervised(parse_args(argv))


if __name__ == "__main__":
    sys.exit(main())
