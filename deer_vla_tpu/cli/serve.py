"""Serve a DeeR checkpoint as an HTTP action service (serving/server.py).

The reference's only deployment story is re-running the Python eval stack
(eval_calvin.py:543-577); this stands up a long-lived TPU serving host:

  deer-serve --evaluate_from_checkpoint runs/d/deer_3.ckpt \\
      --exit_ratio 0.8 --port 8000
  deer-serve --artifact runs/d/deer_3.step \\
      --evaluate_from_checkpoint runs/d/deer_3.ckpt --port 8000   # AOT

Thresholds come from (in priority order): --thresholds direct values (the
BO output contract), the checkpoint's calibration-values sidecar solved at
--exit_ratio (train/checkpoint.load_calibration_values +
models/value_net.solve_thresholds — no dataset needed at serve time), or
full depth with a warning.
"""

from __future__ import annotations

import argparse
import json

from deer_vla_tpu.utils.errors import record


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--evaluate_from_checkpoint", default="")
    p.add_argument("--model", default="tiny",
                   help="config name when no checkpoint is given")
    p.add_argument("--artifact", default="",
                   help="AOT StableHLO serving artifact (deer-export); the "
                        "model program then never traces on this host")
    p.add_argument("--bundle", default="",
                   help="self-contained bundle (deer-export --bundle): "
                        "artifact + packed weights — no checkpoint and no "
                        "model-building Python on this host")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_streams", type=int, default=64)
    p.add_argument("--batch_lanes", type=int, default=0,
                   help=">0: micro-batching serving core "
                        "(serving/batcher.py) — concurrent streams share "
                        "ONE batched program per device step (~2x "
                        "aggregate throughput at 32 lanes on one chip); "
                        "capacity = this many streams. Deterministic head "
                        "only; window-folded (vit_concat/use_hist) and "
                        "proprio (robot_obs per request) models supported")
    p.add_argument("--batch_window_ms", type=float, default=5.0,
                   help="micro-batch collection window after the first "
                        "pending request")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_layer", type=int, default=-1)
    p.add_argument("--tokenizer_path", default="")
    p.add_argument("--exit_ratio", type=float, default=0.8)
    p.add_argument("--exit_dist", default="exp",
                   choices=["exp", "gauss", "gamma"])
    p.add_argument("--threshold_type", default="L2")
    p.add_argument("--thresholds", type=float, nargs="+", default=None,
                   help="direct per-exit thresholds (BO output); overrides "
                        "the sidecar solve")
    p.add_argument("--steps_per_stage", type=int, default=1)
    p.add_argument("--vit_tome_r", type=int, default=0,
                   help="ToMe token merging in the ViT tower (ops/tome.py): "
                        "merge N patch-token pairs per layer. Weight-free "
                        "opt-in vision-FLOPs cut; validate task success "
                        "before production. 0 = exact (default)")
    p.add_argument("--gripper_res", type=int, default=-1,
                   help="native-resolution gripper tower (see deer-eval "
                        "--gripper_res). -1 = inherit the checkpoint "
                        "config; 0 = force off")
    p.add_argument("--quantize", default="none",
                   choices=["none", "int8", "int8_w8a8", "int4", "int4_w8a8"])
    p.add_argument("--tcp_rel", action="store_true")
    p.add_argument("--diff_steps", type=int, default=0,
                   help="diffusion head: >0 samples with a DDIM "
                        "subsequence of this many U-Net evals instead of "
                        "the full DDPM chain")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--oneshot_healthz", action="store_true",
                   help="bind, print healthz JSON, exit (smoke testing)")
    return p


def build_core(args):
    """Engine + tokenizer + server core (separated for tests)."""
    import dataclasses

    from deer_vla_tpu.cli.train import make_tokenizer
    from deer_vla_tpu.serving.server import DeerActionServer

    params = None
    if args.bundle:
        # fully self-contained: AOT program + packed weights; the tokenizer
        # is rebuilt from the bundled config (same vocab contract as
        # cli.train.make_tokenizer)
        from deer_vla_tpu.serving.export import BundledScanPolicy
        policy = BundledScanPolicy(args.bundle,
                                   steps_per_stage=args.steps_per_stage)
        cfg = policy.cfg
        tok = make_tokenizer(args, cfg)
        if tok.media_token_id != cfg.media_token_id:
            raise SystemExit(
                f"bundle media_token_id {cfg.media_token_id} != tokenizer's "
                f"{tok.media_token_id}: serve with the tokenizer the model "
                "was trained with (--tokenizer_path)")
        if cfg.head_type == "diffusion":
            raise SystemExit("diffusion-head serving needs the U-Net "
                             "params; serve from the checkpoint instead "
                             "of a bundle")
    else:
        from deer_vla_tpu.cli.eval import load_model
        from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
        cfg, params = load_model(args)
        tok = make_tokenizer(args, cfg)
        cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
        if args.vit_tome_r > 0:  # weight-free: safe post-load (cli/eval.py)
            cfg = dataclasses.replace(
                cfg, vit=dataclasses.replace(cfg.vit,
                                             tome_r=args.vit_tome_r))
        if args.gripper_res >= 0:  # -1 = inherit the (sidecar) config
            if args.gripper_res and args.gripper_res % cfg.vit.patch_size:
                raise SystemExit(f"--gripper_res must be a multiple of "
                                 f"the ViT patch size {cfg.vit.patch_size}")
            cfg = dataclasses.replace(cfg, gripper_res=args.gripper_res)
        max_layer = args.max_layer if args.max_layer > 0 else None
        quantize = None if args.quantize == "none" else args.quantize

        kw = dict(threshold_type=args.threshold_type, max_layer=max_layer,
                  steps_per_stage=args.steps_per_stage, quantize=quantize)
        if args.artifact:
            from deer_vla_tpu.serving.export import ExportedScanPolicy
            policy = ExportedScanPolicy(args.artifact, params, cfg, **kw)
        else:
            policy = ScanDeerPolicy(params, cfg, **kw)

    thresholds = _resolve_thresholds(args, policy)
    policy.set_thresholds(thresholds)
    if args.batch_lanes > 0:
        from deer_vla_tpu.serving.batcher import BatchedActionServer
        if args.bundle or args.artifact:
            raise SystemExit("--batch_lanes serves the live engine only "
                             "(AOT artifacts bake a fixed batch; export "
                             "with --batch matching and use the "
                             "per-stream core)")
        if args.tcp_rel:
            raise SystemExit("--batch_lanes does not apply the tcp->world "
                             "action-frame conversion; serve tcp_rel "
                             "models with the per-stream core")
        if cfg.head_type == "diffusion":
            # batched DDPM/DDIM plan sampling: per-lane histories + rng
            # counters around the batched feature program; clients receive
            # (k, 7) plans under the usual "action" key
            from deer_vla_tpu.eval.diffusion_policy import \
                BatchedDiffusionSampler
            policy = BatchedDiffusionSampler(
                policy, params, seed=args.seed,
                sample_steps=args.diff_steps, ddim_eta=args.ddim_eta)
        return BatchedActionServer(policy, tok, lanes=args.batch_lanes,
                                   window_ms=args.batch_window_ms), cfg
    if cfg.head_type == "diffusion":
        # DDPM sampling wrapper: exit features -> (k, 7) action plans
        # (clients receive the plan; eval_utils.py:388-419 use_diff branch)
        from deer_vla_tpu.eval.diffusion_policy import DiffusionSamplerPolicy
        policy = DiffusionSamplerPolicy(policy, params, seed=args.seed,
                                        sample_steps=args.diff_steps,
                                        ddim_eta=args.ddim_eta)
    return DeerActionServer(policy, tok, max_streams=args.max_streams,
                            tcp_rel=args.tcp_rel), cfg


def _resolve_thresholds(args, policy):
    exits = list(policy.exits)
    if args.thresholds:
        if len(args.thresholds) != len(exits):
            raise SystemExit(f"--thresholds needs {len(exits)} values "
                             f"(exits {exits})")
        return list(args.thresholds)
    if args.evaluate_from_checkpoint:
        from deer_vla_tpu.models.value_net import solve_thresholds
        from deer_vla_tpu.train.checkpoint import load_calibration_values
        values = load_calibration_values(args.evaluate_from_checkpoint)
        if values is not None:
            th, probs = solve_thresholds(
                values, args.exit_ratio, exits,
                max_layer=exits[-1] + 1, exit_dist=args.exit_dist,
                model_name=getattr(args, "model", "mpt_dolly_3b"))
            print(json.dumps({"thresholds": {str(k): float(v)
                                             for k, v in th.items()},
                              "exit_probs": [round(float(p), 4)
                                             for p in probs]}))
            return th
    print("WARNING: no calibration values sidecar and no --thresholds — "
          "serving at FULL DEPTH (no early exit). Run cli.eval with "
          "--calib_batches to produce the sidecar, or pass --thresholds.")
    return [-1e30] * (len(exits) - 1) + [1e30]


@record
def main(argv=None):
    args = build_parser().parse_args(argv)
    from deer_vla_tpu.serving.server import make_server

    core, cfg = build_core(args)
    httpd = make_server(core, host=args.host, port=args.port)
    host, port = httpd.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "exits": core.healthz()["exits"],
                      "head_type": cfg.head_type,
                      "aot": bool(args.artifact or args.bundle)}),
          flush=True)
    if args.oneshot_healthz:
        print(json.dumps(core.healthz()))
        httpd.server_close()
        return 0
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        if hasattr(core, "shutdown"):
            core.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
