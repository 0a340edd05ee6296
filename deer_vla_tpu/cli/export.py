"""Export a checkpoint's fused serving step to an AOT StableHLO artifact.

The reference has no deployment path beyond re-running the Python eval
stack per host (eval_calvin.py:543-577).  This emits a version-stable,
weight-free program artifact (serving/export.py) that a TPU serving host
deserializes and runs without the model's Python code ever tracing.

  python -m deer_vla_tpu.cli.export \\
      --evaluate_from_checkpoint runs/d/deer_3.ckpt \\
      --out runs/d/deer_3.step --platforms tpu cpu --check

--check reloads the artifact and verifies one step against the live jitted
engine on the current backend (bit-exact).
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
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=1,
                   help="stream count baked into the artifact's shapes")
    p.add_argument("--platforms", nargs="+", default=["tpu"],
                   help="lowering targets (cross-platform export works "
                        "from any host)")
    p.add_argument("--threshold_type", default="L2")
    p.add_argument("--max_layer", type=int, default=-1)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--gripper_res", type=int, default=-1,
                   help="native-resolution gripper tower baked into the "
                        "exported program's input shapes (see deer-eval "
                        "--gripper_res). -1 = inherit the checkpoint config")
    p.add_argument("--quantize", default="none",
                   choices=["none", "int8", "int8_w8a8", "int4", "int4_w8a8"],
                   help="bake the weight-only int8 stacked layout "
                        "(ops/quant.py) into the artifact; the serving "
                        "host quantizes checkpoint weights to match")
    p.add_argument("--bundle", action="store_true",
                   help="also write <out>.weights: the packed serving "
                        "weight trees, making the artifact fully "
                        "self-contained (serving/export.BundledScanPolicy "
                        "runs it with no checkpoint and no model-building "
                        "Python; with --quantize int8 the weights ship "
                        "quantized, ~2x smaller)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--check", action="store_true",
                   help="reload + run one step vs the live engine")
    return p


@record
def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import numpy as np

    from deer_vla_tpu.cli.eval import load_model
    from deer_vla_tpu.serving.export import (ExportedScanPolicy,
                                             export_policy, save_exported)

    cfg, params = load_model(args)
    if args.gripper_res >= 0:  # -1 = inherit the (sidecar) config
        import dataclasses
        if args.gripper_res and args.gripper_res % cfg.vit.patch_size:
            raise SystemExit(f"--gripper_res must be a multiple of the "
                             f"ViT patch size {cfg.vit.patch_size}")
        cfg = dataclasses.replace(cfg, gripper_res=args.gripper_res)
    quantize = None if args.quantize == "none" else args.quantize
    out = export_policy(
        params, cfg, batch_size=args.batch,
        platforms=tuple(args.platforms),
        threshold_type=args.threshold_type,
        max_layer=args.max_layer if args.max_layer > 0 else None,
        quantize=quantize, return_policy=args.bundle)
    if args.bundle:
        import os

        from deer_vla_tpu.serving.export import save_bundle
        blob, meta, policy = out
        save_bundle(args.out, blob, meta, policy)
        wbytes = os.path.getsize(args.out + ".weights")
    else:
        blob, meta = out
        save_exported(args.out, blob, meta)
        wbytes = 0
    print(json.dumps({"out": args.out, "bytes": len(blob),
                      "weight_bytes": wbytes,
                      "exits": meta["exits"],
                      "platforms": meta["platforms"]}))

    if args.check:
        backend = jax.default_backend()
        if backend not in args.platforms:
            print(f"--check skipped: current backend {backend!r} not in "
                  f"export platforms {args.platforms}")
            return 0
        from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
        kw = dict(threshold_type=args.threshold_type,
                  max_layer=args.max_layer if args.max_layer > 0 else None,
                  quantize=quantize)
        live = ScanDeerPolicy(params, cfg, **kw)
        aot = ExportedScanPolicy(args.out, params, cfg, **kw)
        r = np.random.RandomState(0)
        enc_w = (cfg.window_size
                 if (cfg.fusion_mode == "vit_concat" or cfg.use_hist) else 1)
        rows = args.batch * enc_w
        hw, s = cfg.vit.image_size, cfg.text_len
        ghw = cfg.gripper_res or hw  # native-res gripper tower
        img = r.randn(rows, 1, 1, 3, hw, hw).astype(np.float32)
        grip = r.randn(rows, 1, 1, 3, ghw, ghw).astype(np.float32)
        trows = rows if cfg.use_hist else args.batch
        ids = np.full((trows, s), 7, np.int32)
        ids[:, 0] = cfg.media_token_id
        mask = np.ones((trows, s), np.int32)
        state = None
        if cfg.use_state or cfg.head.use_state:
            state = r.randn(rows, 1, 1, cfg.state_dim).astype(np.float32)
        a_live = live.step(img, grip, ids, mask, state)
        a_aot = aot.step(img, grip, ids, mask, state)
        ok = bool(np.array_equal(a_live, a_aot))
        print(json.dumps({"check": "bit-exact" if ok else "MISMATCH",
                          "live": a_live.reshape(-1)[:3].tolist(),
                          "aot": a_aot.reshape(-1)[:3].tolist()}))
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
