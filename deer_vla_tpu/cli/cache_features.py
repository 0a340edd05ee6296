"""Cache RICES retrieval features — upstream
open_flamingo/scripts/cache_rices_features.py equivalent: run the ViT tower
over a dataset's images once and persist the L2-normalized feature index
(npz) so repeated benchmark evals skip the embedding sweep
(`deer-vl-eval --rices --cached_features <file>`).

Example (synthetic smoke):
  python -m deer_vla_tpu.cli.cache_features --task caption --debug \
      --model tiny --output /tmp/feats.npz
"""

from __future__ import annotations

import argparse
import json

from deer_vla_tpu.utils.errors import record


def build_parser():
    p = argparse.ArgumentParser(description="Cache RICES features")
    p.add_argument("--task",
                   choices=["caption", "flickr", "vqa", "textvqa", "vizwiz",
                            "okvqa"],
                   default="caption")
    p.add_argument("--model", default="tiny")
    p.add_argument("--evaluate_from_checkpoint", default="")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--tokenizer_path", default="")
    p.add_argument("--image_dir", default="")
    p.add_argument("--annotations", default="")
    p.add_argument("--questions", default="")
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--output", required=True, help="npz feature index path")
    p.add_argument("--max_layer", type=int, default=-1)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    return p


@record
def main(argv=None):
    args = build_parser().parse_args(argv)
    import dataclasses
    from deer_vla_tpu.cli.eval import load_model
    from deer_vla_tpu.cli.train import make_tokenizer
    from deer_vla_tpu.cli.vl_eval import (build_dataset, preprocess_images,
                                          resolve_paths)
    from deer_vla_tpu.eval.vl_eval import RICES

    cfg, params = load_model(args)
    tok = make_tokenizer(args, cfg)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)

    size = cfg.vit.image_size
    ds = build_dataset(args, size, *resolve_paths(args, cfg))
    n = min(args.num_samples, len(ds))
    imgs = preprocess_images(ds, n, size, args.batch_size)

    ric = RICES(params, cfg, batch_size=args.batch_size)
    feats = ric.build_index(imgs)
    out = args.output if args.output.endswith(".npz") else args.output + ".npz"
    ric.save(out)
    result = {"task": args.task, "n": int(feats.shape[0]),
              "dim": int(feats.shape[1]), "output": out}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
