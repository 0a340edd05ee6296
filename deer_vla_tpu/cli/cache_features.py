"""Cache RICES retrieval features — upstream
open_flamingo/scripts/cache_rices_features.py equivalent: run the eval
model's vision tower over a dataset's images once and persist the
L2-normalized feature index (npz) so repeated benchmark evals skip the
embedding sweep (`deer-vl-eval --rices --cached_features <file>`).

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
    p.add_argument("--eval_model", default="flamingo",
                   choices=["flamingo", "blip"],
                   help="which family embeds the index (must match the "
                        "consumer eval run — the feature spaces differ)")
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
    import numpy as np
    from deer_vla_tpu.cli.vl_eval import build_dataset, resolve_paths
    from deer_vla_tpu.eval.eval_models import make_eval_model

    model = make_eval_model(args)
    size = model.image_size
    ds = build_dataset(args, size, *resolve_paths(args, None))
    n = min(args.num_samples, len(ds))

    bs = args.batch_size
    raw = np.stack([ds[i]["image"] for i in range(n)])
    feats = np.concatenate([model.embed_images(raw[i:i + bs])
                            for i in range(0, n, bs)], 0)
    out = args.output if args.output.endswith(".npz") else args.output + ".npz"
    # exact save path (an open handle stops np.savez appending '.npz')
    with open(out, "wb") as f:
        np.savez(f, features=feats)
    result = {"task": args.task, "eval_model": model.name,
              "n": int(feats.shape[0]), "dim": int(feats.shape[1]),
              "output": out}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
