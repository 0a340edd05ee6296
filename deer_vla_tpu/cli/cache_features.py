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


def build_dataset(args, size):
    """Same dataset routing as cli/vl_eval.py main."""
    from deer_vla_tpu.data.vl_dataset import (CaptionDataset,
                                              KarpathyCaptionDataset,
                                              VQADataset)
    img_dir, ann_p, q_p, a_p = (args.image_dir, args.annotations,
                                args.questions, args.annotations)
    if args.task == "flickr":
        return KarpathyCaptionDataset(img_dir, ann_p, dataset_name="flickr",
                                      is_train=False, image_size=size)
    if args.task == "caption":
        return CaptionDataset(img_dir, ann_p, image_size=size)
    ds_name = {"vqa": "vqav2", "okvqa": "ok_vqa",
               "textvqa": "textvqa", "vizwiz": "vizwiz"}[args.task]
    if args.debug and ds_name in ("vqav2", "ok_vqa"):
        ds_name = "textvqa"
    return VQADataset(img_dir, q_p, a_p, dataset_name=ds_name,
                      image_size=size)


@record
def main(argv=None):
    args = build_parser().parse_args(argv)
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from deer_vla_tpu.cli.eval import load_model
    from deer_vla_tpu.cli.train import make_tokenizer
    from deer_vla_tpu.data.preprocess import clip_preprocess
    from deer_vla_tpu.eval.vl_eval import RICES

    cfg, params = load_model(args)
    tok = make_tokenizer(args, cfg)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)

    if args.debug:
        import tempfile
        from deer_vla_tpu.cli.vl_eval import _synthetic_fixture
        tmp = tempfile.mkdtemp()
        args.image_dir, args.annotations, args.questions, _ = \
            _synthetic_fixture(args, cfg, tmp)

    size = cfg.vit.image_size
    ds = build_dataset(args, size)
    n = min(args.num_samples, len(ds))
    imgs = np.stack([np.asarray(clip_preprocess(
        jnp.asarray(ds[i]["image"][None]), size))[0] for i in range(n)])

    ric = RICES(params, cfg, batch_size=args.batch_size)
    feats = ric.build_index(imgs)
    ric.save(args.output)
    result = {"task": args.task, "n": int(feats.shape[0]),
              "dim": int(feats.shape[1]), "output": args.output}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
