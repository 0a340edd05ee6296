"""Vision-language benchmark CLI — upstream open_flamingo/eval/evaluate.py
equivalent: caption (COCO-style) and VQA evaluation with greedy decoding and
optional RICES in-context example retrieval.

Example (synthetic smoke):
  python -m deer_vla_tpu.cli.vl_eval --task caption --debug --model tiny
"""

from __future__ import annotations

import argparse
import json

from deer_vla_tpu.utils.errors import record


def build_parser():
    p = argparse.ArgumentParser(description="DeeR-VLA TPU VL benchmark eval")
    p.add_argument("--task", choices=["caption", "vqa", "classify"],
                   default="caption")
    p.add_argument("--labels", default="",
                   help="classify task: json {classes: [...], samples: "
                        "[{file_name, label}]} (ImageNet/Flickr-style "
                        "zero-shot classification by LM score)")
    p.add_argument("--model", default="tiny")
    p.add_argument("--evaluate_from_checkpoint", default="")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--tokenizer_path", default="")
    p.add_argument("--image_dir", default="")
    p.add_argument("--annotations", default="")
    p.add_argument("--questions", default="")
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=10)
    p.add_argument("--rices", action="store_true",
                   help="report RICES retrieval indices for shot selection")
    p.add_argument("--shots", type=int, default=2)
    p.add_argument("--max_layer", type=int, default=-1)
    p.add_argument("--debug", action="store_true",
                   help="synthetic images/annotations, no dataset needed")
    p.add_argument("--seed", type=int, default=42)
    return p


def _synthetic_fixture(args, cfg, tmpdir):
    import os
    import numpy as np
    from PIL import Image
    img_dir = os.path.join(tmpdir, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    images, anns, questions, answers = [], [], [], []
    r = np.random.RandomState(args.seed)
    for i in range(max(8, args.num_samples)):
        fn = f"{i}.jpg"  # textvqa naming (debug fixture)
        Image.fromarray(r.randint(0, 256, (32, 32, 3), np.uint8)).save(
            os.path.join(img_dir, fn))
        images.append({"id": i, "file_name": fn})
        anns.append({"image_id": i, "caption": f"a synthetic object {i % 5}"})
        questions.append({"question": f"what is object {i % 5}?",
                          "question_id": i, "image_id": i})
        answers.append({"answers": [{"answer": f"object {i % 5}"}] * 3})
    ann_p = os.path.join(tmpdir, "ann.json")
    q_p = os.path.join(tmpdir, "q.json")
    a_p = os.path.join(tmpdir, "a.json")
    json.dump({"images": images, "annotations": anns}, open(ann_p, "w"))
    json.dump({"questions": questions}, open(q_p, "w"))
    json.dump({"annotations": answers}, open(a_p, "w"))
    return img_dir, ann_p, q_p, a_p


def _run_classify(args, cfg, params, tok, img_dir, size):
    """Zero-shot classification by LM score (classification_utils
    equivalent): rank 'A photo of a <class>' continuations per image by
    summed NLL, report top-1 accuracy."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from deer_vla_tpu.data.preprocess import clip_preprocess
    from deer_vla_tpu.data.vl_dataset import _load_image
    from deer_vla_tpu.eval.vl_eval import classify_by_lm_score

    if args.debug:
        # synthetic fixture images are named {i}.jpg with class i % 5
        classes = [f"object {k}" for k in range(5)]
        samples = [{"file_name": f"{i}.jpg", "label": i % 5}
                   for i in range(max(8, args.num_samples))]
    else:
        if not args.labels:
            raise SystemExit("--task classify needs --labels <spec.json> "
                             "(or --debug for the synthetic fixture)")
        spec = json.load(open(args.labels))
        classes, samples = spec["classes"], spec["samples"]

    n = min(args.num_samples, len(samples))
    correct = 0
    for s in samples[:n]:
        img = _load_image(os.path.join(img_dir, s["file_name"]), size)
        vis = np.asarray(clip_preprocess(jnp.asarray(img[None]), size))
        pred, _ = classify_by_lm_score(params, cfg,
                                       jnp.asarray(vis)[:, None, None],
                                       classes, tok)
        correct += int(pred == int(s["label"]))
    result = {"task": "classify", "n": n, "metric": "top1_acc",
              "score": correct / max(n, 1), "n_classes": len(classes)}
    print(json.dumps(result))
    return result


@record
def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np
    import jax.numpy as jnp
    from deer_vla_tpu.cli.eval import load_model
    from deer_vla_tpu.cli.train import make_tokenizer
    from deer_vla_tpu.data.preprocess import clip_preprocess
    from deer_vla_tpu.data.vl_dataset import CaptionDataset, VQADataset
    from deer_vla_tpu.eval.vl_eval import (RICES, caption_bleu1,
                                           greedy_generate, vqa_accuracy)
    import dataclasses

    cfg, params = load_model(args)
    tok = make_tokenizer(args, cfg)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)

    if args.debug:
        import tempfile
        tmp = tempfile.mkdtemp()
        img_dir, ann_p, q_p, a_p = _synthetic_fixture(args, cfg, tmp)
    else:
        img_dir, ann_p, q_p, a_p = (args.image_dir, args.annotations,
                                    args.questions, args.annotations)

    size = cfg.vit.image_size
    if args.task == "classify":
        return _run_classify(args, cfg, params, tok, img_dir, size)
    if args.task == "caption":
        ds = CaptionDataset(img_dir, ann_p, image_size=size)
    else:
        ds = VQADataset(img_dir, q_p, a_p,
                        dataset_name="textvqa" if args.debug else "vqav2",
                        image_size=size)
    n = min(args.num_samples, len(ds))

    rices_idx = None
    if args.rices:
        imgs = np.stack([np.asarray(clip_preprocess(
            jnp.asarray(ds[i]["image"][None]), size))[0] for i in range(n)])
        ric = RICES(params, cfg)
        ric.build_index(imgs)
        rices_idx = ric.retrieve(imgs, args.shots)

    scores = []
    cap_preds, cap_refs = [], []  # corpus-level CIDEr-D needs the full set
    for start in range(0, n, args.batch_size):
        idxs = list(range(start, min(start + args.batch_size, n)))
        samples = [ds[i] for i in idxs]
        imgs = np.stack([s["image"] for s in samples])
        vision = np.asarray(clip_preprocess(jnp.asarray(imgs), size))[:, None, None]
        if args.task == "caption":
            prompts = [CaptionDataset.get_caption_prompt() for _ in samples]
        else:
            prompts = [VQADataset.get_vqa_prompt(s["question"]) for s in samples]
        ids, mask = tok(prompts)
        # strip each row's trailing <eoc><eos> so generation continues the
        # prompt.  With mixed-length prompts the batch is right-padded, so a
        # flat [:, :-2] would only strip the longest row; strip per row at
        # its true length instead.
        ids = np.array(ids, copy=True)
        mask = np.array(mask, copy=True)
        for r, length in enumerate(mask.sum(-1)):
            le = int(length)
            if le >= 2:
                ids[r, le - 2:le] = 0
                mask[r, le - 2:le] = 0
        ids, mask = ids[:, :-2], mask[:, :-2]  # now-dead tail columns
        out = greedy_generate(params, cfg, jnp.asarray(vision), ids, mask,
                              max_new_tokens=args.max_new_tokens,
                              eos_id=getattr(tok, "eos_token_id", None))
        for row, s in zip(out, samples):
            toks = [int(t) for t in row]
            eos = getattr(tok, "eos_token_id", None)
            if eos is not None and eos in toks:
                # greedy_generate pads the tail with eos; drop it so raw-id
                # joins don't grow phantom tokens that pollute the metrics
                toks = toks[:toks.index(eos)]
            text = " ".join(str(t) for t in toks)  # hash-tok ids; HF decodes
            if hasattr(tok, "tok"):
                text = tok.tok.decode(toks, skip_special_tokens=True)
            if args.task == "caption":
                refs = [s["caption"]]
                scores.append(caption_bleu1(text, refs))
                cap_preds.append(text)
                cap_refs.append(refs)
            else:
                scores.append(vqa_accuracy(text, s.get("answers", [])))

    result = {"task": args.task, "n": n,
              "metric": "bleu1" if args.task == "caption" else "vqa_acc",
              "score": float(np.mean(scores)) if scores else 0.0}
    if args.task == "caption":
        from deer_vla_tpu.eval.vl_eval import cider_d
        result["cider"] = cider_d(cap_preds, cap_refs)
    if rices_idx is not None:
        result["rices_example"] = rices_idx[0].tolist()
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
