"""Vision-language benchmark CLI — upstream open_flamingo/eval/evaluate.py
equivalent: caption (COCO json / Flickr30k karpathy json), VQA (VQAv2,
TextVQA, VizWiz, OK-VQA — dataset-specific image naming per
eval_datasets.py:85-97, shared official VQAEval accuracy) and zero-shot
classification, with greedy decoding, optional RICES in-context example
retrieval, and test-server predictions-json output.

Example (synthetic smoke):
  python -m deer_vla_tpu.cli.vl_eval --task caption --debug --model tiny
"""

from __future__ import annotations

import argparse
import json

from deer_vla_tpu.utils.errors import record


def build_parser():
    p = argparse.ArgumentParser(description="DeeR-VLA TPU VL benchmark eval")
    p.add_argument("--task",
                   choices=["caption", "flickr", "vqa", "textvqa", "vizwiz",
                            "okvqa", "classify", "imagenet", "hateful_memes"],
                   default="caption",
                   help="caption=COCO-style json; flickr=karpathy-split json "
                        "scored by CIDEr-D; vqa/textvqa/vizwiz share the "
                        "official VQAEval accuracy (dataset-specific image "
                        "naming); okvqa adds the stemmed-answer protocol; "
                        "classify/imagenet rank class continuations by LM "
                        "NLL (imagenet uses the upstream 'Output:' prompt); "
                        "hateful_memes scores yes/no over the OCR prompt, "
                        "headline ROC-AUC (evaluate.py:1154-1291)")
    p.add_argument("--save_predictions", default="",
                   help="write predictions json (VQA result format "
                        "[{answer, question_id}] / caption format "
                        "[{image_id, caption}]) for test-server submission")
    p.add_argument("--labels", default="",
                   help="classify task: json {classes: [...], samples: "
                        "[{file_name, label}]} (ImageNet/Flickr-style "
                        "zero-shot classification by LM score)")
    p.add_argument("--model", default="tiny")
    p.add_argument("--eval_model", default="flamingo",
                   choices=["flamingo", "blip"],
                   help="pluggable eval-model family (upstream evaluate.py "
                        "--model importlib selection): flamingo=the "
                        "flagship DeeR stack; blip=the JAX BLIP captioner "
                        "(models/blip.py)")
    p.add_argument("--evaluate_from_checkpoint", default="")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--tokenizer_path", default="")
    p.add_argument("--image_dir", default="")
    p.add_argument("--annotations", default="")
    p.add_argument("--questions", default="")
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=10)
    p.add_argument("--decode_engine", default="auto",
                   choices=["auto", "recompute", "kv_cache"],
                   help="flamingo generation engine: recompute re-runs the "
                        "full buffer per token (best for tiny prompts); "
                        "kv_cache prefills per-layer K/V once "
                        "(eval/kv_decode.py — wins on long few-shot "
                        "prompts); auto switches on buffer length")
    p.add_argument("--rices", action="store_true",
                   help="report RICES retrieval indices for shot selection")
    p.add_argument("--cached_features", default="",
                   help="npz feature index from deer-cache-features; skips "
                        "the RICES embedding sweep (upstream "
                        "cached_demonstration_features equivalent)")
    p.add_argument("--shots", type=int, default=2)
    p.add_argument("--fewshot", action="store_true",
                   help="build K-shot in-context prompts (K=--shots): demo "
                        "examples with their ground-truth text are "
                        "interleaved before the query (evaluate.py:1216-1239"
                        " context join). Demos come from RICES neighbors "
                        "when --rices is set, else seeded random draws; "
                        "both exclude the query itself (the upstream pool "
                        "is the train split)")
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
    images, anns, karp, questions, answers = [], [], [], [], []
    r = np.random.RandomState(args.seed)
    # vizwiz addresses images by full filename, textvqa by {image_id}.jpg
    # (eval_datasets.py:93-96) — the fixture serves both conventions
    img_id = (lambda i, fn: fn) if args.task == "vizwiz" else (lambda i, fn: i)
    for i in range(max(8, args.num_samples)):
        fn = f"{i}.jpg"
        Image.fromarray(r.randint(0, 256, (32, 32, 3), np.uint8)).save(
            os.path.join(img_dir, fn))
        images.append({"id": i, "file_name": fn})
        anns.append({"image_id": i, "caption": f"a synthetic object {i % 5}"})
        karp.append({"filename": fn, "split": "test",
                     "sentences": [{"raw": f"a synthetic object {i % 5}"},
                                   {"raw": f"the object {i % 5} photo"}]})
        questions.append({"question": f"what is object {i % 5}?",
                          "question_id": i, "image_id": img_id(i, fn)})
        answers.append({"answers": [{"answer": f"object {i % 5}"}] * 3})
    ann_p = os.path.join(tmpdir, "ann.json")
    q_p = os.path.join(tmpdir, "q.json")
    a_p = os.path.join(tmpdir, "a.json")
    if args.task == "flickr":
        json.dump({"images": karp}, open(ann_p, "w"))
    else:
        json.dump({"images": images, "annotations": anns}, open(ann_p, "w"))
    json.dump({"questions": questions}, open(q_p, "w"))
    json.dump({"annotations": answers}, open(a_p, "w"))
    return img_dir, ann_p, q_p, a_p


def resolve_paths(args, cfg):
    """(img_dir, ann_p, q_p, a_p) — synthetic fixture under --debug, else
    the CLI path args (VQA answers ride --annotations)."""
    if args.debug:
        import tempfile
        return _synthetic_fixture(args, cfg, tempfile.mkdtemp())
    return (args.image_dir, args.annotations, args.questions,
            args.annotations)


def build_dataset(args, size, img_dir, ann_p, q_p, a_p):
    """Task -> dataset routing shared by vl_eval and cache_features."""
    from deer_vla_tpu.data.vl_dataset import (CaptionDataset,
                                              KarpathyCaptionDataset,
                                              VQADataset)
    if args.task == "flickr":
        return KarpathyCaptionDataset(img_dir, ann_p, dataset_name="flickr",
                                      is_train=False, image_size=size)
    if args.task == "caption":
        return CaptionDataset(img_dir, ann_p, image_size=size)
    ds_name = {"vqa": "vqav2", "okvqa": "ok_vqa",
               "textvqa": "textvqa", "vizwiz": "vizwiz"}[args.task]
    if args.debug and ds_name in ("vqav2", "ok_vqa"):
        ds_name = "textvqa"  # fixture images are plain {i}.jpg
    return VQADataset(img_dir, q_p, a_p, dataset_name=ds_name,
                      image_size=size)


def _run_hateful_memes(args, model, img_dir, size):
    """Hateful-memes protocol (evaluate.py:1154-1291): per meme, rank
    {'no','yes'} continuations of the OCR prompt by LM NLL; the headline
    metric is ROC-AUC over the softmax probability of the positive class.
    --annotations points at the standard jsonl ({img, text, label} rows)."""
    import os
    import numpy as np
    from deer_vla_tpu.data.vl_dataset import _load_image
    from deer_vla_tpu.eval.vl_eval import roc_auc

    if args.debug:
        from PIL import Image
        r = np.random.RandomState(args.seed)
        os.makedirs(img_dir, exist_ok=True)
        rows = []
        for i in range(max(8, args.num_samples)):
            fn = f"meme_{i}.png"
            Image.fromarray(r.randint(0, 256, (32, 32, 3), np.uint8)).save(
                os.path.join(img_dir, fn))
            rows.append({"img": fn, "text": f"meme text {i % 4}",
                         "label": i % 2})
    else:
        if not args.annotations:
            raise SystemExit("--task hateful_memes needs --annotations "
                             "<dev.jsonl> (or --debug)")
        with open(args.annotations) as f:
            rows = [json.loads(line) for line in f if line.strip()]

    n = min(args.num_samples, len(rows))
    gts, pred_scores = [], []
    for row in rows[:n]:
        img = _load_image(os.path.join(img_dir, row["img"]), size)
        vision_one = model.preprocess(img[None])
        nll = model.score_texts(
            vision_one, ["no", "yes"],
            prompt=model.get_hateful_memes_prompt(row["text"]))
        logp = -np.asarray(nll, np.float64)
        p_yes = float(np.exp(logp[1]) / np.exp(logp).sum())
        pred_scores.append(p_yes)  # prob of the greater label ('yes')
        gts.append(int(row["label"]))
    result = {"task": "hateful_memes", "n": n, "metric": "roc_auc",
              "score": roc_auc(gts, pred_scores)}
    print(json.dumps(result))
    return result


def _run_classify(args, model, img_dir, size):
    """Zero-shot classification by LM score (classification_utils
    equivalent): rank class-name continuations per image by summed NLL,
    report top-1 accuracy.  The imagenet task is the same ranking under the
    upstream 'Output:' prompt (evaluate.py:639-679)."""
    import os
    import numpy as np
    from deer_vla_tpu.data.vl_dataset import _load_image

    if args.debug:
        # synthetic fixture images are named {i}.jpg with class i % 5
        classes = [f"object {k}" for k in range(5)]
        samples = [{"file_name": f"{i}.jpg", "label": i % 5}
                   for i in range(max(8, args.num_samples))]
    else:
        if not args.labels:
            raise SystemExit(f"--task {args.task} needs --labels <spec.json> "
                             "(or --debug for the synthetic fixture)")
        spec = json.load(open(args.labels))
        classes, samples = spec["classes"], spec["samples"]

    n = min(args.num_samples, len(samples))
    # imagenet uses the upstream 'Output:' rank-classification prompt
    # (eval/models/open_flamingo.py:330); classify keeps 'A photo of a'
    prompt = (model.get_imagenet_prompt().rstrip()
              if args.task == "imagenet" else "A photo of a")
    correct = 0
    for s in samples[:n]:
        img = _load_image(os.path.join(img_dir, s["file_name"]), size)
        vision_one = model.preprocess(img[None])
        scores = model.score_texts(vision_one, classes, prompt=prompt)
        correct += int(int(np.argmin(scores)) == int(s["label"]))
    result = {"task": args.task, "n": n, "metric": "top1_acc",
              "score": correct / max(n, 1), "n_classes": len(classes)}
    print(json.dumps(result))
    return result


@record
def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np
    from deer_vla_tpu.eval.eval_models import make_eval_model
    from deer_vla_tpu.eval.vl_eval import (caption_bleu1, okvqa_accuracy,
                                           postprocess_vqa_generation,
                                           rices_retrieve, vqa_accuracy)

    model = make_eval_model(args)

    img_dir, ann_p, q_p, a_p = resolve_paths(args, None)

    size = model.image_size
    is_caption = args.task in ("caption", "flickr")
    if args.task in ("classify", "imagenet"):
        return _run_classify(args, model, img_dir, size)
    if args.task == "hateful_memes":
        return _run_hateful_memes(args, model, img_dir, size)
    ds = build_dataset(args, size, img_dir, ann_p, q_p, a_p)
    n = min(args.num_samples, len(ds))

    rices_idx = None
    demo_idx = None
    if args.rices:
        raw = np.stack([ds[i]["image"] for i in range(n)])
        bs = args.batch_size
        q = np.concatenate([model.embed_images(raw[i:i + bs])
                            for i in range(0, n, bs)], 0)
        feats = (np.load(args.cached_features)["features"]
                 if args.cached_features else q)
        rices_idx = rices_retrieve(q, feats, args.shots)
    if args.fewshot:
        if args.shots < 1 or n <= args.shots:
            raise SystemExit("--fewshot needs 1 <= --shots < num samples")
        if args.rices and args.cached_features:
            raise SystemExit("--fewshot demos must be resolvable samples; "
                             "--cached_features indexes a feature file "
                             "whose source samples are not loaded here")
        if args.rices:
            # nearest neighbors, query itself excluded (the upstream
            # retrieves from the train split so self never appears)
            cand = rices_retrieve(q, feats, args.shots + 1)
            demo_idx = np.stack(
                [np.array([j for j in row if j != i][-args.shots:])
                 for i, row in enumerate(cand)])
        else:
            r = np.random.RandomState(args.seed)
            demo_idx = np.stack(
                [r.choice(np.setdiff1d(np.arange(n), [i]), size=args.shots,
                          replace=False) for i in range(n)])

    scores = []
    cap_preds, cap_refs = [], []  # corpus-level CIDEr-D needs the full set
    predictions = []  # VQA/caption result-format rows (--save_predictions)
    for start in range(0, n, args.batch_size):
        idxs = list(range(start, min(start + args.batch_size, n)))
        samples = [ds[i] for i in idxs]
        if demo_idx is not None:
            demos = [[ds[int(j)] for j in demo_idx[i]] for i in idxs]
            if is_caption:
                demo_texts = [[model.get_caption_prompt(d["caption"])
                               for d in row] for row in demos]
                finals = [model.get_caption_prompt() for _ in samples]
            else:
                demo_texts = [[model.get_vqa_prompt(
                    d["question"], (d.get("answers") or [""])[0])
                    for d in row] for row in demos]
                finals = [model.get_vqa_prompt(s["question"])
                          for s in samples]
            prompts = [model.build_fewshot_prompt(dt, f)
                       for dt, f in zip(demo_texts, finals)]
            vision = model.build_fewshot_vision(
                [[d["image"] for d in row] for row in demos],
                [s["image"] for s in samples])
            texts = model.get_outputs(vision, prompts,
                                      max_new_tokens=args.max_new_tokens,
                                      raw=True)
        else:
            imgs = np.stack([s["image"] for s in samples])
            vision = model.preprocess(imgs)
            if is_caption:
                prompts = [model.get_caption_prompt() for _ in samples]
            else:
                prompts = [model.get_vqa_prompt(s["question"])
                           for s in samples]
            texts = model.get_outputs(vision, prompts,
                                      max_new_tokens=args.max_new_tokens)
        for text, s in zip(texts, samples):
            if is_caption:
                refs = s.get("captions", [s["caption"]])
                scores.append(caption_bleu1(text, refs))
                cap_preds.append(text)
                cap_refs.append(refs)
                predictions.append({"image_id": s["image_id"],
                                    "caption": text})
            else:
                if args.task == "okvqa":
                    scores.append(okvqa_accuracy(text, s.get("answers", [])))
                else:
                    scores.append(vqa_accuracy(
                        postprocess_vqa_generation(text),
                        s.get("answers", [])))
                predictions.append(
                    {"answer": postprocess_vqa_generation(text),
                     "question_id": s["question_id"]})

    metric = {"caption": "bleu1", "flickr": "cider", "vqa": "vqa_acc",
              "textvqa": "textvqa_acc", "vizwiz": "vizwiz_acc",
              "okvqa": "okvqa_acc"}[args.task]
    result = {"task": args.task, "n": n, "metric": metric,
              "shots": args.shots if args.fewshot else 0}
    if is_caption:
        from deer_vla_tpu.eval.vl_eval import cider_d
        result["cider"] = cider_d(cap_preds, cap_refs)
        result["bleu1"] = float(np.mean(scores)) if scores else 0.0
        # upstream reports CIDEr x100 as the flickr/coco headline
        # (evaluate.py:886-895); `caption` keeps bleu1 as `score` for
        # back-compat with existing consumers
        result["score"] = (result["cider"] if args.task == "flickr"
                           else result["bleu1"])
    else:
        result["score"] = float(np.mean(scores)) if scores else 0.0
    if rices_idx is not None:
        result["rices_example"] = rices_idx[0].tolist()
    if args.save_predictions:
        with open(args.save_predictions, "w") as f:
            json.dump(predictions, f)
        result["predictions_path"] = args.save_predictions
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
