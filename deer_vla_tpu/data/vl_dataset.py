"""Vision-language co-training datasets (COCO captions + VQAv2).

Port of robot_flamingo/data/vl_dataset.py:15-147 (the `--cotrain` path,
train_calvin_post_strategy.py:296-302): caption samples become
"A photo of {caption}" and VQA samples "Question:{q} Short answer:{a}" with
an answer-only loss mask derived from the question-prefix length.

Host-side numpy; images decode with PIL and ship as uint8, resize/normalize
runs on device like the CALVIN path.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


def _load_image(path: str, size: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    img = img.resize((size, size), Image.BICUBIC)
    return np.asarray(img, np.uint8)


class CaptionDataset:
    """COCO-caption style: annotations json with images[] + annotations[]."""

    def __init__(self, image_dir: str, annotations_path: str, seed: int = 123,
                 image_size: int = 224):
        self.image_dir = image_dir
        self.image_size = image_size
        self._rng = np.random.RandomState(seed)
        full = json.load(open(annotations_path))
        self.id2path = {im["id"]: os.path.join(image_dir, im["file_name"])
                        for im in full["images"]}
        self.id2caption: Dict[int, List[str]] = {}
        for ann in full["annotations"]:
            self.id2caption.setdefault(ann["image_id"], []).append(ann["caption"])
        self.image_ids = list(self.id2path.keys())

    def __len__(self):
        return len(self.image_ids)

    @staticmethod
    def get_caption_prompt(caption: Optional[str] = None) -> str:
        return f"A photo of {caption if caption is not None else ''}"

    def __getitem__(self, idx: int) -> Dict:
        iid = self.image_ids[idx]
        caps = self.id2caption[iid]
        return {"image": _load_image(self.id2path[iid], self.image_size),
                "caption": caps[self._rng.randint(len(caps))],
                "image_id": iid}

    def collate(self, samples: Sequence[Dict], text_fn: Callable) -> Dict:
        images = np.stack([s["image"] for s in samples])
        ids, mask = text_fn([self.get_caption_prompt(s["caption"])
                             for s in samples])
        return {"image": images, "input_ids": ids, "attention_mask": mask}


class KarpathyCaptionDataset:
    """Karpathy-split caption json (Flickr30k / COCO): one ``images`` list
    with per-image ``sentences[].raw``, ``split`` and ``filename``.

    Upstream-equivalent reader (open_flamingo eval_datasets.py:11-64): the
    caption is ``sentences[0].raw``; image_id is ``cocoid`` for COCO and the
    filename stem for Flickr; ``split`` filters train/test entries."""

    def __init__(self, image_dir: str, annotations_path: str,
                 dataset_name: str = "flickr", is_train: bool = False,
                 image_size: int = 224):
        self.image_dir = image_dir
        self.dataset_name = dataset_name
        self.image_size = image_size
        want = "train" if is_train else "test"
        self.annotations = [a for a in json.load(open(annotations_path))["images"]
                            if a.get("split", want) == want]

    def __len__(self):
        return len(self.annotations)

    get_caption_prompt = staticmethod(CaptionDataset.get_caption_prompt)

    def __getitem__(self, idx: int) -> Dict:
        a = self.annotations[idx]
        if self.dataset_name == "coco":
            image_id = a["cocoid"]
        else:
            image_id = os.path.splitext(a["filename"])[0]
        return {"image": _load_image(
                    os.path.join(self.image_dir, a["filename"]),
                    self.image_size),
                "caption": a["sentences"][0]["raw"],
                "captions": [s["raw"] for s in a["sentences"]],
                "image_id": image_id}

    def collate(self, samples: Sequence[Dict], text_fn: Callable) -> Dict:
        images = np.stack([s["image"] for s in samples])
        ids, mask = text_fn([self.get_caption_prompt(s["caption"])
                             for s in samples])
        return {"image": images, "input_ids": ids, "attention_mask": mask}


class VLLoader:
    """Minimal shuffled batch iterator over a Caption/VQA dataset."""

    def __init__(self, dataset, text_fn: Callable, batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True):
        self.ds = dataset
        self.text_fn = text_fn
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, e: int):
        self.epoch = e

    def __len__(self):
        return len(self.ds) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        for b in range(len(self)):
            idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
            yield self.ds.collate([self.ds[int(i)] for i in idxs], self.text_fn)


class VQADataset:
    """VQAv2-style questions+annotations jsons."""

    def __init__(self, image_dir: str, question_path: str,
                 annotations_path: Optional[str] = None, seed: int = 123,
                 dataset_name: str = "vqav2", is_train: bool = True,
                 image_size: int = 224):
        self.questions = json.load(open(question_path))["questions"]
        self.answers = (json.load(open(annotations_path))["annotations"]
                        if annotations_path else None)
        self.image_dir = image_dir
        self.dataset_name = dataset_name
        self.is_train = is_train
        self.image_size = image_size
        self._rng = np.random.RandomState(seed)
        if dataset_name in {"vqav2", "ok_vqa"}:
            self.img_coco_split = image_dir.strip("/").split("/")[-1]

    def __len__(self):
        return len(self.questions)

    def get_img_path(self, question: Dict) -> str:
        if self.dataset_name in {"vqav2", "ok_vqa"}:
            return os.path.join(
                self.image_dir,
                f"COCO_{self.img_coco_split}_{question['image_id']:012d}.jpg")
        if self.dataset_name == "vizwiz":
            return os.path.join(self.image_dir, question["image_id"])
        if self.dataset_name == "textvqa":
            return os.path.join(self.image_dir, f"{question['image_id']}.jpg")
        raise ValueError(self.dataset_name)

    @staticmethod
    def get_vqa_prompt(question: str, answer: Optional[str] = None) -> str:
        return f"Question:{question} Short answer:{answer if answer is not None else ''}"

    def __getitem__(self, idx: int) -> Dict:
        q = self.questions[idx]
        out = {"image": _load_image(self.get_img_path(q), self.image_size),
               "question": q["question"], "question_id": q["question_id"]}
        if self.answers is not None:
            out["answers"] = [a["answer"] for a in self.answers[idx]["answers"]]
        return out

    def collate(self, samples: Sequence[Dict], text_fn: Callable) -> Dict:
        """Returns answer_mask marking answer tokens only (loss mask:
        vl_dataset.py:138-147)."""
        images = np.stack([s["image"] for s in samples])
        texts = [self.get_vqa_prompt(
            s["question"], s["answers"][self._rng.randint(len(s["answers"]))])
            for s in samples]
        ids, mask = text_fn(texts)
        _, qmask = text_fn([self.get_vqa_prompt(s["question"]) for s in samples])
        b, t = mask.shape
        qlen = qmask.sum(1)
        # answers start where the question prompt ends (minus its trailing
        # specials: eoc + eos added by the tokenizer wrapper)
        idxs = np.arange(t)[None, :]
        answer_mask = ((idxs >= np.maximum(qlen - 2, 0)[:, None]) & (mask > 0)
                       ).astype(np.int32)
        return {"image": images, "input_ids": ids, "attention_mask": mask,
                "answer_mask": answer_mask}
