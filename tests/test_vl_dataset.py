"""VL co-train datasets (COCO caption / VQA) with synthetic fixtures."""

import json
import os

import numpy as np
import pytest

from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.data.vl_dataset import CaptionDataset, VQADataset


@pytest.fixture()
def coco_fixture(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "train2014"
    img_dir.mkdir()
    images, anns = [], []
    for i in range(3):
        fn = f"img_{i}.jpg"
        Image.fromarray(np.random.RandomState(i).randint(
            0, 256, (40, 50, 3), np.uint8)).save(img_dir / fn)
        images.append({"id": i, "file_name": fn})
        anns.append({"image_id": i, "caption": f"a thing number {i}"})
        anns.append({"image_id": i, "caption": f"another view of thing {i}"})
    ann_path = tmp_path / "captions.json"
    ann_path.write_text(json.dumps({"images": images, "annotations": anns}))
    return str(img_dir), str(ann_path)


def test_caption_dataset(coco_fixture):
    img_dir, ann_path = coco_fixture
    ds = CaptionDataset(img_dir, ann_path, image_size=32)
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    tok = HashTokenizer(max_length=16)
    batch = ds.collate([ds[0], ds[1]], tok)
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["input_ids"][0, 0] == tok.media_token_id


def test_vqa_dataset(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "train2014"
    img_dir.mkdir()
    questions, annotations = [], []
    for i in range(2):
        Image.fromarray(np.zeros((30, 30, 3), np.uint8)).save(
            img_dir / f"COCO_train2014_{i:012d}.jpg")
        questions.append({"question": f"what color is object {i}?",
                          "question_id": i, "image_id": i})
        annotations.append({"answers": [{"answer": "red"}, {"answer": "blue"}]})
    qp = tmp_path / "questions.json"
    ap = tmp_path / "annotations.json"
    qp.write_text(json.dumps({"questions": questions}))
    ap.write_text(json.dumps({"annotations": annotations}))
    ds = VQADataset(str(img_dir), str(qp), str(ap), image_size=32)
    assert len(ds) == 2
    s = ds[0]
    assert s["answers"] == ["red", "blue"]
    tok = HashTokenizer(max_length=20)
    b = ds.collate([ds[0], ds[1]], tok)
    # answer mask covers a strict suffix of the attended tokens
    am, m = b["answer_mask"], b["attention_mask"]
    assert am.shape == m.shape
    assert (am <= m).all()
    assert am.sum() > 0
    first_answer_idx = np.argmax(am[0] > 0)
    assert am[0, first_answer_idx:][m[0, first_answer_idx:] > 0].all()
