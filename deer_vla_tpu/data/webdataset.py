"""Webdataset-format readers for interleaved VL pretraining (LAION / MMC4).

TPU-native equivalent of the upstream OpenFlamingo pretraining pipeline
(open_flamingo/train/data.py):
  * LAION-2B shards: tar members ``{key}.jpg`` + ``{key}.txt`` — caption
    samples formatted ``<image>{caption}<|endofchunk|>`` (data.py:56-72).
  * MMC4 shards: tar members ``{key}.json`` with ``text_list``,
    ``similarity_matrix`` and base64 images in ``image_info`` — sentences
    get ``<|endofchunk|><image>`` markers at their assigned images via
    optimal (Hungarian) image->sentence assignment with a similarity
    threshold (data.py:138-270).

Design differences from the torch/webdataset original, deliberate:
  * plain ``tarfile`` streaming — no webdataset dependency, no worker
    processes; shard-level sharding across JAX processes replaces
    ``wds.split_by_node`` and a thread prefetches the next batch.
  * images ship as raw uint8 (T, H, W, 3); resize/normalize runs on device
    inside the jitted step (data/preprocess.py), like every other loader
    here — the upstream CPU-side CLIP transform disappears.
  * deterministic: shard order reshuffles per epoch from a seed; the 50%
    single-image drop (data.py:245-249) uses a per-sample hash, not global
    RNG state.
"""

from __future__ import annotations

import base64
import hashlib
import io
import json
import os
import queue
import tarfile
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

MIN_KB = 10
N_CHANNELS = 3


# ---------------------------------------------------------------------------
# tar streaming
# ---------------------------------------------------------------------------


def iter_tar_samples(path: str) -> Iterator[Dict[str, bytes]]:
    """Group consecutive tar members by sample key (basename before the
    first dot) — the webdataset convention."""
    cur_key: Optional[str] = None
    cur: Dict[str, bytes] = {}
    with tarfile.open(path, "r|*") as tf:
        for member in tf:
            if not member.isfile():
                continue
            name = os.path.basename(member.name)
            key, _, ext = name.partition(".")
            if cur_key is not None and key != cur_key and cur:
                yield cur
                cur = {}
            cur_key = key
            data = tf.extractfile(member)
            if data is not None:
                cur[ext.lower()] = data.read()
        if cur:
            yield cur


def _decode_image(raw: bytes, size: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(io.BytesIO(raw)).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.BICUBIC)
    return np.asarray(img, np.uint8)


# ---------------------------------------------------------------------------
# sample decoders
# ---------------------------------------------------------------------------


def decode_laion_sample(sample: Dict[str, bytes], image_size: int
                        ) -> Optional[Dict]:
    """(jpg|png|jpeg) + txt -> single-image caption sample
    (filter_no_caption_or_no_image + preprocess_laion_text,
    data.py:47-72)."""
    raw = sample.get("jpg") or sample.get("png") or sample.get("jpeg")
    txt = sample.get("txt")
    if raw is None or txt is None:
        return None
    caption = txt.decode("utf-8", "replace").strip()
    if not caption:
        return None
    try:
        img = _decode_image(raw, image_size)
    except Exception:
        return None
    return {"images": img[None],
            "text": f"<image>{caption}<|endofchunk|>"}


def _assignment(sim: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """One-to-one image->sentence assignment maximizing similarity
    (linear_sum_assignment on -sim, data.py:181-185); greedy fallback when
    scipy is unavailable."""
    try:
        from scipy.optimize import linear_sum_assignment
        return linear_sum_assignment(-sim)
    except Exception:
        sim = sim.copy()
        rows, cols = [], []
        for _ in range(min(sim.shape)):
            i, j = np.unravel_index(np.argmax(sim), sim.shape)
            if sim[i, j] == -np.inf:
                break
            rows.append(i)
            cols.append(j)
            sim[i, :] = -np.inf
            sim[:, j] = -np.inf
        return np.asarray(rows, np.int64), np.asarray(cols, np.int64)


def _sample_hash01(text: str) -> float:
    h = int.from_bytes(hashlib.md5(text.encode()).digest()[:4], "little")
    return h / 2.0 ** 32


def decode_mmc4_sample(sample: Dict[str, bytes], image_size: int, *,
                       sim_threshold: float = 0.24, min_num_images: int = 1,
                       max_num_images: int = 6) -> Optional[Dict]:
    """MMC4 interleaved json -> multi-image sample
    (preprocess_interleaved, data.py:138-270)."""
    raw = sample.get("json")
    if raw is None:
        return None
    try:
        info = json.loads(raw)
    except Exception:
        return None
    sentences = info.get("text_list")
    sim_matrix = info.get("similarity_matrix")
    image_info = info.get("image_info")
    if not sentences or sim_matrix is None or not image_info:
        return None

    valid_images, valid_idx = [], []
    for i, im in enumerate(image_info):
        b64 = im.get("image_base64")
        if b64 is None:
            continue
        rawbytes = base64.b64decode(b64)
        if len(rawbytes) // 1000 <= MIN_KB and len(image_info) > 1:
            continue  # >=10KB filter (data.py:168-170); keep tiny singletons
        try:
            valid_images.append(_decode_image(rawbytes, image_size))
        except Exception:
            continue
        valid_idx.append(i)
    if not valid_idx:
        return None

    sim = np.asarray(sim_matrix, np.float32)[valid_idx]  # (imgs, sents)
    img_ix, sent_ix = _assignment(sim)
    images, sentence_ixs = [], []
    for i, j in zip(img_ix, sent_ix):
        if sim[i, j] < sim_threshold:
            continue
        images.append(valid_images[i])
        sentence_ixs.append(int(j))
    if not images:
        return None

    keep = min(len(images), max_num_images)
    order = np.argsort(sentence_ixs)[:keep]  # document order
    images = [images[k] for k in order]
    sentence_ixs = [sentence_ixs[k] for k in order]

    sentences = list(sentences)
    for ix in sentence_ixs:
        sentences[ix] = f"<|endofchunk|><image>{sentences[ix]}"
    text = " ".join(sentences)
    text = text.replace("<|endofchunk|>", "", 1)  # drop leading eoc
    text = (text.replace(" <|endofchunk|>", "<|endofchunk|>")
            .replace("<image> ", "<image>").replace(" <image>", "<image>"))
    text = f"{text}<|endofchunk|>"

    n_img = len(images)
    if n_img < min_num_images:
        return None
    if n_img == 1 and _sample_hash01(text) <= 0.5:
        return None  # 50% single-image drop (data.py:245-249), deterministic
    arr = np.zeros((max_num_images, image_size, image_size, N_CHANNELS),
                   np.uint8)
    arr[:n_img] = np.stack(images)
    return {"images": arr, "text": text, "n_images": n_img}


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------


class WebLoader:
    """Sharded, seeded iterator over webdataset tar shards producing
    device-ready uint8 batches.

    kind: 'laion' (single image per sample) or 'mmc4' (interleaved).
    Batches: {"image": (B, T, H, W, 3) uint8, "input_ids": (B, S) int32,
    "attention_mask": (B, S) int32} — pass through prepare_interleaved_batch
    (or clip_preprocess directly) inside the jitted train step.
    """

    def __init__(self, shards: Sequence[str], tokenizer, *, kind: str,
                 batch_size: int, image_size: int = 224, max_tokens: int = 256,
                 rank: int = 0, world_size: int = 1, seed: int = 0,
                 sim_threshold: float = 0.24, min_num_images: int = 1,
                 max_num_images: int = 6, prefetch: int = 2):
        assert kind in ("laion", "mmc4")
        assert len(shards) >= world_size or world_size == 1, \
            "need at least one shard per process"
        self.shards = sorted(shards)
        self.tok = tokenizer
        self.kind = kind
        self.batch_size = batch_size
        self.image_size = image_size
        self.max_tokens = max_tokens if kind == "mmc4" else 32
        self.rank = rank
        self.world_size = world_size
        self.seed = seed
        self.sim_threshold = sim_threshold
        self.min_num_images = min_num_images
        self.max_num_images = max_num_images
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, e: int) -> None:
        self.epoch = e

    def _epoch_shards(self) -> List[str]:
        order = np.random.RandomState(self.seed + self.epoch).permutation(
            len(self.shards))
        mine = [self.shards[i] for i in order]
        return mine[self.rank::self.world_size]

    def _iter_samples(self) -> Iterator[Dict]:
        for shard in self._epoch_shards():
            for raw in iter_tar_samples(shard):
                if self.kind == "laion":
                    s = decode_laion_sample(raw, self.image_size)
                else:
                    s = decode_mmc4_sample(
                        raw, self.image_size,
                        sim_threshold=self.sim_threshold,
                        min_num_images=self.min_num_images,
                        max_num_images=self.max_num_images)
                if s is not None:
                    yield s

    def _make_batch(self, samples: List[Dict]) -> Dict:
        t = 1 if self.kind == "laion" else self.max_num_images
        imgs = np.zeros((len(samples), t, self.image_size, self.image_size,
                         N_CHANNELS), np.uint8)
        for i, s in enumerate(samples):
            imgs[i, :s["images"].shape[0]] = s["images"]
        ids, mask = self.tok.encode_raw([s["text"] for s in samples],
                                        self.max_tokens)
        return {"image": imgs, "input_ids": ids, "attention_mask": mask}

    def __iter__(self) -> Iterator[Dict]:
        def produce(q: queue.Queue):
            buf: List[Dict] = []
            for s in self._iter_samples():
                buf.append(s)
                if len(buf) == self.batch_size:
                    q.put(self._make_batch(buf))
                    buf = []
            q.put(None)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        th = threading.Thread(target=produce, args=(q,), daemon=True)
        th.start()
        while True:
            b = q.get()
            if b is None:
                return
            yield b


class WebVLLoader:
    """Adapt a 'laion'-kind WebLoader to the co-training vl_loader interface
    (cli/train.py --cotrain): single-image uint8 batches {image (B, H, W, 3),
    input_ids, attention_mask} that prepare_vl_batch understands.  Lets the
    CALVIN+VL co-training objective (train_calvin_post_strategy.py:296-302)
    draw its VL batches from webdataset caption shards instead of a local
    COCO directory."""

    def __init__(self, web: WebLoader):
        assert web.kind == "laion", "co-training adapter is single-image"
        self.web = web

    def set_epoch(self, e: int) -> None:
        self.web.set_epoch(e)

    def __iter__(self):
        for b in self.web:
            yield {"image": b["image"][:, 0],
                   "input_ids": b["input_ids"],
                   "attention_mask": b["attention_mask"]}


def prepare_interleaved_batch(batch: Dict, size: int = 224, dtype=None):
    """uint8 (B, T, H, W, 3) -> (B, T, 1, 3, size, size) normalized — the
    vision_x layout lm_loss/encode_vision expect.  jit-fusable."""
    import jax.numpy as jnp
    from deer_vla_tpu.data.preprocess import clip_preprocess
    img = batch["image"]
    b, t = img.shape[:2]
    flat = img.reshape((b * t,) + img.shape[2:])
    x = clip_preprocess(jnp.asarray(flat), size,
                        dtype if dtype is not None else jnp.float32)
    return x.reshape(b, t, 1, *x.shape[1:])


# ---------------------------------------------------------------------------
# synthetic shard writers (tests / smoke runs — the reference's --debug
# analogue for the pretraining path)
# ---------------------------------------------------------------------------


def _png_bytes(rng: np.random.RandomState, hw: int, pad_to_kb: int = 0) -> bytes:
    from PIL import Image
    img = Image.fromarray(rng.randint(0, 255, (hw, hw, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    raw = buf.getvalue()
    if pad_to_kb and len(raw) < pad_to_kb * 1000:
        # PNG ignores trailing bytes after IEND; pad to pass the size filter
        raw += b"\0" * (pad_to_kb * 1000 - len(raw) + 1)
    return raw


def write_synthetic_laion_shard(path: str, n: int = 8, hw: int = 64,
                                seed: int = 0) -> None:
    rng = np.random.RandomState(seed)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{i:09d}"
            for ext, data in (("jpg", _png_bytes(rng, hw)),
                              ("txt", f"a synthetic photo number {i}".encode())):
                ti = tarfile.TarInfo(f"{key}.{ext}")
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))


def write_synthetic_mmc4_shard(path: str, n: int = 4, hw: int = 64,
                               n_images: int = 2, n_sentences: int = 4,
                               seed: int = 0) -> None:
    rng = np.random.RandomState(seed)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            sim = rng.rand(n_images, n_sentences).tolist()
            info = {
                "text_list": [f"sentence {i} {j} words here"
                              for j in range(n_sentences)],
                "similarity_matrix": sim,
                "image_info": [
                    {"image_base64": base64.b64encode(
                        _png_bytes(rng, hw, pad_to_kb=MIN_KB + 1)).decode()}
                    for _ in range(n_images)],
            }
            data = json.dumps(info).encode()
            ti = tarfile.TarInfo(f"{i:09d}.json")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
