"""Pluggable VL eval-model families for the benchmark harness.

The upstream harness evaluates interchangeable models behind one interface
(`open_flamingo/eval/eval_model.py` BaseEvalModel; implementations
`eval/models/open_flamingo.py` and `eval/models/blip.py`, selected by the
`--model` flag, evaluate.py:42,400).  Here the same seam exists TPU-native:
each eval model owns its preprocessing, prompt formats, greedy generation
program and RICES image embedding, so `cli/vl_eval.py` drives caption /
VQA / classification benchmarks without knowing which family is loaded.

Families:
  - ``FlamingoEvalModel`` — the flagship DeeR/OpenFlamingo stack
    (models/flamingo.py + eval/vl_eval.py programs);
  - ``BlipEvalModel`` — the from-scratch JAX BLIP captioner
    (models/blip.py; upstream wraps HF torch BLIP-2 instead —
    eval/models/blip.py:26-31).

All device work stays jitted (per-op eager dispatch is a tunnel round trip
on axon — CLAUDE.md); generation reuses each family's cached lax.scan
decode builder.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import numpy as np


class BaseEvalModel:
    """Interface contract (reference eval_model.py:8-108).

    ``vision`` values passed between methods are whatever the family's
    ``preprocess`` returned — each family interprets its own tensor layout.
    """

    name = "base"

    @property
    def image_size(self) -> int:
        raise NotImplementedError

    def preprocess(self, images: np.ndarray):
        """(B, H, W, 3) uint8/float raw images -> model vision input."""
        raise NotImplementedError

    def get_outputs(self, vision, prompts: Sequence[str],
                    max_new_tokens: int = 10, raw: bool = False) -> List[str]:
        """Greedy-decode a continuation per (image, prompt) row.  With
        raw=True the prompts already carry the family's inline markers
        (few-shot interleaved sequences) and are tokenized verbatim."""
        raise NotImplementedError

    def build_fewshot_prompt(self, demo_texts: Sequence[str],
                             final_prompt: str) -> str:
        """Compose a K-shot in-context prompt from completed demo texts
        (each already containing its ground-truth continuation) + the
        query prompt (upstream evaluate.py:939-957 context_text join).
        The result goes through get_outputs(raw=True)."""
        raise NotImplementedError

    def build_fewshot_vision(self, demo_images: Sequence[Sequence[np.ndarray]],
                             query_images: Sequence[np.ndarray]):
        """Assemble per-row (demo images..., query image) into the family's
        vision input.  Single-image families use the query image only (the
        upstream BLIP-2 restriction, eval/models/blip.py:45-47)."""
        raise NotImplementedError

    def get_caption_prompt(self, caption: Optional[str] = None) -> str:
        raise NotImplementedError

    def get_vqa_prompt(self, question: str, answer: Optional[str] = None) -> str:
        raise NotImplementedError

    def get_imagenet_prompt(self, label: Optional[str] = None) -> str:
        raise NotImplementedError

    def get_hateful_memes_prompt(self, text: str,
                                 label: Optional[str] = None) -> str:
        raise NotImplementedError

    def embed_images(self, images: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) raw -> (B, D) L2-normalized features (RICES index)."""
        raise NotImplementedError

    def score_texts(self, vision_one, texts: Sequence[str],
                    prompt: str) -> np.ndarray:
        """Rank-classification scores: summed NLL of each candidate text's
        continuation after `prompt`, for ONE image (reference
        get_rank_classifications, eval_model.py:69-108). Lower = better."""
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Flamingo (flagship stack)
# ---------------------------------------------------------------------------


class FlamingoEvalModel(BaseEvalModel):
    """The DeeR/OpenFlamingo stack behind the eval seam
    (reference eval/models/open_flamingo.py)."""

    name = "flamingo"

    def __init__(self, cfg, params, tok, decode_engine: str = "auto"):
        self.cfg = cfg
        self.params = params
        self.tok = tok
        # "recompute" re-runs the decoder over the whole buffer per token
        # (optimal for tiny prompts); "kv_cache" prefills per-layer K/V
        # once and attends new tokens against the cache (eval/kv_decode.py
        # — wins once few-shot prompts grow); "auto" switches on buffer
        # length
        assert decode_engine in ("auto", "recompute", "kv_cache")
        self.decode_engine = decode_engine

    @property
    def image_size(self) -> int:
        return self.cfg.vit.image_size

    def preprocess(self, images: np.ndarray):
        import jax
        import jax.numpy as jnp
        from deer_vla_tpu.data.preprocess import clip_preprocess
        size = self.image_size
        prep = _cached_jit(clip_preprocess, size)
        # (B, 3, H, W) -> (B, T=1, F=1, 3, H, W) media layout
        return np.asarray(prep(jnp.asarray(images)))[:, None, None]

    def get_outputs(self, vision, prompts, max_new_tokens=10, raw=False):
        import jax.numpy as jnp
        from deer_vla_tpu.eval.vl_eval import greedy_generate
        eos = getattr(self.tok, "eos_token_id", None)
        pad = getattr(self.tok, "pad_token_id", 0)
        if raw:
            # interleaved few-shot sequences with inline <image> /
            # <|endofchunk|> markers; generous budget, HF truncation guards
            words = max(len(p.split()) for p in prompts) + 1
            ids, mask = self.tok.encode_raw(list(prompts),
                                            min(512, 4 * words + 8))
            ids = np.array(ids, copy=True)
            mask = np.array(mask, copy=True)
            # drop any trailing <eos> so generation continues the prompt
            for r, length in enumerate(mask.sum(-1)):
                le = int(length)
                if eos is not None and le and ids[r, le - 1] == eos:
                    ids[r, le - 1] = pad
                    mask[r, le - 1] = 0
            longest = max(int(mask.sum(-1).max()), 1)
            ids, mask = ids[:, :longest], mask[:, :longest]
        else:
            ids, mask = self.tok(prompts)
            # strip each row's trailing <eoc><eos> at its true length so
            # generation continues the prompt (mixed-length rows are
            # right-padded — a flat [:, :-2] would only strip the longest
            # row)
            ids = np.array(ids, copy=True)
            mask = np.array(mask, copy=True)
            for r, length in enumerate(mask.sum(-1)):
                le = int(length)
                if le >= 2:
                    ids[r, le - 2:le] = 0
                    mask[r, le - 2:le] = 0
            ids, mask = ids[:, :-2], mask[:, :-2]
        from deer_vla_tpu.eval.kv_decode import (greedy_generate_cached,
                                                 supports_kv_cache)
        total = ids.shape[1] + max_new_tokens
        use_cache = supports_kv_cache(self.cfg) and (
            self.decode_engine == "kv_cache" or
            (self.decode_engine == "auto" and total >= 48))
        generate = greedy_generate_cached if use_cache else greedy_generate
        out = generate(self.params, self.cfg, jnp.asarray(vision),
                       ids, mask, max_new_tokens=max_new_tokens, eos_id=eos)
        return [_decode_row(self.tok, row, eos) for row in out]

    def build_fewshot_prompt(self, demo_texts, final_prompt) -> str:
        # reference open_flamingo.py prompt templates join each completed
        # demo as <image>...<|endofchunk|> before the query's open prompt
        return ("".join(f"<image>{t}<|endofchunk|>" for t in demo_texts)
                + f"<image>{final_prompt}")

    def build_fewshot_vision(self, demo_images, query_images):
        """Rows of K demo images + 1 query -> (B, K+1, 1, 3, H, W) media
        (the gated-xattn media-time mask routes each text span to its
        preceding image — models/gated_xattn.py)."""
        b = len(query_images)
        flat = np.concatenate(
            [np.stack(list(demo_images[r]) + [query_images[r]])
             for r in range(b)])
        prep = self.preprocess(flat)  # (B*(K+1), 1, 1, 3, H, W)
        k1 = prep.shape[0] // b
        return prep[:, 0].reshape(b, k1, *prep.shape[2:])

    def get_caption_prompt(self, caption=None) -> str:
        from deer_vla_tpu.data.vl_dataset import CaptionDataset
        return CaptionDataset.get_caption_prompt(caption)

    def get_vqa_prompt(self, question, answer=None) -> str:
        from deer_vla_tpu.data.vl_dataset import VQADataset
        return VQADataset.get_vqa_prompt(question, answer)

    # reference eval/models/open_flamingo.py:330-334 (the tokenizer prepends
    # the <image> marker itself — data/text.HashTokenizer.__call__)
    def get_imagenet_prompt(self, label=None) -> str:
        return f"Output:{label if label is not None else ''}"

    def get_hateful_memes_prompt(self, text, label=None) -> str:
        return (f"is an image with: '{text}' written on it. Is it hateful? "
                f"Answer:{label if label is not None else ''}")

    def embed_images(self, images: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        from deer_vla_tpu.eval.vl_eval import _l2norm, _pooled
        vision = self.preprocess(images)  # (B, 1, 1, 3, H, W)
        embed = _cached_jit_embed_flamingo(self.cfg)
        return np.asarray(embed(self.params, jnp.asarray(vision[:, 0, 0])))

    def score_texts(self, vision_one, texts, prompt="A photo of a"):
        from deer_vla_tpu.eval.vl_eval import classify_by_lm_score
        import jax.numpy as jnp
        _, scores = classify_by_lm_score(self.params, self.cfg,
                                         jnp.asarray(vision_one), list(texts),
                                         self.tok, prompt=prompt)
        return scores


@functools.lru_cache(maxsize=4)
def _cached_jit(fn, size):
    import jax
    return jax.jit(lambda x: fn(x, size))


@functools.lru_cache(maxsize=4)
def _cached_jit_embed_flamingo(cfg):
    import jax
    from deer_vla_tpu.eval.vl_eval import _l2norm, _pooled
    return jax.jit(lambda p, x: _l2norm(_pooled(p, x, cfg)))


# ---------------------------------------------------------------------------
# BLIP
# ---------------------------------------------------------------------------


class BlipEvalModel(BaseEvalModel):
    """JAX BLIP captioner behind the eval seam (reference
    eval/models/blip.py — upstream shells HF torch BLIP-2; the model here
    is models/blip.py, TPU-native)."""

    name = "blip"

    def __init__(self, cfg, params, tok):
        self.cfg = cfg
        self.params = params
        self.tok = tok

    @property
    def image_size(self) -> int:
        return self.cfg.vision.image_size

    def preprocess(self, images: np.ndarray):
        import jax.numpy as jnp
        from deer_vla_tpu.models.blip import blip_preprocess
        prep = _cached_jit(blip_preprocess, self.image_size)
        return np.asarray(prep(jnp.asarray(images)))

    def get_outputs(self, vision, prompts, max_new_tokens=10, raw=False):
        import jax.numpy as jnp
        from deer_vla_tpu.models.blip import blip_generate
        # raw prompts carry no BLIP-specific markers — same tokenization
        ids, mask = self.tok(prompts)
        out = blip_generate(self.params, self.cfg, jnp.asarray(vision),
                            ids, mask, max_new_tokens=max_new_tokens)
        return [_decode_row(self.tok, row, self.cfg.text.sep_token_id)
                for row in out]

    def build_fewshot_prompt(self, demo_texts, final_prompt) -> str:
        # text-only in-context examples: BLIP consumes one image per row
        # (reference eval/models/blip.py:45-47 asserts exactly that)
        return " ".join(list(demo_texts) + [final_prompt])

    def build_fewshot_vision(self, demo_images, query_images):
        return self.preprocess(np.stack(list(query_images)))

    # BLIP-2's single-image prompt formats (reference eval/models/blip.py:99-105)
    def get_vqa_prompt(self, question, answer=None) -> str:
        return (f"Question:{question} Short answer:"
                f"{answer if answer is not None else ''}")

    def get_caption_prompt(self, caption=None) -> str:
        return f"A photo of {caption if caption is not None else ''}"

    # upstream's BLIP-2 eval model defines no imagenet / hateful-memes
    # prompts; captioner-style equivalents keep the task matrix uniform
    def get_imagenet_prompt(self, label=None) -> str:
        return f"A photo of {label if label is not None else ''}"

    def get_hateful_memes_prompt(self, text, label=None) -> str:
        return (f"is an image with: '{text}' written on it. Is it hateful? "
                f"Answer:{label if label is not None else ''}")

    def embed_images(self, images: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        vision = self.preprocess(images)
        embed = _cached_jit_embed_blip(self.cfg)
        return np.asarray(embed(self.params, jnp.asarray(vision)))

    def score_texts(self, vision_one, texts, prompt="A photo of a"):
        """Rank candidates by decoder NLL of the class-name continuation
        (same contract as the flamingo scorer; reference
        blip.py get_rank_classifications)."""
        import jax.numpy as jnp
        from deer_vla_tpu.eval.vl_eval import continuation_target_mask
        ids, mask = self.tok([f"{prompt} {t}" for t in texts])
        _, p_mask = self.tok([prompt] * len(texts))
        # both BLIP tokenizers emit [DEC]-prefixed rows with NO trailing
        # specials, so the continuation starts exactly at the prompt length
        target_mask = continuation_target_mask(mask, p_mask,
                                               trailing_specials=0)
        scorer = _cached_blip_scorer(self.cfg)
        pix = jnp.repeat(jnp.asarray(vision_one), len(texts), axis=0)
        return np.asarray(scorer(self.params, pix, jnp.asarray(ids),
                                 jnp.asarray(mask), jnp.asarray(target_mask)))


@functools.lru_cache(maxsize=4)
def _cached_jit_embed_blip(cfg):
    """Pooled [CLS] feature of the BLIP ViT, L2-normalized (RICES)."""
    import jax
    import jax.numpy as jnp
    from deer_vla_tpu.models.blip import vision_forward

    def embed(params, pix):
        enc = vision_forward(params, pix, cfg.vision)
        cls = enc[:, 0].astype(jnp.float32)
        return cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True),
                                 1e-6)

    return jax.jit(embed)


@functools.lru_cache(maxsize=4)
def _cached_blip_scorer(cfg):
    import jax
    from deer_vla_tpu.models.blip import text_decoder_forward, vision_forward

    def score(params, pix, ids, mask, target_mask):
        from deer_vla_tpu.eval.vl_eval import summed_nll
        enc = vision_forward(params, pix, cfg.vision)
        logits = text_decoder_forward(params, ids, mask, enc, cfg.text)
        return summed_nll(logits, ids, target_mask)

    return jax.jit(score)


def _decode_row(tok, row, stop_id) -> str:
    """ids -> text; trims at/after the stop token. Hash tokenizers render
    raw ids (the debug fixture scores string-matched id sequences)."""
    toks = [int(t) for t in row]
    if stop_id is not None and stop_id in toks:
        toks = toks[:toks.index(stop_id)]
    if hasattr(tok, "tok"):  # HF-backed wrapper
        return tok.tok.decode(toks, skip_special_tokens=True)
    if hasattr(tok, "decode"):
        return tok.decode(toks, skip_special_tokens=True)
    return " ".join(str(t) for t in toks)


# ---------------------------------------------------------------------------
# factory
# ---------------------------------------------------------------------------


def make_eval_model(args) -> BaseEvalModel:
    """`--eval_model {flamingo,blip}` -> ready eval model (reference
    evaluate.py:398-400 importlib module selection).

    flamingo: loads via cli/eval.load_model + cli/train.make_tokenizer
    (checkpoint-aware).  blip: geometry from --model (tiny -> blip_tiny,
    else blip_base); --evaluate_from_checkpoint may point at an HF torch
    BlipForConditionalGeneration state dict (.pt/.bin) or a previously
    converted npz; otherwise PRNG init (debug)."""
    name = getattr(args, "eval_model", "flamingo")
    if name == "flamingo":
        from deer_vla_tpu.cli.eval import load_model
        from deer_vla_tpu.cli.train import make_tokenizer
        cfg, params = load_model(args)
        tok = make_tokenizer(args, cfg)
        cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
        return FlamingoEvalModel(cfg, params, tok,
                                 decode_engine=getattr(args, "decode_engine",
                                                       "auto"))
    if name == "blip":
        import jax
        from deer_vla_tpu.models.blip import blip_base, blip_tiny, init_blip
        cfg = blip_tiny() if args.model == "tiny" else blip_base()
        ckpt = getattr(args, "evaluate_from_checkpoint", "")
        if ckpt:
            params = _load_blip_checkpoint(ckpt, cfg)
        else:
            params = jax.jit(
                lambda k: init_blip(k, cfg))(jax.random.PRNGKey(args.seed))
        tok = make_blip_tokenizer(args, cfg)
        return BlipEvalModel(cfg, params, tok)
    raise SystemExit(f"unknown --eval_model {name!r} (flamingo|blip)")


def _load_blip_checkpoint(path: str, cfg):
    from deer_vla_tpu.models.blip import convert_hf_blip
    if path.endswith(".npz"):
        import jax.numpy as jnp
        flat = dict(np.load(path))
        return _unflatten(flat)
    import torch
    sd = torch.load(path, map_location="cpu")
    sd = sd.get("model", sd.get("state_dict", sd))
    return convert_hf_blip(sd, cfg)


def _unflatten(flat: dict) -> dict:
    import jax.numpy as jnp
    out: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return out


def make_blip_tokenizer(args, cfg):
    """HF BertTokenizer when --tokenizer_path is given, else the
    deterministic hash tokenizer with the BLIP decoder contract
    ([DEC]-prefixed rows, [SEP] stop)."""
    if getattr(args, "tokenizer_path", ""):
        return _HFBlipTokenizer(args.tokenizer_path, cfg)
    return BlipHashTokenizer(cfg.text.vocab_size, cfg.text.bos_token_id,
                             cfg.text.sep_token_id, cfg.text.pad_token_id)


class BlipHashTokenizer:
    """Deterministic stand-in tokenizer with the BLIP decoder contract:
    every row starts with [DEC] (bos) and carries no trailing [SEP] (the
    prompt is a prefix to continue).  Mirrors data/text.HashTokenizer."""

    def __init__(self, vocab_size: int, bos_token_id: int, sep_token_id: int,
                 pad_token_id: int = 0):
        self.vocab_size = vocab_size
        self.bos_token_id = bos_token_id
        self.sep_token_id = sep_token_id
        self.pad_token_id = pad_token_id
        self._specials = {bos_token_id, sep_token_id, pad_token_id}
        # hash ids live in [1, lo) excluding specials
        self._lo = min(bos_token_id, sep_token_id)

    def _word(self, w: str) -> int:
        import hashlib
        h = int(hashlib.md5(w.encode()).hexdigest(), 16)
        span = self._lo - 1
        return 1 + (h % span)

    def __call__(self, texts: Sequence[str]):
        seqs = [[self.bos_token_id] + [self._word(w) for w in t.split()]
                for t in texts]
        longest = max(len(s) for s in seqs)
        ids = np.full((len(seqs), longest), self.pad_token_id, np.int32)
        mask = np.zeros((len(seqs), longest), np.int32)
        for r, s in enumerate(seqs):
            ids[r, :len(s)] = s
            mask[r, :len(s)] = 1
        return ids, mask

    def decode(self, toks, skip_special_tokens=True) -> str:
        keep = [t for t in toks if not (skip_special_tokens and
                                        t in self._specials)]
        return " ".join(str(t) for t in keep)


class _HFBlipTokenizer:
    """BertTokenizer wrapper emitting [DEC]-prefixed prompt rows."""

    def __init__(self, path: str, cfg):
        from transformers import AutoTokenizer
        self.tok = AutoTokenizer.from_pretrained(path)
        self.bos_token_id = cfg.text.bos_token_id
        self.sep_token_id = cfg.text.sep_token_id
        self.pad_token_id = cfg.text.pad_token_id

    def __call__(self, texts: Sequence[str]):
        enc = self.tok(list(texts), padding=True, return_tensors="np",
                       add_special_tokens=False)
        ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        b = ids.shape[0]
        bos = np.full((b, 1), self.bos_token_id, np.int32)
        return (np.concatenate([bos, ids], 1),
                np.concatenate([np.ones((b, 1), np.int32), mask], 1))
