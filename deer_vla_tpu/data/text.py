"""Instruction tokenization.

Reference format (data.py:905-919): ``<image>{instr}<|endofchunk|>{eos}``,
right padding to the longest in batch, max_length 32.  Special tokens
<|endofchunk|>, <image> and <PAD> are appended to the LM tokenizer
(factory.py:119-126).

Two backends:
  * HFTokenizer — wraps a local transformers tokenizer when MPT tokenizer
    files are available (production).
  * HashTokenizer — deterministic, dependency-free fallback for tests and
    synthetic runs: words hash into the vocab range; same text -> same ids.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Tuple

import numpy as np


class HashTokenizer:
    """Deterministic stand-in tokenizer with the Flamingo special tokens."""

    def __init__(self, vocab_size: int = 50432, max_length: int = 32):
        self.vocab_size = vocab_size
        self.max_length = max_length
        # ids at the top of the vocab, mirroring resize_token_embeddings order:
        # <|endofchunk|>, <image>, <PAD>
        self.eoc_token_id = vocab_size - 3
        self.media_token_id = vocab_size - 2
        self.pad_token_id = vocab_size - 1
        self.eos_token_id = 0
        self._word_range = vocab_size - 4

    def _word_id(self, w: str) -> int:
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "little")
        return 1 + h % (self._word_range - 1)

    def __call__(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (input_ids, attention_mask), right-padded to the longest
        (capped at max_length), layout ``<image> w1..wn <|endofchunk|> <eos>``."""
        seqs: List[List[int]] = []
        for t in texts:
            ids = [self.media_token_id]
            ids += [self._word_id(w) for w in t.strip().split()]
            ids += [self.eoc_token_id, self.eos_token_id]
            seqs.append(ids[: self.max_length])
        longest = min(max(len(s) for s in seqs), self.max_length)
        longest = max(longest, 1)
        input_ids = np.full((len(seqs), longest), self.pad_token_id, np.int32)
        mask = np.zeros((len(seqs), longest), np.int32)
        for i, s in enumerate(seqs):
            input_ids[i, :len(s)] = s
            mask[i, :len(s)] = 1
        return input_ids, mask

    def encode_raw(self, texts: Sequence[str], max_length: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Tokenize text that already contains inline ``<image>`` /
        ``<|endofchunk|>`` markers (interleaved MMC4-style sequences,
        open_flamingo/train/data.py:216-233).  Fixed max_length padding."""
        import re
        parts = re.compile(r"(<image>|<\|endofchunk\|>)")
        seqs: List[List[int]] = []
        for t in texts:
            ids: List[int] = []
            for piece in parts.split(t.strip()):
                if piece == "<image>":
                    ids.append(self.media_token_id)
                elif piece == "<|endofchunk|>":
                    ids.append(self.eoc_token_id)
                else:
                    ids += [self._word_id(w) for w in piece.split()]
            ids.append(self.eos_token_id)
            seqs.append(ids[:max_length])
        input_ids = np.full((len(seqs), max_length), self.pad_token_id, np.int32)
        mask = np.zeros((len(seqs), max_length), np.int32)
        for i, s in enumerate(seqs):
            input_ids[i, :len(s)] = s
            mask[i, :len(s)] = 1
        return input_ids, mask


class HFTokenizer:
    """transformers-backed tokenizer with the Flamingo specials appended
    (factory.py:116-126)."""

    def __init__(self, tokenizer_path: str, max_length: int = 32):
        from transformers import AutoTokenizer
        self.tok = AutoTokenizer.from_pretrained(tokenizer_path, local_files_only=True)
        self.tok.add_special_tokens(
            {"additional_special_tokens": ["<|endofchunk|>", "<image>"]})
        if self.tok.pad_token is None:
            self.tok.add_special_tokens({"pad_token": "<PAD>"})
        self.tok.padding_side = "right"
        self.max_length = max_length
        self.eoc_token_id = self.tok.encode("<|endofchunk|>")[-1]
        self.media_token_id = self.tok.encode("<image>")[-1]
        self.pad_token_id = self.tok.pad_token_id
        self.eos_token_id = self.tok.eos_token_id
        self.vocab_size = len(self.tok)

    def __call__(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        sample = [f"<image>{t.strip()}<|endofchunk|>{self.tok.eos_token}"
                  for t in texts]
        enc = self.tok(sample, max_length=self.max_length, padding="longest",
                       truncation="only_first", return_tensors="np")
        return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(np.int32)

    def encode_raw(self, texts: Sequence[str], max_length: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Tokenize text with inline special markers, fixed-length padding
        (MMC4 interleaved format, open_flamingo/train/data.py:216-233)."""
        enc = self.tok(list(texts), max_length=max_length,
                       padding="max_length", truncation=True,
                       return_tensors="np")
        return enc["input_ids"].astype(np.int32), \
            enc["attention_mask"].astype(np.int32)


def fixed_length(ids: np.ndarray, mask: np.ndarray, length: int,
                 pad_id: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad/crop to a fixed length (static shapes for jit)."""
    b, s = ids.shape
    if s >= length:
        return ids[:, :length], mask[:, :length]
    out_ids = np.full((b, length), pad_id, ids.dtype)
    out_mask = np.zeros((b, length), mask.dtype)
    out_ids[:, :s] = ids
    out_mask[:, :s] = mask
    return out_ids, out_mask
