"""HFTokenizer wrapper (production tokenizer path) exercised with an
offline-constructed transformers tokenizer — no downloads."""

import os

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast
    vocab = {"<eos>": 0, "pick": 1, "up": 2, "the": 3, "red": 4,
             "block": 5, "a": 6, "rotate": 7, "blue": 8, "slider": 9,
             "left": 10, "unk": 11}
    t = Tokenizer(models.WordLevel(vocab, unk_token="unk"))
    t.pre_tokenizer = pre_tokenizers.Whitespace()
    d = str(tmp_path_factory.mktemp("tok"))
    t.save(os.path.join(d, "tokenizer.json"))
    PreTrainedTokenizerFast(tokenizer_file=os.path.join(d, "tokenizer.json"),
                            eos_token="<eos>").save_pretrained(d)
    return d


def test_hf_tokenizer_flamingo_format(tok_dir):
    """Flamingo specials appended + reference text format
    (<image>{instr}<|endofchunk|><eos>, right padding; data.py:905-919)."""
    from deer_vla_tpu.data.text import HFTokenizer
    tok = HFTokenizer(tok_dir, max_length=16)
    ids, mask = tok(["pick up the red block", "rotate blue slider left"])
    assert ids.shape == mask.shape and ids.shape[0] == 2
    # layout: <image> words... <|endofchunk|> <eos>
    assert (ids[:, 0] == tok.media_token_id).all()
    row0 = ids[0][mask[0] > 0]
    assert row0[-2] == tok.eoc_token_id and row0[-1] == tok.eos_token_id
    # right padding with the added <PAD>
    assert tok.pad_token_id is not None
    short, m2 = tok(["pick", "rotate blue slider left"])
    assert (short[0][m2[0] == 0] == tok.pad_token_id).all()


def test_hf_tokenizer_in_train_cli_path(tok_dir):
    """make_tokenizer routes to HFTokenizer when --tokenizer_path is set."""
    import argparse
    from deer_vla_tpu.cli.train import make_tokenizer
    from deer_vla_tpu.core.config import deer_tiny
    args = argparse.Namespace(tokenizer_path=tok_dir)
    cfg = deer_tiny()
    tok = make_tokenizer(args, cfg)
    from deer_vla_tpu.data.text import HFTokenizer
    assert isinstance(tok, HFTokenizer)
    ids, mask = tok(["pick up the red block"])
    assert ids[0, 0] == tok.media_token_id
