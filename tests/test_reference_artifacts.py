"""Format compatibility with the reference's REAL frozen artifacts.

These tests READ the public reference checkout (data only, no code) to prove
our loaders consume the actual published artifacts byte-for-byte; they skip
when the reference isn't mounted."""

import json
import os

import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")


def test_eval_sequences_format():
    from deer_vla_tpu.eval.rollout import load_eval_sequences
    seqs = load_eval_sequences(os.path.join(REF, "eval_sequences.json"))
    assert len(seqs) == 1000  # frozen 1000-chain list (eval_utils.py:521)
    initial_state, chain = seqs[0]
    assert len(chain) == 5
    assert all(isinstance(t, str) for t in chain)
    # shardable over the reference's 8-rank eval (NUM_SEQUENCES % ranks == 0)
    assert len(seqs) % 8 == 0


def test_enrich_lang_annotations_format():
    with open(os.path.join(REF, "enrich_lang_annotations.json")) as f:
        enrich = json.load(f)
    assert isinstance(enrich, dict) and len(enrich) > 10
    some_task = next(iter(enrich))
    assert isinstance(enrich[some_task], list)
    # usable by our text-aug path and annotation-cache generator
    from deer_vla_tpu.eval.sequences import generate_annotation_cache
    seqs = [({}, list(enrich.keys())[:5])]
    cache = generate_annotation_cache(seqs, enrich)
    assert len(cache[0]) == 5 and all(isinstance(s, str) for s in cache[0])


def test_lang_annotation_cache_format():
    with open(os.path.join(REF, "lang_annotation_cache.json")) as f:
        cache = json.load(f)
    assert isinstance(cache, list) and len(cache) >= 1000
    assert isinstance(cache[0], list) and isinstance(cache[0][0], str)
    # our diverse-inst resolution consumes it directly
    from deer_vla_tpu.eval.rollout import resolve_annotation
    assert resolve_annotation(cache, "x", seq_i=3, subtask_i=2) == cache[3][2]


def test_partial_task_data_format():
    with open(os.path.join(REF, "partial_task_data.json")) as f:
        partial = json.load(f)
    spans = {tuple(x) for x in partial}
    assert all(len(s) == 2 and s[0] < s[1] for s in list(spans)[:10])
