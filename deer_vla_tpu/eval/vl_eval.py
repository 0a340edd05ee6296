"""Vision-language benchmark evaluation — TPU-native equivalent of the
upstream open_flamingo eval harness (open_flamingo/eval/evaluate.py:393,
rices.py:95; SURVEY §2.6): greedy caption/VQA generation, RICES
retrieval-based in-context example selection, and the standard VQA accuracy
metric.

Generation is one `lax.scan` over decode steps with a static-length token
buffer (the text lengths here are tiny, so full recompute per step beats a
KV-cache in both simplicity and, at S<=64, actual cost).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.models.flamingo import encode_vision
from deer_vla_tpu.models.mpt import decoder_forward, lm_logits


import functools as _functools


@_functools.lru_cache(maxsize=16)
def make_greedy_generate(cfg: DeerConfig, n_new: int):
    """Cached jitted generate(params, vision_x, ids, mask, start_lens):
    ids is a (B, total_len) buffer pre-filled with prompts + padding;
    each ROW decodes greedily from its own prompt length (start_lens (B,)).
    Caching the builder avoids one XLA recompile per call."""

    def step_decode(params, vision_x, ids, mask, start_lens):
        media = encode_vision(params, vision_x, None, cfg)
        rows = jnp.arange(ids.shape[0])

        def body(carry, i):
            ids, mask = carry
            hidden, _ = decoder_forward(params["decoder"], ids, mask, media, cfg)
            logits = lm_logits(params["decoder"], hidden[-1], cfg.dtypes.cdt,
                           arch=cfg.mpt.arch)
            pos = start_lens + i - 1  # per-row last prompt/generated position
            nxt = logits[rows, pos].argmax(-1)
            write = start_lens + i
            ids = ids.at[rows, write].set(nxt.astype(ids.dtype))
            mask = mask.at[rows, write].set(1)
            return (ids, mask), nxt

        (ids, mask), toks = jax.lax.scan(body, (ids, mask), jnp.arange(n_new))
        return ids, jnp.swapaxes(toks, 0, 1)

    return jax.jit(step_decode)


def greedy_generate(params: dict, cfg: DeerConfig, vision_x, prompt_ids,
                    prompt_mask, max_new_tokens: int = 10,
                    eos_id: Optional[int] = None) -> np.ndarray:
    """Host wrapper: pads the prompts into a static buffer, decodes each row
    from ITS OWN prompt length, trims at eos. prompt_ids: (B, S)."""
    b, s = prompt_ids.shape
    total = s + max_new_tokens
    ids = np.zeros((b, total), np.int32)
    mask = np.zeros((b, total), np.int32)
    ids[:, :s] = np.asarray(prompt_ids)
    mask[:, :s] = np.asarray(prompt_mask)
    start_lens = np.asarray(prompt_mask).sum(1).astype(np.int32)
    gen = make_greedy_generate(cfg, max_new_tokens)
    out_ids, _ = gen(params, vision_x, jnp.asarray(ids), jnp.asarray(mask),
                     jnp.asarray(start_lens))
    out_ids = np.asarray(out_ids)
    out = np.stack([out_ids[r, start_lens[r]:start_lens[r] + max_new_tokens]
                    for r in range(b)])
    if eos_id is not None:
        for r in out:
            stop = np.where(r == eos_id)[0]
            if len(stop):
                r[stop[0]:] = eos_id
    return out


# ---------------------------------------------------------------------------
# zero-shot classification by LM scoring (classification_utils equivalent)
# ---------------------------------------------------------------------------


def summed_nll(logits, ids, target_mask):
    """Teacher-forced summed NLL of the target-masked tokens: logits
    (B, S, V) predict ids shifted by one; target_mask marks the scored
    positions.  Shared by the flamingo and BLIP rank-classification
    scorers so their numerics cannot drift."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = ids[:, 1:]
    logp = jax.nn.log_softmax(logits, -1)
    nll = -jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
    valid = target_mask[:, 1:].astype(nll.dtype)
    return (nll * valid).sum(-1)


def continuation_target_mask(mask: np.ndarray, prompt_mask: np.ndarray,
                             trailing_specials: int) -> np.ndarray:
    """(B, S) mask of continuation positions: from each row's prompt
    length (minus the tokenizer's trailing-special count — e.g. the
    flamingo tokenizers append <|endofchunk|><eos>, BLIP's append
    nothing) to its full valid length."""
    p_len = np.asarray(prompt_mask).sum(1) - trailing_specials
    pos = np.arange(np.asarray(mask).shape[1])[None]
    return ((pos >= p_len[:, None]) & (np.asarray(mask) > 0)).astype(np.int32)


@_functools.lru_cache(maxsize=8)
def make_lm_scorer(cfg: DeerConfig):
    """jitted score(params, vision_x, ids, mask, target_mask) -> (B,) summed
    NLL of the target-masked tokens — the upstream classification harness
    ranks class-name continuations by LM likelihood."""

    def score(params, vision_x, ids, mask, target_mask):
        from deer_vla_tpu.models.flamingo import encode_vision
        media = encode_vision(params, vision_x, None, cfg)
        hidden, _ = decoder_forward(params["decoder"], ids, mask, media, cfg)
        logits = lm_logits(params["decoder"], hidden[-1], cfg.dtypes.cdt,
                           arch=cfg.mpt.arch)
        return summed_nll(logits, ids, target_mask)

    return jax.jit(score)


def classify_by_lm_score(params: dict, cfg: DeerConfig, vision_x,
                         class_texts: Sequence[str], text_fn,
                         text_len: Optional[int] = None,
                         prompt: str = "A photo of a") -> Tuple[int, np.ndarray]:
    """Pick the class whose name continuation has the lowest LM NLL for one
    image.  vision_x: (1, 1, 1, 3, H, W).  Returns (argmin, scores)."""
    from deer_vla_tpu.data.text import fixed_length
    tl = text_len or cfg.text_len
    scorer = make_lm_scorer(cfg)
    texts = [f"{prompt} {c}" for c in class_texts]
    ids, mask = text_fn(texts)
    _, p_mask = text_fn([prompt] * len(texts))
    ids, mask = fixed_length(ids, mask, tl, getattr(text_fn, "pad_token_id", 0))
    # the flamingo tokenizers append <|endofchunk|><eos> after the prompt
    target_mask = continuation_target_mask(mask, p_mask, trailing_specials=2)
    n = len(texts)
    vis = jnp.repeat(vision_x, n, axis=0)
    scores = np.asarray(scorer(params, vis, jnp.asarray(ids),
                               jnp.asarray(mask), jnp.asarray(target_mask)))
    return int(scores.argmin()), scores


# ---------------------------------------------------------------------------
# RICES (Retrieval-based In-Context Example Selection, rices.py)
# ---------------------------------------------------------------------------


class RICES:
    """CLIP-vision-feature nearest-neighbor example retrieval.

    The upstream caches train-set CLIP features
    (scripts/cache_rices_features.py) and retrieves top-k cosine neighbors
    per query image.  Here the same ViT tower (pooled pre-proj CLS feature)
    provides the embedding."""

    def __init__(self, params: dict, cfg: DeerConfig, batch_size: int = 32):
        self.cfg = cfg
        self._embed = jax.jit(
            lambda p, x: _l2norm(_pooled(p, x, cfg)))
        self.params = params
        self.batch_size = batch_size
        self.features: Optional[np.ndarray] = None

    def build_index(self, images: np.ndarray) -> np.ndarray:
        """images: (N, 3, H, W) preprocessed. Caches (N, D) features."""
        feats = []
        for i in range(0, len(images), self.batch_size):
            feats.append(np.asarray(
                self._embed(self.params, jnp.asarray(images[i:i + self.batch_size]))))
        self.features = np.concatenate(feats, 0)
        return self.features

    def retrieve(self, query_images: np.ndarray, k: int) -> np.ndarray:
        """(B, 3, H, W) -> (B, k) train indices, most similar LAST (the
        upstream reverses so the closest example is nearest the query)."""
        assert self.features is not None, "call build_index or load first"
        q = np.asarray(self._embed(self.params, jnp.asarray(query_images)))
        return rices_retrieve(q, self.features, k)

    def save(self, path: str) -> None:
        """Persist the feature index (scripts/cache_rices_features.py's
        torch.save equivalent, npz format).  Writes to `path` exactly (an
        open file handle stops np.savez from appending '.npz')."""
        assert self.features is not None, "call build_index first"
        with open(path, "wb") as f:
            np.savez(f, features=self.features)

    def load(self, path: str) -> np.ndarray:
        """Load a cached feature index built by `save` / the
        deer-cache-features CLI; skips the per-eval ViT sweep."""
        self.features = np.load(path)["features"]
        return self.features


def roc_auc(labels, scores) -> float:
    """Binary ROC-AUC via the tie-averaged Mann-Whitney U rank statistic —
    dependency-free sklearn.roc_auc_score equivalent (the upstream hateful-
    memes headline metric, evaluate.py:1280-1291)."""
    labels = np.asarray(labels).astype(bool)
    scores = np.asarray(scores, np.float64)
    n_pos = int(labels.sum())
    n_neg = int((~labels).sum())
    if n_pos == 0 or n_neg == 0:
        return 0.5  # degenerate: undefined; chance by convention
    order = np.argsort(scores, kind="mergesort")
    s = scores[order]
    ranks = np.empty(len(s), np.float64)
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    u = ranks[labels].sum() - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def rices_retrieve(query_feats: np.ndarray, index_feats: np.ndarray,
                   k: int) -> np.ndarray:
    """Cosine top-k retrieval core (features pre-L2-normalized), most
    similar LAST — shared by RICES and the pluggable eval models
    (rices.py:95's sort + reverse)."""
    sim = np.asarray(query_feats) @ np.asarray(index_feats).T
    top = np.argsort(-sim, axis=1)[:, :k]
    return top[:, ::-1]


def _pooled(params, x, cfg):
    from deer_vla_tpu.models.vit import vit_forward
    pooled, _ = vit_forward(params["vit"], x.astype(cfg.dtypes.cdt), cfg.vit)
    return pooled


def _l2norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)


# ---------------------------------------------------------------------------
# metrics (vqa_metric.py equivalents, dependency-free)
# ---------------------------------------------------------------------------


_ARTICLES = {"a", "an", "the"}


def normalize_answer(s: str) -> str:
    s = s.lower().strip()
    s = re.sub(r"[^\w\s]", "", s)
    return " ".join(w for w in s.split() if w not in _ARTICLES)


# Official VQAEval normalization tables (vqa_metric.py:245-320): contraction
# repairs, number words -> digits, article removal, punctuation rules
# (periods stripped unless decimal; commas stripped inside numbers;
# apostrophes kept inside words).
_CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't", "couldve":
    "could've", "couldnt": "couldn't", "couldn'tve": "couldn't've",
    "couldnt've": "couldn't've", "didnt": "didn't", "doesnt": "doesn't",
    "dont": "don't", "hadnt": "hadn't", "hadnt've": "hadn't've",
    "hadn'tve": "hadn't've", "hasnt": "hasn't", "havent": "haven't",
    "hed": "he'd", "hed've": "he'd've", "he'dve": "he'd've", "hes": "he's",
    "howd": "how'd", "howll": "how'll", "hows": "how's", "Id've": "I'd've",
    "I'dve": "I'd've", "Im": "I'm", "Ive": "I've", "isnt": "isn't",
    "itd": "it'd", "itd've": "it'd've", "it'dve": "it'd've",
    "itll": "it'll", "let's": "let's", "maam": "ma'am",
    "mightnt": "mightn't", "mightnt've": "mightn't've",
    "mightn'tve": "mightn't've", "mightve": "might've",
    "mustnt": "mustn't", "mustve": "must've", "neednt": "needn't",
    "notve": "not've", "oclock": "o'clock", "oughtnt": "oughtn't",
    "ow's'at": "'ow's'at", "'ows'at": "'ow's'at", "'ow'sat": "'ow's'at",
    "shant": "shan't", "shed've": "she'd've", "she'dve": "she'd've",
    "she's": "she's", "shouldve": "should've", "shouldnt": "shouldn't",
    "shouldnt've": "shouldn't've", "shouldn'tve": "shouldn't've",
    "somebody'd": "somebodyd", "somebodyd've": "somebody'd've",
    "somebody'dve": "somebody'd've", "somebodyll": "somebody'll",
    "somebodys": "somebody's", "someoned": "someone'd",
    "someoned've": "someone'd've", "someone'dve": "someone'd've",
    "someonell": "someone'll", "someones": "someone's",
    "somethingd": "something'd", "somethingd've": "something'd've",
    "something'dve": "something'd've", "somethingll": "something'll",
    "thats": "that's", "thered": "there'd", "thered've": "there'd've",
    "there'dve": "there'd've", "therere": "there're", "theres": "there's",
    "theyd": "they'd", "theyd've": "they'd've", "they'dve": "they'd've",
    "theyll": "they'll", "theyre": "they're", "theyve": "they've",
    "twas": "'twas", "wasnt": "wasn't", "wed've": "we'd've",
    "we'dve": "we'd've", "weve": "we've", "werent": "weren't",
    "whatll": "what'll", "whatre": "what're", "whats": "what's",
    "whatve": "what've", "whens": "when's", "whered": "where'd",
    "wheres": "where's", "whereve": "where've", "whod": "who'd",
    "whod've": "who'd've", "who'dve": "who'd've", "wholl": "who'll",
    "whos": "who's", "whove": "who've", "whyll": "why'll",
    "whyre": "why're", "whys": "why's", "wont": "won't",
    "wouldve": "would've", "wouldnt": "wouldn't",
    "wouldnt've": "wouldn't've", "wouldn'tve": "wouldn't've",
    "yall": "y'all", "yall'll": "y'all'll", "y'allll": "y'all'll",
    "yall'd've": "y'all'd've", "y'alld've": "y'all'd've",
    "y'all'dve": "y'all'd've", "youd": "you'd", "youd've": "you'd've",
    "you'dve": "you'd've", "youll": "you'll", "youre": "you're",
    "youve": "you've",
}
_MANUAL_MAP = {"none": "0", "zero": "0", "one": "1", "two": "2",
               "three": "3", "four": "4", "five": "5", "six": "6",
               "seven": "7", "eight": "8", "nine": "9", "ten": "10"}
_PUNCT = [";", r"/", "[", "]", '"', "{", "}", "(", ")", "=", "+", "\\",
          "_", "-", ">", "<", "@", "`", ",", "?", "!"]
_COMMA_STRIP = re.compile(r"(\d)(,)(\d)")
_PERIOD_STRIP = re.compile(r"(?!<=\d)(\.)(?!\d)")


def _process_punctuation(t: str) -> str:
    out = t
    for p in _PUNCT:
        if (p + " " in t or " " + p in t) or (_COMMA_STRIP.search(t) is not None):
            out = out.replace(p, "")
        else:
            out = out.replace(p, " ")
    return _PERIOD_STRIP.sub("", out)


def _process_digit_article(t: str) -> str:
    out = []
    for w in t.lower().split():
        w = _MANUAL_MAP.get(w, w)
        if w not in _ARTICLES:
            out.append(w)
    for i, w in enumerate(out):
        if w in _CONTRACTIONS:
            out[i] = _CONTRACTIONS[w]
    return " ".join(out)


def vqa_normalize(s: str) -> str:
    """The official VQAEval answer normalization (vqa_metric.py:245-320 —
    processPunctuation + processDigitArticle, with the same newline/tab
    pre-cleanup)."""
    s = s.replace("\n", " ").replace("\t", " ").strip()
    return _process_digit_article(_process_punctuation(s))


def vqa_accuracy(prediction: str, answers: Sequence[str]) -> float:
    """Official VQA accuracy: the average over all leave-one-out subsets of
    the human answers of min(#matching answers in subset / 3, 1) — the
    vqaEval.py formula (for k answers: mean over k subsets of size k-1).
    Falls back to min(matches/3, 1) when fewer than 2 answers exist."""
    pred = vqa_normalize(prediction)
    matches = sum(vqa_normalize(a) == pred for a in answers)
    k = len(answers)
    if k < 2:
        return min(matches / 3.0, 1.0)
    # leaving out a matching answer -> m-1 matches remain; else m remain
    acc_without_match = min((matches - 1) / 3.0, 1.0) if matches else 0.0
    acc_with_match = min(matches / 3.0, 1.0)
    return (matches * acc_without_match
            + (k - matches) * acc_with_match) / k


def postprocess_vqa_generation(text: str) -> str:
    """Cut the generation at the next Question/Answer/Short marker and at
    the first comma — the upstream answer extraction
    (eval_models/open_flamingo.py + ok_vqa_utils.py:211-215)."""
    text = re.split("Question|Answer|Short", text, 1)[0]
    return re.split(", ", text, 1)[0].strip()


_VOWELS = set("aeiou")


def _singularize(w: str) -> str:
    if len(w) <= 3 or w.endswith("ss") or w.endswith("us"):
        return w
    if w.endswith("ies"):
        return w[:-3] + "y"
    if any(w.endswith(s) for s in ("ches", "shes", "xes", "zes", "ses")):
        return w[:-2]
    if w.endswith("s"):
        return w[:-1]
    return w


def _lemmatize_ing(w: str) -> str:
    stem = w[:-3]
    if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
        return stem[:-1]             # running -> run
    if (len(stem) >= 3 and stem[-1] not in _VOWELS
            and stem[-2] in _VOWELS and stem[-3] not in _VOWELS):
        return stem + "e"            # riding -> ride, dining -> dine
    return stem                      # firefighting -> firefight


def okvqa_stem(text: str) -> str:
    """OK-VQA v1.1-style answer stemming, dependency-free.

    The upstream (ok_vqa_utils.py:187-208) uses nltk POS tags + WordNet
    lemmatization + inflection.singularize + a manual-fix table; none of
    those are available here, so this applies the same two rules
    heuristically (-ing verbs lemmatized, plural nouns singularized).
    Predictions and references go through the SAME stemmer, which is what
    the accuracy comparison needs.
    """
    out = []
    for w in text.lower().split():
        if w.endswith("ing") and len(w) > 4:
            w = _lemmatize_ing(w)
        else:
            w = _singularize(w)
        out.append(w)
    return " ".join(out)


def okvqa_accuracy(prediction: str, answers: Sequence[str]) -> float:
    """VQA accuracy over stemmed answers (the OK-VQA protocol)."""
    return vqa_accuracy(okvqa_stem(postprocess_vqa_generation(prediction)),
                        [okvqa_stem(a) for a in answers])


def caption_bleu1(prediction: str, references: Sequence[str]) -> float:
    """Unigram precision with brevity penalty (lightweight CIDEr stand-in)."""
    pred = normalize_answer(prediction).split()
    if not pred:
        return 0.0
    best = 0.0
    for ref in references:
        r = normalize_answer(ref).split()
        overlap = sum(min(pred.count(w), r.count(w)) for w in set(pred))
        p = overlap / len(pred)
        bp = 1.0 if len(pred) >= len(r) else np.exp(1 - len(r) / max(len(pred), 1))
        best = max(best, p * bp)
    return float(best)


# ---------------------------------------------------------------------------
# CIDEr-D (Vedantam et al. 2015) — corpus-level, dependency-free
# ---------------------------------------------------------------------------


def _ngram_counts(tokens, n):
    from collections import Counter
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def cider_d(predictions: Sequence[str], references: Sequence[Sequence[str]],
            max_n: int = 4, sigma: float = 6.0) -> float:
    """Corpus CIDEr-D score in [0, 10] (the COCO caption metric the
    reference's eval suite reports; pycocoevalcap-equivalent math):
    tf-idf n-gram vectors (n=1..4), per-n clipped cosine to each reference,
    gaussian length penalty, averaged over n and refs, x10.

    predictions[i] pairs with references[i] (a list of ref captions).
    Corpus-level because idf is computed over the reference set.
    """
    import math
    from collections import defaultdict

    toks_p = [normalize_answer(p).split() for p in predictions]
    toks_r = [[normalize_answer(r).split() for r in refs]
              for refs in references]
    n_img = len(toks_p)
    if n_img == 0:
        return 0.0

    # document frequency over reference sets
    df = [defaultdict(int) for _ in range(max_n)]
    for refs in toks_r:
        for n in range(max_n):
            seen = set()
            for r in refs:
                seen |= set(_ngram_counts(r, n + 1).keys())
            for g in seen:
                df[n][g] += 1
    log_n = math.log(max(n_img, 1))

    def tfidf(counts, n):
        # pycocoevalcap uses RAW counts * idf (no length normalization):
        # the scale matters inside the min() clipping below, where a
        # normalized candidate vector would be clipped against a
        # differently-scaled reference vector
        vec, norm = {}, 0.0
        for g, c in counts.items():
            idf = log_n - math.log(max(df[n][g], 1))  # unseen -> full idf
            w = c * idf
            vec[g] = w
            norm += w * w
        return vec, math.sqrt(norm)

    total = 0.0
    for ti, refs in zip(toks_p, toks_r):
        score_n = np.zeros(max_n)
        for n in range(max_n):
            cv, cn = tfidf(_ngram_counts(ti, n + 1), n)
            for r in refs:
                rv, rn = tfidf(_ngram_counts(r, n + 1), n)
                # CIDEr-D clips candidate counts at reference counts
                num = sum(min(cv.get(g, 0.0), rv[g]) * rv[g] for g in rv)
                if cn > 0 and rn > 0:
                    delta = len(ti) - len(r)
                    penalty = math.exp(-delta * delta / (2 * sigma * sigma))
                    score_n[n] += penalty * num / (cn * rn)
            score_n[n] /= max(len(refs), 1)
        total += float(score_n.mean())
    return 10.0 * total / n_img
