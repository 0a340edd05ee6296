"""ToMe token merging for the frozen ViT tower — training-free vision
FLOPs reduction (Bolya et al., "Token Merging: Your ViT But Faster",
arXiv:2210.09461; VLA token-reduction evidence in PAPERS.md).

Why here: at the DeeR-B serving operating point the dual ViT-L encode is
~86-97% of per-action FLOPs (exit-1 step: 359 GFLOPs, of which ~350 is
vision — eval/flops.py), so shrinking the ViT token count is the single
largest structural latency lever left after early exit.  The reference has
no equivalent (its vision tower runs full 257-token ViT-L every step,
flamingo_mpt.py:573-580); this is a beyond-parity opt-in.

TPU-first design constraints honored:
  * STATIC shapes end-to-end: the per-layer merge count schedule is pure
    Python (``tome_schedule``), so layer i always sees the same token count
    — one compile, no dynamic shapes, MXU-sized matmuls throughout.
  * the layer loop must UNROLL (token count shrinks per layer), so the
    serving path indexes the stacked weight pytree per layer instead of
    lax.scan-ing it — argument-leaf count stays packed (CLAUDE.md dispatch
    note) while shapes stay per-layer static.
  * gather/scatter stays tiny next to the saved MLP matmuls: one
    (B, na, nb) similarity matmul + O(n·d) takes/scatter-adds per layer.

Downstream safety: the perceiver resampler treats media tokens as a SET
(models/perceiver.py — no positional terms on x; ViT pos-embeds are baked
into token values), so a merged/reordered/shorter token list is consumed
unchanged.  The CLS token is kept out of the merge sets entirely because
callers split ``h[:, 0]`` / ``h[:, 1:]`` positionally (models/vit.py:101).

Quality note: merging is approximate; action-drift vs the exact tower is
bounded in tests at tiny scale, but task success impact MUST be validated
against real checkpoints (BASELINE.md) before production use — ship as the
opt-in ``--vit_tome_r``.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp


def tome_schedule(num_patches: int, layers: int, r: int,
                  min_keep: int = 2) -> List[int]:
    """Per-layer merge counts for a constant-r ToMe schedule.

    Layer i merges ``min(r, n_i // 2, n_i - min_keep)`` patch tokens, where
    ``n_i`` is the patch-token count entering layer i (CLS excluded — it is
    never merged).  Pure Python so every layer's token count is static.
    """
    if r <= 0:
        return [0] * layers
    out, n = [], num_patches
    for _ in range(layers):
        ri = max(0, min(r, n // 2, n - min_keep))
        out.append(ri)
        n -= ri
    return out


def bipartite_merge(tokens: jnp.ndarray, metric: jnp.ndarray,
                    sizes: jnp.ndarray, r: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge the ``r`` most similar A→B token pairs (bipartite soft
    matching, ToMe §3): A = even-indexed tokens, B = odd-indexed; each A
    token's best cosine match in B is scored, the top-r A tokens are
    size-weighted-averaged into their B targets, the rest pass through.

    tokens: (B, n, D) patch tokens (NO CLS — caller holds it aside).
    metric: (B, n, dm) similarity features (mean attention keys).
    sizes:  (B, n) merged-token multiplicities (all-ones before any merge).
    Returns (tokens', sizes') with n' = n - r; static shapes throughout.
    """
    if r <= 0:
        return tokens, sizes
    b, n, d = tokens.shape
    na = (n + 1) // 2
    if not (0 < r <= min(na, n // 2)):
        raise ValueError(f"r={r} invalid for n={n} (max {min(na, n // 2)})")

    m = metric.astype(jnp.float32)
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-6)
    ma, mb = m[:, ::2], m[:, 1::2]                      # (B, na, dm), (B, nb, dm)
    scores = jnp.einsum("bad,bcd->bac", ma, mb)         # (B, na, nb)
    node_max = scores.max(axis=-1)                      # (B, na)
    node_idx = scores.argmax(axis=-1)                   # (B, na)
    order = jnp.argsort(-node_max, axis=-1)             # best-match A rows first
    src_idx, unm_idx = order[:, :r], order[:, r:]       # (B, r), (B, na-r)
    dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=1)  # (B, r)

    ta, tb = tokens[:, ::2], tokens[:, 1::2]
    sa, sb = sizes[:, ::2], sizes[:, 1::2]
    bidx = jnp.arange(b)[:, None]
    src_tok = jnp.take_along_axis(ta, src_idx[..., None], axis=1)
    src_sz = jnp.take_along_axis(sa, src_idx, axis=1)
    # size-weighted average in fp32 (bf16 token sums lose low bits fast)
    num_b = tb.astype(jnp.float32) * sb[..., None].astype(jnp.float32)
    num_b = num_b.at[bidx, dst_idx].add(
        src_tok.astype(jnp.float32) * src_sz[..., None].astype(jnp.float32))
    new_sb = sb.at[bidx, dst_idx].add(src_sz)
    merged_b = (num_b / new_sb[..., None].astype(jnp.float32)).astype(tokens.dtype)

    unm_tok = jnp.take_along_axis(ta, unm_idx[..., None], axis=1)
    unm_sz = jnp.take_along_axis(sa, unm_idx, axis=1)
    return (jnp.concatenate([unm_tok, merged_b], axis=1),
            jnp.concatenate([unm_sz, new_sb], axis=1))


def proportional_attn_bias(sizes_with_cls: jnp.ndarray, sq: int) -> jnp.ndarray:
    """log-size key bias for proportional attention (ToMe §3.1): a merged
    token representing s patches should weigh s× in softmax.  Returns
    (B, 1, sq, sk) fp32, the layout ops/pallas/flash_attention.py accepts."""
    logs = jnp.log(sizes_with_cls.astype(jnp.float32))   # (B, sk)
    return jnp.broadcast_to(logs[:, None, None, :],
                            (sizes_with_cls.shape[0], 1, sq,
                             sizes_with_cls.shape[1]))
