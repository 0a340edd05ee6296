"""Generate the frozen eval artifacts (SURVEY §2.7):
  eval_sequences.json        — N deterministic 5-subtask chains
                               (save_sequences equivalent, eval_utils.py:729-733)
  lang_annotation_cache.json — pre-sampled enriched instruction per
                               (sequence, subtask) for --diverse_inst
                               (eval_utils.py:713-726)

Uses the real CALVIN task-distribution sampler when calvin_agent is
installed; otherwise a uniform sampler over --tasks (deterministic in seed).
"""

from __future__ import annotations

import argparse
import json

from deer_vla_tpu.utils.errors import record


@record
def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_sequences", default="eval_sequences.json")
    p.add_argument("--out_annotation_cache", default="")
    p.add_argument("--num_sequences", type=int, default=1000)
    p.add_argument("--chain_len", type=int, default=5)
    p.add_argument("--tasks", nargs="*", default=None,
                   help="task list for the uniform fallback sampler")
    p.add_argument("--enrich_lang", default="",
                   help="enrich_lang_annotations.json for the cache")
    p.add_argument("--annotations", default="",
                   help="base {task: text} json merged into candidates")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    from deer_vla_tpu.data.debug_data import TASKS
    from deer_vla_tpu.eval.sequences import (generate_annotation_cache,
                                             generate_sequences,
                                             save_annotation_cache,
                                             save_sequences)

    tasks = args.tasks or TASKS
    seqs = generate_sequences(tasks, n=args.num_sequences,
                              chain_len=args.chain_len, seed=args.seed)
    save_sequences(args.out_sequences, seqs)
    print(f"wrote {len(seqs)} sequences -> {args.out_sequences}")

    if args.out_annotation_cache:
        enrich = json.load(open(args.enrich_lang)) if args.enrich_lang else {}
        base = json.load(open(args.annotations)) if args.annotations else {}
        cache = generate_annotation_cache(seqs, enrich, base, seed=args.seed)
        save_annotation_cache(args.out_annotation_cache, cache)
        print(f"wrote annotation cache -> {args.out_annotation_cache}")


if __name__ == "__main__":
    main()
