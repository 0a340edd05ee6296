#!/usr/bin/env bash
# Artifact-day runbook as ONE command (VERDICT r3 item 8).
#
# The day the published torch artifacts and/or a CALVIN simulator install
# land, run:
#
#     DEER_ARTIFACTS_DIR=/path/to/artifacts \
#     CALVIN_DATASET=/data/task_D_D \
#     CALVIN_CONF_PATH=calvin/calvin_models/conf \
#     bash scripts/readiness.sh [--run-eval]
#
# It probes every prerequisite, runs whichever gates are runnable, and
# prints a ready/blocked checklist — nothing has to be rediscovered.
#
# Steps, their inputs, and expected runtimes (single CPU host; the forward
# checks jit on CPU):
#   1. repo gate      pytest -m quick                       (~4 min)
#   2. artifact gate  scripts/verify_artifacts.py           (~10-20 min at 3B:
#                     key audit + conversion + all-exit forward + solver)
#        needs $DEER_ARTIFACTS_DIR containing:
#          ViT-L-14.pt                        (open_clip vision tower)
#          mpt-1b-redpajama-200b-dolly/       (HF MPT snapshot dir)
#          OpenFlamingo checkpoint .pt        (base, ~5 GB)
#          DeeR delta .pth                    (trainable-only state dict,
#                                              filename-encoded config)
#        (9B: mpt-7b/ + OpenFlamingo-9B + its delta; pass MODEL=mpt_9b)
#   3. conversion     deer-convert -> runs/converted_${MODEL}.ckpt
#                     (performed inside step 2; re-run standalone only if
#                     you need a different --out path)
#   4. sim gate       python -c 'import calvin_env, hydra, calvin_agent'
#        install recipe (host-side; see README "Real-CALVIN simulator"):
#          git clone --recurse-submodules https://github.com/mees/calvin.git
#          pip install -e calvin/calvin_env/tacto -e calvin/calvin_env \
#                      -e calvin/calvin_models
#   5. first eval     224 sequences (= reference NUM_SEQUENCES/ranks shard,
#                     eval_utils.py:523-527), exit_ratio 0.8
#                     (~40-70 min on one TPU v5e chip at 3B; pass --run-eval
#                     to execute, otherwise the exact command is printed)
#
# Exit code 0 iff every step that is RUNNABLE passed; blocked steps are
# reported, not failed (this script's job is the checklist).
set -u
cd "$(dirname "$0")/.."

MODEL="${MODEL:-mpt_dolly_3b}"
ARTS="${DEER_ARTIFACTS_DIR:-}"
DATASET="${CALVIN_DATASET:-}"
CONF="${CALVIN_CONF_PATH:-}"
RUN_EVAL=0
[ "${1:-}" = "--run-eval" ] && RUN_EVAL=1

declare -A STATUS DETAIL
overall=0

note() { STATUS[$1]=$2; DETAIL[$1]=${3:-}; }

# ---- 1. repo gate ---------------------------------------------------------
if python -m pytest tests/ -m quick -q >/tmp/readiness_quick.log 2>&1; then
  note repo_quick_tier ready "$(tail -1 /tmp/readiness_quick.log)"
else
  note repo_quick_tier FAILED "see /tmp/readiness_quick.log"; overall=1
fi

# ---- 2+3. artifact gate ---------------------------------------------------
find_one() { find "$ARTS" -maxdepth 2 -iname "$1" 2>/dev/null | head -1; }
if [ -z "$ARTS" ] || [ ! -d "$ARTS" ]; then
  note artifacts blocked "set DEER_ARTIFACTS_DIR (ViT-L-14.pt, MPT snapshot dir, OpenFlamingo ckpt, DeeR delta .pth)"
else
  CLIP=$(find_one 'ViT-L-14*.pt'); DEER=$(find_one '*stg=post*.pth')
  OF=$(find_one 'checkpoint*.pt'); MPT=$(find "$ARTS" -maxdepth 2 -iname '*mpt*' -type d 2>/dev/null | head -1)
  missing=""
  [ -z "$CLIP" ] && missing="$missing clip"; [ -z "$MPT" ] && missing="$missing mpt"
  [ -z "$OF" ] && missing="$missing openflamingo"; [ -z "$DEER" ] && missing="$missing deer-delta"
  if [ -n "$missing" ]; then
    note artifacts blocked "missing in $ARTS:$missing"
  elif python scripts/verify_artifacts.py --model "$MODEL" \
         --clip_checkpoint "$CLIP" --mpt_checkpoint "$MPT" \
         --openflamingo_checkpoint "$OF" --deer_checkpoint "$DEER" \
         --workdir runs/readiness >/tmp/readiness_artifacts.log 2>&1; then
    note artifacts ready "PARITY_ARTIFACTS.json in runs/readiness; converted ckpt ready"
  else
    note artifacts FAILED "see /tmp/readiness_artifacts.log + runs/readiness/PARITY_ARTIFACTS.json"; overall=1
  fi
fi

# ---- 4. sim gate ----------------------------------------------------------
if python -c 'import calvin_env, hydra, calvin_agent' >/dev/null 2>&1; then
  note calvin_sim ready ""
else
  note calvin_sim blocked "pip install -e calvin/{calvin_env/tacto,calvin_env,calvin_models} (README recipe)"
fi

# ---- 5. dataset + first eval ---------------------------------------------
if [ -z "$DATASET" ] || [ ! -d "$DATASET/validation" ]; then
  note calvin_dataset blocked "set CALVIN_DATASET to a task_D_D dir (training/ + validation/)"
else
  note calvin_dataset ready "$DATASET"
fi

CKPT=$(ls -t runs/readiness/converted.ckpt 2>/dev/null | head -1)
# --calib_streamed: the published 3B/9B checkpoints serve streaming (post
# fusion, window 12) — the carry-matched regime is the recommended default
# there (decision rule in MIGRATION.md "Calibration regime"; cli/eval
# warns if dropped).  Remove it only for vit_concat / use_hist variants.
EVAL_CMD="python -m deer_vla_tpu.cli.eval \
  --evaluate_from_checkpoint ${CKPT:-runs/readiness/converted.ckpt} \
  --calvin_dataset ${DATASET:-/data/task_D_D} \
  --calvin_conf_path ${CONF:-calvin/calvin_models/conf} \
  --calib_streamed \
  --num_sequences_override 224 --exit_ratio 0.8 --report_json runs/readiness/first_eval.json"
if [ "${STATUS[artifacts]}" = ready ] && [ "${STATUS[calvin_sim]}" = ready ] \
   && [ "${STATUS[calvin_dataset]}" = ready ] && [ -n "$CKPT" ]; then
  if [ "$RUN_EVAL" = 1 ]; then
    if $EVAL_CMD >/tmp/readiness_eval.log 2>&1; then
      note first_eval ready "runs/readiness/first_eval.json"
    else
      note first_eval FAILED "see /tmp/readiness_eval.log"; overall=1
    fi
  else
    note first_eval runnable "re-run with --run-eval, or: $EVAL_CMD"
  fi
else
  note first_eval blocked "needs artifacts + calvin_sim + calvin_dataset ready"
fi

# ---- checklist ------------------------------------------------------------
echo
echo "== DeeR-VLA-TPU artifact-day readiness (model=$MODEL) =="
for k in repo_quick_tier artifacts calvin_sim calvin_dataset first_eval; do
  printf "  %-16s %-9s %s\n" "$k" "${STATUS[$k]}" "${DETAIL[$k]}"
  # backstop: any FAILED row forces a non-zero exit even if a future step
  # forgets to set overall itself
  [ "${STATUS[$k]}" = FAILED ] && overall=1
done
if [ $overall -eq 0 ]; then
  echo "VERDICT: every runnable gate passed; blocked gates list their unblock step above."
else
  echo "VERDICT: a runnable gate FAILED — fix before artifact day."
fi
exit $overall
