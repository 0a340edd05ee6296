"""Evaluation CLI — eval_calvin.py equivalent.

Differences by design: the model config comes from the checkpoint's JSON
sidecar, not from regexing the filename (eval_calvin.py:356-421); the
calibrated value cache is a .values.npz sidecar, not an in-place mutation of
the checkpoint (:601-611).

BO/eval_ckpts contract preserved: the LAST THREE stdout lines are
  thresholds (comma separated)
  avg successful sequence length
  avg exit layer
(eval_calvin.py:646-653 prints exactly these for bayesian_optimization.py
and eval_ckpts.py log parsing.)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DeeR-VLA TPU evaluation")
    p.add_argument("--evaluate_from_checkpoint", default="")
    p.add_argument("--model", default="tiny",
                   help="model config when no checkpoint is given")
    p.add_argument("--max_layer", type=int, default=-1)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--calvin_dataset", default=os.environ.get("calvin_dataset_path", ""))
    p.add_argument("--calvin_conf_path", default=os.environ.get("calvin_conf_path", ""))
    p.add_argument("--tokenizer_path", default="")
    p.add_argument("--num_seq", type=int, default=224)
    p.add_argument("--eval_sequences", default="eval_sequences.json")
    p.add_argument("--diverse_inst", action="store_true",
                   help="enriched-instruction eval from the annotation cache "
                        "(lang_annotation_cache.json, eval_utils.py:513-516)")
    p.add_argument("--annotation_cache", default="lang_annotation_cache.json")
    p.add_argument("--ep_len", type=int, default=360)
    # dynamic exit
    p.add_argument("--exit_ratio", type=float, default=1.0)
    p.add_argument("--exit_dist", default="exp", choices=["exp", "gauss", "gamma"])
    p.add_argument("--threshold_type", default="L2",
                   choices=["mean", "L2", "max", "cosine"])
    p.add_argument("--steps_per_stage", type=int, default=1)
    p.add_argument("--thresholds", type=float, nargs="*", default=None,
                   help="direct thresholds (BO mode), last should be 1e5")
    p.add_argument("--exit_id", type=int, default=None,
                   help="fixed exit layer (static eval, disables dynamic exit)")
    p.add_argument("--quantize", default="none",
                   choices=["none", "int8", "int8_w8a8", "int4", "int4_w8a8"],
                   help="quantized serving (ops/quant.py): int8 = "
                        "weight-only (halves weight HBM traffic of the "
                        "B=1 step, dequant fused into the dots); "
                        "int8_w8a8 = int8 weights + dynamic per-row int8 "
                        "activations (int8 MXU matmuls, 2x bf16 MXU "
                        "throughput — for compute-bound batched serving, "
                        "--lanes); int4 = weight-only nibble-packed "
                        "(half int8's weight bytes; coarse, opt-in); "
                        "int4_w8a8 = int4 weights + int8 activations "
                        "(half w8a8's weight bytes on the int8 MXU). "
                        "Embeddings and the action heads stay "
                        "full precision. Serves both the while-loop "
                        "engine and the host-bucketed DeerPolicy")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "fused", "bucketed"],
                   help="dynamic-exit execution model: fused = one XLA "
                        "program per action (lax.cond buckets); bucketed = "
                        "host-sequenced bucket programs (supports "
                        "steps_per_stage/ensemble)")
    p.add_argument("--use_action_ensemble", action="store_true",
                   help="average the last two evaluated exits' actions "
                        "(bucketed engine, value_net.py:92-95)")
    p.add_argument("--multi_execution", type=int, default=1,
                   help="repeat/consume k actions per policy call")
    p.add_argument("--diff_steps", type=int, default=0,
                   help="diffusion head: >0 samples plans with a DDIM "
                        "subsequence of this many U-Net evaluations instead "
                        "of the full n_timesteps DDPM chain (the reference "
                        "always runs full DDPM, action_head.py:1028)")
    p.add_argument("--ddim_eta", type=float, default=0.0,
                   help="DDIM stochasticity (0 = deterministic ODE limit)")
    p.add_argument("--future_act_len", type=int, default=-1,
                   help="diffusion head: execute only the first K sampled "
                        "actions of each plan (eval_calvin.py:209)")
    p.add_argument("--replan", type=int, default=-1)
    p.add_argument("--reset", action="store_true",
                   help="re-reset the env to the chain's initial state "
                        "before every subtask (eval_utils.py:603-606)")
    p.add_argument("--lanes", type=int, default=1,
                   help=">1: batched rollout — N env streams in lockstep "
                        "through one batched policy program "
                        "(eval/batched_rollout.py; ~lanes-x eval speedup)")
    p.add_argument("--pipeline", type=int, default=1,
                   help=">1: split lanes into this many groups and overlap "
                        "one group's env stepping with the others' device "
                        "programs (async dispatch); rounded down to a "
                        "divisor of --lanes so all groups share one "
                        "compiled batch shape")
    p.add_argument("--env_workers", type=int, default=0,
                   help=">1: step a lane group's simulators through a "
                        "thread pool (CALVIN pybullet/EGL releases the GIL "
                        "— N env steps run on N host cores); identical "
                        "semantics to serial stepping")
    p.add_argument("--action_cache_tau", type=float, default=0.0,
                   help=">0: training-free action caching — replay the "
                        "previous action while the frame delta stays below "
                        "tau (eval/caching.py; approximate for LSTM carry)")
    p.add_argument("--action_cache_refresh", type=int, default=5)
    p.add_argument("--frame_cache", action="store_true",
                   help="window-folded serving (vit_concat/use_hist): cache "
                        "per-frame ViT tokens on device and encode only the "
                        "newest frame each step — exact actions, (W-1)/W "
                        "less vision work (feature_cache analogue, "
                        "eval_utils.py:371)")
    p.add_argument("--vision_cache_tau", type=float, default=0.0,
                   help=">0: visual-token caching — reuse ViT+perceiver "
                        "latents across near-identical frames (exact head "
                        "semantics; composes with both the while-loop and "
                        "bucketed engines; not with --lanes)")
    p.add_argument("--vit_tome_r", type=int, default=0,
                   help="ToMe token merging: merge N ViT patch-token pairs "
                        "per layer (ops/tome.py). Training-free vision-FLOPs "
                        "reduction (~40%% of the dominant encode at r=8 on "
                        "ViT-L); approximate — validate task success before "
                        "production. 0 = exact tower (default)")
    p.add_argument("--gripper_res", type=int, default=-1,
                   help="native-resolution gripper tower: run the wrist "
                        "camera through the shared ViT at this size (84 = "
                        "CALVIN native; pos-embeds interpolate). Weight-"
                        "free opt-in; cuts dual-camera vision FLOPs ~43%% "
                        "at 84. -1 = inherit the checkpoint config "
                        "(default); 0 = force off")
    p.add_argument("--value_cache", default="",
                   help="values .npz sidecar; defaults to ckpt path")
    p.add_argument("--recompute_values", action="store_true")
    p.add_argument("--calib_batches", type=int, default=8)
    p.add_argument("--calib_warm", type=int, default=0,
                   help="window-folded models: warm the head carry with "
                        "this many pseudo-history frames during "
                        "calibration (reduces the zero-carry delta skew "
                        "vs streamed serving; models/value_net.py)")
    p.add_argument("--calib_streamed", action="store_true",
                   help="windowed models: calibrate deltas with ONE LSTM "
                        "carry threaded across each trajectory window and "
                        "commit exits sampled from the target exit "
                        "distribution — matches the serving carry regime "
                        "(closes the streamed-histogram bias the folded "
                        "random-prefix calibration leaves; "
                        "value_net.generate_streamed_exit_deltas)")
    p.add_argument("--batch_size_calvin", type=int, default=6)
    p.add_argument("--validation_set", action="store_true", default=True)
    p.add_argument("--tcp_rel", action="store_true",
                   help="policy was trained on tcp-frame actions; convert "
                        "back to world frame with the live robot_obs")
    p.add_argument("--layerwise_exit_eval", action="store_true",
                   help="take the final action from the chosen exit layer's "
                        "OWN head (lm_exits[i] / lm_head) instead of the "
                        "shared extra exit; each head streams its own LSTM "
                        "carry, the exit criterion stays on the extra exit "
                        "(eval_calvin.py:530, flamingo_mpt.py:450-457). "
                        "Host-bucketed engine only.")
    p.add_argument("--amp", type=int, default=0)  # accepted for parity; bf16 covers it
    p.add_argument("--report_json", default="",
                   help="also write the full eval report (chain SRs, exit "
                        "histograms, per-task SRs, GFLOPs, thresholds) to "
                        "this JSON path — the machine-readable version of "
                        "the reference's print_and_save log "
                        "(eval_utils.py:71-118)")
    p.add_argument("--visualize", default="",
                   help="directory for per-subtask rollout GIFs "
                        "(static camera, one file per episode tagged "
                        "ok/fail; the reference flag collects frames it "
                        "never writes, eval_utils.py:649-678)")
    p.add_argument("--debug", action="store_true", help="DebugEnv fake backend")
    p.add_argument("--num_sequences_override", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    return p


def load_model(args):
    import jax
    from deer_vla_tpu.core.config import BF16, FP32, DeerConfig, MODEL_REGISTRY
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.train.checkpoint import load_checkpoint

    dtypes = BF16 if args.precision == "bf16" else FP32
    if args.evaluate_from_checkpoint:
        side = args.evaluate_from_checkpoint.replace(".ckpt", "") + ".json"
        with open(side) as f:
            side_data = json.load(f)
        cfg = DeerConfig.from_json(json.dumps(side_data["config"]))
        cfg = dataclasses.replace(cfg, dtypes=dtypes)
        if args.max_layer > 0:
            cfg = dataclasses.replace(
                cfg, mpt=dataclasses.replace(cfg.mpt, n_layers=args.max_layer))
        # trainable-delta ckpts overlay a PRNG-initialized frozen backbone:
        # the init seed MUST be the training seed or the backbone is random.
        # The trainer records it in the sidecar meta; --seed is the fallback
        # for ckpts written before that.
        init_seed = int(side_data.get("meta", {}).get("seed", args.seed))
        params = init_deer(jax.random.PRNGKey(init_seed), cfg)
        params, _, meta = load_checkpoint(args.evaluate_from_checkpoint, params)
        print(f"loaded {meta['meta'].get('loaded_keys')} param groups from ckpt")
    else:
        factory = MODEL_REGISTRY[args.model]
        cfg = factory(dtypes=dtypes) if args.model == "tiny" else \
            factory(max_layer=args.max_layer if args.max_layer > 0 else 12,
                    dtypes=dtypes)
        params = init_deer(jax.random.PRNGKey(args.seed), cfg)
    return cfg, params


from deer_vla_tpu.utils.errors import record


@record
def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import numpy as np
    from deer_vla_tpu.cli.train import make_tokenizer
    from deer_vla_tpu.eval.calibrate import calibrate
    from deer_vla_tpu.eval.flops import avg_llm_gflops, llm_flops_per_exit
    from deer_vla_tpu.eval.metrics import format_report
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.eval.rollout import (CalvinPolicyAdapter, DebugEnv,
                                           DebugTaskOracle, evaluate_policy,
                                           load_eval_sequences,
                                           make_debug_sequences)
    from deer_vla_tpu.models.value_net import ExitController
    from deer_vla_tpu.train.checkpoint import (load_calibration_values,
                                               save_calibration_values)

    cfg, params = load_model(args)
    tok = make_tokenizer(args, cfg)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    if args.vit_tome_r > 0:
        # weight-free: safe to flip post-load; calibration and serving then
        # share the merged tower so thresholds match the served deltas
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, tome_r=args.vit_tome_r))
    if args.gripper_res >= 0:  # -1 = inherit the (sidecar) config
        if args.gripper_res and args.gripper_res % cfg.vit.patch_size:
            raise SystemExit(f"--gripper_res must be a multiple of the "
                             f"ViT patch size {cfg.vit.patch_size}")
        cfg = dataclasses.replace(cfg, gripper_res=args.gripper_res)
    if args.env_workers > 1 and args.lanes <= 1:
        raise SystemExit("--env_workers only applies to the batched "
                         "rollout; add --lanes N")
    if args.layerwise_exit_eval:
        if cfg.share_exit:
            print("WARNING: --layerwise_exit_eval is a no-op with "
                  "share_exit (every exit IS the shared lm_head)")
        elif not cfg.multi_exit:
            raise SystemExit("--layerwise_exit_eval needs a multi-exit "
                             "checkpoint (per-layer lm_exits heads)")
        else:
            cfg = dataclasses.replace(cfg, layerwise_exit_eval=True)
        if args.engine == "fused":
            raise SystemExit("--layerwise_exit_eval serves through the "
                             "host-bucketed engine (per-exit-head carries); "
                             "drop --engine fused")
        if args.lanes > 1 or args.frame_cache:
            raise SystemExit("--layerwise_exit_eval does not compose with "
                             "--lanes / --frame_cache")
        if args.use_action_ensemble:
            raise SystemExit("--layerwise_exit_eval does not compose with "
                             "--use_action_ensemble: the ensemble averages "
                             "the extra-exit criterion actions, which would "
                             "silently override the layerwise head's action")
    max_layer = args.max_layer if args.max_layer > 0 else cfg.n_layers
    exits = list(cfg.all_exit_ids())

    controller = None
    thresholds = {}
    if args.exit_id is None:
        controller = ExitController(
            exit_id_list=exits, steps_per_stage=args.steps_per_stage,
            max_layer=max_layer, threshold_type=args.threshold_type)
        if args.thresholds:
            controller.set_threshold_values(args.thresholds[:len(
                [e for e in exits if e <= controller.effective_max])])
            thresholds = controller.thresholds
        else:
            cache = args.value_cache or args.evaluate_from_checkpoint
            folded = (cfg.fusion_mode == "vit_concat" or
                      cfg.window_size == 1)
            if args.calib_warm > 0 and not folded:
                print(f"WARNING: --calib_warm={args.calib_warm} only "
                      "applies to window-folded (w=1) calibration; this "
                      "model calibrates with full training windows and the "
                      "flag is a no-op (models/value_net.py warm_prefix)")
            if args.calib_streamed and folded:
                raise SystemExit(
                    "--calib_streamed needs a real time window; this model "
                    "is window-folded — use --calib_warm instead")
            if not args.calib_streamed and not folded and not cfg.use_hist:
                # decision rule (MIGRATION.md "Calibration regime"):
                # streaming serving + real time window => --calib_streamed;
                # window-folded (vit_concat / w=1)     => --calib_warm;
                # use_hist (full-window head per step)  => default folded.
                print("RECOMMENDED: this model serves STREAMING (one LSTM "
                      "carry threaded across the episode) but is "
                      "calibrating in the folded random-prefix regime — "
                      "pass --calib_streamed for carry-matched calibration "
                      "(~2.5x tighter realized exit mix at tiny scale, "
                      "tests/test_exit_contract.py; driver-recorded at "
                      "bench scale in BENCH detail.calibration)")
            values = None
            if cache and not args.recompute_values:
                values = load_calibration_values(cache)
                if values is not None:
                    from deer_vla_tpu.train.checkpoint import \
                        load_calibration_info
                    info = load_calibration_info(cache)
                    cached_warm = int(info.get("calib_warm", 0))
                    want_warm = args.calib_warm if folded else 0
                    cached_str = bool(info.get("calib_streamed", False))
                    if cached_warm != want_warm or \
                            cached_str != args.calib_streamed:
                        print(f"values sidecar was calibrated with "
                              f"calib_warm={cached_warm} "
                              f"streamed={cached_str}; recomputing with "
                              f"calib_warm={want_warm} "
                              f"streamed={args.calib_streamed}")
                        values = None
            batches = None
            if values is None:
                batches = _calibration_batches(args, cfg, tok)
            from deer_vla_tpu.parallel.multihost import all_gather_values
            thresholds, values = calibrate(
                params, cfg, batches or [], args.exit_ratio,
                max_layer=max_layer, exit_dist=args.exit_dist,
                model_name=args.model, threshold_type=args.threshold_type,
                values=values, max_batches=args.calib_batches,
                all_gather=all_gather_values, warm_prefix=args.calib_warm,
                streamed=args.calib_streamed)
            if cache:
                save_calibration_values(
                    cache, values,
                    {"exit_ratio": args.exit_ratio,
                     "calib_warm": args.calib_warm if folded else 0,
                     "calib_streamed": args.calib_streamed})
            controller.set_thresholds(thresholds)

    use_fused = (args.engine == "fused" or
                 (args.engine == "auto" and controller is not None
                  and not args.use_action_ensemble))
    if cfg.layerwise_exit_eval:
        use_fused = False  # per-exit-head carries live on the bucketed path
    if args.multi_execution > 1:
        use_fused = False  # the jit engines don't repeat actions;
        # DeerPolicy covers multi_execution.  State-trained models DO get
        # the while-loop engine now (proprio threaded through the single
        # program — round 1 forced them onto the host-bucketed path).
        # multi_step_action k>1 IS supported by the jit engines ((k, 7)
        # plans into the rollout queue), and vision caching composes with
        # BOTH engines (split encode/decode programs).
    if cfg.head_type != "deterministic":
        # fc/gpt/diffusion heads serve through the while-loop engine (the
        # head routing in models/heads.any_head_step is traced into the
        # single program) or the bucketed DeerPolicy for --multi_execution /
        # --use_action_ensemble; cli routes like the reference selects
        # decoder_type at construction (eval_calvin.py:520,528)
        if cfg.head_type == "diffusion" and args.action_cache_tau > 0:
            raise SystemExit("--action_cache_tau does not compose with the "
                             "diffusion head's plan sampling")
        if cfg.head_type == "diffusion" and args.multi_execution > 1:
            raise SystemExit("--multi_execution has no effect with the "
                             "diffusion head (it emits its own action "
                             "plan); use --future_act_len to bound the "
                             "executed plan length")
        if args.vision_cache_tau > 0:
            raise SystemExit("--vision_cache_tau currently serves the "
                             "deterministic LSTM head only")
    if use_fused and controller is not None:
        # while-loop engine: one program per action, compile time constant
        # in depth (the lax.cond-chain engine in eval/fused_policy.py is the
        # small-model alternative)
        from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
        policy = ScanDeerPolicy(params, cfg, threshold_type=args.threshold_type,
                                max_layer=max_layer,
                                steps_per_stage=args.steps_per_stage,
                                quantize=args.quantize)
        policy.set_thresholds(controller.thresholds)
        if args.frame_cache:
            if not (cfg.fusion_mode == "vit_concat" or cfg.use_hist):
                raise SystemExit("--frame_cache only applies to "
                                 "window-folded models (vit_concat / "
                                 "use_hist); other modes encode one frame "
                                 "per step already")
            if args.vision_cache_tau > 0:
                raise SystemExit("--frame_cache and --vision_cache_tau are "
                                 "mutually exclusive caching modes")
            from deer_vla_tpu.eval.caching import FrameCachePolicy
            policy = FrameCachePolicy(policy)
        if args.vision_cache_tau > 0:
            if cfg.use_state or cfg.head.use_state:
                raise SystemExit(
                    "--vision_cache_tau cannot serve state models: the "
                    "proprio token is part of the cached media latents and "
                    "changes every step")
            from deer_vla_tpu.eval.caching import VisionCacheScanPolicy
            policy = VisionCacheScanPolicy(policy,
                                           tau=args.vision_cache_tau)
    else:
        if args.frame_cache:
            raise SystemExit("--frame_cache needs the while-loop engine "
                             "(deterministic head, no --multi_execution, "
                             "thresholds set)")
        policy = DeerPolicy(params, cfg, controller=controller,
                            exit_id=args.exit_id,
                            threshold_type=args.threshold_type,
                            use_action_ensemble=args.use_action_ensemble,
                            multi_execution=args.multi_execution,
                            quantize=args.quantize)
        if args.vision_cache_tau > 0:
            from deer_vla_tpu.eval.caching import VisionCacheDeerPolicy
            policy = VisionCacheDeerPolicy(policy, tau=args.vision_cache_tau)
    if cfg.head_type == "diffusion":
        # DDPM sampling wrapper: exit features -> action plan
        # (eval_utils.py:388-419 use_diff branch)
        from deer_vla_tpu.eval.diffusion_policy import DiffusionSamplerPolicy
        policy = DiffusionSamplerPolicy(policy, params,
                                        future_act_len=args.future_act_len,
                                        seed=args.seed,
                                        sample_steps=args.diff_steps,
                                        ddim_eta=args.ddim_eta)
    if args.action_cache_tau > 0:
        from deer_vla_tpu.eval.caching import ActionCachePolicy
        policy = ActionCachePolicy(policy, tau=args.action_cache_tau,
                                   refresh_every=args.action_cache_refresh)
    adapter = CalvinPolicyAdapter(policy, tok, text_len=cfg.text_len,
                                  tcp_rel=args.tcp_rel)

    if args.debug or not args.calvin_conf_path:
        env = DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
        oracle = DebugTaskOracle(threshold=0.05)
        sequences = make_debug_sequences(args.num_sequences_override or 8)
        annotations = {}
        ep_len = min(args.ep_len, 40)
    else:
        env, oracle, sequences, annotations = _make_calvin_env(args)
        ep_len = args.ep_len
    if args.diverse_inst and os.path.exists(args.annotation_cache):
        # list-of-lists [seq][subtask] -> per-chain enriched instructions
        with open(args.annotation_cache) as f:
            annotations = json.load(f)

    n_seq = min(args.num_seq, len(sequences))
    per_layer = llm_flops_per_exit(cfg)
    if args.lanes > 1:
        # batched rollout: lanes env streams through one program per step
        from deer_vla_tpu.eval.batched_rollout import evaluate_policy_batched
        from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
        assert controller is not None, "--lanes needs dynamic exit"
        if args.frame_cache:
            raise SystemExit("--lanes does not compose with --frame_cache "
                             "(per-lane device token queues are not "
                             "implemented); window-folded models run "
                             "--lanes with the uncached window re-encode")
        if args.vision_cache_tau > 0:
            raise SystemExit("--lanes does not compose with "
                             "--vision_cache_tau (per-lane frame caching "
                             "is not implemented); drop one of the flags")
        if args.visualize:
            raise SystemExit("--visualize needs the sequential harness; "
                             "run without --lanes")
        if args.tcp_rel:
            raise SystemExit("--lanes does not apply the tcp->world "
                             "action-frame conversion (it lives in the "
                             "sequential adapter); run tcp_rel models "
                             "without --lanes")
        if args.multi_execution > 1 or args.use_action_ensemble:
            raise SystemExit("--lanes serves the plain jit engine; "
                             "--multi_execution / --use_action_ensemble "
                             "need the sequential harness")
        if args.action_cache_tau > 0:
            raise SystemExit("--lanes does not compose with "
                             "--action_cache_tau (per-lane action caching "
                             "is not implemented)")
        if args.replan != -1:
            raise SystemExit("--lanes has no per-lane replan counter; "
                             "run --replan without --lanes")
        # reuse an already-built while-loop engine where possible (the
        # sequential path may have wrapped one inside the DDPM sampler —
        # engine compiles are ~90 s at 3B over the tunnel)
        inner = policy.policy if (cfg.head_type == "diffusion"
                                  and isinstance(
                                      getattr(policy, "policy", None),
                                      ScanDeerPolicy)) else policy
        bpolicy = inner if isinstance(inner, ScanDeerPolicy) else \
            ScanDeerPolicy(params, cfg, threshold_type=args.threshold_type,
                           max_layer=max_layer,
                           steps_per_stage=args.steps_per_stage,
                           quantize=args.quantize)
        if not isinstance(inner, ScanDeerPolicy):
            bpolicy.set_thresholds(controller.thresholds)
        if cfg.head_type == "diffusion":
            # batched DDPM/DDIM plan sampling: per-lane histories + rng
            # counters around the batched feature program
            from deer_vla_tpu.eval.diffusion_policy import \
                BatchedDiffusionSampler
            bpolicy = BatchedDiffusionSampler(
                bpolicy, params, future_act_len=args.future_act_len,
                seed=args.seed, sample_steps=args.diff_steps,
                ddim_eta=args.ddim_eta)
        if args.debug or not args.calvin_conf_path:
            envs = [DebugEnv(img_hw=cfg.vit.image_size,
                             grip_hw=cfg.vit.image_size)
                    for _ in range(args.lanes)]
        else:
            envs = [env] + [_make_calvin_env(args)[0]
                            for _ in range(args.lanes - 1)]
        report = evaluate_policy_batched(
            bpolicy, envs, sequences[:n_seq], annotations, oracle, tok,
            text_len=cfg.text_len, ep_len=ep_len, n_layers=cfg.n_layers,
            pipeline=args.pipeline, reset=args.reset,
            env_workers=args.env_workers)
    else:
        report = evaluate_policy(
            adapter, env, sequences[:n_seq], annotations, oracle,
            rank=jax.process_index(), world_size=jax.process_count(),
            num_sequences=n_seq, ep_len=ep_len, replan=args.replan,
            reset=args.reset,
            flops_per_layer=per_layer[0] * 1e9 if 0 in per_layer else None,
            n_layers=cfg.n_layers, visualize_dir=args.visualize or None)
    hist = np.add(report["success_exit_hist"], report["fail_exit_hist"]) \
        / max(1e-9, sum(report["success_exit_hist"]) + sum(report["fail_exit_hist"]))
    report["avg_llm_gflops"] = avg_llm_gflops(cfg, hist)
    if controller is not None and controller.thresholds and not args.thresholds:
        # realized-vs-target exit-distribution contract rows: the paper's
        # quantitative claim is that calibrated thresholds make the serving
        # exit mix match the solver's target probs (value_net.py:206-272;
        # avg exit printed at eval_calvin.py:646-653).  Asserted numerically
        # in tests/test_exit_contract.py; reported here per run.
        from deer_vla_tpu.models.value_net import exit_probs as _exit_probs
        real_ids = [e for e in exits if e <= controller.effective_max]
        probs = _exit_probs(len(real_ids), args.exit_ratio, args.exit_dist,
                            args.model)
        realized = [float(hist[e]) for e in real_ids]
        report["exit_contract"] = {
            "exit_ids": [int(e) for e in real_ids],
            "target_probs": [float(p) for p in probs],
            "realized": realized,
            "avg_exit_target": float(sum(p * (e + 1)
                                         for p, e in zip(probs, real_ids))),
            "avg_exit_realized": float(report["avg_exit_layer"]),
            "max_abs_gap": float(max(abs(r - p)
                                     for r, p in zip(realized, probs))),
        }
        print(f"exit contract: target={[round(p, 3) for p in probs]} "
              f"realized={[round(r, 3) for r in realized]} "
              f"max gap {report['exit_contract']['max_abs_gap']:.3f}")
    # paper-convention number for Table-2 comparison (thop MACs, ~13-token
    # unpadded text; see eval/flops.paper_convention_gflops)
    from deer_vla_tpu.eval.flops import paper_convention_gflops
    report["avg_llm_gflops_paper_conv"] = float(sum(
        paper_convention_gflops(cfg, i) * p for i, p in enumerate(hist) if p > 0))
    if args.action_cache_tau > 0:
        report["action_cache_hit_rate"] = policy.hits / max(1, policy.steps)
        print(f"action cache: {policy.hits}/{policy.steps} hits")
    if args.vision_cache_tau > 0:
        vc = policy.policy if args.action_cache_tau > 0 else policy
        report["vision_cache_hit_rate"] = vc.encode_hits / max(1, vc.steps)
        print(f"vision-token cache: {vc.encode_hits}/{vc.steps} encode hits")
    print(format_report(report))
    th_list = [thresholds[e] for e in sorted(thresholds)] if thresholds else []
    if args.report_json:
        def _clean(v):
            if isinstance(v, dict):
                return {k: _clean(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [_clean(x) for x in v]
            if isinstance(v, (np.integer,)):
                return int(v)
            if isinstance(v, (np.floating,)):
                return float(v)
            if isinstance(v, np.ndarray):
                return v.tolist()
            return v
        payload = {"report": _clean(report),
                   "thresholds": {int(k): float(v)
                                  for k, v in thresholds.items()},
                   "exit_ratio": args.exit_ratio,
                   "checkpoint": args.evaluate_from_checkpoint,
                   "model": args.model, "max_layer": max_layer,
                   "num_seq": n_seq}
        os.makedirs(os.path.dirname(os.path.abspath(args.report_json)),
                    exist_ok=True)
        with open(args.report_json, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"report written to {args.report_json}")
    # -- BO/eval_ckpts parse contract: last three lines ---------------------
    print(",".join(f"{t:.6f}" for t in th_list))
    print(f"{report['avg_seq_len']:.6f}")
    print(f"{report['avg_exit_layer'] - 1:.6f}")
    return report


def _calibration_batches(args, cfg, tok):
    if args.debug or not args.calvin_dataset:
        from deer_vla_tpu.data.debug_data import DebugBatcher
        return DebugBatcher(cfg, tok, batch_size=2,
                            num_batches=args.calib_batches,
                            img_hw=cfg.vit.image_size,
                            grip_hw=cfg.vit.image_size)
    from deer_vla_tpu.data.calvin import (CalvinDataConfig, CalvinLoader,
                                          DiskCalvinDataset)
    dcfg = CalvinDataConfig(
        dataset_dir=os.path.join(args.calvin_dataset, "validation"),
        window_size=cfg.window_size, seed=args.seed)
    ds = DiskCalvinDataset(dcfg, validation=True)
    import jax
    return CalvinLoader(ds, tok, args.batch_size_calvin,
                        rank=jax.process_index(),
                        world_size=jax.process_count(), shuffle=False)


def _make_calvin_env(args):
    """Real CALVIN env (requires calvin_env installed; host-side)."""
    from deer_vla_tpu.eval.rollout import load_eval_sequences
    os.environ.setdefault("PYOPENGL_PLATFORM", "egl")
    import hydra
    from omegaconf import OmegaConf
    from pathlib import Path
    conf_dir = Path(args.calvin_conf_path)
    task_cfg = OmegaConf.load(conf_dir / "callbacks/rollout/tasks/new_playtable_tasks.yaml")
    task_oracle = hydra.utils.instantiate(task_cfg)
    val_annotations = OmegaConf.load(conf_dir / "annotations/new_playtable_validation.yaml")
    annotations = {k: v[0] for k, v in val_annotations.items()}
    sequences = load_eval_sequences(args.eval_sequences)
    from calvin_env.envs.play_table_env import get_env
    env = get_env(Path(args.calvin_dataset) / "validation", show_gui=False)
    return env, task_oracle, sequences, annotations


if __name__ == "__main__":
    main()
