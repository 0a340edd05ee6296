"""Training CLI — train_calvin_post_strategy.py equivalent.

Single JAX process drives all local TPU chips through the mesh (no torchrun;
multi-host runs use `jax.distributed.initialize` via --coordinator).

Example (smoke, no dataset needed):
  python -m deer_vla_tpu.cli.train --debug --model tiny --num_joint_epochs 1 \
      --num_exit_epochs 1 --batch_size 2
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DeeR-VLA TPU training")
    # model (mirrors factory mpt_dict + flags)
    p.add_argument("--model", default="mpt_dolly_3b",
                   choices=["mpt_dolly_3b", "mpt_9b", "llama_9b", "tiny"])
    p.add_argument("--max_layer", type=int, default=12,
                   help="truncated decoder depth (early_exit_layer + 1)")
    p.add_argument("--exit_interval", type=int, default=2)
    p.add_argument("--window_size", type=int, default=12)
    p.add_argument("--dif_ws", action="store_true",
                   help="variable-window training (data.py:250-255): train "
                        "windows uniform in [min, max], validation windows "
                        "hash-determinized, samples padded to max")
    p.add_argument("--min_window_size", type=int, default=12)
    p.add_argument("--max_window_size", type=int, default=24)
    p.add_argument("--multi_step_action", type=int, default=1)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--use_state", action="store_true")
    p.add_argument("--clip_state", action="store_true",
                   help="keep only arm pose + gripper of the proprio state "
                        "(train_utils.py:253-255)")
    p.add_argument("--sep_resampler", action="store_true")
    p.add_argument("--share_exit", action="store_true")
    # freeze-policy ablations (reference factory.py:203-237)
    p.add_argument("--freeze_embed", action="store_true",
                   help="keep token embeddings frozen in the joint phase")
    p.add_argument("--freeze_sampler", action="store_true",
                   help="keep the perceiver resampler(s) frozen")
    p.add_argument("--unfreeze_vit", action="store_true",
                   help="train the ViT vision encoder too")
    p.add_argument("--train_params", type=int, default=-1,
                   help=">=0: train only the last round(n/140) gated "
                        "x-attn layers (reference param budget, "
                        "factory.py:214-222)")
    p.add_argument("--fusion_mode", default="post",
                   choices=["post", "pre", "two_way", "vit_concat"],
                   help="camera fusion (flamingo_mpt.py:585-777); "
                        "vit_concat folds the window into the media tokens "
                        "(per-window text, last-step action labels)")
    p.add_argument("--use_hist", action="store_true",
                   help="history variant: learned frame embeddings on ViT "
                        "tokens, last-step-only loss (flamingo_mpt.py:700)")
    # action-head family (reference --decoder_type/--head_type,
    # train_calvin_post_strategy.py:308,317)
    # action-head architecture knobs (reference train flags :313-338; all
    # default to None = keep the model-config defaults)
    p.add_argument("--exit_dropout", type=float, default=None,
                   help="exit-head MLP dropout (reference default 0.4)")
    p.add_argument("--lstm_dropout", type=float, default=None,
                   help="between-LSTM-layer dropout (reference default 0.3)")
    p.add_argument("--dropout_mode", default=None,
                   choices=["layerwise", "last", "wo_last"])
    p.add_argument("--mlp_num_hidden_layers", type=int, default=None,
                   help="exit-head MLP hidden layers (reference flag "
                        "default 2; module default 3)")
    p.add_argument("--lstm_num_layers", type=int, default=None)
    p.add_argument("--mlp_layernorm", action="store_true")
    p.add_argument("--lstm_layernorm", action="store_true")
    p.add_argument("--pooling", default=None, choices=["max", "mean"],
                   help="language-token pooling before the head")
    p.add_argument("--single_exit", action="store_true",
                   help="train only the final head (the reference's default "
                        "when --multi_exit is absent); DeeR training keeps "
                        "multi-exit on, which is our default")
    p.add_argument("--bin_coef", type=float, default=None,
                   help="gripper-BCE weight override; default keeps the "
                        "reference rule (0.05 real data, else 0.01 — "
                        "train_utils.py:314-316; the reference --bin_coef "
                        "flag only renames the checkpoint)")
    p.add_argument("--exit_strategy", default="post", choices=["post"],
                   help="accepted for launch-command parity; the reference "
                        "declares pre/joint but only implements the post "
                        "two-phase schedule (the flag is consumed solely by "
                        "checkpoint naming, train_utils.py:69-75; phase "
                        "logic is hard-wired post, "
                        "train_calvin_post_strategy.py:644-660)")
    p.add_argument("--loss_multiplier_calvin", type=float, default=1.0,
                   help="scales the CALVIN imitation loss before the "
                        "gradient (train_utils.py:322,549)")
    p.add_argument("--save_freq", type=int, default=1,
                   help="save an epoch checkpoint every N epochs "
                        "(train_calvin_post_strategy.py:688); the final "
                        "epoch is always saved")
    p.add_argument("--head_type", default="deterministic",
                   choices=["deterministic", "fc", "gpt", "diffusion"])
    p.add_argument("--hidden_size", type=int, default=None,
                   help="GPTDecoder backbone width (head_type gpt)")
    p.add_argument("--n_timesteps", type=int, default=150,
                   help="diffusion timesteps (head_type diffusion)")
    p.add_argument("--n_obs_steps", type=int, default=6,
                   help="action-history length + 1 for the diffusion head")
    p.add_argument("--diff_horizon", type=int, default=32)
    # data
    p.add_argument("--calvin_dataset", default=os.environ.get("calvin_dataset_path", ""))
    p.add_argument("--tokenizer_path", default="")
    p.add_argument("--rgb_pad", type=int, default=10)
    p.add_argument("--gripper_pad", type=int, default=4)
    p.add_argument("--traj_cons", action="store_true", default=True)
    p.add_argument("--text_aug", action="store_true")
    p.add_argument("--data_percent", type=float, default=1.0)
    p.add_argument("--workers", type=int, default=4)
    # optimization (train_calvin_post_strategy.py defaults)
    p.add_argument("--batch_size_calvin", type=int, default=6)
    p.add_argument("--num_joint_epochs", type=int, default=4)
    p.add_argument("--num_exit_epochs", type=int, default=5)
    p.add_argument("--joint_learning_rate", type=float, default=1e-4)
    p.add_argument("--exit_learning_rate", type=float, default=2.5e-4)
    p.add_argument("--joint_lr_scheduler", default="constant")
    p.add_argument("--exit_lr_scheduler", default="constant")
    p.add_argument("--joint_warmup_steps", type=int, default=2500)
    p.add_argument("--exit_warmup_steps", type=int, default=2500)
    p.add_argument("--weight_decay", type=float, default=0.1)
    p.add_argument("--exit_lr_scale", type=float, default=1.0)
    p.add_argument("--exit_decay", action="store_true")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--real_data", action="store_true")
    p.add_argument("--tcp_rel", action="store_true",
                   help="train on tool-center-point-frame relative actions "
                        "(labels converted with robot_obs)")
    p.add_argument("--seed", type=int, default=42)
    # run
    p.add_argument("--run_name", default="runs/deer")
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--from_scratch", action="store_true",
                   help="ignore existing checkpoints in run_name (disables "
                        "the auto-resume scan, train_calvin_post_strategy"
                        ".py:605)")
    p.add_argument("--no_gripper", action="store_true",
                   help="single-camera ablation: drop the gripper camera "
                        "(use_gripper=False, the reference's --use_gripper "
                        "default-off toggle)")
    p.add_argument("--logging_steps", type=int, default=100)
    p.add_argument("--save_every_iter", type=int, default=-1,
                   help=">0: also checkpoint every N steps within an epoch "
                        "(train_utils.py:626-628)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help=">0: track an exponential moving average of the "
                        "trainable leaves; each checkpoint gains a sibling "
                        "<name>_ema.ckpt (standard for diffusion heads; "
                        "the reference has no EMA)")
    p.add_argument("--debug", action="store_true",
                   help="random-tensor data, no dataset required")
    # vision-language co-training (--cotrain, train_calvin_post_strategy.py:296-302)
    p.add_argument("--cotrain", action="store_true")
    p.add_argument("--cotrain_laion_shards", default="",
                   help="glob of LAION webdataset tars as the co-training "
                        "VL source (alternative to --coco_ann)")
    p.add_argument("--coco_image_dir", default="")
    p.add_argument("--coco_ann", default="")
    p.add_argument("--vqa_image_dir", default="")
    p.add_argument("--vqa_questions", default="")
    p.add_argument("--vqa_ann", default="")
    p.add_argument("--vl_weight", type=float, default=1.0)
    p.add_argument("--vl_batch_size", type=int, default=None)
    p.add_argument("--vit_tome_r", type=int, default=0,
                   help="ToMe token merging in the frozen ViT (ops/tome.py): "
                        "merge N patch-token pairs per layer; cuts the "
                        "dominant per-frame vision FLOPs. Approximate — "
                        "validate quality. 0 = exact tower (default)")
    p.add_argument("--gripper_res", type=int, default=0,
                   help="native-resolution gripper tower: train the wrist "
                        "camera through the shared ViT at this input size "
                        "(84 = CALVIN native, no upsample; pos-embeds "
                        "interpolate). Cuts dual-camera vision FLOPs ~43%% "
                        "at 84. Saved in the checkpoint config so eval/"
                        "serve inherit it. 0 = off (default)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize decoder layers (activation memory)")
    p.add_argument("--remat_policy", default="full", choices=["full", "dots"],
                   help="remat granularity: full recompute vs save-matmuls")
    p.add_argument("--coordinator", default="",
                   help="host:port for multi-host jax.distributed")
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    return p


def make_model_config(args):
    from deer_vla_tpu.core.config import BF16, FP32, MODEL_REGISTRY
    dtypes = BF16 if args.precision == "bf16" else FP32
    factory = MODEL_REGISTRY[args.model]
    if args.model == "tiny":
        cfg = factory(window_size=min(args.window_size, 4), dtypes=dtypes)
    else:
        cfg = factory(max_layer=args.max_layer, exit_interval=args.exit_interval,
                      window_size=args.window_size, dtypes=dtypes)
    updates = {"use_state": args.use_state, "sep_resampler": args.sep_resampler,
               "share_exit": args.share_exit,
               "fusion_mode": getattr(args, "fusion_mode", "post"),
               "use_hist": getattr(args, "use_hist", False),
               "remat_layers": getattr(args, "remat", False),
               "remat_policy": getattr(args, "remat_policy", "full"),
               "freeze_embed": getattr(args, "freeze_embed", False),
               "freeze_sampler": getattr(args, "freeze_sampler", False),
               "unfreeze_vit": getattr(args, "unfreeze_vit", False),
               "train_params": getattr(args, "train_params", -1),
               "use_gripper": not getattr(args, "no_gripper", False)}
    ht = getattr(args, "head_type", "deterministic")
    if ht != "deterministic":
        updates["head_type"] = ht
    if getattr(args, "hidden_size", None):
        updates["gpt_hidden_size"] = args.hidden_size
    if ht == "diffusion":
        updates["diff_timesteps"] = getattr(args, "n_timesteps", 150)
        updates["diff_horizon"] = getattr(args, "diff_horizon", 32)
        # clamp the history to the (possibly tiny) window so smoke configs
        # stay valid; reference couples the two the same way via
        # eval_hist_size = n_obs_steps (train_calvin_post_strategy.py:348)
        w = cfg.window_size if args.model == "tiny" else args.window_size
        updates["n_obs_steps"] = min(getattr(args, "n_obs_steps", 6), w)
        updates["diff_horizon"] = max(updates["diff_horizon"], w)
    if getattr(args, "single_exit", False):
        updates["multi_exit"] = False
    head_updates = {}
    for flag, field in (("exit_dropout", "dropout"),
                        ("lstm_dropout", "lstm_dropout"),
                        ("dropout_mode", "dropout_mode"),
                        ("mlp_num_hidden_layers", "mlp_num_hidden_layers"),
                        ("lstm_num_layers", "lstm_num_layers"),
                        ("pooling", "pooling")):
        v = getattr(args, flag, None)
        if v is not None:
            head_updates[field] = v
    if getattr(args, "mlp_layernorm", False):
        head_updates["mlp_layernorm"] = True
    if getattr(args, "lstm_layernorm", False):
        head_updates["lstm_layernorm"] = True
    if args.multi_step_action != 1:
        head_updates["multi_step_action"] = args.multi_step_action
    if args.use_state:
        # both state paths: vision token via state_fc (DeerConfig.use_state)
        # and proprio embedding in the LSTM head (HeadConfig.use_state),
        # mirroring the reference's single use_state flag
        head_updates["use_state"] = True
        if args.clip_state:
            updates["clip_state"] = True
            updates["state_dim"] = 7
    if head_updates:
        updates["head"] = dataclasses.replace(cfg.head, **head_updates)
    if getattr(args, "vit_tome_r", 0) > 0:
        # ToMe merged tower for training too (vision_tokens routes on cfg):
        # the frozen ViT dominates per-frame train FLOPs the same way it
        # dominates serving; weight-free, so checkpoints stay loadable with
        # any tome_r at eval
        updates["vit"] = dataclasses.replace(cfg.vit, tome_r=args.vit_tome_r)
    if getattr(args, "gripper_res", 0) > 0:
        if args.gripper_res % cfg.vit.patch_size:
            raise SystemExit(f"--gripper_res must be a multiple of the "
                             f"ViT patch size {cfg.vit.patch_size}")
        updates["gripper_res"] = args.gripper_res
    return dataclasses.replace(cfg, **updates)


def make_tokenizer(args, cfg):
    from deer_vla_tpu.data.text import HashTokenizer, HFTokenizer
    if args.tokenizer_path:
        return HFTokenizer(args.tokenizer_path, max_length=cfg.text_len)
    return HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)


from deer_vla_tpu.utils.errors import record


@record
def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.coordinator:
        import jax
        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)
    import jax
    from deer_vla_tpu.train.trainer import TrainConfig, Trainer

    cfg = make_model_config(args)
    tok = make_tokenizer(args, cfg)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id,
                              eoc_token_id=getattr(tok, "eoc_token_id",
                                                   cfg.eoc_token_id))

    if args.debug:
        from deer_vla_tpu.data.debug_data import DebugBatcher
        loader = DebugBatcher(cfg, tok, batch_size=args.batch_size_calvin,
                              num_batches=4, img_hw=cfg.vit.image_size,
                              grip_hw=cfg.vit.image_size)
    else:
        from deer_vla_tpu.data.calvin import (CalvinDataConfig, CalvinLoader,
                                              DiskCalvinDataset)
        if args.dif_ws and cfg.window_size != args.max_window_size:
            raise SystemExit(
                f"--dif_ws pads every sample to --max_window_size "
                f"({args.max_window_size}); the model window "
                f"({cfg.window_size}) must equal it (the reference trains "
                "the LSTM over the padded max window, data.py:212)")
        dcfg = CalvinDataConfig(
            dataset_dir=os.path.join(args.calvin_dataset, "training"),
            window_size=cfg.window_size, act_step=args.multi_step_action,
            text_aug=args.text_aug, data_percent=args.data_percent,
            seed=args.seed, dif_ws=args.dif_ws,
            var_min_window=args.min_window_size,
            var_max_window=args.max_window_size)
        ds = DiskCalvinDataset(dcfg, validation=False)
        loader = CalvinLoader(ds, tok, args.batch_size_calvin,
                              rank=jax.process_index(),
                              world_size=jax.process_count(),
                              seed=args.seed, workers=args.workers)

    tcfg = TrainConfig(
        run_dir=args.run_name,
        num_joint_epochs=args.num_joint_epochs,
        num_exit_epochs=args.num_exit_epochs,
        joint_lr=args.joint_learning_rate, exit_lr=args.exit_learning_rate,
        joint_warmup_steps=args.joint_warmup_steps,
        exit_warmup_steps=args.exit_warmup_steps,
        joint_scheduler=args.joint_lr_scheduler,
        exit_scheduler=args.exit_lr_scheduler,
        weight_decay=args.weight_decay, exit_lr_scale=args.exit_lr_scale,
        exit_decay=args.exit_decay,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        batch_size=args.batch_size_calvin,
        world_size=jax.process_count(),
        rgb_pad=args.rgb_pad, gripper_pad=args.gripper_pad,
        traj_cons=args.traj_cons, real_data=args.real_data,
        bin_coef=args.bin_coef, tcp_rel=args.tcp_rel,
        loss_multiplier_calvin=args.loss_multiplier_calvin,
        save_freq=args.save_freq,
        logging_steps=args.logging_steps, seed=args.seed,
        save_every_iter=args.save_every_iter,
        ema_decay=args.ema_decay)

    def log_fn(d):
        print(json.dumps({k: v for k, v in d.items()}, default=float))

    vl_loader = None
    if args.cotrain:
        from deer_vla_tpu.data.vl_dataset import (CaptionDataset, VLLoader,
                                                  VQADataset)
        vbs = args.vl_batch_size or args.batch_size_calvin
        if args.cotrain_laion_shards:
            import glob as _glob
            from deer_vla_tpu.data.webdataset import WebLoader, WebVLLoader
            shards = sorted(_glob.glob(args.cotrain_laion_shards))
            if not shards:
                raise SystemExit("--cotrain_laion_shards matched no files")
            vl_loader = WebVLLoader(WebLoader(
                shards, tok, kind="laion", batch_size=vbs,
                image_size=cfg.vit.image_size, rank=jax.process_index(),
                world_size=jax.process_count(), seed=args.seed))
            vl_ds = None
        elif args.coco_ann:
            vl_ds = CaptionDataset(args.coco_image_dir, args.coco_ann,
                                   image_size=cfg.vit.image_size)
        elif args.vqa_questions:
            vl_ds = VQADataset(args.vqa_image_dir, args.vqa_questions,
                               args.vqa_ann, image_size=cfg.vit.image_size)
        else:
            raise SystemExit("--cotrain needs --coco_ann, --vqa_questions "
                             "or --cotrain_laion_shards")
        if vl_ds is not None:
            vl_loader = VLLoader(vl_ds, tok, vbs, seed=args.seed)

    trainer = Trainer(cfg, tcfg, loader, log_fn=log_fn, vl_loader=vl_loader,
                      vl_weight=args.vl_weight)
    if args.resume and not args.from_scratch:
        start = trainer.maybe_resume()
        if start:
            print(f"resumed from epoch {start}")
    metrics = trainer.train()
    print(json.dumps({"final": metrics}, default=float))


if __name__ == "__main__":
    main()
