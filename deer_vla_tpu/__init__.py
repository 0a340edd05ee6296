"""deer-vla-tpu: TPU-native DeeR-VLA (dynamic-early-exit VLA policy).

Public API (lazily imported — `import deer_vla_tpu` stays cheap):

  Configs    deer_vla_tpu.DeerConfig / deer_3b / deer_9b / bc_llama / deer_tiny
  Model      deer_vla_tpu.init_deer / forward_train / forward_fixed_exit
  Engines    deer_vla_tpu.ScanDeerPolicy (default) / DeerPolicy /
             FusedDeerPolicy / BatchedDeerPolicy
  Training   deer_vla_tpu.Trainer / TrainConfig
  Eval       deer_vla_tpu.calibrate / evaluate_policy / ExitController
"""

_LAZY = {
    "DeerConfig": "deer_vla_tpu.core.config",
    "deer_3b": "deer_vla_tpu.core.config",
    "deer_9b": "deer_vla_tpu.core.config",
    "bc_llama": "deer_vla_tpu.core.config",
    "deer_tiny": "deer_vla_tpu.core.config",
    "MODEL_REGISTRY": "deer_vla_tpu.core.config",
    "init_deer": "deer_vla_tpu.models.flamingo",
    "forward_train": "deer_vla_tpu.models.flamingo",
    "forward_fixed_exit": "deer_vla_tpu.models.flamingo",
    "trainable_mask": "deer_vla_tpu.models.flamingo",
    "ExitController": "deer_vla_tpu.models.value_net",
    "solve_thresholds": "deer_vla_tpu.models.value_net",
    "ScanDeerPolicy": "deer_vla_tpu.eval.scan_policy",
    "DeerPolicy": "deer_vla_tpu.eval.policy",
    "FusedDeerPolicy": "deer_vla_tpu.eval.fused_policy",
    "BatchedDeerPolicy": "deer_vla_tpu.eval.batched_policy",
    "calibrate": "deer_vla_tpu.eval.calibrate",
    "evaluate_policy": "deer_vla_tpu.eval.rollout",
    "Trainer": "deer_vla_tpu.train.trainer",
    "TrainConfig": "deer_vla_tpu.train.trainer",
}

__all__ = list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module 'deer_vla_tpu' has no attribute {name!r}")
