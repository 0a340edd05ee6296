"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware (the driver
separately dry-runs them; see __graft_entry__.dryrun_multichip).

IMPORTANT: this host's sitecustomize (axon TPU tunnel) force-sets
jax_platforms="axon,cpu" at interpreter startup, overriding JAX_PLATFORMS.
Eager test code on the tunneled TPU pays a network round trip PER OP, so we
must override the config again here, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: the suite re-compiles the same tiny-model
# programs across files; caching cuts full-suite time dramatically on reruns
jax.config.update("jax_compilation_cache_dir", "/tmp/deer_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Quick tier (`pytest -m quick`): ONE representative test per subsystem,
# first param variant only — a <5 min smoke across the whole surface for
# sessions that can't afford the full suite (VERDICT r3 weak 6).  Tests can
# also self-mark with @pytest.mark.quick (tests/test_bench_emit.py does).
# ---------------------------------------------------------------------------
QUICK_TIER = {
    # models / forward
    "test_smoke.py": {"test_forward_train"},
    "test_golden.py": {"test_fixed_exit_golden"},
    "test_fusion_modes.py": {"test_encode_shapes_by_mode"},
    "test_llama.py": {"test_bc_flamingo_forward"},
    "test_alt_heads.py": {"test_fc_decoder", "test_diffusion_unet_and_sampler"},
    "test_head_types.py": {"test_fc_requires_window_folded_fusion"},
    "test_gripper_res.py": {"test_resize_pos_embed_identity_and_grid"},
    # ops / kernels
    "test_pallas.py": {"test_flash_attention_bias_head_broadcast"},
    "test_parity_torch.py": {"test_lstm_matches_torch"},
    "test_quant.py": {"test_linear_w8a8_close"},
    "test_tome.py": {"test_bipartite_merge_matches_numpy_reference"},
    # train
    "test_train.py": {"test_two_phase_training_runs"},
    "test_review_fixes_r2.py": {"test_clip_norm_ignores_frozen_grads"},
    # data
    "test_data.py": {"test_dataset_index_and_sample"},
    "test_native_loader.py": {"test_read_window_matches_numpy"},
    "test_vl_dataset.py": {"test_caption_dataset"},
    "test_webdataset.py": {"test_mmc4_decode"},
    "test_real_hdf5.py": {"test_euler_rotm_roundtrip"},
    "test_hf_tokenizer.py": {"test_hf_tokenizer_flamingo_format"},
    # dynamic-exit control plane
    "test_exit_plane.py": {"test_solve_thresholds_matches_distribution"},
    "test_exit_contract.py": {"test_on_calibration_realized_equals_target"},
    # serving engines
    "test_scan_policy.py": {"test_scan_step_batch"},
    "test_batched_policy.py": {"test_batched_matches_single_at_full_depth"},
    "test_caching.py": {"test_frame_delta"},
    "test_kv_decode.py": {"test_cached_single_new_token"},
    "test_server.py": {"test_healthz_and_step"},
    # rollout / eval harness
    "test_batched_rollout.py": {"test_batched_rollout_matches_sequential"},
    "test_calvin_contract.py": {"test_adapter_consumes_real_obs_schema"},
    "test_eval_models.py": {"test_factory_routes_families"},
    "test_vl_eval.py": {"test_greedy_generate"},
    "test_misc.py": {"test_gp_minimize_quadratic"},
    "test_parallel_bo.py": {"test_per_stream_thresholds_exit_independently"},
    "test_tcp.py": {"test_world_tcp_world_roundtrip"},
    "test_rollout_features.py": {"test_multi_step_action_queue"},
    # parallel / multichip
    "test_sharding.py": {"test_tp_sharding_numerically_equivalent"},
    "test_sharded_serving.py": {"test_sharded_matches_single_device"},
    "test_9b_sharded.py": {"test_9b_layout"},
    # checkpoints / artifacts / deployment
    "test_convert.py": {"test_head_conversion_parity"},
    "test_convert_cli.py": {"test_convert_cli_end_to_end"},
    "test_export.py": {"test_export_roundtrip_bit_exact"},
    "test_verify_artifacts.py": {"test_verify_artifacts_catches_shape_drift"},
    "test_reference_artifacts.py": {"test_eval_sequences_format"},
    "test_elastic.py": {"test_heartbeat_write_and_age"},
    "test_compile_cache.py": {"test_env_var_hook"},
}


# ---------------------------------------------------------------------------
# Medium tier (`pytest -m medium`): the CI / round-end tier (VERDICT r4
# item 7).  Quick's one-test-per-subsystem coverage PLUS the full param
# grids of the core-correctness files below (~15 min on this 1-core box;
# the full 459-test suite is ~44 min serial and within sight of
# session-budget kills).  Tier policy:
#   quick  (<5 min)  — iteration during development
#   medium (~15 min) — CI (scripts/ci.sh CI_MEDIUM=1) and round-end state
#   full   (~44 min) — pre-release / when the budget allows
# ---------------------------------------------------------------------------
MEDIUM_FILES = {
    # golden/parity correctness
    "test_smoke.py", "test_golden.py", "test_parity_torch.py",
    # kernels / quantization / token merging
    "test_quant.py", "test_tome.py",
    # the dynamic-exit control plane (the product's heart)
    "test_exit_plane.py", "test_exit_contract.py",
    # serving engines + rollout harness
    "test_scan_policy.py", "test_batched_policy.py",
    "test_batched_rollout.py", "test_calvin_contract.py",
    # data pipeline
    "test_data.py",
    # multichip
    "test_sharding.py", "test_sharded_serving.py",
    # artifacts / deployment / driver contracts
    "test_convert.py", "test_export.py", "test_bench_emit.py",
    "test_reference_artifacts.py", "test_verify_artifacts.py",
}
# known-heavy members of medium files that only the full tier runs
# (populate from measured timings; empty today — the tier fits its budget)
MEDIUM_EXCLUDE: set = set()


def pytest_collection_modifyitems(config, items):
    seen = set()
    for item in items:
        fname = item.fspath.basename
        base = item.name.split("[")[0]
        key = (fname, base)
        quick = base in QUICK_TIER.get(fname, ()) and key not in seen
        if quick:
            seen.add(key)  # first param variant only
            item.add_marker(pytest.mark.quick)
        if quick or (fname in MEDIUM_FILES
                     and (fname, base) not in MEDIUM_EXCLUDE):
            item.add_marker(pytest.mark.medium)
