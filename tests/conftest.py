"""Test configuration: force CPU backend with 8 virtual devices so
multi-device sharding tests run without TPU hardware (SURVEY.md §4, item 5).

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
so we must use jax.config.update before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiers (VERDICT r4 §3): `-m smoke` = quick green signal (<5 min on
# the 1-core harness host); `-m "not slow"` = the default development
# suite; `-m slow` = heavyweight gauntlets/parity suites.
# ---------------------------------------------------------------------------

# Whole modules that are fast end-to-end.
SMOKE_MODULES = {
    "test_eval_metrics.py",
    "test_parallel_multihost.py",
    "test_bench_entry.py",
}

# Individually fast tests inside otherwise-heavier modules: core
# numerics, window math, loss semantics, bbox/crop math, one small-dim
# mesh exec.
SMOKE_TESTS = {
    # test_core_smpl.py — FK/skinning/camera numerics vs numpy oracles.
    "test_skew_symmetric",
    "test_rodrigues_matches_reference",
    "test_rodrigues_zero_angle_guard",
    "test_rodrigues_valid_rotations",
    "test_rot_to_axis_angle_roundtrip",
    "test_rotation_deltas",
    "test_fk_matches_reference_sequential",
    "test_smpl_forward_matches_reference",
    "test_orth_proj_idrot",
    "test_procrustes2d_recovers_camera",
    "test_procrustes2d_matches_reference_with_vis",
    "test_procrustes_scale_clamped",
    "test_optcam_stops_gradient",
    # test_infer.py — window schedule math + predictor loop parity.
    "test_window_schedule_matches_reference_formulas",
    "test_window_pad_and_stitch_roundtrip",
    "test_predictor_matches_reference_window_loop",
    "test_predictor_rejects_bad_pred_mode",
    "test_bucket_values",
    "test_kp_to_bbox_param",
    "test_bbox_interpolation_over_gap",
    "test_smooth_bbox_prepends_zeros",
    "test_process_image_shapes_and_range",
    "test_process_image_scale",
    "test_get_labels_poseflow",
    # test_train.py — TF loss-reduction semantics + one DP mesh exec.
    "test_keypoint_l1_tf_reduction",
    "test_masked_mse_tf_reduction",
    "test_masked_mse_all_masked",
    "test_align_by_pelvis",
    "test_lsgan_losses",
    "test_beta_smoothness",
    "test_fake_pool_size",
    "test_shard_batch_2d_rejects_indivisible_t",
    "test_train_step_dp_sharded",
}

# Heavyweight tier: accuracy gauntlets, TF-oracle suites, image-mode
# training, contract-dims compile certs (test_dryrun_contract marks
# itself via pytestmark).
SLOW_MODULES = {
    "test_synthetic_gauntlet.py",
    "test_tf_forward_parity.py",
    "test_image_mode_training.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base = item.name.split("[")[0]
        if fname in SMOKE_MODULES or base in SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
        if fname in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
