"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the fake-backend capability the reference lacks (SURVEY.md §4):
multi-chip sharding logic is exercised on host CPU via
--xla_force_host_platform_device_count, no TPU pod required.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon boot hook registers the TPU backend and pins jax_platforms before
# env vars are read; override at the config level (backends are lazy).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "reference_grids.npz")


@pytest.fixture(scope="session")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixtures not generated")
    return np.load(GOLDEN)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


# Tests measured >=15 s on the 1-core box (pytest --durations=0, round 5) —
# kept in the DEFAULT suite, but excludable for the inner loop with
# `-m "not heavy"` (~5 min).  Regenerate after big suite changes:
#   grep -E "^[0-9.]+s call" durations.log | awk '$1+0>=15 {print $3}'
HEAVY = frozenset({
    "tests/test_cli_surface.py::test_dump_vars_and_inter_ckpt_roundtrip",
    "tests/test_cli_surface.py::test_engine_cli_override_sharded_matches_folded",
    "tests/test_cli_surface.py::test_exp_suffix_names_save_dir",
    "tests/test_cli_surface.py::test_override_save_idx",
    "tests/test_cli_surface.py::test_speed_benchmark_writes_per_day_file",
    "tests/test_engine_pallas.py::test_engine_pallas_matches_xla",
    "tests/test_engine_pallas.py::test_engine_skip_tables_matches_gather_path",
    "tests/test_engine_pallas.py::test_sharded_generate_matches_single_device",
    "tests/test_eval_cli.py::test_fid_cli_distinct_sets_positive",
    "tests/test_eval_cli.py::test_fid_cli_self_is_zero",
    "tests/test_eval_cli.py::test_stats_precompute_roundtrip",
    "tests/test_evalkit.py::test_inception_feature_shape",
    "tests/test_halo_sharded.py::test_width_sharded_halo_exchange",
    "tests/test_halo_sharded.py::test_width_sharded_halo_pad_drop",
    "tests/test_halo_sharded.py::test_halo_engine_via_manager",
    "tests/test_interactive.py::test_interactive_repl_scripted",
    "tests/test_inversion.py::test_invert_generated_patch",
    "tests/test_models.py::test_discriminator_shapes",
    "tests/test_models.py::test_generator_forward_shapes",
    "tests/test_models.py::test_style_fusion_synthesis",
    "tests/test_multihost.py::test_two_process_training_step",
    "tests/test_pallas_sample.py::test_sphere_conv_sample_mode_fwd_and_grads",
    "tests/test_pano_parity.py::test_close_loop_pano_parity",
    "tests/test_profile.py::test_cli_profile_dir",
    "tests/test_profile.py::test_train_loop_profile_window",
    "tests/test_reference_forward_parity.py::test_forward_parity_with_reference",
    "tests/test_stitcher.py::test_dedup_wrap_meta_bit_identical",
    "tests/test_stitcher.py::test_ss_noise_engine_semantics",
    "tests/test_train_fid.py::test_train_fid_pipeline",
    "tests/test_train_step.py::test_freeze_mask_and_lr_schedule_and_sgd",
    "tests/test_train_step.py::test_full_train_step_on_mesh",
    "tests/test_train_step.py::test_pallas_sampler_step_matches_xla_step",
    "tests/test_train_step.py::test_step_many_equals_sequential_steps",
    "tests/test_train_step.py::test_step_many_respects_freeze_mask",
    "tests/test_trainstep_parity.py::test_g_step_values_and_grads",
    "tests/test_trainstep_parity.py::test_ppl_values_and_grads",
    "tests/test_trainstep_parity.py::test_r1_value_and_grads",
    "tests/test_trainstep_parity.py::test_torch_adam_chain_exact_d",
    "tests/test_trainstep_parity.py::test_torch_adam_chain_exact_g",
})


_HEAVY_KEYS = frozenset((n.split("::")[0].rsplit("/", 1)[-1],
                         n.split("::")[1]) for n in HEAVY)


def pytest_collection_modifyitems(config, items):
    for item in items:
        path, _, name = item.nodeid.partition("::")
        key = (path.replace(os.sep, "/").rsplit("/", 1)[-1],
               name.split("[")[0])  # parametrizations inherit
        if key in _HEAVY_KEYS:
            item.add_marker(pytest.mark.heavy)
