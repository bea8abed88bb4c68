"""Test configuration: CPU backend with a virtual 8-device mesh + float64.

Tests run on the CPU backend (multi-chip sharding is validated on a virtual
device mesh per SURVEY.md §4); float64 is enabled so the engine can be
compared against the hapi-driven CPU oracle at tight tolerances. Real-TPU
execution is exercised by bench.py / __graft_entry__.py, not pytest.
"""

import os

# The image's sitecustomize registers the axon TPU backend in every Python
# process; selecting the platform must therefore go through jax.config (env
# JAX_PLATFORMS is overridden by the plugin registration). XLA_FLAGS is read
# lazily at first backend init, so setting it here (before any jax.devices())
# still yields the virtual 8-device CPU mesh.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


# Tests measured >= ~13 s on this container (pytest --durations on the
# round-4 tree); centrally marked slow so `-m quick` is a fast iteration
# tier (~6-7 min) while the default full run keeps the complete
# hapi-oracle parity sweep for CI (VERDICT r4 #8).
_SLOW_TESTS = {
    "test_fused_param_layouts_equivalent",
    "test_differentiable_sdvoigt_pallas_jvp_matches_jnp",
    "test_ht_differentiable_jacobian_matches_fd",
    "test_cli_tud_jacobian_and_mako_sort",
    "test_sdvoigt_production_path_matches_jnp",
    "test_pallas_jacobian_engine_matches_jnp",
    "test_layered_ht_pallas_matches_jnp",
    "test_layered_ht_jnp_zero_ht_columns_is_sdvoigt",
    "test_sdvoigt_engine_pallas_dispatch",
    "test_spectrum_sharded_sdvoigt_matches_unsharded",
    "test_differentiable_sdvoigt_jacfwd_matches_fd",
    "test_tud_ensemble_pallas_matches_unsharded",
    "test_ht_lattice_coarse_far_matches_classic",
    "test_line_sharded_od_matches_replicated",
    "test_coarse_far_layered_od_matches_classic",
    "test_differentiable_pallas_jvp_matches_jnp",
    "test_kill_resume_bit_identical",
    "test_pallas_ensemble_continuum",
    "test_tud_ensemble_weighted_partition_matches_equal",
    "test_cli_atmosgen",
    "test_spectrum_sharded_line_mixing_matches_unsharded",
    "test_atmos_generator_end_to_end",
    "test_jacobian_tangent_batching_matches_full",
    "test_atmos_generator_variational_moments",
    "test_coarse_far_matches_classic_xs_lattice",
    "test_grouped_od_pallas_matches_jnp_engine",
    "test_cli_xsect_and_tud_pipeline",
    "test_weighted_partition_matches_unsharded",
    "test_pallas_mix_mode_matches_jnp",
    "test_od_layers_continuum_wiring",
    "test_xsect_lattice_pallas_matches_jnp",
    "test_cli_tud_sharded_matches_single_device",
    "test_sharded_jacobian_matches_single_device",
    "test_sharded_jacobian_tangent_matches_fd",
    "test_cli_tud_sharded_jacobian",
}


def pytest_collection_modifyitems(config, items):
    """Mark the measured-heavy tests slow; every test not marked ``slow``
    gets ``quick`` (run the fast tier with ``-m quick``)."""
    for item in items:
        if item.originalname in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def iso_tables():
    from radtxfr_tpu.lines.store import IsoTables

    return IsoTables.load()
