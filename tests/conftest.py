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


@pytest.fixture(scope="session")
def iso_tables():
    from radtxfr_tpu.lines.store import IsoTables

    return IsoTables.load()
