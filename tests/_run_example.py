"""Subprocess shim: run an example script on the CPU backend.

Usage: ``python tests/_run_example.py examples/01_....py``

The examples default to the ambient JAX backend (real TPU under the axon
plugin, which registers itself from sitecustomize and overrides the
``JAX_PLATFORMS`` env var) — tests must pin the CPU backend through
``jax.config`` *before* first backend init, which a plain subprocess
invocation of the script cannot do. This shim does that, then executes
the script as ``__main__``.
"""

import os
import runpy
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

runpy.run_path(sys.argv[1], run_name="__main__")
