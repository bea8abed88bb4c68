"""Multi-host runtime initialization.

The reference has no distributed backend (single host ``multiprocessing`` +
shared memory, ``Generate_LWIR_TUD.py:98-149``). The TPU framework scales
over hosts through JAX's distributed runtime: call :func:`init_multihost`
once per process before building meshes; device meshes then span all hosts'
devices and ``shard_map`` collectives ride ICI/DCN automatically.
"""

from __future__ import annotations

import os

__all__ = ["init_multihost", "runtime_info"]


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op on single-process TPU pods where
    the runtime auto-detects, and safe to call once per process).

    Arguments default to the standard env variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``)
    or full auto-detection on Cloud TPU.
    """
    import jax

    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def runtime_info() -> dict:
    """Process/device layout summary for logs."""
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "backend": jax.default_backend(),
    }
