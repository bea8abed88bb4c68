"""Persistent XLA compilation cache.

The OD kernel's first compile costs minutes per process (remote-compile on
the TPU service path); the reference pays an analogous per-process cost by
re-launching its Fortran binary per layer (``radiative_transfer.py:494``).
Enabling JAX's persistent compilation cache makes every tool/CLI/production
process after the first reuse compiled executables from disk.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "radtxfr_tpu", "xla"
)


def enable_persistent_cache(directory: str | None = None,
                            min_compile_secs: float = 1.0) -> str:
    """Point JAX's compilation cache at a durable directory and return it.

    ``directory`` defaults to ``$RADTXFR_CACHE_DIR`` or
    ``~/.cache/radtxfr_tpu/xla``. Safe to call more than once; call before
    the first ``jit`` execution for full effect.
    """
    import jax

    directory = directory or os.environ.get("RADTXFR_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return directory
