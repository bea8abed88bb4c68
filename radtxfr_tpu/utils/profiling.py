"""Tracing / profiling / metrics — the observability the reference lacks.

SURVEY.md §5: the reference's only observability is print statements
(``radiative_transfer.py:339-373``). Here:

* :class:`PhaseTimer` — per-phase wall timing with derived throughput
  (lines/s, nu-points/s, spectra/s) as first-class numbers;
* :func:`trace` — context manager around ``jax.profiler`` for device
  traces viewable in TensorBoard/XProf;
* :class:`MetricsLog` — append-only JSONL metrics sink.
"""

from __future__ import annotations

import contextlib
import json
import time


def device_sync(x):
    """Force device-execution completion of ``x`` (pytree of arrays).

    ``jax.block_until_ready`` can return before remote execution
    completes on tunneled backends (e.g. the axon TPU plugin), and a
    full ``jax.device_get`` would drag whole buffers through a slow
    tunnel. This reads ONE element of each array leaf instead — the
    producing computation must finish, and only a few bytes transfer.
    On ordinary backends it is equivalent to ``block_until_ready``.
    """
    import jax

    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            jax.device_get(leaf.ravel()[0])
    return x


class PhaseTimer:
    """Accumulates named phase durations and optional work counters."""

    def __init__(self):
        self.phases: dict[str, float] = {}
        self.work: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, work_items: float | None = None,
              block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                # device_sync, not block_until_ready: the latter can
                # return before remote execution completes on tunneled
                # backends, making phase times dispatch-only
                device_sync(block_on)
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            if work_items is not None:
                self.work[name] = self.work.get(name, 0.0) + work_items

    def rates(self) -> dict[str, float]:
        return {
            name: self.work[name] / self.phases[name]
            for name in self.work
            if self.phases.get(name)
        }

    def report(self) -> str:
        lines = []
        for name, dt in sorted(self.phases.items(), key=lambda kv: -kv[1]):
            rate = self.rates().get(name)
            tail = f"  ({rate:,.3e} items/s)" if rate else ""
            lines.append(f"{name:>24s}: {dt:9.3f} s{tail}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLog:
    """Append-only JSONL metrics file (one JSON object per event)."""

    def __init__(self, path: str):
        self.path = path

    def log(self, **fields) -> None:
        fields.setdefault("t", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(fields) + "\n")

    def read(self) -> list[dict]:
        try:
            with open(self.path) as f:
                return [json.loads(ln) for ln in f if ln.strip()]
        except FileNotFoundError:
            return []
