"""Deterministic, resumable ensemble checkpointing.

The reference re-saves its whole shared-memory arrays to one ``.npz`` after
every 24-atmosphere batch and has no code path that reads it back to skip
completed work (``Generate_LWIR_TUD.py:150``; SURVEY.md §5 "a checkpoint
without a resume path"). Here production runs over an ensemble are split
into a deterministic batch manifest; each completed batch is persisted as
its own ``.npz`` plus a manifest entry, and a restarted job recomputes only
the missing batches.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["EnsembleCheckpoint", "run_batched"]


class EnsembleCheckpoint:
    """Directory of per-batch ``.npz`` shards + a JSON manifest."""

    def __init__(self, directory: str, n_items: int, batch_size: int,
                 meta: dict | None = None):
        self.directory = directory
        self.n_items = int(n_items)
        self.batch_size = int(batch_size)
        self.n_batches = -(-self.n_items // self.batch_size)
        os.makedirs(directory, exist_ok=True)
        self._manifest_path = os.path.join(directory, "manifest.json")
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                m = json.load(f)
            if (m["n_items"], m["batch_size"]) != (self.n_items, self.batch_size):
                raise ValueError(
                    f"checkpoint at {directory} was created for "
                    f"n_items={m['n_items']}, batch_size={m['batch_size']}"
                )
            self._manifest = m
        else:
            self._manifest = {
                "n_items": self.n_items,
                "batch_size": self.batch_size,
                "completed": [],
                "meta": meta or {},
            }
            self._flush()

    def _flush(self):
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._manifest, f)
        os.replace(tmp, self._manifest_path)

    def batch_indices(self, b: int) -> np.ndarray:
        lo = b * self.batch_size
        return np.arange(lo, min(lo + self.batch_size, self.n_items))

    @property
    def completed(self) -> set[int]:
        return set(self._manifest["completed"])

    @property
    def pending(self) -> list[int]:
        done = self.completed
        return [b for b in range(self.n_batches) if b not in done]

    def _batch_path(self, b: int) -> str:
        return os.path.join(self.directory, f"batch_{b:06d}.npz")

    def write_batch(self, b: int, arrays: dict) -> None:
        tmp = self._batch_path(b) + ".tmp.npz"
        np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
        os.replace(tmp, self._batch_path(b))
        if b not in self._manifest["completed"]:
            self._manifest["completed"].append(b)
            self._manifest["completed"].sort()
        self._flush()

    def read_batch(self, b: int) -> dict:
        with np.load(self._batch_path(b)) as f:
            return {k: f[k].copy() for k in f.files}

    def gather(self) -> dict:
        """Concatenate all completed batches in index order."""
        if self.pending:
            raise RuntimeError(f"batches incomplete: {self.pending}")
        parts = [self.read_batch(b) for b in range(self.n_batches)]
        if not parts:
            return {}
        return {
            k: np.concatenate([p[k] for p in parts], axis=0)
            for k in parts[0]
        }


def run_batched(ckpt: EnsembleCheckpoint, compute_batch, log=print,
                async_io: bool = False) -> dict:
    """Run ``compute_batch(indices) -> dict`` over pending batches, persist
    each, and gather. Restarts skip completed batches automatically.

    With ``async_io=True`` each batch's ``.npz`` serialization overlaps the
    next batch's (device) compute on a single writer thread — at most one
    write in flight, so a crash loses at most the in-flight batch and the
    manifest stays consistent (writes are serialized in batch order).
    """
    if not async_io:
        for b in ckpt.pending:
            idx = ckpt.batch_indices(b)
            out = compute_batch(idx)
            ckpt.write_batch(b, out)
            if log:
                log(f"checkpoint: batch {b + 1}/{ckpt.n_batches} "
                    f"({idx[0]}..{idx[-1]}) done")
        return ckpt.gather()

    from concurrent.futures import ThreadPoolExecutor

    def write(b, idx, out):
        ckpt.write_batch(b, out)
        if log:
            log(f"checkpoint: batch {b + 1}/{ckpt.n_batches} "
                f"({idx[0]}..{idx[-1]}) done")

    with ThreadPoolExecutor(max_workers=1) as ex:
        pending_write = None
        for b in ckpt.pending:
            idx = ckpt.batch_indices(b)
            out = compute_batch(idx)
            if pending_write is not None:
                pending_write.result()
            pending_write = ex.submit(write, b, idx, out)
        if pending_write is not None:
            pending_write.result()
    return ckpt.gather()
