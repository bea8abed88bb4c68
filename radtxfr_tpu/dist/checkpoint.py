"""Deterministic, resumable ensemble checkpointing.

The reference re-saves its whole shared-memory arrays to one ``.npz`` after
every 24-atmosphere batch and has no code path that reads it back to skip
completed work (``Generate_LWIR_TUD.py:150``; SURVEY.md §5 "a checkpoint
without a resume path"). Here production runs over an ensemble are split
into a deterministic batch plan; each completed batch is persisted as its
own atomically-renamed ``.npz``, completion is *derived from the shard
files themselves* (so concurrent hosts on shared storage cannot race on
manifest state), and a restarted job recomputes only the missing batches.
The JSON manifest holds only the immutable plan (sizes + meta) for
restart validation.
"""

from __future__ import annotations

import json
import os
import re
import uuid

import numpy as np

__all__ = ["EnsembleCheckpoint", "run_batched", "TiledCheckpoint",
           "run_tiled", "host_gather"]


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
                "meta": meta or {},
            }
            self._flush()

    def _flush(self):
        # unique temp name per writer: several hosts/processes may flush the
        # same manifest concurrently on shared storage, and a shared fixed
        # temp path would interleave their writes into invalid JSON
        tmp = f"{self._manifest_path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(self._manifest, f)
        os.replace(tmp, self._manifest_path)

    def batch_indices(self, b: int) -> np.ndarray:
        lo = b * self.batch_size
        return np.arange(lo, min(lo + self.batch_size, self.n_items))

    @property
    def completed(self) -> set[int]:
        # completion is derived from the atomically-renamed shard files
        # themselves, never from manifest state: concurrent writers on
        # shared storage cannot lose each other's completions this way
        pat = re.compile(r"^batch_(\d{6})\.npz$")
        return {int(m.group(1)) for name in os.listdir(self.directory)
                if (m := pat.match(name))}

    @property
    def pending(self) -> list[int]:
        done = self.completed
        return [b for b in range(self.n_batches) if b not in done]

    def _batch_path(self, b: int) -> str:
        return os.path.join(self.directory, f"batch_{b:06d}.npz")

    def write_batch(self, b: int, arrays: dict) -> None:
        tmp = f"{self._batch_path(b)}.tmp.{uuid.uuid4().hex}.npz"
        np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
        os.replace(tmp, self._batch_path(b))

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


class TiledCheckpoint:
    """(ensemble-batch x nu-shard) tiled manifest for multi-host jobs.

    SURVEY.md §5: a restarted job should recompute only missing
    (nu-shard x atmosphere-batch) tiles. Each host persists the tiles it
    owns (typically shard == its mesh column) as atomic renames; completion
    state is the set of tile files present, so any number of hosts write
    concurrently without coordination and restarts on any host count skip
    every completed tile. Tile files are
    ``tile_{batch:06d}_{shard:03d}.npz``.
    """

    def __init__(self, directory: str, n_items: int, batch_size: int,
                 n_shards: int, meta: dict | None = None):
        self.directory = directory
        self.n_items = int(n_items)
        self.batch_size = int(batch_size)
        self.n_shards = int(n_shards)
        self.n_batches = -(-self.n_items // self.batch_size)
        os.makedirs(directory, exist_ok=True)
        self._manifest_path = os.path.join(directory, "manifest.json")
        key = {"n_items": self.n_items, "batch_size": self.batch_size,
               "n_shards": self.n_shards}
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                m = json.load(f)
            if {k: m[k] for k in key} != key:
                raise ValueError(
                    f"checkpoint at {directory} was created for {m}")
            self._manifest = m
        else:
            self._manifest = dict(key, meta=meta or {})
            self._flush()

    _flush = EnsembleCheckpoint._flush
    batch_indices = EnsembleCheckpoint.batch_indices

    @property
    def completed(self) -> set[tuple[int, int]]:
        # derived from the atomically-renamed tile files (see
        # EnsembleCheckpoint.completed): hosts completing tiles
        # concurrently never race on shared manifest state
        pat = re.compile(r"^tile_(\d{6})_(\d{3})\.npz$")
        return {(int(m.group(1)), int(m.group(2)))
                for name in os.listdir(self.directory)
                if (m := pat.match(name))}

    @property
    def pending(self) -> list[tuple[int, int]]:
        done = self.completed
        return [(b, s) for b in range(self.n_batches)
                for s in range(self.n_shards) if (b, s) not in done]

    def _tile_path(self, b: int, s: int) -> str:
        return os.path.join(self.directory, f"tile_{b:06d}_{s:03d}.npz")

    def write_tile(self, b: int, s: int, arrays: dict) -> None:
        tmp = f"{self._tile_path(b, s)}.tmp.{uuid.uuid4().hex}.npz"
        np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
        os.replace(tmp, self._tile_path(b, s))

    def read_tile(self, b: int, s: int) -> dict:
        with np.load(self._tile_path(b, s)) as f:
            return {k: f[k].copy() for k in f.files}

    def gather(self, shard_axes: dict | int = -1) -> dict:
        """Stitch all tiles: shards concatenated along ``shard_axes``
        (an int for every key, or a per-key dict; ``None`` = key is
        shard-replicated, take shard 0), then batches along axis 0."""
        if self.pending:
            raise RuntimeError(f"tiles incomplete: {self.pending}")
        rows = []
        for b in range(self.n_batches):
            tiles = [self.read_tile(b, s) for s in range(self.n_shards)]
            row = {}
            for k in tiles[0]:
                ax = shard_axes.get(k, -1) if isinstance(shard_axes, dict) else shard_axes
                row[k] = (tiles[0][k] if ax is None else
                          np.concatenate([t[k] for t in tiles], axis=ax))
            rows.append(row)
        return {k: np.concatenate([r[k] for r in rows], axis=0)
                for k in rows[0]}


def run_tiled(ckpt: TiledCheckpoint, compute_tile, log=print,
              shard_axes: dict | int = -1,
              owned_shards=None) -> dict | None:
    """Run ``compute_tile(indices, shard) -> dict`` over this host's pending
    tiles and gather (returns None when other hosts' tiles are missing —
    call :meth:`TiledCheckpoint.gather` after a barrier instead).

    ``owned_shards`` restricts the work to the nu-shards this host computes
    (default: all — the single-host case).
    """
    owned = set(range(ckpt.n_shards) if owned_shards is None else owned_shards)
    for b, s in ckpt.pending:
        if s not in owned:
            continue
        out = compute_tile(ckpt.batch_indices(b), s)
        ckpt.write_tile(b, s, out)
        if log:
            log(f"checkpoint: tile (batch {b + 1}/{ckpt.n_batches}, "
                f"shard {s}) done")
    return None if ckpt.pending else ckpt.gather(shard_axes=shard_axes)


def host_gather(arr):
    """Gather a (possibly multi-host sharded) jax.Array to a host ndarray.

    Fully-addressable arrays (single host, any number of local devices)
    transfer directly; cross-host shardings go through
    ``multihost_utils.process_allgather`` so every host receives the full
    value (SURVEY.md §5 host-side gather for HDF5 export)."""
    import jax

    if not isinstance(arr, jax.Array) or arr.is_fully_addressable:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


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
