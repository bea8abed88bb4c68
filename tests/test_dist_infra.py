"""Distributed infrastructure: 2-process jax.distributed smoke test,
tiled (batch x nu-shard) checkpointing, host gather."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from radtxfr_tpu.dist.init import init_multihost, runtime_info

coord, pid = sys.argv[1], int(sys.argv[2])
init_multihost(coordinator_address=coord, num_processes=2, process_id=pid)
info = runtime_info()
assert info["process_count"] == 2, info
assert info["process_index"] == pid, info

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils

g = multihost_utils.process_allgather(jnp.asarray([float(pid + 1)]))
assert sorted(np.ravel(g).tolist()) == [1.0, 2.0], g

from radtxfr_tpu.dist.checkpoint import host_gather
x = jnp.arange(4.0) + 10.0 * pid
h = host_gather(x)          # fully addressable: direct transfer
assert h.shape == (4,)
print("WORKER_OK", pid)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_jax_distributed(tmp_path):
    """dist.init.init_multihost wires two CPU processes into one JAX
    runtime (coordinator + collective), validating the C1 comms backend
    glue end to end."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("XLA_FLAGS", None)   # single CPU device per process
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, coord, str(i)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, cwd=str(tmp_path))
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out


def test_tiled_checkpoint_resume(tmp_path):
    from radtxfr_tpu.dist.checkpoint import TiledCheckpoint, run_tiled

    d = str(tmp_path / "ck")
    calls = []

    def compute(indices, shard):
        calls.append((indices[0], shard))
        n = len(indices)
        return {"tau": np.full((n, 4), 10 * shard + indices[0], np.float32),
                "x_lo": np.arange(4) + 100 * shard}

    ck = TiledCheckpoint(d, n_items=5, batch_size=2, n_shards=3)
    assert len(ck.pending) == 3 * 3
    # complete a subset, then "crash"
    for b, s in ck.pending[:4]:
        ck.write_tile(b, s, compute(ck.batch_indices(b), s))
    # resume: only the remaining 5 tiles are computed
    calls.clear()
    ck2 = TiledCheckpoint(d, n_items=5, batch_size=2, n_shards=3)
    assert len(ck2.pending) == 5
    out = run_tiled(ck2, compute, log=None,
                    shard_axes={"tau": -1, "x_lo": -1})
    assert len(calls) == 5
    assert out["tau"].shape == (5, 12)      # 5 items x (3 shards * 4)
    assert out["x_lo"].shape == (3 * 3 * 4,)  # concatenated per batch row

    # shard-replicated key convention: take shard 0 only
    out2 = ck2.gather(shard_axes={"tau": -1, "x_lo": None})
    assert out2["x_lo"].shape == (3 * 4,)

    # geometry mismatch rejected
    with pytest.raises(ValueError):
        TiledCheckpoint(d, n_items=5, batch_size=2, n_shards=4)


def test_tiled_checkpoint_concurrent_writers(tmp_path):
    """Completion is derived from the atomically-renamed tile files, so
    interleaved writers on the same directory never lose each other's
    completions (the failure mode of a manifest read-modify-write)."""
    from radtxfr_tpu.dist.checkpoint import TiledCheckpoint

    d = str(tmp_path / "ck")
    a = TiledCheckpoint(d, n_items=4, batch_size=2, n_shards=2)
    b = TiledCheckpoint(d, n_items=4, batch_size=2, n_shards=2)
    pay = lambda: {"v": np.zeros((2, 2), np.float32)}
    a.write_tile(0, 0, pay())
    b.write_tile(0, 1, pay())   # b holds no view of a's completion
    a.write_tile(1, 0, pay())
    b.write_tile(1, 1, pay())
    assert a.completed == b.completed == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert not a.pending and not b.pending


def test_tiled_checkpoint_owned_shards(tmp_path):
    """Per-host shard ownership: a host computes only its shards; gather
    refuses until every host's tiles exist."""
    from radtxfr_tpu.dist.checkpoint import TiledCheckpoint, run_tiled

    d = str(tmp_path / "ck")
    compute = lambda idx, s: {"v": np.full((len(idx), 2), s, np.float32)}
    ck = TiledCheckpoint(d, n_items=4, batch_size=2, n_shards=2)
    out = run_tiled(ck, compute, log=None, owned_shards=[0])
    assert out is None and len(ck.pending) == 2
    # "other host" (same fs) completes shard 1
    ck_other = TiledCheckpoint(d, n_items=4, batch_size=2, n_shards=2)
    out = run_tiled(ck_other, compute, log=None, owned_shards=[1])
    assert out is not None
    assert out["v"].shape == (4, 4)
    np.testing.assert_array_equal(out["v"][0], [0, 0, 1, 1])


def test_host_gather_sharded_array():
    """host_gather on a virtual-mesh sharded array (fully addressable)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from radtxfr_tpu.dist.checkpoint import host_gather
    from radtxfr_tpu.dist.mesh import make_mesh

    mesh = make_mesh(4, 2)
    x = jnp.arange(32.0).reshape(8, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P("ensemble", "spectrum")))
    np.testing.assert_array_equal(host_gather(xs), np.asarray(x))


def test_kill_resume_bit_identical(tmp_path):
    """Fault injection (VERDICT r3 #8): SIGKILL the ensemble driver
    mid-run (checkpointing active), restart it, and assert the final
    HDF5 is BIT-identical to an uninterrupted run — the elastic-recovery
    scenario the checkpoint subsystem exists for."""
    import signal
    import time

    args = lambda h5, ck: [
        "tud", "--synthetic", "120", "--numin", "800", "--numax", "812",
        "--dv", "0.005", "--dv-out", "0.25", "--n-atmos", "8",
        "--batch", "2", "--n-angles", "8", "--altitudes", "2.0", "500.0",
        "--checkpoint", ck, "--output", h5,
    ]

    def spawn(h5, ck):
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from radtxfr_tpu.cli.main import main; main(%r)"
            % (args(h5, ck),))
        return subprocess.Popen(
            [sys.executable, "-c", code], stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))

    # uninterrupted reference run
    h5_ref, ck_ref = str(tmp_path / "ref.h5"), str(tmp_path / "ck_ref")
    p = spawn(h5_ref, ck_ref)
    assert p.wait(timeout=600) == 0, p.stdout.read().decode()[-2000:]

    # interrupted run: SIGKILL as soon as the first batch lands on disk
    # but before all four batches exist
    h5_int, ck_int = str(tmp_path / "int.h5"), str(tmp_path / "ck_int")
    p = spawn(h5_int, ck_int)
    deadline = time.time() + 600
    killed = False
    while time.time() < deadline:
        if p.poll() is not None:
            break               # finished before we could kill — retry below
        done = [f for f in (os.listdir(ck_int)
                            if os.path.isdir(ck_int) else [])
                if f.startswith("batch_")]
        if done:
            os.kill(p.pid, signal.SIGKILL)
            p.wait(timeout=60)
            killed = True
            break
        time.sleep(0.05)
    assert killed or p.poll() == 0
    if killed:
        from radtxfr_tpu.dist.checkpoint import EnsembleCheckpoint

        ck = EnsembleCheckpoint(ck_int, 8, 2)
        n_done = len(ck.completed)
        assert 0 < n_done, "kill landed before any batch was written"
        assert not os.path.exists(h5_int), "output written despite kill"
        # resume: a fresh process completes only the pending batches
        p = spawn(h5_int, ck_int)
        assert p.wait(timeout=600) == 0, p.stdout.read().decode()[-2000:]

    with open(h5_ref, "rb") as a, open(h5_int, "rb") as b:
        ref, got = a.read(), b.read()
    assert ref == got, "resumed HDF5 differs from uninterrupted run"
