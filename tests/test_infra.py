"""Checkpoint/resume, profiling, retry, CLI smoke tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from radtxfr_tpu.dist.checkpoint import EnsembleCheckpoint, run_batched
from radtxfr_tpu.utils import MetricsLog, PhaseTimer, retry


def test_checkpoint_resume(tmp_path):
    d = str(tmp_path / "ck")
    calls = []

    def compute(indices):
        calls.append(list(indices))
        return {"x": indices.astype(float) * 2.0}

    ck = EnsembleCheckpoint(d, n_items=10, batch_size=4)
    assert ck.n_batches == 3 and ck.pending == [0, 1, 2]
    # simulate a crash after two batches
    for b in [0, 1]:
        ck.write_batch(b, compute(ck.batch_indices(b)))

    # fresh process resumes: only batch 2 recomputed
    ck2 = EnsembleCheckpoint(d, n_items=10, batch_size=4)
    assert ck2.pending == [2]
    out = run_batched(ck2, compute, log=None)
    assert len(calls) == 3
    np.testing.assert_allclose(out["x"], np.arange(10) * 2.0)

    with pytest.raises(ValueError, match="was created for"):
        EnsembleCheckpoint(d, n_items=10, batch_size=5)


def test_checkpoint_async_io(tmp_path):
    """async_io overlaps writes with compute but persists every batch."""
    ck = EnsembleCheckpoint(str(tmp_path / "ck"), n_items=9, batch_size=2)
    out = run_batched(ck, lambda idx: {"x": idx + 0.5}, log=None,
                      async_io=True)
    np.testing.assert_allclose(out["x"], np.arange(9) + 0.5)
    assert ck.pending == []


def test_phase_timer_and_metrics(tmp_path):
    t = PhaseTimer()
    with t.phase("work", work_items=100):
        pass
    assert t.phases["work"] >= 0 and "work" in t.report()
    m = MetricsLog(str(tmp_path / "m.jsonl"))
    m.log(metric="spectra_per_s", value=12.5)
    rows = m.read()
    assert rows[0]["metric"] == "spectra_per_s"


def test_retry():
    attempts = []

    @retry(n_attempts=3, backoff_s=0.0)
    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise OSError("transient")
        return "ok"

    assert flaky() == "ok" and len(attempts) == 3

    @retry(n_attempts=2, backoff_s=0.0)
    def broken():
        raise ValueError("permanent")

    with pytest.raises(RuntimeError, match="failed after 2"):
        broken()


def _run_cli(*args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = env.get("JAX_PLATFORMS", "")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from radtxfr_tpu.cli.main import main; main(%r)" % (list(args),)
    )
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd=os.path.dirname(os.path.dirname(__file__)))


def test_cli_planck():
    r = _run_cli("planck")
    assert r.returncode == 0, r.stderr
    assert "BT round-trip" in r.stdout


def test_cli_xsect_and_tud_pipeline(tmp_path):
    xs = str(tmp_path / "xs.bin")
    r = _run_cli("xsect", "--synthetic", "100", "--numin", "800",
                 "--numax", "805", "--dv", "0.01", "--output", xs)
    assert r.returncode == 0, r.stderr
    from radtxfr_tpu.io.afit_xs import xs_read

    X, Y, meta = xs_read(xs)
    assert X.size == Y.size and meta["T"] == 296.0

    h5 = str(tmp_path / "tud.h5")
    ck = str(tmp_path / "ck")
    r = _run_cli("tud", "--synthetic", "80", "--numin", "800", "--numax", "810",
                 "--dv", "0.01", "--dv-out", "0.25", "--n-atmos", "3",
                 "--batch", "2", "--n-angles", "6", "--altitudes", "2.0", "500.0",
                 "--checkpoint", ck, "--output", h5)
    assert r.returncode == 0, r.stderr
    from radtxfr_tpu.io.h5 import read_h5

    data = read_h5(h5)
    assert data["tau"].data.shape[0] == 3
    from radtxfr_tpu.dist.checkpoint import EnsembleCheckpoint

    assert EnsembleCheckpoint(ck, 3, 2).completed == {0, 1}

    # config 4 + 5 downstream
    mk = str(tmp_path / "mako.h5")
    r = _run_cli("mako", "--input", h5, "--output", mk)
    assert r.returncode == 0, r.stderr

    hs = str(tmp_path / "hsi.h5")
    r = _run_cli("hsi", "--input", h5, "--output", hs, "--n-pixels", "5",
                 "--n-atm", "2")
    assert r.returncode == 0, r.stderr
    cube = read_h5(hs)
    assert cube["L"].data.shape[0] == 2


def test_cli_tud_sharded_matches_single_device(tmp_path):
    """cli tud --mesh-spectrum/--mesh-ensemble: the SPMD sharded
    production path (weighted spectral partition, on-device reduction,
    fixed-batch padding of the short final batch) produces the same
    TUD products as the single-device path."""
    h5a = str(tmp_path / "tud_1dev.h5")
    common = ["tud", "--synthetic", "80", "--numin", "800", "--numax",
              "810", "--dv", "0.01", "--dv-out", "0.25", "--n-atmos", "3",
              "--n-angles", "6", "--altitudes", "2.0", "500.0"]
    r = _run_cli(*common, "--batch", "3", "--output", h5a)
    assert r.returncode == 0, r.stderr
    h5b = str(tmp_path / "tud_mesh.h5")
    r = _run_cli(*common, "--batch", "2", "--mesh-spectrum", "2",
                 "--mesh-ensemble", "2", "--output", h5b)
    assert r.returncode == 0, r.stderr
    from radtxfr_tpu.io.h5 import read_h5

    a = read_h5(h5a)
    b = read_h5(h5b)
    np.testing.assert_allclose(a["X"].data, b["X"].data, rtol=0, atol=1e-9)
    for k in ("tau", "La", "Ld"):
        ref = a[k].data
        scale = np.abs(ref).max()
        assert b[k].data.shape == ref.shape
        assert np.abs(b[k].data - ref).max() < 2e-4 * scale, k


def test_cli_radiance(tmp_path):
    h5 = str(tmp_path / "tud.h5")
    r = _run_cli("tud", "--synthetic", "60", "--numin", "800", "--numax", "806",
                 "--dv", "0.02", "--dv-out", "0.5", "--n-atmos", "2",
                 "--n-angles", "4", "--altitudes", "500.0", "--output", h5)
    assert r.returncode == 0, r.stderr
    out = str(tmp_path / "rad.h5")
    r = _run_cli("radiance", "--input", h5, "--output", out,
                 "--n-materials", "4", "--dT-step", "5.0")
    assert r.returncode == 0, r.stderr
    from radtxfr_tpu.io.h5 import read_h5

    d = read_h5(out)
    L = d["L"].data
    assert L.ndim == 4 and L.shape[1] == 4 and L.shape[2] == 2
    n = L.shape[1] * L.shape[2] * L.shape[3]
    assert len(d["ix_train"].data) + len(d["ix_test"].data) + len(d["ix_val"].data) == n


def test_cli_tud_jacobian_and_mako_sort(tmp_path):
    h5 = str(tmp_path / "tud.h5")
    r = _run_cli("tud", "--synthetic", "50", "--numin", "800", "--numax", "830",
                 "--dv", "0.02", "--dv-out", "0.5", "--n-atmos", "2",
                 "--n-angles", "4", "--altitudes", "500.0",
                 "--jacobian", "--output", h5)
    assert r.returncode == 0, r.stderr
    from radtxfr_tpu.io.h5 import read_h5

    d = read_h5(h5)
    assert "dtau_dT" in d and d["dtau_dT"].data.shape[-1] == 66
    assert "dLd_dH2O" in d

    mk = str(tmp_path / "mako.h5")
    r = _run_cli("mako", "--input", h5, "--output", mk, "--sort-atmos")
    assert r.returncode == 0, r.stderr
    m = read_h5(mk)
    assert "atmos_order" in m
    means = m["tau"].data.mean(axis=1)
    assert (np.diff(means) >= 0).all()


def test_cli_emis(tmp_path):
    base = str(tmp_path / "emisdb")
    r = _run_cli("emis", "--n-materials", "6", "--mixtures",
                 "--n-fractions", "5", "--mako", "--features", "4",
                 "--output", base)
    assert r.returncode == 0, r.stderr
    import numpy as np

    from radtxfr_tpu.scene.emissivity import load_db

    db = load_db(base)
    # C(6,2) pairs x 5 fractions (endpoints reproduce the originals)
    assert db.n_materials == 15 * 5
    assert ((np.asarray(db.emis) >= 0) & (np.asarray(db.emis) <= 1)).all()
    mako = load_db(base + "_MAKO")
    assert mako.X.shape[0] == 128 or mako.X.shape[0] <= 128  # in-band trim
    assert "feature compression" in r.stdout


def test_cli_atmosgen(tmp_path):
    import numpy as np

    out = str(tmp_path / "aug.npz")
    r = _run_cli("atmosgen", "--n-ensemble", "24", "--n-airmass", "2",
                 "--n-aug", "3", "--output", out)
    assert r.returncode == 0, r.stderr
    with np.load(out) as f:
        T, H2O, O3 = f["T"], f["H2O"], f["O3"]
        assert T.shape[1] == 66 and H2O.shape == T.shape and O3.shape == T.shape
        assert T.shape[0] > 24  # augmented beyond the input ensemble
        assert (H2O >= 0).all() and (O3 >= 0).all()
        assert f["airmass"].shape[0] == T.shape[0]


def test_cli_tud_sharded_jacobian(tmp_path):
    """cli tud --jacobian with --mesh-* (round-5: the exclusion is
    lifted): tangent directions shard over the ensemble mesh axis through
    the differentiable builder; the written Jacobian matches the
    single-device autodiff path."""
    h5m = str(tmp_path / "tud_mesh_jac.h5")
    common = ["tud", "--synthetic", "40", "--numin", "800", "--numax",
              "806", "--dv", "0.02", "--dv-out", "0.5", "--n-atmos", "2",
              "--batch", "2", "--n-angles", "4", "--altitudes", "500.0",
              "--jacobian", "--jacobian-wrt", "T"]
    r = _run_cli(*common, "--mesh-spectrum", "2", "--mesh-ensemble", "2",
                 "--output", h5m)
    assert r.returncode == 0, r.stderr
    h5s = str(tmp_path / "tud_1dev_jac.h5")
    r = _run_cli(*common, "--output", h5s)
    assert r.returncode == 0, r.stderr
    from radtxfr_tpu.io.h5 import read_h5

    a = read_h5(h5s)
    b = read_h5(h5m)
    for k in ("dtau_dT", "dLu_dT", "dLd_dT"):
        want = a[k].data
        got = b[k].data
        assert got.shape[-1] == 66
        assert got.shape == want.shape, (k, got.shape, want.shape)
        scale = max(np.abs(want).max(), 1e-30)
        assert np.abs(got - want).max() < 5e-4 * scale, k
