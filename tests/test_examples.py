"""Smoke tests for the documented example entry points (VERDICT r4 #6).

Each example is executed as ``__main__`` in a subprocess on the CPU
backend (via tests/_run_example.py — the axon TPU plugin registers itself
from sitecustomize and ignores ``JAX_PLATFORMS``, so the backend pin must
go through ``jax.config`` before first init). The examples are already
small demo configurations (23-65 s each on this container's CPU); these
tests exist so API drift in the documented entry points cannot ship
silently — example 04 had exactly such rot (an older ``od_from_xs``
calling convention) when this file was introduced.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SHIM = os.path.join(_ROOT, "tests", "_run_example.py")


def _run(name, tmp_path):
    script = os.path.join(_ROOT, "examples", name)
    r = subprocess.run([sys.executable, _SHIM, script], cwd=str(tmp_path),
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_example_01_quickstart(tmp_path):
    out = _run("01_od_tud_quickstart.py", tmp_path)
    assert "OK" in out


def test_example_02_production_ensemble(tmp_path):
    out = _run("02_production_tud_ensemble.py", tmp_path)
    assert "OK" in out
    assert (tmp_path / "_demo_tud.h5").exists()


def test_example_03_hapi_dropin(tmp_path):
    out = _run("03_hapi_dropin.py", tmp_path)
    assert "OK" in out


def test_example_04_xs_lattice(tmp_path):
    out = _run("04_xs_lattice_serving.py", tmp_path)
    assert "OK" in out
    assert "AFIT_XS round-trip ok" in out


def test_example_05_derived_physics(tmp_path):
    out = _run("05_derived_physics.py", tmp_path)
    assert "line-mixing reshapes tau" in out
