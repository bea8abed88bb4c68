"""ctypes binding for the native C++ .par parser (native/par_parser.cpp).

Builds the shared library on demand with g++ (cached next to the source);
falls back cleanly to the pure-Python parser when the toolchain or library
is unavailable, so the package has no hard native dependency.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "par_parser.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libpar_parser.so")


def _build() -> str | None:
    if not os.path.exists(_SRC):
        return None
    if (os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True,
        )
        return _LIB
    except (OSError, subprocess.CalledProcessError):
        return None


@functools.lru_cache(maxsize=1)
def load_library():
    """Return the ctypes library, or None if unavailable."""
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.par_count_records.restype = ctypes.c_long
    lib.par_count_records.argtypes = [ctypes.c_char_p]
    dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    iptr = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.par_parse.restype = ctypes.c_long
    lib.par_parse.argtypes = [ctypes.c_char_p, ctypes.c_long, iptr, iptr,
                              dptr, dptr, dptr, dptr, dptr, dptr, dptr]
    return lib


def parse_par_native(path: str):
    """Parse a .par file natively -> dict of NumPy columns, or None."""
    lib = load_library()
    if lib is None:
        return None
    n = lib.par_count_records(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    cols = dict(
        mol=np.empty(n, np.int32), iso=np.empty(n, np.int32),
        nu=np.empty(n), sw=np.empty(n), elower=np.empty(n),
        gamma_air=np.empty(n), gamma_self=np.empty(n),
        n_air=np.empty(n), delta_air=np.empty(n),
    )
    got = lib.par_parse(path.encode(), n, cols["mol"], cols["iso"],
                        cols["nu"], cols["sw"], cols["elower"],
                        cols["gamma_air"], cols["gamma_self"],
                        cols["n_air"], cols["delta_air"])
    if got < 0:
        raise FileNotFoundError(path)
    return {k: v[:got] for k, v in cols.items()}
