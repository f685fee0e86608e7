"""ctypes bindings for the native CPU oracle kernels (native/se_gram.cpp).

Auto-builds the shared library with g++ on first import if missing (cheap,
~1s).  Import failure (no compiler) degrades gracefully — np_gp falls back
to pure NumPy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libauxpm_cpu.so")


def _ensure_built():
    src = os.path.join(_NATIVE_DIR, "se_gram.cpp")
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
        return
    subprocess.run(
        ["bash", os.path.join(_NATIVE_DIR, "build.sh")],
        check=True,
        capture_output=True,
    )


_ensure_built()
_lib = ctypes.CDLL(_LIB_PATH)

_dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_lib.se_gram_iso.argtypes = [
    _dp, _dp, ctypes.c_long, ctypes.c_double, ctypes.c_double, ctypes.c_double,
]
_lib.se_gram_ard.argtypes = [
    _dp, _dp, ctypes.c_long, ctypes.c_long, _dp, ctypes.c_double, ctypes.c_double,
]
_lib.chol_inplace.argtypes = [_dp, ctypes.c_long]
_lib.chol_inplace.restype = ctypes.c_int


def se_gram_iso_native(sqdist, log_ell, log_sigma, jitter):
    sqdist = np.ascontiguousarray(sqdist, np.float64)
    n = sqdist.shape[0]
    out = np.empty((n, n), np.float64)
    _lib.se_gram_iso(sqdist, out, n, float(log_ell), float(log_sigma), float(jitter))
    return out


def se_gram_ard_native(x, log_ells, log_sigma, jitter):
    x = np.ascontiguousarray(x, np.float64)
    n, d = x.shape
    log_ells = np.ascontiguousarray(np.broadcast_to(log_ells, (d,)), np.float64)
    out = np.empty((n, n), np.float64)
    _lib.se_gram_ard(x, out, n, d, log_ells, float(log_sigma), float(jitter))
    return out


def chol_native(a):
    a = np.ascontiguousarray(a, np.float64).copy()
    rc = _lib.chol_inplace(a, a.shape[0])
    if rc:
        raise np.linalg.LinAlgError("matrix not positive definite")
    return a
