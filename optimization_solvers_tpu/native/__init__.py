"""Native C++ host backend (role parity with the reference's L4 FFI layer,
``/root/reference/src/quasi_newton/lbfgsb.rs``: its only native algorithmic
core is the Fortran ``setulb_`` reached over a Rust FFI).

Here the native core is a clean-room C++ L-BFGS-B (``native/lbfgsb.cpp``)
reached over ctypes, with the oracle as a plain callback — the same closure
seam the Rust crate and the WASM binding use.  It serves CPU-only hosts and
cross-checks the device-resident JAX implementation.

The shared library is built on demand with g++ (no pip/pybind11 required).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Callable, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "lbfgsb.cpp")
_LIB_DIR = os.path.join(os.path.dirname(__file__), "_build")
_LIB = os.path.join(_LIB_DIR, "libost_lbfgsb.so")

_ORACLE_FN = ctypes.CFUNCTYPE(
    None,
    ctypes.POINTER(ctypes.c_double),  # x
    ctypes.c_int,                     # n
    ctypes.POINTER(ctypes.c_double),  # f out
    ctypes.POINTER(ctypes.c_double),  # g out
    ctypes.c_void_p,                  # user
)

_lib_handle: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the shared library (g++ -O3); returns its path."""
    src = os.path.abspath(_SRC)
    os.makedirs(_LIB_DIR, exist_ok=True)
    if force or not os.path.exists(_LIB) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_LIB)
    ):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", _LIB],
            check=True,
        )
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib_handle
    if _lib_handle is None:
        lib = ctypes.CDLL(build())
        lib.ost_lbfgsb_minimize.restype = ctypes.c_int
        lib.ost_lbfgsb_minimize.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int,
            _ORACLE_FN, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib_handle = lib
    return _lib_handle


def lbfgsb_minimize_native(
    value_and_grad: Callable[[np.ndarray], tuple[float, np.ndarray]],
    x0: np.ndarray,
    lower: np.ndarray,
    upper: np.ndarray,
    *,
    m: int = 5,
    factr: float = 1e7,
    pgtol: float = 1e-5,
    max_iter: int = 500,
    max_iter_ls: int = 20,
):
    """Single-instance host solve.  ``value_and_grad(x) -> (f, g)`` is a
    plain Python callable (analytic or numpy autodiff — the reference oracle
    seam).  Returns ``(x, f, iterations, status)`` with the same status
    codes as :class:`optimization_solvers_tpu.core.types.Status`."""
    lib = _load()
    n = int(x0.shape[0])
    x = np.ascontiguousarray(x0, dtype=np.float64).copy()
    lo = np.ascontiguousarray(lower, dtype=np.float64)
    up = np.ascontiguousarray(upper, dtype=np.float64)

    def _cb(x_ptr, n_, f_ptr, g_ptr, _user):
        xv = np.ctypeslib.as_array(x_ptr, shape=(n_,))
        f, g = value_and_grad(xv.copy())
        f_ptr[0] = float(f)
        gv = np.ctypeslib.as_array(g_ptr, shape=(n_,))
        gv[:] = np.asarray(g, dtype=np.float64)

    cb = _ORACLE_FN(_cb)
    out_f = ctypes.c_double(0.0)
    out_iters = ctypes.c_int(0)
    status = lib.ost_lbfgsb_minimize(
        n, m,
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        up.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(factr), float(pgtol), int(max_iter), int(max_iter_ls),
        cb, None,
        ctypes.byref(out_f), ctypes.byref(out_iters),
    )
    return x, out_f.value, out_iters.value, status


def bench_rosenbrock_native(
    count: int,
    n: int = 100,
    *,
    m: int = 5,
    factr: float = 1e7,
    pgtol: float = 1e-5,
    max_iter: int = 500,
    lower: float = -5.0,
    upper: float = 5.0,
    seed: int = 42,
):
    """Sequential native Rosenbrock-n solves (the reference execution model:
    one instance at a time, analytic gradients, no callback overhead).
    Returns ``(converged, mean_f, elapsed_seconds)``."""
    import time

    lib = _load()
    lib.ost_bench_rosenbrock.restype = ctypes.c_int
    lib.ost_bench_rosenbrock.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    rng = np.random.RandomState(seed)
    x0s = np.ascontiguousarray(rng.uniform(-2.0, 2.0, size=(count, n)))
    lo = np.full(n, lower)
    up = np.full(n, upper)
    fsum = ctypes.c_double(0.0)
    t0 = time.perf_counter()
    converged = lib.ost_bench_rosenbrock(
        count, n, m,
        x0s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        up.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(factr), float(pgtol), int(max_iter),
        ctypes.byref(fsum),
    )
    dt = time.perf_counter() - t0
    return converged, fsum.value / count, dt
