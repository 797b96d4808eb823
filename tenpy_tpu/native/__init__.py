r"""Native (C++) host-path kernels.

The charge-block tensordot decomposes into many small GEMMs; the Python loop
overhead per task (~1.3 us) dominates for block-heavy models (Hubbard with
U(1)xU(1) charges has thousands of 1-64 sized sectors).  ``batched_gemm.cpp``
runs the identical task loop in C++ against the BLAS already loaded in the
process (function pointers from ``scipy.linalg.cython_blas`` -- nothing to
link).  Compiled lazily with g++ on first import; every caller falls back to
the pure-Python loop if unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ['get_batched_gemm', 'batched_gemm_available']

_LIB = None
_GEMM_PTRS = None
_TRIED = False


def _blas_ptr(name):
    """Extract a raw BLAS function pointer from scipy.linalg.cython_blas."""
    import scipy.linalg.cython_blas as cb
    capsule = cb.__pyx_capi__[name]
    ctypes.pythonapi.PyCapsule_GetName.restype = ctypes.c_char_p
    ctypes.pythonapi.PyCapsule_GetPointer.restype = ctypes.c_void_p
    ctypes.pythonapi.PyCapsule_GetPointer.argtypes = [ctypes.py_object,
                                                      ctypes.c_char_p]
    cname = ctypes.pythonapi.PyCapsule_GetName(ctypes.py_object(capsule))
    return ctypes.pythonapi.PyCapsule_GetPointer(ctypes.py_object(capsule),
                                                 cname)


def _load():
    global _LIB, _GEMM_PTRS, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    so_path = os.path.join(here, '_batched_gemm.so')
    src_path = os.path.join(here, 'batched_gemm.cpp')
    if not os.path.exists(so_path) or \
            os.path.getmtime(so_path) < os.path.getmtime(src_path):
        try:
            subprocess.run(['g++', '-O3', '-shared', '-fPIC',
                            '-o', so_path, src_path],
                           check=True, capture_output=True, timeout=120)
        except Exception as e:  # noqa: BLE001 - fall back to python loop
            logger.info("native batched_gemm unavailable (no compiler?): %s", e)
            return None
    try:
        lib = ctypes.CDLL(so_path)
        lib.batched_gemm.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p),
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS'),
            ctypes.c_int64, ctypes.c_int32,
        ]
        lib.batched_gemm.restype = None
        _GEMM_PTRS = {'d': _blas_ptr('dgemm'), 'z': _blas_ptr('zgemm')}
        _LIB = lib
    except Exception as e:  # noqa: BLE001
        logger.info("native batched_gemm failed to load: %s", e)
        _LIB = None
    return _LIB


def batched_gemm_available():
    return _load() is not None


def get_batched_gemm():
    """Returns ``run(kind, a_blocks, b_blocks, c_blocks, dims, betas)`` or None.

    ``kind``: 'd' (float64) or 'z' (complex128); blocks are lists of
    C-contiguous 2D arrays; dims int32 (n_tasks, 3); betas float64 (n_tasks,).
    """
    lib = _load()
    if lib is None:
        return None
    gemm_ptrs = _GEMM_PTRS

    def run(kind, a_blocks, b_blocks, c_blocks, dims, betas):
        n = len(a_blocks)
        PtrArr = ctypes.c_void_p * n
        a_ptrs = PtrArr(*[a.ctypes.data for a in a_blocks])
        b_ptrs = PtrArr(*[b.ctypes.data for b in b_blocks])
        c_ptrs = PtrArr(*[c.ctypes.data for c in c_blocks])
        lib.batched_gemm(gemm_ptrs[kind], a_ptrs, b_ptrs, c_ptrs,
                         dims, betas, n, 1 if kind == 'z' else 0)

    return run
