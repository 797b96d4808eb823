"""Process-level utilities: memory usage, BLAS/OMP thread control, device info.

Rebuild of ``tenpy/tools/process.py``.  The reference controls OMP/MKL
thread counts via ctypes (``process.py:99-184``); the TPU build keeps
that capability for the *host* execution path (numpy/scipy BLAS — the
chi ramp and everything eager runs there) and additionally reports JAX
devices, since intra-op parallelism on the accelerator itself is XLA's
job.  OpenBLAS is handled alongside OMP/MKL (this image ships scipy
linked against OpenBLAS, not MKL).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import logging
import os
import resource

logger = logging.getLogger(__name__)

__all__ = ['memory_usage', 'load_omp_library', 'omp_set_nthreads',
           'omp_get_nthreads', 'mkl_set_nthreads', 'mkl_get_nthreads',
           'device_info']


def memory_usage():
    """Current peak memory usage of this process in MB (RSS)."""
    try:
        import psutil
        return psutil.Process(os.getpid()).memory_info().rss / 1024. ** 2
    except ImportError:
        # ru_maxrss is KB on linux
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.


def device_info():
    """List of JAX devices with platform/kind (TPU analogue of CPU-thread info)."""
    import jax
    return [{'id': d.id, 'platform': d.platform, 'kind': getattr(d, 'device_kind', '?')}
            for d in jax.devices()]


# ------------------------------------------------------- thread control
def _loaded_libs(patterns):
    """ctypes handles for already-mapped shared libraries matching any pattern.

    Scans /proc/self/maps (the libraries numpy/scipy actually loaded beat
    whatever find_library would guess).
    """
    paths = []
    try:
        with open('/proc/self/maps') as f:
            for line in f:
                part = line.rsplit(' ', 1)[-1].strip()
                if part.startswith('/') and part not in paths and \
                        any(p in os.path.basename(part).lower()
                            for p in patterns):
                    paths.append(part)
    except OSError:
        pass
    libs = []
    for p in paths:
        try:
            libs.append(ctypes.CDLL(p))
        except OSError:
            continue
    return libs


_OMP_LIB = None


def load_omp_library(libs=('gomp', 'iomp5', 'omp'), verbose=None):
    """Load (once) an OpenMP runtime already mapped into this process."""
    global _OMP_LIB
    if _OMP_LIB is not None:
        return _OMP_LIB
    # make sure numpy/scipy pulled their BLAS in
    import numpy  # noqa: F401
    for lib in _loaded_libs([f'lib{name}' for name in libs]):
        if hasattr(lib, 'omp_set_num_threads'):
            _OMP_LIB = lib
            if verbose:
                logger.info("loaded OpenMP runtime %r", lib._name)
            return lib
    name = ctypes.util.find_library('gomp')
    if name:
        try:
            _OMP_LIB = ctypes.CDLL(name)
            return _OMP_LIB
        except OSError:
            pass
    logger.debug("no OpenMP runtime found in this process")
    return None


def _blas_libs():
    import numpy  # noqa: F401 — load BLAS first
    import scipy.linalg  # noqa: F401
    # 'libmkl' also catches split installs (libmkl_core/libmkl_intel_thread)
    return _loaded_libs(['openblas', 'libblas', 'mkl_rt', 'libmkl'])


def omp_set_nthreads(n):
    """Set the OMP *and* OpenBLAS thread counts for host BLAS; True on success."""
    ok = False
    lib = load_omp_library()
    if lib is not None:
        lib.omp_set_num_threads(int(n))
        ok = True
    for blas in _blas_libs():
        if hasattr(blas, 'openblas_set_num_threads'):
            blas.openblas_set_num_threads(int(n))
            ok = True
    return ok


def omp_get_nthreads():
    """Max OMP threads (or OpenBLAS threads), -1 if undeterminable."""
    lib = load_omp_library()
    if lib is not None:
        return int(lib.omp_get_max_threads())
    for blas in _blas_libs():
        if hasattr(blas, 'openblas_get_num_threads'):
            return int(blas.openblas_get_num_threads())
    return -1


def mkl_set_nthreads(n):
    """Set MKL threads (ctypes, like the reference); False when no MKL."""
    for blas in _blas_libs():
        if hasattr(blas, 'MKL_Set_Num_Threads'):
            blas.MKL_Set_Num_Threads(int(n))
            return True
    logger.debug("mkl_set_nthreads: no MKL in this process")
    return False


def mkl_get_nthreads():
    for blas in _blas_libs():
        if hasattr(blas, 'MKL_Get_Max_Threads'):
            return int(blas.MKL_Get_Max_Threads())
    return -1
