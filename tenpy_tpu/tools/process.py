"""Process-level utilities: memory usage, device info.

Rebuild of ``tenpy/tools/process.py``.  The reference controls OMP/MKL thread counts
(``process.py:99-184``); on TPU intra-op parallelism is XLA's job, so the analogous knobs
here report/configure JAX devices instead.
"""

from __future__ import annotations

import logging
import os
import resource

logger = logging.getLogger(__name__)

__all__ = ['memory_usage', 'load_omp_library', 'omp_set_nthreads', 'omp_get_nthreads',
           'mkl_set_nthreads', 'mkl_get_nthreads', 'device_info']


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


# -- CPU-thread stubs kept for API parity with the reference (no-ops on TPU) --
def load_omp_library(libs=None, verbose=None):
    logger.debug("load_omp_library: no-op in the TPU build")
    return None


def omp_set_nthreads(n):
    logger.debug("omp_set_nthreads(%d): no-op in the TPU build", n)
    return False


def omp_get_nthreads():
    return -1


def mkl_set_nthreads(n):
    logger.debug("mkl_set_nthreads(%d): no-op in the TPU build", n)
    return False


def mkl_get_nthreads():
    return -1
