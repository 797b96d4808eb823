"""Robust dense SVD: gesdd with gesvd fallback on LAPACK non-convergence.

Rebuild of ``tenpy/linalg/svd_robust.py`` (svd :1-30); the same logic guards
every blockwise SVD inside :func:`~tenpy_tpu.linalg.np_conserved.svd` via
``_robust_svd``.
"""

import numpy as np
import scipy.linalg

__all__ = ['svd']


def svd(a, full_matrices=True, compute_uv=True, overwrite_a=False,
        check_finite=True, lapack_driver='gesdd', warn=True):
    """np.linalg.svd with automatic gesvd fallback on convergence failures."""
    try:
        return scipy.linalg.svd(a, full_matrices=full_matrices,
                                compute_uv=compute_uv,
                                overwrite_a=overwrite_a,
                                check_finite=check_finite,
                                lapack_driver=lapack_driver)
    except np.linalg.LinAlgError:
        if warn:
            import warnings
            warnings.warn("svd (gesdd) did not converge: retrying with gesvd")
        return scipy.linalg.svd(a, full_matrices=full_matrices,
                                compute_uv=compute_uv, overwrite_a=False,
                                check_finite=check_finite,
                                lapack_driver='gesvd')
