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


def _and_allowed(allowed, extra, constraint_name):
    """AND a constraint's admissible keep-counts into `allowed`.

    A constraint that would leave nothing admissible is dropped with a warning
    instead of failing the decomposition (the reference's semantics for
    conflicting truncation options)."""
    both = allowed & extra
    if both.any():
        return both
    warnings.warn("truncation: can't satisfy constraint " + constraint_name,
                  stacklevel=3)
    return allowed


def truncate(S, options):
    """Select which Schmidt values of spectrum `S` to keep.

    Semantic parity note: the *policy* here must match the reference
    (``tenpy/linalg/truncation.py:146``) decision-for-decision — the 1e-10
    energy-parity requirement of BASELINE.json hinges on identical kept sets —
    but it is formulated differently: we work with the descending spectrum and
    a table of admissible *keep-counts* ``k`` (the reference walks ascending
    cut positions).  Each option intersects the admissible set; an option that
    would empty it is dropped with a warning; the final choice is the largest
    admissible ``k`` (truncate as little as every constraint allows — except
    ``trunc_cut``, whose admissible set by construction forces discarding
    everything within the error budget).

    Options (reference defaults): ``chi_max`` (100), ``chi_min``,
    ``degeneracy_tol``, ``svd_min`` (1e-14), ``trunc_cut`` (1e-14).

    Returns ``(mask, norm_new, TruncationError)`` — mask over the *input*
    order; at least one value is always kept.
    """
    options = asConfig(options, 'truncation')
    chi_max = options.get('chi_max', 100, int)
    chi_min = options.get('chi_min', None, int)
    deg_tol = options.get('degeneracy_tol', None, 'real')
    svd_min = options.get('svd_min', 1e-14, 'real')
    trunc_cut = options.get('trunc_cut', 1e-14, 'real')
    S = np.asarray(S)
    n = len(S)

    if trunc_cut is not None and trunc_cut >= 1.:
        raise ValueError("trunc_cut >= 1.")
    if not np.any(S > 1e-10):
        warnings.warn("no Schmidt value above 1e-10", stacklevel=2)
    if np.any(S < -1e-10):
        warnings.warn("negative Schmidt values!", stacklevel=2)

    # clamp non-positive values to one tiny tie value *before* sorting so that
    # negative rounding noise and exact zeros are interchangeable at the cut
    S_floor = np.where(S <= 0., 1e-100, S)
    # stable ascending sort, reversed: descending with later-input ties first —
    # the same kept *set* as the reference's ascending-stable convention
    desc = np.argsort(S_floor, kind='stable')[::-1]
    logS_desc = np.log(S_floor[desc])

    ks = np.arange(1, n + 1)          # candidate keep-counts; k=0 never allowed
    allowed = np.ones(n, dtype=bool)
    if chi_max is not None and chi_max > 0:
        allowed = _and_allowed(allowed, ks <= chi_max, 'chi_max')
    if chi_min is not None and chi_min > 1:
        allowed = _and_allowed(allowed, ks >= chi_min, 'chi_min')
    if deg_tol:
        # no cut inside a near-degenerate multiplet: the log-gap between the
        # smallest kept and the largest discarded value must be >= deg_tol
        gap_ok = np.empty(n, dtype=bool)
        gap_ok[:-1] = logS_desc[:-1] - logS_desc[1:] >= deg_tol
        gap_ok[-1] = True             # keeping everything cuts no multiplet
        allowed = _and_allowed(allowed, gap_ok, 'degeneracy_tol')
    if svd_min is not None:
        # every kept value must be >= svd_min
        allowed = _and_allowed(allowed, logS_desc >= np.log(svd_min),
                               'svd_min')
    if trunc_cut is not None:
        # k admissible iff discarding *one more* would overflow the error
        # budget: weight of the (n-k+1) smallest values > trunc_cut^2.
        # This is what makes chi shrink when the spectrum decays fast.
        # (raw S here, not S_floor: negative noise values keep their weight)
        tail_w = np.cumsum(S[desc][::-1] ** 2)[::-1]         # tail_w[k-1]
        allowed = _and_allowed(allowed, tail_w > trunc_cut * trunc_cut,
                               'trunc_cut')

    k_keep = int(ks[allowed][-1])
    mask = np.zeros(n, dtype=bool)
    mask[desc[:k_keep]] = True
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


def eigh_rho(rho, trunc_par, UPLO='L', sort=None):
    """Hermitian eigendecomposition of a density matrix + truncation.

    Returns ``(W, V, err, renormalization)`` — used by density-matrix mixers.
    ``W`` follows the reference convention (``truncation.py:316``):
    eigenvalues scaled such that ``rho ~= V @ diag(W) @ V^H`` after the cut,
    i.e. ``W_kept / new_norm**2 * renormalization`` with ``renormalization`` =
    trace of rho after zeroing negative-noise eigenvalues.  The truncation
    decision is made on ``sqrt(W)`` (Schmidt-value scale).
    """
    W, V = npc.eigh(rho, UPLO=UPLO, sort=sort)
    W = np.asarray(W).copy()
    W[W < 1e-14] = 0.  # negative/noise eigenvalues must not bias the trace
    renormalization = float(np.sum(W))
    if renormalization > 0.:
        W = W / renormalization
    piv, new_norm, err = truncate(np.sqrt(W), trunc_par)
    V = V.copy(deep=False).iproject(piv, 1)
    W_kept = W[piv] / new_norm ** 2 * renormalization
    return W_kept, V, err, renormalization


def _eig_based_svd(A, need_U=True, need_Vd=True, inner_labels=(None, None),
                   trunc_params=None):
    """Singular values/vectors of 2-leg ``A`` via eigh of a Gram matrix.

    One-sided: computes U from ``A A^H`` or V^H from ``A^H A`` (not both — the
    relative phases would be undetermined).  On-device batched eigh is cheaper
    than SVD on accelerators; reference ``truncation.py:474``.
    """
    if need_U and need_Vd:
        raise NotImplementedError("one-sided only: need_U xor need_Vd")
    U = Vd = None
    if need_U:
        gram = npc.tensordot(A, A.conj(), axes=[[1], [1]])
        L, U = npc.eigh(gram, sort='>')
        S = np.sqrt(np.abs(np.asarray(L)))
        U.iset_leg_labels([A.get_leg_labels()[0], inner_labels[0]])
    elif need_Vd:
        gram = npc.tensordot(A.conj(), A, axes=[[0], [0]])
        L, V = npc.eigh(gram, sort='>')
        S = np.sqrt(np.abs(np.asarray(L)))
        Vd = V.iconj().itranspose([1, 0])
        Vd.iset_leg_labels([inner_labels[1], A.get_leg_labels()[1]])
    else:
        if A.shape[1] >= A.shape[0]:
            gram = npc.tensordot(A, A.conj(), axes=[[1], [1]])
        else:
            gram = npc.tensordot(A.conj(), A, axes=[[0], [0]])
        S = np.sqrt(np.abs(np.asarray(npc.eigvalsh(gram))))
    if trunc_params is not None:
        piv, renormalize, err = truncate(S, trunc_params)
        S = S[piv] / renormalize
        if need_U:
            U = U.copy(deep=False).iproject(piv, 1)
        if need_Vd:
            Vd = Vd.copy(deep=False).iproject(piv, 0)
    else:
        renormalize = float(np.linalg.norm(S))
        S = S / renormalize
        err = TruncationError()
    return U, S, Vd, err, renormalize


def _qr_theta_Y0(old_qtotal_L, old_qtotal_R, old_bond_leg, theta, move_right,
                 expand, min_block_increase):
    """Initial isometry guess for :func:`decompose_theta_qr_based`.

    Per charge sector of the enlarged bond (the flattened pipe on the side the
    sweep moves *away* from), keep the ``old_size + increase`` highest-norm
    columns of theta — the old bond content plus an expansion budget of
    ``~expand * chi`` extra directions (at least ``min_block_increase`` per
    sector).  Reference: ``truncation.py:364``.
    """
    assert min_block_increase >= 0 and expand
    Y0 = theta.copy(deep=False)
    if move_right:
        ax, q_axis, norm_axis = 1, 1, 0
        Y0.legs = (Y0.legs[0], Y0.legs[1].to_LegCharge())
        Y0.ireplace_label('(p1.vR)', 'vR')
        if np.any(np.asarray(old_qtotal_R) != 0):
            Y0 = Y0.gauge_total_charge('vR', old_qtotal_L)
    else:
        ax, q_axis, norm_axis = 0, 0, 1
        Y0.legs = (Y0.legs[0].to_LegCharge(), Y0.legs[1])
        Y0.ireplace_label('(vL.p0)', 'vL')
        if np.any(np.asarray(old_qtotal_L) != 0):
            Y0 = Y0.gauge_total_charge('vL', old_qtotal_R)
    _, v_old = old_bond_leg.sort()
    v_new = Y0.legs[ax]
    sizes_old = {tuple(q): int(v_old.slices[j + 1] - v_old.slices[j])
                 for j, q in enumerate(v_old.charges)}
    piv = np.zeros(v_new.ind_len, dtype=bool)
    incr = max(min_block_increase,
               int(v_old.ind_len * expand) // max(v_new.block_number, 1))
    stored = {}  # sector qindex on the bond axis -> block index
    for bi, row in enumerate(Y0._qdata):
        stored.setdefault(int(row[q_axis]), []).append(bi)
    for j_new, q_new in enumerate(v_new.charges):
        s_new = sizes_old.get(tuple(q_new), 0) + incr
        width = int(v_new.slices[j_new + 1] - v_new.slices[j_new])
        s_new = min(s_new, width)
        bis = stored.get(j_new)
        if not bis:
            continue  # zero block: keeping its columns would add nothing
        # column norms across all stored blocks sharing this bond sector
        norms = np.zeros(width)
        for bi in bis:
            blk = np.asarray(Y0._data[bi])
            norms += np.linalg.norm(
                blk.reshape(-1, width) if q_axis == 1 else blk.reshape(width, -1).T,
                axis=0) ** 2
        kept = np.argsort(-norms)[:s_new]
        piv[int(v_new.slices[j_new]) + kept] = True
    return Y0.iproject(piv, ax)


def decompose_theta_qr_based(old_qtotal_L, old_qtotal_R, old_bond_leg, theta,
                             move_right, expand, min_block_increase,
                             use_eig_based_svd, trunc_params,
                             compute_err, return_both_T):
    r"""QR-based truncated decomposition of theta (CBE-style, arXiv:2212.09782).

    ``theta`` has combined legs ``[(vL.p0), (p1.vR)]``.  Two QR half-iterations
    against the (optionally expanded) initial guess produce isometries
    ``A_L``/``B_R`` and a small bond matrix ``Xi``, whose (eig-based or plain)
    SVD is truncated — an SVD-free alternative to :func:`svd_theta` whose cost
    is dominated by QR + a chi×chi SVD.  Reference: ``truncation.py:533``.

    Returns ``(T_Lc, S, T_Rc, form, trunc_err, renormalization)``; with
    ``move_right=True`` (``False``) only ``T_Lc`` (``T_Rc``) is guaranteed,
    the other is ``None`` unless ``return_both_T``; ``form`` gives the
    canonical form of each returned tensor (e.g. ``['A', 'B']``).
    """
    if compute_err:
        return_both_T = True
    if move_right:
        Y0 = _qr_theta_Y0(old_qtotal_L, old_qtotal_R, old_bond_leg, theta,
                          True, expand, min_block_increase) if expand else \
            theta  # no expansion: theta itself seeds the iteration
        th1 = npc.tensordot(Y0.conj(), theta,
                            axes=[['(vL*.p0*)'], ['(vL.p0)']])
        th1.iset_leg_labels(['vL', '(p1.vR)'])
        th1.itranspose(['(p1.vR)', 'vL'])
        B_R, _ = npc.qr(th1, inner_labels=['vL', 'vR'], inner_qconj=-1)
        B_R.itranspose(['vL', '(p1.vR)'])
        th0 = npc.tensordot(theta, B_R.conj(), axes=[['(p1.vR)'], ['(p1*.vR*)']])
        th0.iset_leg_labels(['(vL.p0)', 'vR'])
        A_L, Xi = npc.qr(th0, inner_labels=['vR', 'vL'])
    else:
        Y0 = _qr_theta_Y0(old_qtotal_L, old_qtotal_R, old_bond_leg, theta,
                          False, expand, min_block_increase) if expand else theta
        th0 = npc.tensordot(theta, Y0.conj(), axes=[['(p1.vR)'], ['(p1*.vR*)']])
        th0.iset_leg_labels(['(vL.p0)', 'vR'])
        A_L, _ = npc.qr(th0, inner_labels=['vR', 'vL'])
        th1 = npc.tensordot(A_L.conj(), theta, axes=[['(vL*.p0*)'], ['(vL.p0)']])
        th1.iset_leg_labels(['vL', '(p1.vR)'])
        th1.itranspose(['(p1.vR)', 'vL'])
        B_R, Xi = npc.qr(th1, inner_labels=['vL', 'vR'], inner_qconj=-1)
        B_R.itranspose(['vL', '(p1.vR)'])
        Xi.itranspose(['vL', 'vR'])

    if use_eig_based_svd:
        U, S, Vd, _, renormalization = _eig_based_svd(
            Xi, need_U=move_right, need_Vd=not move_right,
            inner_labels=('vR', 'vL'), trunc_params=trunc_params)
    else:
        U, S, Vd, _, renormalization = svd_theta(Xi, trunc_params)

    T_Lc = T_Rc = None
    form = ['A', 'B']
    if move_right:
        T_Lc = npc.tensordot(A_L, U, axes=[['vR'], ['vL']])
        if return_both_T:
            if use_eig_based_svd:
                T_Rc = npc.tensordot(Xi, B_R, axes=[['vR'], ['vL']])
                T_Rc = npc.tensordot(U.conj(), T_Rc, axes=[['vL*'], ['vL']])
                T_Rc.ireplace_label('vR*', 'vL')
                T_Rc = T_Rc / npc.norm(T_Rc)
                form[1] = 'Th'
            else:
                T_Rc = npc.tensordot(Vd, B_R, axes=[['vR'], ['vL']])
    else:
        T_Rc = npc.tensordot(Vd, B_R, axes=[['vR'], ['vL']])
        if return_both_T:
            if use_eig_based_svd:
                T_Lc = npc.tensordot(A_L, Xi, axes=[['vR'], ['vL']])
                T_Lc = npc.tensordot(T_Lc, Vd.conj(), axes=[['vR'], ['vR*']])
                T_Lc.ireplace_label('vL*', 'vR')
                T_Lc = T_Lc / npc.norm(T_Lc)
                form[0] = 'Th'
            else:
                T_Lc = npc.tensordot(A_L, U, axes=[['vR'], ['vL']])

    if compute_err:
        if use_eig_based_svd:
            theta_approx = npc.tensordot(T_Lc, T_Rc, axes=[['vR'], ['vL']])
        else:
            theta_approx = npc.tensordot(T_Lc.scale_axis(np.asarray(S), 'vR'),
                                         T_Rc, axes=[['vR'], ['vL']])
        N_theta = npc.norm(theta)
        eps = float(npc.norm(theta * (1. / N_theta) -
                             theta_approx * (renormalization / N_theta))) ** 2
        trunc_err = TruncationError(eps, 1. - 2. * eps)
    else:
        trunc_err = TruncationError(np.nan, np.nan)

    if T_Lc is not None:
        T_Lc.ireplace_label('(vL.p0)', '(vL.p)')
    if T_Rc is not None:
        T_Rc.ireplace_label('(p1.vR)', '(p.vR)')
    return T_Lc, S, T_Rc, form, trunc_err, renormalization
