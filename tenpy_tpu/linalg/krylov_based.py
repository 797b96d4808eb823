"""Krylov-subspace solvers on charge-conserving Arrays: Lanczos, Arnoldi, GMRES.

Rebuild of ``tenpy/linalg/krylov_based.py`` (KrylovBased :30, LanczosGroundState :584,
LanczosEvolution :718, Arnoldi :322, GMRES :209, gram_schmidt :858).

TPU design: the Krylov *vectors* are npc Arrays (pytrees of device blocks); the matvec —
virtually all FLOPs — is jitted by the operator.  The small tridiagonal/Hessenberg
eigenproblem per iteration runs on the host (O(N²) with N <= ~20).  Host<->device syncs per
iteration are two scalars (alpha, beta); dispatch stays asynchronous otherwise.
"""

from __future__ import annotations

import logging
import warnings

import numpy as np
import jax.numpy as jnp

from . import np_conserved as npc
from ..tools.params import asConfig

logger = logging.getLogger(__name__)

__all__ = ['KrylovBased', 'LanczosGroundState', 'LanczosEvolution', 'Arnoldi',
           'ArnoldiEvolution', 'GMRES', 'lanczos_arpack', 'gram_schmidt',
           'plot_stats']


def _v_copy(v):
    """Copy a Krylov vector (npc Array or list of Arrays)."""
    if isinstance(v, list):
        return [x.copy(deep=False) for x in v]
    return v.copy(deep=False)


def _v_norm(v):
    if isinstance(v, list):
        return float(np.linalg.norm([float(npc.norm(x)) for x in v]))
    return float(npc.norm(v))


def _v_inner(v, w):
    """<v|w> with conjugation of v; supports lists (direct-sum vectors)."""
    if isinstance(v, list):
        return sum(complex(npc.inner(a.conj(), b, axes='range'))
                   for a, b in zip(v, w))
    return complex(npc.inner(v.conj(), w, axes='range'))


def _v_scale(v, a):
    if isinstance(v, list):
        return [x * a for x in v]
    return v * a


def _v_axpy(a, x, y):
    """y + a * x (new object); supports lists."""
    if isinstance(y, list):
        return [yi + a * xi for yi, xi in zip(y, x)]
    return y + a * x



class KrylovBased:
    """Base class handling orthonormal Krylov-basis construction.

    Options: ``N_min`` (2), ``N_max`` (20), ``P_tol`` (1e-14), ``min_gap`` (1e-12),
    ``reortho`` (False), ``E_shift``, ``cutoff`` (1e-12).
    """

    def __init__(self, H, psi0, options):
        self.H = H
        self.psi0 = _v_copy(psi0)
        self.options = options = asConfig(options, self.__class__.__name__)
        self.N_min = options.get('N_min', 2, int)
        self.N_max = options.get('N_max', 20, int)
        self.P_tol = options.get('P_tol', 1e-14, 'real')
        self.min_gap = options.get('min_gap', 1e-12, 'real')
        self.reortho = options.get('reortho', False, bool)
        self.E_shift = options.get('E_shift', None, 'real')
        self._cutoff = options.get('cutoff', 1e-12, 'real')
        self.Es = []
        self._psi0_norm = None

    def _to_cache(self, psi, cache, keep=None):
        cache.append(psi)
        if keep is not None and len(cache) > keep:
            del cache[0]


class LanczosGroundState(KrylovBased):
    """Lanczos ground-state search of a hermitian operator.

    Returns ``(E0, psi0, N)`` from :meth:`run`: lowest Ritz value, its Ritz vector,
    and the number of iterations used.
    Reference: ``tenpy/linalg/krylov_based.py:584``.
    """

    def __init__(self, H, psi0, options, orthogonal_to=()):
        super().__init__(H, psi0, options)
        self.E_tol = self.options.get('E_tol', np.inf, 'real')
        self.N_cache = self.options.get('N_cache', self.N_max, int)
        if self.N_cache < 2:
            raise ValueError("N_cache < 2 cannot reconstruct the result")
        if len(orthogonal_to) > 0:
            from .sparse import OrthogonalNpcLinearOperator
            self.H = OrthogonalNpcLinearOperator(self.H, list(orthogonal_to))

    def run(self):
        psi = self.psi0
        norm0 = _v_norm(psi)
        if norm0 < 1e-14:
            raise ValueError("Lanczos with zero initial vector")
        w = _v_scale(psi, 1. / norm0)
        cache = [w]
        alphas = []
        betas = []
        E_prev = None
        vecs_all = [w] if self.reortho else None
        N_max = self.N_max
        for k in range(N_max):
            hw = self.H.matvec(cache[-1])
            if self.E_shift is not None:
                hw = _v_axpy(self.E_shift, cache[-1], hw)
            alpha = float(np.real(_v_inner(cache[-1], hw)))
            alphas.append(alpha)
            hw = _v_axpy(-alpha, cache[-1], hw)
            if len(cache) > 1:
                hw = _v_axpy(-betas[-1], cache[-2], hw)
            if self.reortho:
                for v in vecs_all[:-1]:
                    hw = _v_axpy(-_v_inner(v, hw), v, hw)
            beta = _v_norm(hw)
            # diagonalize current tridiagonal T
            T = _tridiag(alphas, betas)
            evals, evecs = np.linalg.eigh(T)
            E = evals[0]
            self.Es.append(evals)
            converged = False
            if beta < self._cutoff:
                converged = True
            elif k + 1 >= self.N_min:
                P_err = (beta * abs(evecs[-1, 0])) ** 2  # weight of would-be next vector
                if P_err < self.P_tol:
                    converged = True
                if E_prev is not None and self.E_tol < np.inf and \
                        abs(E - E_prev) < self.E_tol:
                    converged = True
            E_prev = E
            if converged or k + 1 == N_max:
                N = k + 1
                if len(cache) >= N:  # all basis vectors cached: single pass
                    coeff = evecs[:, 0]
                    psi_out = _v_scale(cache[0], coeff[0])
                    for j in range(1, N):
                        psi_out = _v_axpy(coeff[j], cache[j], psi_out)
                    n_out = _v_norm(psi_out)
                    if n_out > 0:
                        psi_out = _v_scale(psi_out, 1. / n_out)
                else:  # cache too small: re-run the iteration (second pass)
                    psi_out = self._build_vector(evecs[:, 0], N)
                E_out = float(E - (self.E_shift or 0.))
                return E_out, psi_out, N
            betas.append(float(beta))
            w_next = _v_scale(hw, 1. / beta)
            self._to_cache(w_next, cache, self.N_cache)
            if self.reortho:
                vecs_all.append(w_next)
        raise RuntimeError("unreachable")

    def _build_vector(self, coeff, N):
        """Second pass: rebuild Ritz vector sum_k coeff[k] v_k (re-running Lanczos if the
        cache was too small to hold all basis vectors)."""
        psi = _v_scale(self.psi0, 1. / _v_norm(self.psi0))
        cache = [psi]
        result = _v_scale(psi, coeff[0])
        alphas = []
        betas = []
        for k in range(N - 1):
            hw = self.H.matvec(cache[-1])
            if self.E_shift is not None:
                hw = _v_axpy(self.E_shift, cache[-1], hw)
            alpha = float(np.real(_v_inner(cache[-1], hw)))
            hw = _v_axpy(-alpha, cache[-1], hw)
            if len(cache) > 1:
                hw = _v_axpy(-betas[-1], cache[-2], hw)
            beta = _v_norm(hw)
            if beta < self._cutoff:
                break
            betas.append(beta)
            w = _v_scale(hw, 1. / beta)
            result = _v_axpy(coeff[k + 1], w, result)
            self._to_cache(w, cache, 2)
        n = _v_norm(result)
        if n > 0:
            result = _v_scale(result, 1. / n)
        return result


class LanczosEvolution(LanczosGroundState):
    """Compute ``exp(delta * H) |psi0>`` in the Krylov space (TDVP local updates).

    ``run(delta)`` returns ``(psi_f, N)``; ``delta`` may be complex (e.g. -1j*dt).
    Reference: ``tenpy/linalg/krylov_based.py:718``.
    """

    def __init__(self, H, psi0, options):
        super().__init__(H, psi0, options)
        self.delta = None

    def run(self, delta, normalize=None):
        self.delta = delta
        psi = self.psi0
        norm0 = _v_norm(psi)
        w = _v_scale(psi, 1. / norm0)
        cache = [w]
        vecs = [w]
        alphas = []
        betas = []
        result_coeff = None
        P_tol = self.P_tol
        for k in range(self.N_max):
            hw = self.H.matvec(cache[-1])
            if self.E_shift is not None:
                hw = _v_axpy(self.E_shift, cache[-1], hw)
            alpha = float(np.real(_v_inner(cache[-1], hw)))
            alphas.append(alpha)
            hw = _v_axpy(-alpha, cache[-1], hw)
            if len(cache) > 1:
                hw = _v_axpy(-betas[-1], cache[-2], hw)
            beta = _v_norm(hw)
            T = _tridiag(alphas, betas)
            expT = _expm_tridiag(T, delta)
            coeff = expT[:, 0]
            converged = beta < self._cutoff or \
                (k + 1 >= self.N_min and abs(coeff[-1]) ** 2 < P_tol)
            if converged or k + 1 == self.N_max:
                result_coeff = coeff
                break
            betas.append(float(beta))
            w = _v_scale(hw, 1. / beta)
            cache.append(w)
            vecs.append(w)
        N = len(result_coeff)
        result = _v_scale(vecs[0], result_coeff[0])
        for k in range(1, N):
            result = _v_axpy(result_coeff[k], vecs[k], result)
        if normalize is None:
            normalize = np.real(delta) == 0.
        if normalize:
            result = _v_scale(result, 1. / _v_norm(result))
        else:
            result = _v_scale(result, norm0)  # undo initial normalization
        return result, N


def _tridiag(alphas, betas):
    N = len(alphas)
    T = np.zeros((N, N))
    T[np.arange(N), np.arange(N)] = alphas
    if N > 1:
        b = np.asarray(betas[:N - 1])
        T[np.arange(N - 1), np.arange(1, N)] = b
        T[np.arange(1, N), np.arange(N - 1)] = b
    return T


def _expm_tridiag(T, delta):
    evals, evecs = np.linalg.eigh(T)
    return evecs @ np.diag(np.exp(delta * evals)) @ evecs.conj().T


class Arnoldi(KrylovBased):
    """Arnoldi iteration for (non-hermitian) dominant eigenpairs.

    Options add ``E_tol``, ``which`` ('LM'), ``num_ev`` (1).
    Reference: ``tenpy/linalg/krylov_based.py:322``.
    """

    def __init__(self, H, psi0, options):
        super().__init__(H, psi0, options)
        self.E_tol = self.options.get('E_tol', np.inf, 'real')
        self.which = self.options.get('which', 'LM', str)
        self.num_ev = self.options.get('num_ev', 1, int)

    def run(self):
        from ..tools.misc import argsort
        psi = self.psi0
        norm0 = _v_norm(psi)
        vecs = [_v_scale(psi, 1. / norm0)]
        h = np.zeros((self.N_max + 1, self.N_max), dtype=complex)
        E_prev = None
        for k in range(self.N_max):
            w = self.H.matvec(vecs[-1])
            for j, v in enumerate(vecs):
                h[j, k] = _v_inner(v, w)
                w = _v_axpy(-h[j, k], v, w)
            beta = _v_norm(w)
            h[k + 1, k] = beta
            H_k = h[:k + 1, :k + 1]
            evals, evecs = np.linalg.eig(H_k)
            perm = argsort(evals, self.which)
            evals = evals[perm]
            evecs = evecs[:, perm]
            self.Es.append(evals)
            converged = beta < self._cutoff
            if k + 1 >= self.N_min and E_prev is not None:
                if self.E_tol < np.inf and \
                        abs(evals[0] - E_prev) < self.E_tol * max(abs(evals[0]), 1e-10):
                    converged = True
                P_err = abs(beta * evecs[-1, 0]) ** 2
                if P_err < self.P_tol:
                    converged = True
            E_prev = evals[0]
            if converged or k + 1 == self.N_max:
                num = min(self.num_ev, k + 1)
                psis = []
                for n in range(num):
                    res = _v_scale(vecs[0], evecs[0, n])
                    for j in range(1, k + 1):
                        res = _v_axpy(evecs[j, n], vecs[j], res)
                    nrm = _v_norm(res)
                    if nrm > 0:
                        res = _v_scale(res, 1. / nrm)
                    psis.append(res)
                if self.num_ev == 1:
                    return evals[0], psis[0], k + 1
                return evals[:num], psis, k + 1
            vecs.append(_v_scale(w, 1. / beta))
        raise RuntimeError("unreachable")


class ArnoldiEvolution(Arnoldi):
    """exp(delta H)|psi0> via Arnoldi (non-hermitian H). Reference: ``:458``."""

    def run(self, delta, normalize=None):
        import scipy.linalg
        psi = self.psi0
        norm0 = _v_norm(psi)
        vecs = [_v_scale(psi, 1. / norm0)]
        h = np.zeros((self.N_max + 1, self.N_max), dtype=complex)
        coeff = None
        for k in range(self.N_max):
            w = self.H.matvec(vecs[-1])
            for j, v in enumerate(vecs):
                h[j, k] = _v_inner(v, w)
                w = _v_axpy(-h[j, k], v, w)
            beta = _v_norm(w)
            h[k + 1, k] = beta
            H_k = h[:k + 1, :k + 1]
            expH = scipy.linalg.expm(delta * H_k)
            coeff = expH[:, 0]
            if beta < self._cutoff or \
                    (k + 1 >= self.N_min and abs(coeff[-1]) ** 2 < self.P_tol) or \
                    k + 1 == self.N_max:
                break
            vecs.append(_v_scale(w, 1. / beta))
        result = _v_scale(vecs[0], coeff[0])
        for j in range(1, len(coeff)):
            result = _v_axpy(coeff[j], vecs[j], result)
        if normalize is None:
            normalize = np.real(delta) == 0.
        if normalize:
            result = _v_scale(result, 1. / _v_norm(result))
        else:
            result = _v_scale(result, norm0)
        return result, len(coeff)


class GMRES(KrylovBased):
    """Restarted GMRES solving ``H x = b`` for npc Arrays.

    Used for iMPS MPO-environment fixed-point equations.
    Options: ``N_min`` (5), ``N_max`` (20), ``restart`` (10), ``res`` (1e-8).
    Reference: ``tenpy/linalg/krylov_based.py:209``.
    """

    def __init__(self, H, psi0, b, options):
        super().__init__(H, psi0, options)
        self.N_min = self.options.get('N_min_gmres', 5, int)
        self.N_max = self.options.get('N_max_gmres', self.options.silent_get('N_max', 20)
                                      if hasattr(self.options, 'silent_get') else 20)
        self.restart = self.options.get('restart', 10, int)
        self.res_tol = self.options.get('res', 1e-8, 'real')
        self.b = b

    def run(self):
        x = self.psi0
        norm_b = _v_norm(self.b)
        if norm_b < 1e-300:
            return _v_scale(self.b, 0.), 0.
        total_iters = 0
        for _restart in range(self.restart):
            x, res = self._cycle(x, norm_b)
            total_iters += 1
            if res < self.res_tol:
                break
        return x, res

    def _cycle(self, x0, norm_b):
        import scipy.linalg
        r = _v_axpy(-1., self.H.matvec(x0), self.b)
        beta = _v_norm(r)
        if beta / norm_b < self.res_tol:
            return x0, beta / norm_b
        m = self.N_max
        vecs = [_v_scale(r, 1. / beta)]
        h = np.zeros((m + 1, m), dtype=complex)
        k_used = 0
        for k in range(m):
            w = self.H.matvec(vecs[-1])
            for j, v in enumerate(vecs):
                h[j, k] = _v_inner(v, w)
                w = _v_axpy(-h[j, k], v, w)
            hk = _v_norm(w)
            h[k + 1, k] = hk
            k_used = k + 1
            # solve least squares ||beta e1 - H_bar y||
            e1 = np.zeros(k_used + 1)
            e1[0] = beta
            y, _, _, _ = np.linalg.lstsq(h[:k_used + 1, :k_used], e1, rcond=None)
            res = np.linalg.norm(e1 - h[:k_used + 1, :k_used] @ y) / norm_b
            if hk < self._cutoff or res < self.res_tol:
                break
            vecs.append(_v_scale(w, 1. / hk))
        x = x0
        for j in range(k_used):
            x = _v_axpy(y[j], vecs[j], x)
        return x, res


def lanczos_arpack(H, psi0, options={}):
    """scipy.sparse ARPACK fallback for the ground state (reference ``:825``)."""
    from .sparse import FlatHermitianOperator
    options = asConfig(options, 'Lanczos')
    flat_op, psi_flat = FlatHermitianOperator.from_guess_with_pipe(
        H.matvec, psi0, dtype=np.dtype(str(psi0.dtype)))
    tol = options.get('P_tol', 1e-14, 'real')
    N_min = options.get('N_min', None, int)
    E, V = flat_op.eigenvectors(num_ev=1, which='SA', v0_npc=psi_flat, tol=tol)
    psi = V[0].split_legs([0])
    psi.iset_leg_labels(psi0.get_leg_labels())
    return float(np.real(E[0])), psi


def gram_schmidt(vecs, rcond=1e-14, verbose=None):
    """Orthonormalize a list of npc Arrays in place (dropping linear dependence)."""
    res = []
    for v in vecs:
        for u in res:
            v = v - complex(npc.inner(u.conj(), v, axes='range')) * u
        n = npc.norm(v)
        if n > rcond:
            res.append(v / n)
    return res


def plot_stats(ax, Es):
    """Plot convergence of Ritz values over iterations."""
    ks = [[k] * len(E) for k, E in enumerate(Es)]
    ks = np.array(sum(ks, []))
    Es = np.array(sum([list(E) for E in Es], []))
    ax.scatter(ks.flatten(), np.real(Es))
    ax.set_xlabel("Lanczos iteration")
    ax.set_ylabel("Ritz values")
