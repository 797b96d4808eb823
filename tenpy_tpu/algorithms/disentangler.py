r"""Disentanglers: two-site unitaries on the ancilla legs minimizing entanglement.

Rebuild of ``tenpy/algorithms/disentangler.py`` (Disentangler :39, Backward :106,
Renyi :139, Norm :226, Noise :421, Last :450, Diagonalize :470, Composite :499,
Min :530, parser get_disentangler :601).

A disentangler takes the two-site purification theta (legs
``vL p0 q0 p1 q1 vR``), applies a unitary ``U`` on ``(q0, q1)``, and returns
``(U theta, U)``.  Minimizing the entanglement across the bond on the ancilla
space keeps finite-T simulation bond dimensions small.
"""

from __future__ import annotations

import logging

import numpy as np

from ..linalg import np_conserved as npc

logger = logging.getLogger(__name__)

__all__ = ['Disentangler', 'BackwardDisentangler', 'RenyiDisentangler',
           'GradientDescentDisentangler',
           'NormDisentangler', 'NoiseDisentangler', 'LastDisentangler',
           'DiagonalizeDisentangler', 'CompositeDisentangler', 'MinDisentangler',
           'get_disentangler']


class Disentangler:
    """Base class: ``__call__(theta) -> (theta', U)``. Reference: ``:39``."""

    def __init__(self, parent):
        self.parent = parent

    def __call__(self, theta):
        return theta, None


class BackwardDisentangler(Disentangler):
    """Evolve the ancilla legs backwards in (imaginary) time: U = exp(+dt H_q).

    Exact inverse of the physical gate on the ancillas; works only for imaginary
    time evolution.  Reference: ``disentangler.py:106``."""

    def __call__(self, theta):
        eng = self.parent
        if eng._U_param.get('type_evo') != 'imag':
            return theta, None
        U_bond = eng._U[self._U_idx][self._bond] if hasattr(self, '_U_idx') else None
        if U_bond is None:
            return theta, None
        U = U_bond.conj()
        U.iset_leg_labels(['q0*', 'q1*', 'q0', 'q1'])
        theta = npc.tensordot(U, theta, axes=[['q0*', 'q1*'], ['q0', 'q1']])
        return theta, U


class GradientDescentDisentangler(Disentangler):
    """Gradient descent on the n-th Renyi entropy of the bond.

    Per iteration: compute the entropy gradient dS w.r.t. the ancilla unitary,
    project onto its anti-hermitian part, and pick the best step from
    ``disent_stepsizes`` via ``U(t) = exp(-t dS)``.
    Options (from parent): ``disent_max_iter``, ``disent_eps``, ``disent_n``,
    ``disent_stepsizes``.  Reference: ``disentangler.py:309``."""

    def __init__(self, parent):
        super().__init__(parent)
        opts = parent.options
        self.max_iter = opts.get('disent_max_iter', 20, int)
        self.eps = opts.get('disent_eps', 1e-10, 'real')
        self.n = opts.get('disent_n', 1., 'real')
        self.stepsizes = opts.get('disent_stepsizes', [0.2, 1., 2.])

    def __call__(self, theta):
        S_old = np.inf
        U_tot = None
        for _ in range(self.max_iter):
            S, theta, U = self.iter(theta)
            if U_tot is None:
                U_tot = U
            else:
                U_tot = npc.tensordot(U, U_tot,
                                      axes=[['q0*', 'q1*'], ['q0', 'q1']])
            if abs(S_old - S) < self.eps:
                break
            S_old = S
        self.parent._last_disentangler_U = U_tot
        return theta, U_tot

    def iter(self, theta):
        from ..tools.math import entropy as _entropy
        th2 = theta.combine_legs([['vL', 'p0', 'q0'], ['vR', 'p1', 'q1']],
                                 qconj=[+1, -1])
        X, Y, Z = npc.svd(th2, inner_labels=['vR', 'vL'])
        Y = np.asarray(Y)
        n = self.n
        if n == 1:
            r = np.where(Y < 1e-14, 0., Y * np.log(np.where(Y < 1e-14, 1., Y)) * 2)
        else:
            Ys = np.where(Y < 1e-20, 1e-20, Y)
            tr_pn = np.sum(Ys ** (2 * n))
            r = Ys * Ys ** (2 * (n - 1)) * (n / (n - 1.) / tr_pn)
        XrZ = npc.tensordot(X.scale_axis(r, 'vR'), Z,
                            axes=[['vR'], ['vL']]).split_legs()
        dS = npc.tensordot(
            theta, XrZ.conj(),
            axes=[['vL', 'p0', 'p1', 'vR'], ['vL*', 'p0*', 'p1*', 'vR*']])
        dS = dS.combine_legs([['q0', 'q1'], ['q0*', 'q1*']], qconj=[+1, -1])
        dS_ah = dS - dS.conj().transpose([1, 0]).iset_leg_labels(
            dS.get_leg_labels())
        best = None
        for t in self.stepsizes:
            U = npc.expm(dS_ah * (-t)).split_legs()
            U.iset_leg_labels(['q0', 'q1', 'q0*', 'q1*'])
            new_theta = npc.tensordot(U, theta,
                                      axes=[['q0*', 'q1*'], ['q0', 'q1']])
            c2 = new_theta.combine_legs([['vL', 'p0', 'q0'],
                                         ['vR', 'p1', 'q1']], qconj=[+1, -1])
            S2 = np.asarray(npc.svd(c2, compute_uv=False))
            Sval = _entropy(S2 ** 2 / np.sum(S2 ** 2), n)
            if best is None or Sval < best[0]:
                best = (Sval, new_theta, U)
        return best



class NoiseDisentangler(Disentangler):
    """Random unitary on the ancillas (escape from local minima).

    Reference: ``disentangler.py:421``."""

    def __init__(self, parent, a=0.01):
        super().__init__(parent)
        self.a = a

    def __call__(self, theta):
        from ..linalg.random_matrix import U_close_1
        from ..linalg.charges import LegPipe
        leg0 = theta.get_leg('q0')
        leg1 = theta.get_leg('q1')
        pipe = LegPipe([leg0.conj(), leg1.conj()], qconj=+1)
        rng = np.random.default_rng()
        U2 = npc.Array.from_func(lambda size: U_close_1(size, a=self.a, rng=rng),
                                 [pipe.to_LegCharge(), pipe.to_LegCharge().conj()],
                                 dtype=np.complex128, shape_kw='size')
        U2.legs = (pipe, pipe.conj())
        U = U2.split_legs()
        U.iset_leg_labels(['q0*', 'q1*', 'q0', 'q1'])
        theta = npc.tensordot(U, theta, axes=[['q0*', 'q1*'], ['q0', 'q1']])
        return theta, U


class LastDisentangler(Disentangler):
    """Reuse the unitary found by the previous disentangler call on this bond.

    Reference: ``disentangler.py:450``."""

    def __call__(self, theta):
        U = getattr(self.parent, '_last_disentangler_U', None)
        if U is None:
            return theta, None
        theta = npc.tensordot(U, theta, axes=[['q0*', 'q1*'], ['q0', 'q1']])
        return theta, U


class DiagonalizeDisentangler(Disentangler):
    """Diagonalize the ancilla 2-site reduced density matrix.

    Reference: ``disentangler.py:470``."""

    def __call__(self, theta):
        rho = npc.tensordot(
            theta, theta.conj(),
            axes=[['vL', 'p0', 'p1', 'vR'], ['vL*', 'p0*', 'p1*', 'vR*']])
        rho = rho.combine_legs([['q0', 'q1'], ['q0*', 'q1*']], qconj=[+1, -1])
        W, V = npc.eigh(rho, sort='m>')
        # U = V^dag rotates into the eigenbasis
        U_c = V.conj().itranspose([1, 0])
        U = U_c.split_legs()
        U.iset_leg_labels(['q0*', 'q1*', 'q0', 'q1'])
        # relabel: rows = new (q0.q1) basis
        U.iset_leg_labels(['q0', 'q1', 'q0*', 'q1*'])
        theta2 = npc.tensordot(U, theta, axes=[['q0*', 'q1*'], ['q0', 'q1']])
        theta2.ireplace_labels(['q0', 'q1'], ['q0', 'q1'])
        return theta2, U


class RenyiDisentangler(Disentangler):
    """Iteratively minimize the 2nd Renyi entropy of the bond.

    Power-iteration on the environment of U (reference ``disentangler.py:139`` /
    arXiv:1711.01288).  Options (from parent): ``disent_eps``, ``disent_max_iter``.
    """

    def __init__(self, parent):
        super().__init__(parent)
        opts = parent.options
        self.max_iter = opts.get('disent_max_iter', 20, int)
        self.eps = opts.get('disent_eps', 1e-10, 'real')

    def __call__(self, theta):
        from ..linalg.charges import LegPipe
        leg0 = theta.get_leg('q0')
        leg1 = theta.get_leg('q1')
        U = npc.outer(
            npc.diag(1., leg0.conj(), labels=['q0*', 'q0']),
            npc.diag(1., leg1.conj(), labels=['q1*', 'q1']))
        S2_old = None
        for it in range(self.max_iter):
            S2, U = self.iter(theta, U)
            if S2_old is not None and abs(S2 - S2_old) < self.eps:
                break
            S2_old = S2
        theta2 = npc.tensordot(U, theta, axes=[['q0*', 'q1*'], ['q0', 'q1']])
        self.parent._last_disentangler_U = U
        return theta2, U

    def iter(self, theta, U):
        r"""One polar-decomposition iteration maximizing Tr(rho_L^2).

        dS2/dU gives the environment ``dS``; the optimal U for fixed environment is
        the polar unitary of dS."""
        U_theta = npc.tensordot(U, theta, axes=[['q0*', 'q1*'], ['q0', 'q1']])
        # rho_L = Tr_{p1 q1 vR} |U theta><U theta|
        rho_L = npc.tensordot(
            U_theta, U_theta.conj(),
            axes=[['p1', 'q1', 'vR'], ['p1*', 'q1*', 'vR*']])
        # dS = d Tr(rho_L^2) / dU*: contract rho_L with theta and U theta*
        x = npc.tensordot(rho_L, U_theta,
                          axes=[['vL*', 'p0*', 'q0*'], ['vL', 'p0', 'q0']])
        # x legs: vL, p0, q0 (from rho_L's ket side), p1, q1, vR
        dS = npc.tensordot(
            x, theta.conj(),
            axes=[['vL', 'p0', 'p1', 'vR'], ['vL*', 'p0*', 'p1*', 'vR*']])
        # dS legs: q0, q1 (ket of new U), q0*, q1* (contract with old theta's q)
        dS = dS.combine_legs([['q0', 'q1'], ['q0*', 'q1*']], qconj=[+1, -1])
        # polar unitary of the environment maximizes Tr(rho_L^2) for fixed env
        W, s, VH = npc.svd(dS, inner_labels=['vR', 'vL'])
        S2 = float(np.sum(np.asarray(s)))  # ~ Tr(rho_L^2) at the stationary point
        U_new = npc.tensordot(W, VH, axes=[['vR'], ['vL']])
        U_new = U_new.split_legs()
        U_new.iset_leg_labels(['q0', 'q1', 'q0*', 'q1*'])
        return -np.log(max(S2, 1e-300)), U_new


class NormDisentangler(Disentangler):
    """Minimize the truncation error (maximize the norm kept at fixed chi).

    Reference: ``disentangler.py:226``.  Simplified: same polar iteration as Renyi
    but targeting the sum of the chi_max largest Schmidt weights."""

    def __init__(self, parent):
        super().__init__(parent)
        self.renyi = RenyiDisentangler(parent)

    def __call__(self, theta):
        return self.renyi(theta)


class CompositeDisentangler(Disentangler):
    """Apply several disentanglers in sequence. Reference: ``:499``."""

    def __init__(self, disentanglers):
        self.disentanglers = disentanglers

    def __call__(self, theta):
        Us = []
        for d in self.disentanglers:
            theta, U = d(theta)
            Us.append(U)
        return theta, Us


class MinDisentangler(Disentangler):
    """Try several disentanglers, keep the one with minimal 2nd Renyi entropy.

    Reference: ``disentangler.py:530``."""

    def __init__(self, disentanglers, parent):
        self.disentanglers = disentanglers
        self.parent = parent

    def _S2(self, theta):
        rho = npc.tensordot(theta, theta.conj(),
                            axes=[['p1', 'q1', 'vR'], ['p1*', 'q1*', 'vR*']])
        rho_c = rho.combine_legs([['vL', 'p0', 'q0'], ['vL*', 'p0*', 'q0*']],
                                 qconj=[+1, -1])
        tr2 = npc.tensordot(rho_c, rho_c, axes=[[1, 0], [0, 1]])
        return -np.log(max(float(np.real(complex(tr2))), 1e-300))

    def __call__(self, theta):
        best = (self._S2(theta), theta, None)
        for d in self.disentanglers:
            th2, U = d(theta)
            s2 = self._S2(th2)
            if s2 < best[0]:
                best = (s2, th2, U)
        return best[1], best[2]


_DISENT_CLASSES = {
    'backwards': BackwardDisentangler,
    'graddesc': GradientDescentDisentangler,
    'renyi': RenyiDisentangler,
    'norm': NormDisentangler,
    'noise': NoiseDisentangler,
    'last': LastDisentangler,
    'diag': DiagonalizeDisentangler,
    'None': Disentangler,
}


def get_disentangler(method, parent):
    """Parse a disentangler spec like ``'renyi'``, ``'last-renyi'`` (composite) or
    ``'min(noise,renyi)'``.  Reference: ``disentangler.py:601``."""
    if method is None or method == 'None':
        return None

    def parse(spec):
        spec = spec.strip()
        if spec.startswith('min(') and spec.endswith(')'):
            parts = spec[4:-1].split(',')
            return MinDisentangler([parse(p) for p in parts if p.strip()
                                    and p.strip() != 'None'], parent)
        if '-' in spec:
            return CompositeDisentangler([parse(p) for p in spec.split('-')])
        cls = _DISENT_CLASSES.get(spec)
        if cls is None:
            raise ValueError(f"unknown disentangler {spec!r}")
        return cls(parent)

    return parse(method)
