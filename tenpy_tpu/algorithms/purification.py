r"""Finite-temperature algorithms on purification MPS.

Rebuild of ``tenpy/algorithms/purification.py`` (PurificationTEBD :85,
PurificationTEBD2 :451, PurificationApplyMPO :38, PurificationTwoSiteU :20):
imaginary-time TEBD on the physical legs of a purification, with optional
disentangler hooks acting on the ancilla legs.
"""

from __future__ import annotations

import logging

import numpy as np

from .tebd import TEBDEngine
from .mps_common import VariationalApplyMPO
from ..linalg import np_conserved as npc
from ..linalg.truncation import TruncationError, svd_theta

logger = logging.getLogger(__name__)

__all__ = ['PurificationTEBD', 'PurificationTEBD2', 'PurificationApplyMPO']


class PurificationTEBD(TEBDEngine):
    """TEBD on a purification: gates act on the ``p`` legs only.

    Options add ``disentangle`` (None | spec string for
    :func:`~tenpy_tpu.algorithms.disentangler.get_disentangler`).
    Reference: ``tenpy/algorithms/purification.py:85``.
    """

    def __init__(self, psi, model, options, **kwargs):
        super().__init__(psi, model, options, **kwargs)
        spec = self.options.get('disentangle', None)
        from .disentangler import get_disentangler
        self._disentangler = get_disentangler(spec, self) if spec else None

    def run_imaginary(self, beta):
        """Evolve ``exp(-beta H / 2)`​` (thermal state at inverse temperature beta).

        Options: ``dt`` (imaginary step).  For finite bc + order 2 the
        canonical-form-preserving :meth:`update_imag` is used (2nd order in
        dt; the generic evolve degrades to 1st order for non-unitary gates).
        Reference: ``purification.py`` same name."""
        dt = self.options.get('dt', 0.1, 'real')
        N_steps = int(round(beta / 2. / dt))
        order = self.options.get('order', 2)
        self.calc_U(order, dt, type_evo='imag')
        if self.psi.finite and order == 2 and type(self) is PurificationTEBD:
            self.update_imag(N_steps)
        else:
            self.evolve(N_steps, dt)
        logger.info("purification: evolved to beta=%.3f", 2 * dt * N_steps)

    def update_bond_imag(self, i, U_bond):
        """Canonical-form-preserving imaginary bond update on (p, q) legs.

        Reference: ``tenpy/algorithms/tebd.py:742`` (purification override)."""
        psi = self.psi
        i0 = i - 1
        theta = psi.get_theta(i0, 2)  # vL p0 q0 p1 q1 vR
        theta = npc.tensordot(U_bond, theta, axes=[['p0*', 'p1*'], ['p0', 'p1']])
        if self._disentangler is not None:
            theta, _ = self._disentangler(theta)
        theta.itranspose(['vL', 'p0', 'q0', 'p1', 'q1', 'vR'])
        theta = theta.combine_legs([['vL', 'p0', 'q0'], ['p1', 'q1', 'vR']],
                                   qconj=[+1, -1])
        U, S, VH, err, renorm = svd_theta(theta, self.trunc_params,
                                          inner_labels=['vR', 'vL'])
        psi.norm *= renorm
        B_R = VH.split_legs([1]).ireplace_labels(['p1', 'q1'], ['p', 'q'])
        A_L = U.split_legs([0]).ireplace_labels(['p0', 'q0'], ['p', 'q'])
        psi.set_SR(i0, S)
        psi.set_B(i0, A_L, form='A')
        psi.set_B(i0 + 1, B_R, form='B')
        self._trunc_err_bonds[i % (psi.L + 1)] = \
            self._trunc_err_bonds[i % (psi.L + 1)] + err
        return err

    def update_bond(self, i, U_bond):
        """Apply the gate on the p legs of sites (i-1, i); then disentangle.

        Reference: ``purification.py`` update_bond."""
        psi = self.psi
        i0 = i - 1
        theta = psi.get_theta(i0, 2)  # legs vL p0 q0 p1 q1 vR
        theta = npc.tensordot(U_bond, theta, axes=[['p0*', 'p1*'], ['p0', 'p1']])
        if self._disentangler is not None:
            theta, _ = self._disentangler(theta)
        theta.itranspose(['vL', 'p0', 'q0', 'p1', 'q1', 'vR'])
        theta_c = theta.combine_legs([['vL', 'p0', 'q0'], ['p1', 'q1', 'vR']],
                                     qconj=[+1, -1])
        U, S, VH, err, renorm = svd_theta(theta_c, self.trunc_params,
                                          inner_labels=['vR', 'vL'])
        B_R = VH.split_legs([1]).ireplace_labels(['p1', 'q1'], ['p', 'q'])
        A_L = U.split_legs([0]).ireplace_labels(['p0', 'q0'], ['p', 'q'])
        # convert A_L to B form: B_L = SL^{-1} A_L S
        SL_inv = psi._scale_S(psi.get_SL(i0), -1.)
        B_L = A_L.iscale_axis(SL_inv, 'vL').iscale_axis(np.asarray(S), 'vR')
        psi.set_SR(i0, S)
        psi.set_B(i0, B_L, form='B')
        psi.set_B(i0 + 1, B_R, form='B')
        self._trunc_err_bonds[i % (psi.L + 1)] = \
            self._trunc_err_bonds[i % (psi.L + 1)] + err
        return err

    def bond_energies(self):
        psi = self.psi
        E = []
        bonds = range(1, psi.L) if psi.finite else range(psi.L)
        for i in bonds:
            h = self.model.H_bond[i % psi.L] if not psi.finite else \
                self.model.H_bond[i]
            if h is None:
                continue
            theta = psi.get_theta(i - 1, 2)
            h_th = npc.tensordot(h, theta, axes=[['p0*', 'p1*'], ['p0', 'p1']])
            val = npc.tensordot(
                theta.conj(), h_th,
                axes=[['vL*', 'p0*', 'q0*', 'p1*', 'q1*', 'vR*'],
                      ['vL', 'p0', 'q0', 'p1', 'q1', 'vR']])
            E.append(float(np.real(complex(val))))
        return np.array(E)


class PurificationTEBD2(PurificationTEBD):
    """TEBD on purification with dt/2 left-right + right-left sweeps instead of
    the even/odd checkerboard (second order by symmetry).
    Reference: ``purification.py:451``."""

    def evolve(self, N_steps, dt):
        # ensure U[0] holds the dt/2 gates (order-2 table: prefactors [0.5, 1.])
        self.calc_U(2, dt, type_evo=self._U_param.get('type_evo', 'imag'))
        Us = self._U[0]
        trunc_err = TruncationError()
        psi = self.psi
        L = psi.L
        bonds = list(range(1, L)) if psi.finite else list(range(L))
        for _ in range(N_steps):
            for i in bonds + bonds[::-1]:
                U = Us[i % L if not psi.finite else i]
                if U is not None:
                    trunc_err += self.update_bond(i, U)
        self.evolved_time = self.evolved_time + N_steps * dt
        self.trunc_err = self.trunc_err + trunc_err
        return trunc_err


class PurificationApplyMPO(VariationalApplyMPO):
    """Variational MPO application on purification MPS.

    Reference: ``purification.py:38``."""

    def update_bond(self, i0):
        env = self.env
        LP = env.get_LP(i0)
        RP = env.get_RP(i0 + 1)
        W0 = env.H.get_W(i0).replace_labels(['p', 'p*'], ['p0', 'p0*'])
        W1 = env.H.get_W(i0 + 1).replace_labels(['p', 'p*'], ['p1', 'p1*'])
        th = self.old_psi.get_theta(i0, n=2)
        th = npc.tensordot(LP, th, axes=[['vR'], ['vL']])
        th = npc.tensordot(th, W0, axes=[['wR', 'p0'], ['wL', 'p0*']])
        th = npc.tensordot(th, W1, axes=[['wR', 'p1'], ['wL', 'p1*']])
        th = npc.tensordot(th, RP, axes=[['wR', 'vR'], ['wL', 'vL']])
        th.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
        th = th.combine_legs([['vL', 'p0', 'q0'], ['p1', 'q1', 'vR']],
                             qconj=[+1, -1])
        U, S, VH, err, renorm = svd_theta(th, self.trunc_params)
        self.trunc_err_list.append(err.eps)
        self.renormalize.append(renorm)
        A = U.split_legs([0]).ireplace_labels(['p0', 'q0'], ['p', 'q'])
        B = VH.split_legs([1]).ireplace_labels(['p1', 'q1'], ['p', 'q'])
        self.psi.set_B(i0, A, 'A')
        self.psi.set_SR(i0, S)
        self.psi.set_B(i0 + 1, B, 'B')
        self.env.del_LP(i0 + 1)
        self.env.del_RP(i0)
