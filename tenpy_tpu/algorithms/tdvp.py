r"""Time-Dependent Variational Principle: 1- and 2-site MPS time evolution.

Rebuild of ``tenpy/algorithms/tdvp.py`` (TDVPEngine :58, TwoSiteTDVPEngine :233,
SingleSiteTDVPEngine :318 with zero-site backward updates :419, time-dependent
variants :431,444).

Second-order symmetric integrator: a right sweep with dt/2 followed by a left sweep
with dt/2.  The sweeps carry the center tensor explicitly (never storing mixed
C-absorbed tensors into psi), so the cached right/left environments stay exactly
valid during the opposite sweep — the tangent-space projector structure of TDVP.
All local evolutions are Krylov exponentials (:class:`LanczosEvolution`) on jitted
effective-H matvecs.
"""

from __future__ import annotations

import logging

import numpy as np

from .algorithm import TimeEvolutionAlgorithm, TimeDependentHAlgorithm
from .mps_common import TwoSiteH, OneSiteH, ZeroSiteH
from ..linalg import np_conserved as npc
from ..linalg.krylov_based import LanczosEvolution
from ..linalg.truncation import TruncationError, svd_theta
from ..networks.mpo import MPOEnvironment

logger = logging.getLogger(__name__)

__all__ = ['TDVPEngine', 'TwoSiteTDVPEngine', 'SingleSiteTDVPEngine',
           'TimeDependentSingleSiteTDVP', 'TimeDependentTwoSiteTDVP']


class TDVPEngine(TimeEvolutionAlgorithm):
    """Base TDVP engine (finite MPS).

    Options: ``dt``, ``N_steps``, ``trunc_params`` (2-site), ``lanczos_options``.
    """

    def __init__(self, psi, model, options, **kwargs):
        super().__init__(psi, model, options, **kwargs)
        if psi.bc != 'finite':
            raise NotImplementedError("TDVP currently implemented for finite MPS")
        self.lanczos_options = self.options.subconfig('lanczos_options')
        self.env = MPOEnvironment(psi, model.H_MPO, psi)
        self.trunc_err = TruncationError()

    def prepare_evolve(self, dt):
        pass

    def evolve(self, N_steps, dt):
        trunc_err = TruncationError()
        for _ in range(N_steps):
            trunc_err += self.evolve_step(dt)
        self.evolved_time = self.evolved_time + N_steps * dt
        self.trunc_err = self.trunc_err + trunc_err
        return trunc_err

    def evolve_step(self, dt):
        raise NotImplementedError

    def _evolve_local(self, H, theta, delta):
        """exp(delta * H)|theta> via Krylov; delta = -1j*dt/2 forward etc."""
        opts = dict(self.lanczos_options.as_dict()) if hasattr(
            self.lanczos_options, 'as_dict') else dict(self.lanczos_options)
        opts.setdefault('N_max', 20)
        opts.setdefault('P_tol', 1e-14)
        psi_t, N = LanczosEvolution(H, theta, opts).run(delta, normalize=True)
        return psi_t

    def _site0_to_B_form(self):
        """Bring site 0 from Th into B form, keeping global phase and norm.

        The 1x1 U factor of the boundary SVD is a pure phase — discarding it
        would corrupt phase-sensitive observables (Loschmidt echo, overlaps);
        the SVD renormalization goes into ``psi.norm`` (reference
        ``tenpy/algorithms/tdvp.py:398``: "better keep it!").
        """
        psi = self.psi
        th0 = psi.get_B(0, None)
        th0_c = th0.combine_legs([['p', 'vR']], qconj=[-1])
        th0_c.itranspose(['vL', '(p.vR)'])
        U, S, VH = npc.svd(th0_c, inner_labels=['vR', 'vL'])
        S = np.asarray(S)
        renorm = np.linalg.norm(S)
        phase = complex(U.to_numpy().item())  # U is 1x1 at the trivial boundary
        B0 = VH.split_legs([1])
        if abs(phase - 1.) > 1e-15:
            B0 = B0 * (phase / abs(phase))
        psi.set_B(0, B0, form='B')
        psi.set_SL(0, np.ones(1))
        psi.norm *= renorm * abs(phase)


class SingleSiteTDVPEngine(TDVPEngine):
    """1-site TDVP: exact chi-preserving evolution (no truncation error).

    Reference: ``tenpy/algorithms/tdvp.py:318``.
    """

    def evolve_step(self, dt):
        psi = self.psi
        env = self.env
        L = psi.L
        half = dt / 2.
        # ---- right sweep with dt/2
        theta = psi.get_theta(0, 1)  # Th form, labels vL p0 vR
        for i in range(L):
            H1 = OneSiteH(env, i, combine=False)
            theta = self._evolve_local(H1, theta, -0.5j * dt)
            if i < L - 1:
                theta = theta.combine_legs([['vL', 'p0']], qconj=[+1])
                U, S, VH = npc.svd(theta, inner_labels=['vR', 'vL'])
                S = np.asarray(S)
                S = S / np.linalg.norm(S)
                A = U.split_legs([0]).ireplace_label('p0', 'p')
                psi.set_B(i, A, form='A')
                psi.set_SR(i, S)
                H1.update_LP(env, i + 1)
                C = VH.iscale_axis(S, 'vL')
                C.iset_leg_labels(['vL', 'vR'])
                H0 = ZeroSiteH(env, i + 1)
                C = self._evolve_local(H0, C, +0.5j * dt)
                theta = npc.tensordot(C, psi.get_B(i + 1, 'B'),
                                      axes=[['vR'], ['vL']])
                theta.ireplace_label('p', 'p0')
            else:
                psi.set_B(i, theta.replace_label('p0', 'p'), form='Th')
        # ---- left sweep with dt/2
        theta = psi.get_theta(L - 1, 1)
        for i in range(L - 1, -1, -1):
            H1 = OneSiteH(env, i, combine=False, move_right=False)
            theta = self._evolve_local(H1, theta, -0.5j * dt)
            if i > 0:
                theta = theta.combine_legs([['p0', 'vR']], qconj=[-1])
                theta.itranspose(['vL', '(p0.vR)'])
                U, S, VH = npc.svd(theta, inner_labels=['vR', 'vL'])
                S = np.asarray(S)
                S = S / np.linalg.norm(S)
                B = VH.split_legs([1]).ireplace_label('p0', 'p')
                psi.set_B(i, B, form='B')
                psi.set_SL(i, S)
                H1.update_RP(env, i - 1)
                C = U.iscale_axis(S, 'vR')
                C.iset_leg_labels(['vL', 'vR'])
                H0 = ZeroSiteH(env, i)
                C = self._evolve_local(H0, C, +0.5j * dt)
                theta = npc.tensordot(psi.get_B(i - 1, 'A'), C,
                                      axes=[['vR'], ['vL']])
                theta.ireplace_label('p', 'p0')
            else:
                psi.set_B(0, theta.replace_label('p0', 'p'), form='Th')
        self._site0_to_B_form()
        return TruncationError()  # 1-site TDVP does not truncate


class TwoSiteTDVPEngine(TDVPEngine):
    """2-site TDVP: evolves two-site thetas (allows chi growth + truncation).

    Reference: ``tenpy/algorithms/tdvp.py:233``.
    """

    def evolve_step(self, dt):
        psi = self.psi
        env = self.env
        L = psi.L
        err_tot = TruncationError()
        # ---- right sweep with dt/2
        theta = psi.get_theta(0, 2)
        for i in range(L - 1):
            H2 = TwoSiteH(env, i, combine=False)
            theta = self._evolve_local(H2, theta, -0.5j * dt)
            theta = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
            U, S, VH, err, renorm = svd_theta(theta, self.trunc_params,
                                              inner_labels=['vR', 'vL'])
            err_tot += err
            psi.norm *= renorm   # truncation/evolution norm change is physical
            A = U.split_legs([0]).ireplace_label('p0', 'p')
            psi.set_B(i, A, form='A')
            psi.set_SR(i, S)
            H2.update_LP(env, i + 1)
            theta1 = VH.iscale_axis(np.asarray(S), 'vL').split_legs([1])
            theta1.ireplace_label('p1', 'p0')  # one-site theta at site i+1
            if i < L - 2:
                H1 = OneSiteH(env, i + 1, combine=False)
                theta1 = self._evolve_local(H1, theta1, +0.5j * dt)
                B_next = psi.get_B(i + 2, 'B', label_p=1)
                theta = npc.tensordot(theta1, B_next, axes=[['vR'], ['vL']])
            else:
                theta = theta1  # last site's one-site theta
        # at the end of the right sweep, theta is the Th of site L-1
        # ---- left sweep with dt/2
        for i in range(L - 2, -1, -1):
            # theta currently: one-site Th at site i+1 (labels vL p0 vR)
            A_prev = psi.get_B(i, 'A', label_p=0)
            theta = npc.tensordot(A_prev, theta.replace_label('p0', 'p1'),
                                  axes=[['vR'], ['vL']])
            H2 = TwoSiteH(env, i, combine=False)
            theta = self._evolve_local(H2, theta, -0.5j * dt)
            theta = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
            U, S, VH, err, renorm = svd_theta(theta, self.trunc_params,
                                              inner_labels=['vR', 'vL'])
            err_tot += err
            psi.norm *= renorm
            B = VH.split_legs([1]).ireplace_label('p1', 'p')
            psi.set_B(i + 1, B, form='B')
            psi.set_SR(i, S)
            H2.update_RP(env, i)
            theta1 = U.iscale_axis(np.asarray(S), 'vR').split_legs([0])
            if i > 0:
                H1 = OneSiteH(env, i, combine=False, move_right=False)
                theta1 = self._evolve_local(H1, theta1, +0.5j * dt)
                theta = theta1
            else:
                psi.set_B(0, theta1.replace_label('p0', 'p'), form='Th')
        self._site0_to_B_form()
        return err_tot


class TimeDependentSingleSiteTDVP(TimeDependentHAlgorithm, SingleSiteTDVPEngine):
    """1-site TDVP with H(t). Reference: ``tdvp.py:431``."""

    def reinit_model(self):
        TimeDependentHAlgorithm.reinit_model(self)
        self.env = MPOEnvironment(self.psi, self.model.H_MPO, self.psi)


class TimeDependentTwoSiteTDVP(TimeDependentHAlgorithm, TwoSiteTDVPEngine):
    """2-site TDVP with H(t). Reference: ``tdvp.py:444``."""

    def reinit_model(self):
        TimeDependentHAlgorithm.reinit_model(self)
        self.env = MPOEnvironment(self.psi, self.model.H_MPO, self.psi)
