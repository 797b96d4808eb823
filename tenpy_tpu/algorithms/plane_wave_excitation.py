r"""Plane-wave (quasiparticle) excitation ansatz on uniform MPS.

Rebuild of ``tenpy/algorithms/plane_wave_excitation.py`` (append_right_env :51,
append_left_env :83, construct_orthogonal :115, PlaneWaveExcitationEngine :152);
algorithm of haegeman2012 / vanderstraeten2019 (tangent-space excitations).

The excited state is a momentum superposition where one ground-state tensor is
replaced by ``B = VL X`` (``VL`` = orthogonal complement of ``AL``).  The
effective Hamiltonian for the ``X`` tensors splits into an *aligned* part (the B
in the same unit cell) and an *unaligned* part (B strictly left/right, resummed
as a geometric series with momentum phases), and a standard Lanczos finds the
dispersion minimum in each momentum/charge sector.
"""

from __future__ import annotations

import logging

import numpy as np

from .algorithm import Algorithm
from .mps_common import ZeroSiteH
from ..linalg import np_conserved as npc
from ..linalg.krylov_based import GMRES, Arnoldi, LanczosGroundState
from ..linalg.sparse import (BoostNpcLinearOperator, NpcLinearOperator,
                             SumNpcLinearOperator)
from ..networks.momentum_mps import MomentumMPS
from ..networks.mpo import MPOEnvironment, MPOTransferMatrix

logger = logging.getLogger(__name__)

__all__ = ['append_right_env', 'append_left_env', 'construct_orthogonal',
           'PlaneWaveExcitationEngine']


def append_right_env(As, Bs, R, Ws=None):
    """Absorb sites into a right environment: ``As`` on top, ``Bs`` (conj) below.

    R has legs ``vL (wL) vL*``.  Reference: ``plane_wave_excitation.py:51``."""
    temp = R
    for i in reversed(range(len(As))):
        temp = npc.tensordot(Bs[i].conj(), temp, axes=[['vR*'], ['vL*']])
        if Ws is not None:
            temp = npc.tensordot(Ws[i], temp, axes=[['wR', 'p'], ['wL', 'p*']])
        temp = npc.tensordot(As[i], temp, axes=[['vR', 'p'], ['vL', 'p*']])
    return temp


def append_left_env(As, Bs, L, Ws=None):
    """Absorb sites into a left environment: ``As`` on top, ``Bs`` (conj) below.

    L has legs ``vR* (wR) vR``.  Reference: ``plane_wave_excitation.py:83``."""
    temp = L
    for i in range(len(As)):
        temp = npc.tensordot(temp, Bs[i].conj(), axes=[['vR*'], ['vL*']])
        if Ws is not None:
            temp = npc.tensordot(temp, Ws[i], axes=[['wR', 'p*'], ['wL', 'p']])
        temp = npc.tensordot(temp, As[i], axes=[['vR', 'p*'], ['vL', 'p']])
    return temp


def construct_orthogonal(M, left=True):
    """Orthogonal complement ``VL`` of an isometry M (labels ``vL p vR``):
    all columns orthogonal to M's, so any ``VL X`` is orthogonal to the state.

    Reference: ``plane_wave_excitation.py:115``."""
    if left:
        Mc = M.combine_legs([['vL', 'p']], qconj=[+1])
        Q = npc.orthogonal_columns(Mc, 'vR')
        err = npc.norm(npc.tensordot(Q.conj(), Mc, axes=[[0], [0]]))
        assert err < 1e-10, f"orthogonal complement failed: {err}"
    else:
        Mc = M.combine_legs([['p', 'vR']], qconj=[-1])
        Mt = Mc.transpose([1, 0])
        Q = npc.orthogonal_columns(Mt, 'vL').itranspose([1, 0])
        err = npc.norm(npc.tensordot(Q.conj(), Mt, axes=[[1], [0]]))
        assert err < 1e-10, f"orthogonal complement failed: {err}"
    return Q.split_legs()


class PlaneWaveExcitationEngine(Algorithm):
    r"""Quasiparticle excitations of a uniform MPS at fixed momentum.

    ``run(p, qtotal_change)`` returns the lowest excitation energies (relative
    to the ground state) and the corresponding :class:`MomentumMPS` states.

    Options: ``lanczos_params``, ``init_env_data``, ``lambda_C1``,
    ``sum_method`` ('explicit' | 'GMRES'), ``sum_tol``, ``sum_iterations``,
    ``E_boost``.  Reference: ``tenpy/algorithms/plane_wave_excitation.py:152``.
    """

    def __init__(self, psi, model, options, **kwargs):
        from ..networks.uniform_mps import UniformMPS
        from ..networks.mps import MPS
        if not isinstance(psi, UniformMPS) and isinstance(psi, MPS):
            psi = UniformMPS.from_MPS(psi)
        super().__init__(psi, model, options, **kwargs)
        assert self.psi.L == self.model.H_MPO.L
        self.L = self.psi.L
        self.ALs = [self.psi.get_AL(i) for i in range(self.L)]
        self.ARs = [self.psi.get_AR(i) for i in range(self.L)]
        self.ACs = [self.psi.get_AC(i) for i in range(self.L)]
        self.Cs = [self.psi.get_C(i) for i in range(self.L)]
        self.H = self.model.H_MPO
        self.Ws = [self.H.get_W(i) for i in range(self.L)]
        self.IdL = self.H.get_IdL(0)
        self.IdR = self.H.get_IdR(-1)
        self.guess_init_env_data = self.options.get('init_env_data', None)

        # B = VL X parametrization (tangent space, Eq. 85 of vanderstraeten2019)
        self.VLs = [construct_orthogonal(self.ALs[i]) for i in range(self.L)]

        self.boundary_env_data, self.energy_density, _ = \
            MPOTransferMatrix.find_init_LP_RP(
                self.H, self.psi, calc_E=True,
                guess_init_env_data=self.guess_init_env_data)
        self.energy_density = float(np.real(np.mean(self.energy_density)))
        self.LW = self.boundary_env_data['init_LP']
        self.RW = self.boundary_env_data['init_RP']
        self.GS_env = self.GS_env_L = self.GS_env_R = MPOEnvironment(
            self.psi, self.H, self.psi,
            init_LP=self.boundary_env_data['init_LP'],
            init_RP=self.boundary_env_data['init_RP'])

        # lambda_C1: energy offset of the infinite environments across bond 0
        self.lambda_C1 = self.options.get('lambda_C1', None, 'real')
        if self.lambda_C1 is None:
            C0 = self.Cs[0]
            norm = npc.tensordot(C0, C0.conj(),
                                 axes=[['vL', 'vR'], ['vL*', 'vR*']])
            lam = npc.tensordot(C0, self.RW, axes=[['vR'], ['vL']])
            lam = npc.tensordot(self.LW, lam, axes=[['wR', 'vR'], ['wL', 'vL']])
            lam = npc.tensordot(lam, C0.conj(),
                                axes=[['vR*', 'vL*'], ['vL*', 'vR*']])
            self.lambda_C1 = float(np.real(complex(lam) / complex(norm)))

        self.aligned_H = self.Aligned_Effective_H(self)

        strange = []
        for i in range(self.L):
            tL = self.GS_env.get_LP(i)
            tR = self.GS_env.get_RP(i)
            t = append_left_env([self.VLs[i]], [self.ACs[i]], tL,
                                Ws=[self.Ws[i]])
            t = npc.tensordot(t, tR, axes=[['wR', 'vR*'], ['wL', 'vL*']])
            strange.append(float(npc.norm(t)))
        logger.info("tangent-space projection of H|psi> per site: %r", strange)

    def run(self, p, qtotal_change=None, orthogonal_to=[], E_boosts=[],
            num_ev=1):
        """Find the lowest excitation(s) at momentum ``p``.

        Reference: ``plane_wave_excitation.py:249``."""
        self.unaligned_H = self.Unaligned_Effective_H(self, p)
        effective_H = SumNpcLinearOperator(self.aligned_H, self.unaligned_H)
        lanczos_params = self.options.subconfig('lanczos_params')
        X_init = self.initial_guess(qtotal_change)
        if len(E_boosts) != len(orthogonal_to):
            E_boost = self.options.get('E_boost', 100, 'real')
            E_boosts = [E_boost] * len(orthogonal_to)
        if len(orthogonal_to) > 0:
            effective_H = BoostNpcLinearOperator(effective_H, E_boosts,
                                                 orthogonal_to)
        if num_ev > 1:
            opts = dict(lanczos_params.as_dict())
            opts['which'] = 'SR'
            opts['num_ev'] = num_ev
            energies, Xs, N = Arnoldi(effective_H, X_init, opts).run()
            Es = [float(np.real(E)) - self.lambda_C1
                  - self.energy_density * self.L for E in energies]
            psis = [MomentumMPS(X, self.psi, p) for X in Xs]
        else:
            energy, X, N = LanczosGroundState(effective_H, X_init,
                                              lanczos_params).run()
            Es = [energy - self.lambda_C1 - self.energy_density * self.L]
            psis = [MomentumMPS(X, self.psi, p)]
        if N == lanczos_params.get('N_max', 20, int):
            logger.warning("maximum Lanczos iterations reached; "
                           "excitation energies may not be converged")
        return np.real_if_close(Es), psis, N

    def energy(self, p, X):
        """Energy of given excitation tensors at momentum p."""
        self.unaligned_H = self.Unaligned_Effective_H(self, p)
        effective_H = SumNpcLinearOperator(self.aligned_H, self.unaligned_H)
        HX = effective_H.matvec(X)
        from ..linalg.krylov_based import _v_inner
        E = float(np.real(_v_inner(X, HX)))
        return E - self.energy_density * self.L - self.lambda_C1

    # ------------------------------------------------------------ infinite sums
    def infinite_sum_right(self, p, X):
        """Geometric series of B-environments to the right (Eq. 194 of
        vanderstraeten2019).  Reference: ``plane_wave_excitation.py:338``."""
        sum_tol = self.options.get('sum_tol', 1e-10, 'real')
        sum_iterations = self.options.get('sum_iterations', 100, int)
        sum_method = self.options.get('sum_method', 'explicit', str)
        L = self.L
        B = npc.tensordot(self.VLs[L - 1], X[L - 1], axes=[['vR'], ['vL']])
        RB = append_right_env([B], [self.ARs[L - 1]], self.RW,
                              Ws=[self.Ws[L - 1]])
        for i in reversed(range(L - 1)):
            B = npc.tensordot(self.VLs[i], X[i], axes=[['vR'], ['vL']])
            RB = append_right_env([B], [self.ARs[i]],
                                  self.GS_env_R.get_RP(i), Ws=[self.Ws[i]]) \
                + append_right_env([self.ALs[i]], [self.ARs[i]], RB,
                                   Ws=[self.Ws[i]])
        R = RB
        if np.isclose(float(npc.norm(R)), 0):
            return R
        if sum_method == 'explicit':
            R_sum = R
            for _ in range(sum_iterations):
                R = np.exp(-1j * p * L) * append_right_env(
                    self.ALs, self.ARs, R, Ws=self.Ws)
                R_sum = R_sum + R
                if float(npc.norm(R)) < sum_tol:
                    break
            return R_sum
        elif 'GMRES' in sum_method:
            outer = self

            class helper_matvec(NpcLinearOperator):
                def matvec(self, vec):
                    Tr = append_right_env(outer.ALs, outer.ARs, vec,
                                          Ws=outer.Ws)
                    return vec - np.exp(-1j * p * outer.L) * Tr

            R_sum, _ = GMRES(helper_matvec(), R.zeros_like() * 1j, R,
                             self.options.subconfig('GMRES_params')).run()
            return R_sum
        raise ValueError(f"unknown sum_method {sum_method!r}")

    def infinite_sum_left(self, p, X):
        """Geometric series of B-environments to the left.

        Reference: ``plane_wave_excitation.py:415``."""
        sum_tol = self.options.get('sum_tol', 1e-10, 'real')
        sum_iterations = self.options.get('sum_iterations', 100, int)
        sum_method = self.options.get('sum_method', 'explicit', str)
        L = self.L
        B = npc.tensordot(self.VLs[0], X[0], axes=[['vR'], ['vL']])
        LB = append_left_env([B], [self.ALs[0]], self.LW, Ws=[self.Ws[0]])
        for i in range(1, L):
            B = npc.tensordot(self.VLs[i], X[i], axes=[['vR'], ['vL']])
            LB = append_left_env([B], [self.ALs[i]],
                                 self.GS_env_L.get_LP(i), Ws=[self.Ws[i]]) \
                + append_left_env([self.ARs[i]], [self.ALs[i]], LB,
                                  Ws=[self.Ws[i]])
        Lenv = LB
        if np.isclose(float(npc.norm(Lenv)), 0):
            return Lenv
        if sum_method == 'explicit':
            L_sum = Lenv
            for _ in range(sum_iterations):
                Lenv = np.exp(1j * p * L) * append_left_env(
                    self.ARs, self.ALs, Lenv, Ws=self.Ws)
                L_sum = L_sum + Lenv
                if float(npc.norm(Lenv)) < sum_tol:
                    break
            return L_sum
        elif 'GMRES' in sum_method:
            outer = self

            class helper_matvec(NpcLinearOperator):
                def matvec(self, vec):
                    lT = append_left_env(outer.ARs, outer.ALs, vec,
                                         Ws=outer.Ws)
                    return vec - np.exp(1j * p * outer.L) * lT

            L_sum, _ = GMRES(helper_matvec(), Lenv.zeros_like() * 1j, Lenv,
                             self.options.subconfig('GMRES_params')).run()
            return L_sum
        raise ValueError(f"unknown sum_method {sum_method!r}")

    # ------------------------------------------------------------ effective H
    class Aligned_Effective_H(NpcLinearOperator):
        """B tensors inside the same unit cell as the updated X.

        Reference: ``plane_wave_excitation.py:490``."""

        def __init__(self, outer):
            self.outer = outer

        def matvec(self, vec):
            o = self.outer
            L = o.L
            total = [v.zeros_like() for v in vec]
            for i in range(L):
                LB = None
                for j in range(i):
                    B = npc.tensordot(o.VLs[j], vec[j], axes=[['vR'], ['vL']])
                    if j > 0 and LB is not None:
                        LB = append_left_env([B], [o.ALs[j]],
                                             o.GS_env_L.get_LP(j),
                                             Ws=[o.Ws[j]]) \
                            + append_left_env([o.ARs[j]], [o.ALs[j]], LB,
                                              Ws=[o.Ws[j]])
                    else:
                        LB = append_left_env([B], [o.ALs[j]],
                                             o.GS_env_L.get_LP(j),
                                             Ws=[o.Ws[j]])
                B = npc.tensordot(o.VLs[i], vec[i], axes=[['vR'], ['vL']])
                LP1 = append_left_env([o.ALs[i]], [o.VLs[i]],
                                      o.GS_env_L.get_LP(i), Ws=[o.Ws[i]])
                LP2 = append_left_env([B], [o.VLs[i]],
                                      o.GS_env_L.get_LP(i), Ws=[o.Ws[i]])
                RB = None
                for j in reversed(range(i + 1, L)):
                    B = npc.tensordot(o.VLs[j], vec[j], axes=[['vR'], ['vL']])
                    if j < L - 1 and RB is not None:
                        RB = append_right_env([B], [o.ARs[j]],
                                              o.GS_env_R.get_RP(j),
                                              Ws=[o.Ws[j]]) \
                            + append_right_env([o.ALs[j]], [o.ARs[j]], RB,
                                               Ws=[o.Ws[j]])
                    else:
                        RB = append_right_env([B], [o.ARs[j]],
                                              o.GS_env_R.get_RP(j),
                                              Ws=[o.Ws[j]])
                out = npc.tensordot(LP2, o.GS_env_R.get_RP(i),
                                    axes=[['vR', 'wR'], ['vL', 'wL']])
                if i > 0 and LB is not None:
                    LB_i = append_left_env([o.ARs[i]], [o.VLs[i]], LB,
                                           Ws=[o.Ws[i]])
                    out = out + npc.tensordot(LB_i, o.GS_env_R.get_RP(i),
                                              axes=[['vR', 'wR'],
                                                    ['vL', 'wL']])
                if i < L - 1 and RB is not None:
                    out = out + npc.tensordot(LP1, RB,
                                              axes=[['vR', 'wR'],
                                                    ['vL', 'wL']])
                out.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
                total[i] = total[i] + out
            return total

    class Unaligned_Effective_H(NpcLinearOperator):
        """B tensors strictly left/right of the updated unit cell, resummed
        with momentum phases.  Reference: ``plane_wave_excitation.py:575``."""

        def __init__(self, outer, p):
            self.outer = outer
            self.p = p

        def matvec(self, vec):
            o = self.outer
            L = o.L
            total = [v.zeros_like() for v in vec]

            inf_sum_TR = o.infinite_sum_right(self.p, vec)
            cached_TR = [inf_sum_TR]
            for i in reversed(range(1, L)):
                cached_TR.insert(0, append_right_env(
                    [o.ALs[i]], [o.ARs[i]], cached_TR[0], Ws=[o.Ws[i]]))
            for i in range(L):
                LP_VL = append_left_env([o.ALs[i]], [o.VLs[i]],
                                        o.GS_env_L.get_LP(i), Ws=[o.Ws[i]])
                out = np.exp(-1j * self.p * L) * npc.tensordot(
                    LP_VL, cached_TR[i], axes=[['vR', 'wR'], ['vL', 'wL']])
                out.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
                total[i] = total[i] + out

            inf_sum_TL = o.infinite_sum_left(self.p, vec)
            cached_TL = [inf_sum_TL]
            for i in range(L - 1):
                cached_TL.append(append_left_env(
                    [o.ARs[i]], [o.ALs[i]], cached_TL[-1], Ws=[o.Ws[i]]))
            for i in range(L):
                TL_VL = append_left_env([o.ARs[i]], [o.VLs[i]], cached_TL[i],
                                        Ws=[o.Ws[i]])
                out = np.exp(1j * self.p * L) * npc.tensordot(
                    TL_VL, o.GS_env_R.get_RP(i),
                    axes=[['vR', 'wR'], ['vL', 'wL']])
                out.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
                total[i] = total[i] + out
            return total

    # ------------------------------------------------------------ initial guess
    def initial_guess(self, qtotal_change):
        """Random/optimized X guesses in the requested charge sector.

        Reference: ``plane_wave_excitation.py:622``."""
        X_init = []
        valid_charge = False
        for i in range(self.L):
            vL = self.VLs[i].get_leg('vR').conj()
            vR = self.ALs[(i + 1) % self.L].get_leg('vL').conj()
            th0 = npc.Array.from_func(np.ones, [vL, vR],
                                      dtype=np.dtype(str(self.psi.dtype)),
                                      qtotal=qtotal_change,
                                      labels=['vL', 'vR'])
            if np.isclose(float(npc.norm(th0)), 0):
                logger.warning("initial X guess zero on site %d "
                               "(charge not allowed there)", i)
            else:
                valid_charge = True
                LP = self.GS_env_L.get_LP(i, store=True)
                RP = self.GS_env_R.get_RP(i, store=True)
                LP = append_left_env([self.VLs[i]], [self.VLs[i]], LP,
                                     Ws=[self.Ws[i]])
                H0 = ZeroSiteH.from_LP_RP(LP, RP)
                if self.model.H_MPO.explicit_plus_hc:
                    H0 = SumNpcLinearOperator(H0, H0.adjoint())
                lanczos_params = self.options.subconfig('lanczos_params')
                _, th0, _ = LanczosGroundState(H0, th0, lanczos_params).run()
            X_init.append(th0)
        assert valid_charge, "no valid X: requested charge cannot be realized"
        return X_init
