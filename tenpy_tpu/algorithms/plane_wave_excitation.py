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
           'PlaneWaveExcitationEngine', 'MultiSitePlaneWaveExcitationEngine']


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


class MultiSitePlaneWaveExcitationEngine(Algorithm):
    r"""Plane-wave excitations spanning several sites.

    Generalizes :class:`PlaneWaveExcitationEngine`: for each unit-cell site
    ``i`` the excited window is ``B_i = VL_i X_i`` where ``X_i`` carries
    ``excitation_size - 1`` extra physical legs ``p1..p{size-1}`` (the window
    covers sites ``i .. i+size-1``, completed with AR tensors to the right).
    Options: ``excitation_size`` plus those of the single-site engine.
    Reference: ``tenpy/algorithms/plane_wave_excitation.py:667``.
    """

    def __init__(self, psi, model, options, **kwargs):
        from ..networks.uniform_mps import UniformMPS
        from ..networks.mps import MPS
        if not isinstance(psi, UniformMPS) and isinstance(psi, MPS):
            psi = UniformMPS.from_MPS(psi)
        super().__init__(psi, model, options, **kwargs)
        assert self.psi.L == self.model.H_MPO.L
        self.L = L = self.psi.L
        self.size = self.options.get('excitation_size', 1, int)
        assert self.size >= 1
        self.ALs = [self.psi.get_AL(i) for i in range(L)]
        self.ARs = [self.psi.get_AR(i) for i in range(L)]
        self.ACs = [self.psi.get_AC(i) for i in range(L)]
        self.Cs = [self.psi.get_C(i) for i in range(L)]
        self.H = self.model.H_MPO
        self.Ws = [self.H.get_W(i) for i in range(L)]
        self.guess_init_env_data = self.options.get('init_env_data', None)
        self.VLs = [construct_orthogonal(self.ALs[i]) for i in range(L)]
        self.boundary_env_data, self.energy_density, _ = \
            MPOTransferMatrix.find_init_LP_RP(
                self.H, self.psi, calc_E=True,
                guess_init_env_data=self.guess_init_env_data)
        self.energy_density = float(np.real(np.mean(self.energy_density)))
        self.LW = self.boundary_env_data['init_LP']
        self.RW = self.boundary_env_data['init_RP']
        self.GS_env = self.GS_env_L = self.GS_env_R = MPOEnvironment(
            self.psi, self.H, self.psi, init_LP=self.LW, init_RP=self.RW)
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

    # how many unit cells a window can extend over
    @property
    def _n_cells(self):
        return int(np.ceil((self.L - 1 + self.size) / self.L))

    def run(self, p, qtotal_change=None, orthogonal_to=[], E_boosts=[],
            num_ev=1):
        """Lowest multi-site excitation(s) at momentum ``p``.

        Reference: ``plane_wave_excitation.py:771`` (run)."""
        aligned = self.Aligned_Effective_H(self, p)
        unaligned = self.Unaligned_Effective_H(self, p)
        effective_H = SumNpcLinearOperator(aligned, unaligned)
        lanczos_params = self.options.subconfig('lanczos_params')
        X_init = self.initial_guess(qtotal_change)
        if len(E_boosts) != len(orthogonal_to):
            E_boost = self.options.get('E_boost', 100, 'real')
            E_boosts = [E_boost] * len(orthogonal_to)
        if len(orthogonal_to) > 0:
            effective_H = BoostNpcLinearOperator(effective_H, E_boosts,
                                                 orthogonal_to)
        offset = self.lambda_C1 + self.energy_density * self.L * self._n_cells
        if num_ev > 1:
            opts = dict(lanczos_params.as_dict())
            opts['which'] = 'SR'
            opts['num_ev'] = num_ev
            energies, Xs, N = Arnoldi(effective_H, X_init, opts).run()
            Es = [float(np.real(E)) - offset for E in energies]
            psis = [MomentumMPS(X, self.psi, p, self.size) for X in Xs]
        else:
            energy, X, N = LanczosGroundState(effective_H, X_init,
                                              lanczos_params).run()
            Es = [energy - offset]
            psis = [MomentumMPS(X, self.psi, p, self.size)]
        if N == lanczos_params.get('N_max', 20, int):
            logger.warning("maximum Lanczos iterations reached; "
                           "excitation energies may not be converged")
        return np.real_if_close(Es), psis, N

    def energy(self, p, X):
        effective_H = SumNpcLinearOperator(self.Aligned_Effective_H(self, p),
                                           self.Unaligned_Effective_H(self, p))
        from ..linalg.krylov_based import _v_inner
        E = float(np.real(_v_inner(X, effective_H.matvec(X))))
        return E - self.lambda_C1 - self.energy_density * self.L * self._n_cells

    # ------------------------------------------------------- window attachment
    def attach_right(self, VL, X, As, R, Ws=None):
        """Right environment with the excited window ``VL X`` on the ket side
        and ``As`` (conj) on the bra side."""
        B = npc.tensordot(VL.replace_label('p', 'p0'), X, axes=[['vR'], ['vL']])
        RB = npc.tensordot(B, R, axes=[['vR'], ['vL']])
        for i in reversed(range(len(As))):
            lbl = 'p' + str(i)
            if Ws is not None:
                RB = npc.tensordot(RB, Ws[i], axes=[[lbl, 'wL'], ['p*', 'wR']])
            RB = npc.tensordot(RB, As[i].conj(),
                               axes=[['p', 'vL*'], ['p*', 'vR*']])
        return RB

    def attach_left(self, VL, X, As, L, Ws=None):
        B = npc.tensordot(VL.replace_label('p', 'p0'), X, axes=[['vR'], ['vL']])
        LB = npc.tensordot(L, B, axes=[['vR'], ['vL']])
        for i in range(len(As)):
            lbl = 'p' + str(i)
            if Ws is not None:
                LB = npc.tensordot(Ws[i], LB, axes=[['p*', 'wL'], [lbl, 'wR']])
            LB = npc.tensordot(As[i].conj(), LB,
                               axes=[['p*', 'vL*'], ['p', 'vR*']])
        return LB

    # ------------------------------------------------------------ infinite sums
    def _starting_right_TR(self, X):
        L, size = self.L, self.size
        RW = None
        for i in range(L):
            RP = self.GS_env_R.get_RP(i + size - 1)
            RB = self.attach_right(
                self.VLs[i], X[i],
                [self.ARs[j % L] for j in range(i, i + size)], RP,
                Ws=[self.Ws[j % L] for j in range(i, i + size)])
            RB = append_right_env(self.ALs[:i], self.ARs[:i], RB,
                                  Ws=self.Ws[:i])
            RW = RB if RW is None else RW + RB
        return RW

    def _starting_left_TL(self, X):
        L, size = self.L, self.size
        n_cells = self._n_cells
        LW = None
        for i in range(L):
            LP = self.GS_env_L.get_LP(i)
            LB = self.attach_left(
                self.VLs[i], X[i],
                [self.ALs[j % L] for j in range(i, i + size)], LP,
                Ws=[self.Ws[j % L] for j in range(i, i + size)])
            for j in range(i + size, n_cells * L):
                LB = append_left_env([self.ARs[j % L]], [self.ALs[j % L]], LB,
                                     Ws=[self.Ws[j % L]])
            LW = LB if LW is None else LW + LB
        return LW

    def infinite_sum_right(self, p, X):
        sum_tol = self.options.get('sum_tol', 1e-10, 'real')
        sum_iterations = self.options.get('sum_iterations', 100, int)
        sum_method = self.options.get('sum_method', 'explicit', str)
        R = self._starting_right_TR(X)
        if np.isclose(float(npc.norm(R)), 0):
            return R
        if sum_method == 'explicit':
            R_sum = R
            for _ in range(sum_iterations):
                R = np.exp(-1j * p * self.L) * append_right_env(
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
        sum_tol = self.options.get('sum_tol', 1e-10, 'real')
        sum_iterations = self.options.get('sum_iterations', 100, int)
        sum_method = self.options.get('sum_method', 'explicit', str)
        L, size = self.L, self.size
        # shift the starting window left far enough that every excitation
        # fits strictly left of the output unit cell
        if size == 1:
            self.shift_unit_cell = 0
        elif L == 1:
            self.shift_unit_cell = size - 1
        elif size > L:
            self.shift_unit_cell = size // L
        else:
            self.shift_unit_cell = 1
        LB = np.exp(1j * p * L * self.shift_unit_cell) * \
            self._starting_left_TL(X)
        if np.isclose(float(npc.norm(LB)), 0):
            return LB
        if sum_method == 'explicit':
            L_sum = LB
            for _ in range(sum_iterations):
                LB = np.exp(1j * p * L) * append_left_env(
                    self.ARs, self.ALs, LB, Ws=self.Ws)
                L_sum = L_sum + LB
                if float(npc.norm(LB)) < sum_tol:
                    break
            return L_sum
        elif 'GMRES' in sum_method:
            outer = self

            class helper_matvec(NpcLinearOperator):
                def matvec(self, vec):
                    lT = append_left_env(outer.ARs, outer.ALs, vec,
                                         Ws=outer.Ws)
                    return vec - np.exp(1j * p * outer.L) * lT

            L_sum, _ = GMRES(helper_matvec(), LB.zeros_like() * 1j, LB,
                             self.options.subconfig('GMRES_params')).run()
            return L_sum
        raise ValueError(f"unknown sum_method {sum_method!r}")

    # ------------------------------------------------------------ effective H
    class Aligned_Effective_H(NpcLinearOperator):
        """Windows overlapping the output window (within +-size sites).

        Reference: ``plane_wave_excitation.py`` MultiSite Aligned_Effective_H."""

        def __init__(self, outer, p):
            self.outer = outer
            self.p = p

        def matvec(self, vec):
            o = self.outer
            L, size = o.L, o.size
            n_cells = o._n_cells
            total = [v.zeros_like() for v in vec]
            for i in range(L):
                # windows starting at i+j (j >= 0): B shifted right by j
                for j in range(size):
                    LW = o.GS_env_L.get_LP(i)
                    RW = o.GS_env_R.get_RP((i + j + size - 1) % L)
                    for _ in range(int(np.ceil((i + j + size) / L)), n_cells):
                        RW = append_right_env(
                            [o.ARs[n % L] for n in range(i + j + size,
                                                         i + j + size + L)],
                            [o.ARs[n % L] for n in range(i + j + size,
                                                         i + j + size + L)],
                            RW,
                            [o.Ws[n % L] for n in range(i + j + size,
                                                        i + j + size + L)])
                    B = npc.tensordot(o.VLs[(i + j) % L].replace_label('p', 'p0'),
                                      vec[(i + j) % L], axes=[['vR'], ['vL']])
                    RW = npc.tensordot(B, RW, axes=[['vR'], ['vL']])
                    for n in reversed(range(j, size + j)):
                        lbl = 'p' + str(n - j)
                        RW = npc.tensordot(RW, o.Ws[(n + i) % L],
                                           axes=[[lbl, 'wL'], ['p*', 'wR']])
                        if n >= size:
                            RW = npc.tensordot(RW, o.ARs[(n + i) % L].conj(),
                                               axes=[['p', 'vL*'],
                                                     ['p*', 'vR*']])
                        else:
                            RW.ireplace_label('p', 'p' + str(n))
                    for k in range(j):
                        LW = npc.tensordot(LW, o.ALs[(i + k) % L],
                                           axes=[['vR'], ['vL']])
                        LW = npc.tensordot(LW, o.Ws[(i + k) % L],
                                           axes=[['wR', 'p'], ['wL', 'p*']])
                        LW.ireplace_label('p', 'p' + str(k))
                    if j == 0:
                        LW = npc.tensordot(LW, o.VLs[i].conj(),
                                           axes=[['vR*'], ['vL*']])
                        out = npc.tensordot(LW, RW, axes=[['vR', 'wR', 'p*'],
                                                          ['vL', 'wL', 'p0']])
                    else:
                        LW = npc.tensordot(LW, o.VLs[i].conj(),
                                           axes=[['vR*', 'p0'], ['vL*', 'p*']])
                        out = npc.tensordot(LW, RW,
                                            axes=[['vR', 'wR'], ['vL', 'wL']])
                    out.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
                    out.itranspose(total[i].get_leg_labels())
                    total[i] = total[i] + out * np.exp(
                        -1j * self.p * L * ((i + j) // L))
                # windows starting at j < i (overlapping from the left)
                for j in range(i - size + 1, i):
                    LW = o.GS_env_L.get_LP(j % L)
                    RW = o.GS_env_R.get_RP((size - 1 + i) % L)
                    B = npc.tensordot(o.VLs[j % L].replace_label('p', 'p0'),
                                      vec[j % L], axes=[['vR'], ['vL']])
                    LW = npc.tensordot(LW, B, axes=[['vR'], ['vL']])
                    for n in range(j, j + size):
                        lbl = 'p' + str(n - j)
                        LW = npc.tensordot(LW, o.Ws[n % L],
                                           axes=[[lbl, 'wR'], ['p*', 'wL']])
                        if n < i:
                            LW = npc.tensordot(LW, o.ALs[n % L].conj(),
                                               axes=[['p', 'vR*'],
                                                     ['p*', 'vL*']])
                        else:
                            LW.ireplace_label('p', 'p' + str(n - i))
                    for k in reversed(range(j + size, size + i)):
                        RW = npc.tensordot(o.ARs[k % L], RW,
                                           axes=[['vR'], ['vL']])
                        RW = npc.tensordot(o.Ws[k % L], RW,
                                           axes=[['wR', 'p*'], ['wL', 'p']])
                        RW.ireplace_label('p', 'p' + str(k - i))
                    LW = npc.tensordot(LW, o.VLs[i].conj(),
                                       axes=[['vR*', 'p0'], ['vL*', 'p*']])
                    out = npc.tensordot(LW, RW, axes=[['vR', 'wR'],
                                                      ['vL', 'wL']])
                    out.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
                    out.itranspose(total[i].get_leg_labels())
                    total[i] = total[i] + out * np.exp(
                        -1j * self.p * L * (j // L))
            return total

    class Unaligned_Effective_H(NpcLinearOperator):
        """Windows strictly left/right of the output window (geometric sums).

        Reference: ``plane_wave_excitation.py`` MultiSite Unaligned_Effective_H."""

        def __init__(self, outer, p):
            self.outer = outer
            self.p = p

        def matvec(self, vec):
            o = self.outer
            L, size = o.L, o.size
            total = [v.zeros_like() for v in vec]

            inf_sum_TR = o.infinite_sum_right(self.p, vec)
            for i in range(L):
                n_cells_i = int(np.ceil((i + size) / L))
                LP_VL = append_left_env([o.ALs[i]], [o.VLs[i]],
                                        o.GS_env_L.get_LP(i), Ws=[o.Ws[i]])
                for j in range(1, size):
                    LP_VL = npc.tensordot(LP_VL, o.ALs[(i + j) % L],
                                          axes=[['vR'], ['vL']])
                    LP_VL = npc.tensordot(LP_VL, o.Ws[(i + j) % L],
                                          axes=[['wR', 'p'], ['wL', 'p*']])
                    LP_VL.ireplace_label('p', 'p' + str(j))
                RB = inf_sum_TR * np.exp(-1j * self.p * L * n_cells_i)
                for j in reversed(range(i + size, n_cells_i * L)):
                    RP = o.GS_env_R.get_RP((j + size - 1) % L)
                    RB = append_right_env([o.ALs[j % L]], [o.ARs[j % L]], RB,
                                          Ws=[o.Ws[j % L]])
                    RB = RB + o.attach_right(
                        o.VLs[j % L], vec[j % L],
                        [o.ARs[k % L] for k in range(j, j + size)], RP,
                        Ws=[o.Ws[k % L] for k in range(j, j + size)]) * \
                        np.exp(-1j * self.p * L * (n_cells_i - 1))
                out = npc.tensordot(LP_VL, RB, axes=[['vR', 'wR'],
                                                     ['vL', 'wL']])
                out.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
                out.itranspose(total[i].get_leg_labels())
                total[i] = total[i] + out

            inf_sum_TL = o.infinite_sum_left(self.p, vec)
            for i in range(L):
                RP = o.GS_env_R.get_RP((i + size - 1) % L)
                for j in reversed(range(size)):
                    RP = npc.tensordot(o.ARs[(i + j) % L], RP,
                                       axes=[['vR'], ['vL']])
                    RP = npc.tensordot(o.Ws[(i + j) % L], RP,
                                       axes=[['wR', 'p*'], ['wL', 'p']])
                    RP.ireplace_label('p', 'p' + str(j))
                LB = inf_sum_TL * np.exp(1j * self.p * L)
                # windows fitting entirely left of site 0 but not in inf_sum
                for j in range(-L * o.shift_unit_cell, 0):
                    if j + size <= 0:
                        LP = o.GS_env_L.get_LP(j % L)
                        LP_B = o.attach_left(
                            o.VLs[j % L], vec[j % L],
                            [o.ALs[k % L] for k in range(j, j + size)], LP,
                            Ws=[o.Ws[k % L] for k in range(j, j + size)]) * \
                            np.exp(1j * self.p * L)
                        for k in range(j + size, 0):
                            LP_B = append_left_env([o.ARs[k % L]],
                                                   [o.ALs[k % L]], LP_B,
                                                   Ws=[o.Ws[k % L]])
                        LB = LB + LP_B
                for j in range(i):
                    LP = o.GS_env_L.get_LP((j - size + 1) % L)
                    LB = append_left_env([o.ARs[j % L]], [o.ALs[j % L]], LB,
                                         Ws=[o.Ws[j % L]])
                    LB = LB + o.attach_left(
                        o.VLs[(j - size + 1) % L], vec[(j - size + 1) % L],
                        [o.ALs[k % L] for k in range(j - size + 1, j + 1)],
                        LP,
                        Ws=[o.Ws[k % L] for k in range(j - size + 1, j + 1)]) \
                        * np.exp(-1j * self.p * L * ((j - size + 1) // L))
                LB = npc.tensordot(LB, o.VLs[i].conj(), axes=[['vR*'], ['vL*']])
                out = npc.tensordot(LB, RP, axes=[['vR', 'wR', 'p*'],
                                                  ['vL', 'wL', 'p0']])
                out.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
                out.itranspose(total[i].get_leg_labels())
                total[i] = total[i] + out
            return total

    # ------------------------------------------------------------ initial guess
    def initial_guess(self, qtotal_change):
        from ..linalg.charges import LegPipe
        X_init = []
        valid_charge = False
        rng = np.random.default_rng(42)
        for i in range(self.L):
            vL = self.VLs[i].get_leg('vR').conj()
            vL_label = 'vL'
            if self.size > 1:
                p_legs = [self.ALs[(i + j) % self.L].get_leg('p')
                          for j in range(1, self.size)]
                vL = LegPipe([vL] + p_legs)
                vL_label = '(vL' + ''.join(f'.p{j}'
                                           for j in range(1, self.size)) + ')'
            vR = self.ALs[(i + self.size) % self.L].get_leg('vL').conj()
            dtype = np.dtype(str(self.psi.dtype))
            th0 = npc.Array.from_func(rng.standard_normal, [vL, vR],
                                      dtype=dtype, qtotal=qtotal_change,
                                      labels=[vL_label, 'vR'])
            if self.size > 1:
                th0 = th0.split_legs()
            if np.isclose(float(npc.norm(th0)), 0):
                logger.warning("initial X guess zero on site %d "
                               "(charge not allowed there)", i)
            else:
                valid_charge = True
                th0 = th0 / npc.norm(th0)
            X_init.append(th0)
        assert valid_charge, "no valid X: requested charge cannot be realized"
        return X_init
