r"""Variational Uniform Matrix Product States (VUMPS).

Rebuild of ``tenpy/algorithms/vumps.py`` (VUMPSEngine :60, SingleSiteVUMPSEngine
:544, TwoSiteVUMPSEngine :691); algorithm of arXiv:1701.07035 / zauner-stauber2018.

Tangent-space ground-state search directly in the thermodynamic limit: per site,
solve a one-/two-site and two zero-site eigenvalue problems against environments
regenerated from the MPO transfer-matrix fixed points, then restore the
AL/AR/AC/C uniform canonical form through polar decompositions (no inversions).

TPU notes: the effective Hamiltonians reuse the same jitted matvecs as DMRG
(``mps_common``), and the environment fixed-point solve is a host-side ARPACK
iteration over charge-blocked tensors.
"""

from __future__ import annotations

import logging
import time

import numpy as np

from ..linalg import np_conserved as npc
from ..linalg.krylov_based import LanczosGroundState
from ..linalg.truncation import svd_theta
from ..networks.mpo import MPOEnvironment, MPOTransferMatrix
from ..networks.mps import MPS
from ..networks.uniform_mps import UniformMPS
from ..tools.math import entropy
from ..tools.params import asConfig
from .mps_common import (IterativeSweeps, OneSiteH, TwoSiteH, ZeroSiteH,
                         DensityMatrixMixer)

logger = logging.getLogger(__name__)

__all__ = ['VUMPSEngine', 'SingleSiteVUMPSEngine', 'TwoSiteVUMPSEngine']


def _align_phase(v, guess):
    """Rotate the global phase of an eigenvector to match its initial guess.

    Lanczos eigenvectors carry an arbitrary phase; without alignment the stored
    AL/AC/C tensors of *different* local updates pick up relative signs and the
    canonical-form identities AL C = AC = C AR only hold up to phase."""
    ov = complex(npc.inner(guess.conj(), v, axes='range'))
    if abs(ov) > 1e-14:
        v = v * (abs(ov) / ov)
    return v


class VUMPSEngine(IterativeSweeps):
    """Common machinery of the single- and two-site VUMPS engines.

    Options (on top of :class:`~tenpy_tpu.algorithms.mps_common.IterativeSweeps`):
    ``N_sweeps_check`` (1), ``max_E_err``, ``max_S_err``, ``max_split_err``,
    ``check_overlap``, ``norm_tol``.
    Reference: ``tenpy/algorithms/vumps.py:60``.
    """

    EffectiveH = None

    def __init__(self, psi, model, options, **kwargs):
        if not isinstance(psi, UniformMPS):
            assert isinstance(psi, MPS)
            psi = UniformMPS.from_MPS(psi)
        options = asConfig(options, self.__class__.__name__)
        super().__init__(psi, model, options, **kwargs)
        assert psi.L % model.H_MPO.L == 0
        self.psi.left_U = self.psi.right_U = None
        self.psi.valid_umps = False
        self._entropy_approx = [None] * psi.L
        self.N_sweeps_check = self.options.get('N_sweeps_check', 1, int)
        self.options.setdefault('min_sweeps', int(1.5 * self.N_sweeps_check))

    def init_env(self, model=None, resume_data=None, orthogonal_to=None):
        if orthogonal_to:
            raise NotImplementedError("VUMPS does not support orthogonal_to")
        H = model.H_MPO if model is not None else self.env.H
        if resume_data is None:
            resume_data = {}
        self.guess_init_env_data = resume_data.get('init_env_data', None)
        data, Es, _ = MPOTransferMatrix.find_init_LP_RP(
            H, self.psi, calc_E=True,
            guess_init_env_data=self.guess_init_env_data)
        self.env = MPOEnvironment(self.psi, H, self.psi,
                                  init_LP=data['init_LP'],
                                  init_RP=data['init_RP'])
        self.transfer_matrix_energy = Es
        self.guess_init_env_data = data
        self.reset_stats()

    def reset_stats(self, resume_data=None):
        super().reset_stats(resume_data)
        self.update_stats = {k: [] for k in
                             ['i0', 'e_L', 'e_R', 'e_C1', 'e_C2', 'e_theta',
                              'N_lanczos', 'split_err_L', 'split_err_R', 'time']}
        self.sweep_stats = {k: [] for k in
                            ['sweep', 'E', 'Delta_E', 'S', 'Delta_S', 'max_S',
                             'time', 'max_chi', 'norm_err', 'max_split_err']}

    # ---------------------------------------------------------------- run loop
    def run(self):
        """Find the ground state; returns ``(E, psi_MPS)``.

        Reference: ``vumps.py:375``."""
        self.shelve = False
        self.pre_run_initialize()
        is_first_sweep = True
        while True:
            iteration_start_time = time.time()
            if self.stopping_criterion(iteration_start_time=iteration_start_time):
                break
            if not is_first_sweep:
                self.checkpoint.emit(self)
            self.run_iteration()
            self.status_update(iteration_start_time=iteration_start_time)
            is_first_sweep = False
        return self.post_run_cleanup()

    def pre_run_initialize(self):
        super().pre_run_initialize()
        self.mixer_activate()

    def run_iteration(self):
        """N_sweeps_check sweeps + statistics. Reference: ``vumps.py:193``."""
        if len(self.sweep_stats['E']) < 1:
            E_old, S_old = np.nan, np.mean(self.psi.entanglement_entropy())
        else:
            E_old = self.sweep_stats['E'][-1]
            S_old = self.sweep_stats['S'][-1]
        for _ in range(self.N_sweeps_check):
            self.sweep()
        entropies = [s if s is not None else 0. for s in self._entropy_approx]
        S = np.mean(entropies)
        E = np.mean(self.update_stats['e_L'][-self.psi.L:]
                    + self.update_stats['e_R'][-self.psi.L:])
        max_split_err = np.max(self.update_stats['split_err_L'][-self.psi.L:]
                               + self.update_stats['split_err_R'][-self.psi.L:])
        self.sweep_stats['sweep'].append(self.sweeps)
        self.sweep_stats['E'].append(E)
        self.sweep_stats['Delta_E'].append((E - E_old) / self.N_sweeps_check)
        self.sweep_stats['S'].append(S)
        self.sweep_stats['Delta_S'].append((S - S_old) / self.N_sweeps_check)
        self.sweep_stats['max_S'].append(np.max(entropies))
        self.sweep_stats['time'].append(time.time() - self.time0)
        self.sweep_stats['max_chi'].append(np.max(self.psi.chi))
        self.sweep_stats['norm_err'].append(np.linalg.norm(self.psi.norm_test()))
        self.sweep_stats['max_split_err'].append(max_split_err)
        return E, self.psi

    def status_update(self, iteration_start_time):
        logger.info(
            "VUMPS sweep %d: E=%.14f, dE=%.3e, S=%.10f, max_split_err=%.3e, "
            "norm_err=%.1e, max_chi=%d",
            self.sweeps, self.sweep_stats['E'][-1],
            self.sweep_stats['Delta_E'][-1], self.sweep_stats['S'][-1],
            self.sweep_stats['max_split_err'][-1],
            self.sweep_stats['norm_err'][-1], self.sweep_stats['max_chi'][-1])

    def is_converged(self):
        """Converged when Delta_E, Delta_S AND the split error are small.

        Reference: ``vumps.py:301``."""
        max_E_err = self.options.get('max_E_err', 1e-8, 'real')
        max_S_err = self.options.get('max_S_err', 1e-5, 'real')
        max_split_err = self.options.get('max_split_err', 1e-8, 'real')
        E = self.sweep_stats['E'][-1]
        Delta_E = self.sweep_stats['Delta_E'][-1]
        Delta_S = self.sweep_stats['Delta_S'][-1]
        split_err = self.sweep_stats['max_split_err'][-1]
        return (abs(Delta_E / max(abs(E), 1.)) < max_E_err
                and abs(Delta_S) < max_S_err and split_err < max_split_err)

    def post_run_cleanup(self):
        """Convert back to an MPS; recompute the energy from clean environments.

        Reference: ``vumps.py:333``."""
        super().post_run_cleanup()
        check_overlap = self.options.get('check_overlap', True, bool)
        norm_tol = self.options.get('norm_tol', 1e-10, 'real')
        self.psi.test_validity()
        norm_err = np.linalg.norm(self.psi.norm_test())
        E = self.sweep_stats['E'][-1] if self.sweep_stats['E'] else np.nan
        if norm_err <= norm_tol:
            try:
                self.guess_init_env_data, Es, _ = MPOTransferMatrix.find_init_LP_RP(
                    self.model.H_MPO, self.psi, calc_E=True,
                    guess_init_env_data=self.guess_init_env_data)
                E = float(np.real(np.mean(Es)))
            except Exception as e:
                logger.warning("final energy recomputation failed: %s", e)
        else:
            logger.warning("final VUMPS state not canonical: norm_err=%.2e",
                           norm_err)
        return E, self.psi.to_MPS(check_overlap=check_overlap)

    def environment_sweeps(self, N_sweeps):
        pass  # environments are regenerated at every update

    def get_sweep_schedule(self):
        """Left-to-right, never storing env updates. Reference: ``vumps.py:436``."""
        L = self.psi.L
        return zip(range(L), [True] * L, [[False, False]] * L)

    # ---------------------------------------------------------------- updates
    def prepare_update_local(self):
        """Regenerate environments from the transfer-matrix fixed point, then
        build the zero-site and n-site effective Hamiltonians.

        Reference: ``vumps.py:445``."""
        i0 = self.i0
        H = self.model.H_MPO
        psi = self.psi
        self.update_env()  # updates guess w/ gauge rotations (single-site)
        data, Es, _ = MPOTransferMatrix.find_init_LP_RP(
            H, psi, calc_E=True, guess_init_env_data=self.guess_init_env_data)
        self.env = MPOEnvironment(psi, H, psi, init_LP=data['init_LP'],
                                  init_RP=data['init_RP'])
        self.transfer_matrix_energy = Es
        self.make_eff_H()
        theta = psi.get_theta(i0, n=self.n_optimize)
        C1 = psi.get_C(i0)
        C2 = psi.get_C(i0 + self.n_optimize)
        return (theta, C1, C2)

    def make_eff_H(self):
        self.eff_H0_1 = ZeroSiteH(self.env, self.i0)
        self.eff_H0_2 = ZeroSiteH(self.env, self.i0 + self.n_optimize)
        self.eff_H = self.EffectiveH(self.env, self.i0, False, self.move_right)

    def post_update_local(self, e_L, e_R, eps_L, eps_R, e_C1, e_C2, e_theta,
                          N0_L, N0_R, N1, **update_data):
        self.update_stats['i0'].append(self.i0)
        self.update_stats['e_L'].append(e_L)
        self.update_stats['e_R'].append(e_R)
        self.update_stats['e_C1'].append(e_C1)
        self.update_stats['e_C2'].append(e_C2)
        self.update_stats['e_theta'].append(e_theta)
        self.update_stats['N_lanczos'].append([N0_L, N0_R, N1])
        self.update_stats['split_err_L'].append(eps_L)
        self.update_stats['split_err_R'].append(eps_R)
        self.update_stats['time'].append(time.time() - self.time0)

    def free_no_longer_needed_envs(self):
        pass

    # mixer_activate inherited from Sweep; a UniformMPS naturally stores the
    # bond matrices C, so no matrix-S absorption cleanup is needed
    # (reference vumps.py:371)
    def mixer_deactivate(self):
        if self.mixer is not None:
            logger.info("disable mixer after %d sweeps", self.sweeps)
        self.mixer = None

    def mixer_cleanup(self):
        pass  # see mixer_deactivate


class SingleSiteVUMPSEngine(VUMPSEngine):
    """Single-site VUMPS: fixed bond dimension, fully translation invariant.

    Reference: ``tenpy/algorithms/vumps.py:544``.
    """

    EffectiveH = OneSiteH

    def mixer_activate(self):
        # check the raw option: with no DefaultMixer the base activate would
        # silently ignore mixer=True instead of surfacing the misuse
        if self.options.get('mixer', False):   # reference vumps.py:567
            raise NotImplementedError(
                "no mixer for SingleSiteVUMPS (fixed chi); use "
                "TwoSiteVUMPSEngine to grow the bond dimension")
        super().mixer_activate()

    def update_env(self, **update_data):
        """Rotate the environment guess by the diagonal-gauge unitaries.

        Reference: ``vumps.py:570``."""
        if self.env is not None:
            L = self.psi.L
            self.guess_init_env_data = {
                'init_LP': self.env.get_LP(0, store=False),
                'init_RP': self.env.get_RP(L - 1, store=False)}
        psi = self.psi
        if psi.left_U is not None and self.guess_init_env_data is not None:
            LP = self.guess_init_env_data['init_LP']
            LP = npc.tensordot(psi.left_U.conj(), LP, axes=[['vL*'], ['vR*']])
            LP = npc.tensordot(LP, psi.left_U, axes=[['vR'], ['vL']])
            LP.iset_leg_labels(['vR*', 'wR', 'vR'])
            self.guess_init_env_data['init_LP'] = LP
        if psi.right_U is not None and self.guess_init_env_data is not None:
            RP = self.guess_init_env_data['init_RP']
            RP = npc.tensordot(psi.right_U, RP, axes=[['vR'], ['vL']])
            RP = npc.tensordot(RP, psi.right_U.conj(), axes=[['vL*'], ['vR*']])
            RP.iset_leg_labels(['vL', 'wL', 'vL*'])
            self.guess_init_env_data['init_RP'] = RP
        psi.left_U = psi.right_U = None

    def update_local(self, theta, optimize=True):
        """One-site update: 2 zero-site + 1 one-site Lanczos, then polar gauge.

        Reference: ``vumps.py:590``."""
        psi = self.psi
        i0 = self.i0
        AC, C1, C2 = theta
        lanczos_params = self.options.subconfig('lanczos_params')
        E0_1, theta0_1, N0_1 = LanczosGroundState(self.eff_H0_1, C1,
                                                  lanczos_params).run()
        theta0_1 = _align_phase(theta0_1, C1)
        if psi.L > 1:
            E0_2, theta0_2, N0_2 = LanczosGroundState(self.eff_H0_2, C2,
                                                      lanczos_params).run()
            theta0_2 = _align_phase(theta0_2, C2)
        E1, theta1, N1 = LanczosGroundState(self.eff_H, AC,
                                            lanczos_params).run()
        theta1 = _align_phase(theta1, AC)
        if psi.L == 1:
            E0_2, theta0_2, N0_2 = E0_1, theta0_1, N0_1
        theta1.ireplace_label('p0', 'p')
        psi.set_C(i0, theta0_1)
        psi.set_C(i0 + 1, theta0_2)
        psi.set_B(i0, theta1, 'AC')
        AL, AR, eps_L, eps_R, S_1, S_2 = self.polar_max(theta1, theta0_1,
                                                        theta0_2)
        psi.set_B(i0, AL, 'AL')
        psi.set_B(i0, AR, 'AR')
        self._entropy_approx[i0 % psi.L] = S_1
        self._entropy_approx[(i0 + 1) % psi.L] = S_2
        self.trunc_err_list.append(0.)
        return {'e_L': np.real(self.transfer_matrix_energy[1]),
                'e_R': np.real(self.transfer_matrix_energy[0]),
                'eps_L': eps_L, 'eps_R': eps_R,
                'e_C1': E0_1, 'e_C2': E0_2, 'e_theta': E1,
                'N0_L': N0_1, 'N0_R': N0_2, 'N1': N1}

    def polar_max(self, AC, C1, C2):
        """AL, AR with ``AL C2 = AC = C1 AR`` via polar decompositions.

        Reference: ``vumps.py:646``."""
        U_ACL, _ = npc.polar(AC.combine_legs([['vL', 'p']], qconj=[+1]))
        U_CL, _ = npc.polar(C2)
        AL = npc.tensordot(U_ACL.split_legs([0]), U_CL.conj(),
                           axes=[['vR'], ['vR*']]).ireplace_label('vL*', 'vR')
        U_ACR, _ = npc.polar(AC.combine_legs([['p', 'vR']], qconj=[-1]),
                             left=True)
        U_CR, _ = npc.polar(C1, left=True)
        AR = npc.tensordot(U_CR.conj(), U_ACR.split_legs([1]),
                           axes=[['vL*'], ['vL']]).ireplace_label('vR*', 'vL')
        eps_L = float(npc.norm(AC - npc.tensordot(AL, C2, axes=[['vR'], ['vL']])))
        eps_R = float(npc.norm(AC - npc.tensordot(C1, AR, axes=[['vR'], ['vL']])))
        s1 = np.asarray(npc.svd(C2, compute_uv=False))
        s2 = np.asarray(npc.svd(C1, compute_uv=False))
        S_left = entropy(np.sort(s2 ** 2)[::-1] / np.sum(s2 ** 2), 1)
        S_right = entropy(np.sort(s1 ** 2)[::-1] / np.sum(s1 ** 2), 1)
        return AL, AR, eps_L, eps_R, S_left, S_right


class TwoSiteVUMPSEngine(VUMPSEngine):
    """Two-site VUMPS: dynamical bond dimension via truncated SVD.

    Reference: ``tenpy/algorithms/vumps.py:691``.
    """

    EffectiveH = TwoSiteH

    DefaultMixer = DensityMatrixMixer

    def __init__(self, psi, model, options, **kwargs):
        super().__init__(psi, model, options, **kwargs)
        if not self.psi.L > 1:
            raise ValueError("two-site VUMPS needs a unit cell of L > 1")

    def mixer_activate(self):
        super().mixer_activate()
        if isinstance(self.mixer, DensityMatrixMixer) and self.psi.L <= 2:
            # the density-matrix mixer needs independent LP(i0)/RP(i0+1);
            # in a <=2-site unit cell they wrap onto the updated bond
            # (reference vumps.py:718)
            raise NotImplementedError(
                "DensityMatrixMixer needs a unit cell of L > 2 for VUMPS; "
                "use mixer='SubspaceExpansion'")

    def update_env(self, **update_data):
        self.guess_init_env_data = None  # bond dims change: cannot reuse

    def update_local(self, theta, optimize=True):
        """Two-site update. Reference: ``vumps.py:726``."""
        psi = self.psi
        i0 = self.i0
        AC, C1, C2 = theta
        lanczos_params = self.options.subconfig('lanczos_params')
        E0_1, theta0_1, N0_1 = LanczosGroundState(self.eff_H0_1, C1,
                                                  lanczos_params).run()
        theta0_1 = _align_phase(theta0_1, C1)
        E0_2, theta0_2, N0_2 = LanczosGroundState(self.eff_H0_2, C2,
                                                  lanczos_params).run()
        theta0_2 = _align_phase(theta0_2, C2)
        E2, theta2, N2 = LanczosGroundState(self.eff_H, AC,
                                            lanczos_params).run()
        theta2 = _align_phase(theta2, AC)
        theta2 = theta2.combine_legs([['vL', 'p0'], ['p1', 'vR']],
                                     qconj=[+1, -1])
        U, S, VH, err, S_a = self.mixed_svd(theta2)
        AL1 = U.split_legs([0]).ireplace_label('p0', 'p')
        AR2 = VH.split_legs([1]).ireplace_label('p1', 'p')
        AC1 = npc.tensordot(AL1, S, axes=[['vR'], ['vL']])
        AC2 = npc.tensordot(S, AR2, axes=[['vR'], ['vL']])
        psi.set_C(i0, theta0_1)
        psi.set_C(i0 + 2, theta0_2)
        psi.set_C(i0 + 1, S)
        psi.set_B(i0, AL1, 'AL')
        psi.set_B(i0 + 1, AR2, 'AR')
        psi.set_B(i0, AC1, 'AC')
        psi.set_B(i0 + 1, AC2, 'AC')
        AL2, AR1, eps_L, eps_R, S_1, S_2 = self.polar_max(AC1, AC2, theta0_1,
                                                          theta0_2)
        psi.set_B(i0, AR1, 'AR')
        psi.set_B(i0 + 1, AL2, 'AL')
        self._entropy_approx[i0 % psi.L] = S_1
        self._entropy_approx[(i0 + 1) % psi.L] = entropy(
            S_a ** 2 / np.sum(S_a ** 2), 1)
        self._entropy_approx[(i0 + 2) % psi.L] = S_2
        self.trunc_err_list.append(err.eps)
        return {'e_L': np.real(self.transfer_matrix_energy[1]),
                'e_R': np.real(self.transfer_matrix_energy[0]),
                'eps_L': eps_L, 'eps_R': eps_R,
                'e_C1': E0_1, 'e_C2': E0_2, 'e_theta': E2,
                'N0_L': N0_1, 'N0_R': N0_2, 'N1': N2}

    def mixed_svd(self, theta):
        """Truncated SVD of the two-site theta; S as an npc bond matrix.

        Without a mixer, a plain truncated SVD (S diagonal).  With a mixer,
        the bond basis is perturbed/enriched first: single-site mixers
        (SubspaceExpansion) go through
        :meth:`~tenpy_tpu.algorithms.mps_common.SubspaceExpansion.mixed_svd_2site`,
        the DensityMatrixMixer through its two-site ``perturb_svd`` (S then a
        general matrix — natural for a UniformMPS, whose bond tensors C are
        matrices anyway).  Reference: ``vumps.py:838``.
        """
        if self.mixer is None:
            U, S, VH, err, renorm = svd_theta(theta, self.trunc_params,
                                              inner_labels=['vR', 'vL'])
            S_a = np.asarray(S)
        elif self.mixer.update_sites == 1:
            U, S, VH, err, S_a = self.mixer.mixed_svd_2site(
                self, theta, self.i0)
        else:
            U, S, VH, err, S_a = self.mixer.perturb_svd(self, theta, self.i0,
                                                        True, True)
        if isinstance(S, npc.Array):
            return U, S, VH, err, np.asarray(S_a)
        S_npc = npc.diag(np.asarray(S), U.get_leg('vR').conj(),
                         labels=['vL', 'vR'])
        return U, S_npc, VH, err, np.asarray(S_a)

    def polar_max(self, AC1, AC2, C1, C3):
        """AR1 with ``C1 AR1 = AC1`` and AL2 with ``AL2 C3 = AC2``.

        Reference: ``vumps.py:789``."""
        U_ACL, _ = npc.polar(AC2.combine_legs([['vL', 'p']], qconj=[+1]))
        U_CL, _ = npc.polar(C3)
        AL2 = npc.tensordot(U_ACL.split_legs([0]), U_CL.conj(),
                            axes=[['vR'], ['vR*']]).ireplace_label('vL*', 'vR')
        U_ACR, _ = npc.polar(AC1.combine_legs([['p', 'vR']], qconj=[-1]),
                             left=True)
        U_CR, _ = npc.polar(C1, left=True)
        AR1 = npc.tensordot(U_CR.conj(), U_ACR.split_legs([1]),
                            axes=[['vL*'], ['vL']]).ireplace_label('vR*', 'vL')
        eps_L = float(npc.norm(AC2 - npc.tensordot(AL2, C3, axes=[['vR'], ['vL']])))
        eps_R = float(npc.norm(AC1 - npc.tensordot(C1, AR1, axes=[['vR'], ['vL']])))
        s1 = np.asarray(npc.svd(C3, compute_uv=False))
        s2 = np.asarray(npc.svd(C1, compute_uv=False))
        S_left = entropy(np.sort(s2 ** 2)[::-1] / np.sum(s2 ** 2), 1)
        S_right = entropy(np.sort(s1 ** 2)[::-1] / np.sum(s1 ** 2), 1)
        return AL2, AR1, eps_L, eps_R, S_left, S_right
