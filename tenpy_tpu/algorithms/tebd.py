r"""Time-Evolving Block Decimation: Trotterized bond-gate evolution.

Rebuild of ``tenpy/algorithms/tebd.py`` (TEBDEngine :60, Suzuki-Trotter tables :183,
calc_U :297, evolve :346, update_bond :416 with the inverse-free ``B_L = C V^dag``
update, run_GS :113, RandomUnitaryEvolution :787, TimeDependentTEBD :927).

Conventions: ``U_bond[i]`` acts on sites ``(i-1, i)`` (like ``H_bond[i]``); bonds are
updated in even/odd checkerboard layers.  Every bond update is a jit-compatible
contraction + truncated SVD; within one layer all updates are independent (the
real-space parallel axis exploited by :mod:`tenpy_tpu.parallel.dense_tebd`).
"""

from __future__ import annotations

import logging

import numpy as np

from .algorithm import TimeEvolutionAlgorithm, TimeDependentHAlgorithm
from ..linalg import np_conserved as npc
from ..linalg.truncation import TruncationError, svd_theta
from ..tools.params import asConfig

logger = logging.getLogger(__name__)

__all__ = ['TEBDEngine', 'QRBasedTEBDEngine', 'RandomUnitaryEvolution',
           'TimeDependentTEBD']


class TEBDEngine(TimeEvolutionAlgorithm):
    """TEBD engine for real/imaginary time evolution of (finite or infinite) MPS.

    Options: ``dt``, ``N_steps``, ``order`` (2), ``trunc_params``, ``start_time``,
    ``start_trunc_err``.  Reference: ``tenpy/algorithms/tebd.py:60``.
    """

    def __init__(self, psi, model, options, **kwargs):
        super().__init__(psi, model, options, **kwargs)
        self.trunc_err = self.options.get('start_trunc_err', TruncationError())
        self._U = None
        self._U_param = {}
        self._trunc_err_bonds = [TruncationError() for _ in range(psi.L + 1)]

    @property
    def TEBD_params(self):
        return self.options

    @property
    def trunc_err_bonds(self):
        return self._trunc_err_bonds[self.psi.nontrivial_bonds]

    @staticmethod
    def suzuki_trotter_time_steps(order):
        """Subtime-step prefactors for the given Trotter order.

        Reference: ``tebd.py:183``."""
        if order == 1:
            return [1.]
        elif order == 2:
            return [0.5, 1.]
        elif order == 4:
            t1 = 1. / (4. - 4. ** (1 / 3.))
            t3 = 1. - 4. * t1
            return [t1 / 2., t1, (t1 + t3) / 2., t3]
        elif order == '4_opt':
            # optimized 4th order (Barthel/Zhang 11-term decomposition constants)
            a1 = 0.095848502741203681182
            b1 = 0.42652466131587616168
            a2 = -0.078111158921637922695
            b2 = -0.12039526945509726545
            return [a1, b1, a2, b2, 0.5 - a1 - a2, 1. - 2. * (b1 + b2)]
        raise ValueError(f"unknown order {order!r}")

    @staticmethod
    def suzuki_trotter_decomposition(order, N_steps):
        """Sequence of ``(time-step-index, odd)``; odd=1 for odd bonds (starting at 1).

        Reference: ``tebd.py:219``."""
        even, odd = 0, 1
        if N_steps == 0:
            return []
        if order == 1:
            a = (0, odd)
            b = (0, even)
            return [a, b] * N_steps
        elif order == 2:
            a = (0, odd)   # dt/2
            a2 = (1, odd)  # dt
            b = (1, even)  # dt
            # U = [a b a]*N  with merged adjacent a,a -> a2
            return [a, b] + [a2, b] * (N_steps - 1) + [a]
        elif order == 4:
            a = (0, odd)
            a2 = (1, odd)
            b = (1, even)
            c = (2, odd)
            d = (3, even)
            steps = [a, b, a2, b, c, d, c, b, a2, b]
            return steps + ([a2] + steps[1:]) * (N_steps - 1) + [a]
        elif order == '4_opt':
            steps = [(0, odd), (1, even), (2, odd), (3, even), (4, odd),
                     (5, even), (4, odd), (3, even), (2, odd), (1, even),
                     (0, odd)]
            return steps * N_steps
        raise ValueError(f"unknown order {order!r}")

    # ---------------------------------------------------------------- U construction
    def calc_U(self, order, delta_t, type_evo='real', E_offset=None):
        """Build the bond unitaries ``self._U[k][i]`` for each Trotter substep.

        Reference: ``tebd.py:297``."""
        U_param = dict(order=order, delta_t=delta_t, type_evo=type_evo,
                       E_offset=E_offset)
        if self._U_param == U_param:
            return
        self._U_param = U_param
        L = self.psi.L
        self._U = []
        for dt_frac in self.suzuki_trotter_time_steps(order):
            U_bond = [None] * (L + 1)
            for i, h in enumerate(self.model.H_bond):
                if h is None:
                    continue
                U_bond[i] = self._calc_U_bond(h, dt_frac * delta_t, type_evo,
                                              E_offset)
            self._U.append(U_bond)

    def _calc_U_bond(self, H_bond, dt, type_evo, E_offset):
        """exp(-i/-1 * dt * H_bond) via blockwise eigendecomposition.

        Reference: ``tebd.py:585``."""
        H = H_bond.combine_legs([['p0', 'p1'], ['p0*', 'p1*']], qconj=[+1, -1])
        W, V = npc.eigh(H)
        W = np.asarray(W)
        if type_evo == 'imag':
            diag = np.exp(-dt * W)
        elif type_evo == 'real':
            if E_offset is not None:
                W = W + E_offset
            diag = np.exp(-1j * dt * W)
        else:
            raise ValueError(f"unknown type_evo {type_evo!r}")
        U = V.copy(deep=False)
        if np.iscomplexobj(diag):
            U = U.astype(np.complex128)
        U = U.iscale_axis(diag, 1)
        U = npc.tensordot(U, V.conj().itranspose([1, 0]), axes=[[1], [0]])
        U.iset_leg_labels(['(p0.p1)', '(p0*.p1*)'])
        U = U.split_legs()
        return U

    # ---------------------------------------------------------------- evolution
    def prepare_evolve(self, dt):
        order = self.options.get('order', 2)
        self.calc_U(order, dt, type_evo='real', E_offset=None)

    def evolve(self, N_steps, dt):
        """Evolve by N_steps * dt using the precomputed U. Reference: ``tebd.py:346``."""
        trunc_err = TruncationError()
        order = self._U_param['order']
        for U_idx, odd in self.suzuki_trotter_decomposition(order, N_steps):
            trunc_err += self.evolve_step(U_idx, odd)
        self.evolved_time = self.evolved_time + N_steps * self._U_param['delta_t']
        self.trunc_err = self.trunc_err + trunc_err
        return trunc_err

    def evolve_step(self, U_idx_dt, odd):
        """Apply ``U[U_idx_dt]`` to all even/odd bonds. Reference: ``tebd.py:374``."""
        Us = self._U[U_idx_dt]
        trunc_err = TruncationError()
        psi = self.psi
        L = psi.L
        if psi.finite:
            bonds = range(1, L)
        else:
            bonds = range(0, L)
        for i in bonds:
            if i % 2 == (1 if odd else 0):
                U = Us[i % L] if not psi.finite else Us[i]
                if U is None:
                    continue
                trunc_err += self.update_bond(i, U)
        return trunc_err

    def update_bond(self, i, U_bond):
        """Update bond i (sites i-1, i): theta -> U theta, SVD, inverse-free B_L.

        Reference: ``tenpy/algorithms/tebd.py:416``."""
        psi = self.psi
        i0 = i - 1
        theta = psi.get_theta(i0, 2)
        C = psi.get_theta(i0, 2, formL=0.)  # without S_L: for the inverse-free trick
        theta = npc.tensordot(U_bond, theta, axes=[['p0*', 'p1*'], ['p0', 'p1']])
        C = npc.tensordot(U_bond, C, axes=[['p0*', 'p1*'], ['p0', 'p1']])
        theta.itranspose(['vL', 'p0', 'p1', 'vR'])
        C.itranspose(['vL', 'p0', 'p1', 'vR'])
        theta = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
        U, S, VH, err, renorm = svd_theta(theta, self.trunc_params,
                                          inner_labels=['vR', 'vL'])
        B_R = VH.split_legs([1]).ireplace_label('p1', 'p')
        # B_L = C VH^dag / renorm:  S_L^{-1}-free left tensor in B form
        B_L = npc.tensordot(C.combine_legs([['p1', 'vR']], qconj=[-1]), VH.conj(),
                            axes=[['(p1.vR)'], ['(p1*.vR*)']])
        B_L.ireplace_labels(['p0', 'vL*'], ['p', 'vR'])
        B_L.itranspose(['vL', 'p', 'vR'])
        B_L = B_L / renorm
        psi.set_SR(i0, S)
        psi.set_B(i0, B_L, form='B')
        psi.set_B(i0 + 1, B_R, form='B')
        self._trunc_err_bonds[i % (psi.L + 1)] = \
            self._trunc_err_bonds[i % (psi.L + 1)] + err
        return err

    def update_bond_imag(self, i, U_bond):
        """Update bond i with a non-unitary gate, KEEPING canonical form.

        After a non-unitary gate the state's old singular values are stale; the
        inverse-free reconstruction of :meth:`update_bond` then degrades
        imaginary-time evolution to first order in dt.  Here we store the SVD's
        A/S/B directly (valid since :meth:`update_imag` sweeps sequentially).
        Reference: ``tenpy/algorithms/tebd.py:545``.
        """
        psi = self.psi
        i0 = i - 1
        theta = psi.get_theta(i0, 2)
        theta = npc.tensordot(U_bond, theta, axes=[['p0*', 'p1*'], ['p0', 'p1']])
        theta.itranspose(['vL', 'p0', 'p1', 'vR'])
        theta = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
        U, S, VH, err, renorm = svd_theta(theta, self.trunc_params,
                                          inner_labels=['vR', 'vL'])
        psi.norm *= renorm
        B_R = VH.split_legs([1]).ireplace_label('p1', 'p')
        A_L = U.split_legs([0]).ireplace_label('p0', 'p')
        psi.set_SR(i0, S)
        psi.set_B(i0, A_L, form='A')
        psi.set_B(i0 + 1, B_R, form='B')
        self._trunc_err_bonds[i % (psi.L + 1)] = \
            self._trunc_err_bonds[i % (psi.L + 1)] + err
        return err

    def update_imag(self, N_steps):
        """Second-order imaginary-time evolution: dt/2 right-sweep + dt/2
        left-sweep per step with canonical-form-preserving bond updates.

        Requires order=2, finite bc.  Reference: ``tenpy/algorithms/tebd.py:497``.
        """
        if self._U_param['order'] != 2 or not self.psi.finite:
            raise NotImplementedError("update_imag needs order=2 + finite bc")
        assert self.suzuki_trotter_time_steps(2)[0] == 0.5
        Us = self._U[0]  # the dt/2 gates
        trunc_err = TruncationError()
        L = self.psi.L
        for _ in range(N_steps):
            for i_bond in range(L):
                if Us[i_bond] is None:
                    continue
                trunc_err += self.update_bond_imag(i_bond, Us[i_bond])
            for i_bond in range(L - 1, -1, -1):
                if Us[i_bond] is None:
                    continue
                trunc_err += self.update_bond_imag(i_bond, Us[i_bond])
        self.evolved_time = self.evolved_time + N_steps * self._U_param['delta_t']
        self.trunc_err = self.trunc_err + trunc_err
        self.psi.canonical_form_finite(renormalize=True)
        return trunc_err

    # ---------------------------------------------------------------- ground state
    def run_GS(self):
        """Imaginary-time TEBD ground-state search with a dt-ramp.

        Options: ``delta_tau_list`` (default ramp 0.1 -> 1e-6), ``N_steps``,
        ``max_error_E``.  Reference: ``tebd.py:113``."""
        opts = self.options
        delta_tau_list = opts.get(
            'delta_tau_list',
            [0.1, 0.01, 0.001, 1e-4, 1e-5, 1e-6])
        max_error_E = opts.get('max_error_E', 1e-13, 'real')
        N_steps = opts.get('N_steps', 10, int)
        order = opts.get('order', 2)
        for delta_tau in delta_tau_list:
            self.calc_U(order, delta_tau, type_evo='imag')
            E_old = np.mean(self.bond_energies())
            use_imag = self.psi.finite and order == 2
            while True:
                if use_imag:
                    self.update_imag(N_steps)
                else:
                    self.evolve(N_steps, delta_tau)
                E = np.mean(self.bond_energies())
                dE = abs(E - E_old)
                E_old = E
                logger.info("TEBD-GS: delta_tau=%.1e, E_bond=%.14f, dE=%.2e",
                            delta_tau, E, dE)
                if dE < max_error_E:
                    break
        return

    def bond_energies(self):
        """<psi|H_bond|psi> per bond (for convergence checks)."""
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
            val = npc.tensordot(theta.conj(), h_th,
                                axes=[['vL*', 'p0*', 'p1*', 'vR*'],
                                      ['vL', 'p0', 'p1', 'vR']])
            E.append(float(np.real(complex(val))))
        return np.array(E)


class QRBasedTEBDEngine(TEBDEngine):
    """TEBD with QR-based truncation instead of full SVD (arXiv:2212.09782).

    Cheaper for large chi: QR + small SVD on the reduced matrix.
    Reference: ``tenpy/algorithms/tebd.py:622``.
    """

    def update_bond(self, i, U_bond):
        psi = self.psi
        i0 = i - 1
        theta = psi.get_theta(i0, 2)
        C = psi.get_theta(i0, 2, formL=0.)
        theta = npc.tensordot(U_bond, theta, axes=[['p0*', 'p1*'], ['p0', 'p1']])
        C = npc.tensordot(U_bond, C, axes=[['p0*', 'p1*'], ['p0', 'p1']])
        theta.itranspose(['vL', 'p0', 'p1', 'vR'])
        C.itranspose(['vL', 'p0', 'p1', 'vR'])
        theta_c = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
        # QR of theta then SVD of the small R
        Q, R = npc.qr(theta_c, inner_labels=['vR', 'vL'])
        U, S, VH, err, renorm = svd_theta(R, self.trunc_params,
                                          inner_labels=['vR', 'vL'])
        VH_full = VH  # acts on (p1.vR)
        B_R = VH_full.split_legs([1]).ireplace_label('p1', 'p')
        B_L = npc.tensordot(C.combine_legs([['p1', 'vR']], qconj=[-1]), VH_full.conj(),
                            axes=[['(p1.vR)'], ['(p1*.vR*)']])
        B_L.ireplace_labels(['p0', 'vL*'], ['p', 'vR'])
        B_L.itranspose(['vL', 'p', 'vR'])
        B_L = B_L / renorm
        psi.set_SR(i0, S)
        psi.set_B(i0, B_L, form='B')
        psi.set_B(i0 + 1, B_R, form='B')
        return err


class RandomUnitaryEvolution(TEBDEngine):
    """Apply random two-site unitaries (e.g. to grow chi of a product state).

    Options: ``N_steps``, ``trunc_params``, ``close_1`` (identity-close unitaries).
    Reference: ``tenpy/algorithms/tebd.py:787``.
    """

    def __init__(self, psi, options, **kwargs):
        TimeEvolutionAlgorithm.__init__(self, psi, None, options, **kwargs)
        self.trunc_err = TruncationError()
        self._U = None
        self._U_param = {}
        self._trunc_err_bonds = [TruncationError() for _ in range(psi.L + 1)]

    def run(self):
        N_steps = self.options.get('N_steps', 1, int)
        trunc_err = self.evolve(N_steps, 0.)
        return trunc_err

    def prepare_evolve(self, dt):
        self.calc_random_U()

    def evolve(self, N_steps, dt):
        trunc_err = TruncationError()
        for _ in range(N_steps):
            self.calc_random_U()
            trunc_err += self.evolve_step(0, odd=1)
            trunc_err += self.evolve_step(0, odd=0)
        self.trunc_err = self.trunc_err + trunc_err
        return trunc_err

    def calc_random_U(self):
        """Random charge-conserving two-site unitaries on every bond."""
        from ..linalg.random_matrix import GUE, U_close_1
        from ..linalg.charges import LegPipe
        seed = self.options.silent_get('seed', None)
        rng = np.random.default_rng(seed) if seed is not None else \
            getattr(self, '_rng', None) or np.random.default_rng()
        self._rng = rng
        close_1 = self.options.get('close_1', False)
        psi = self.psi
        L = psi.L
        U_bond = [None] * (L + 1)
        for i in range(1, L + 1 if not psi.finite else L):
            s0 = psi.get_site(i - 1)
            s1 = psi.get_site(i % L)
            pipe = LegPipe([s0.leg, s1.leg], qconj=+1)
            leg = pipe.to_LegCharge()
            func = (lambda size: U_close_1(size, a=0.1, rng=rng)) if close_1 \
                else (lambda size: GUE(size, rng))
            H2 = npc.Array.from_func(func, [leg, leg.conj()],
                                     dtype=np.complex128, shape_kw='size')
            if not close_1:
                H2 = (H2 + H2.conj().itranspose([1, 0])) * 0.5
                U2 = npc.expm(H2 * 1j)
            else:
                U2 = H2  # already unitary-close-to-1 per block
            U2.legs = (pipe, pipe.conj())
            U2 = U2.split_legs()
            U2.iset_leg_labels(['p0', 'p1', 'p0*', 'p1*'])
            U_bond[i % (L + 1) if psi.finite else i % L] = U2
        self._U = [U_bond]
        self._U_param = {'order': 1, 'delta_t': 0., 'type_evo': 'random'}

    def evolve_step(self, U_idx_dt, odd):
        # same checkerboard application as TEBD
        return TEBDEngine.evolve_step(self, U_idx_dt, odd)


class TimeDependentTEBD(TimeDependentHAlgorithm, TEBDEngine):
    """TEBD with a time-dependent Hamiltonian H(t). Reference: ``tebd.py:927``."""

    def reinit_model(self):
        TimeDependentHAlgorithm.reinit_model(self)
        self._U_param = {}  # force recomputation of U with the new H_bond
