r"""Device-resident TEBD on the bucket-packed layout.

The TEBD hot loop to beat is the reference's ``update_bond``
(``tenpy/algorithms/tebd.py:416``): theta = U.(S.B.B), SVD-truncate,
inverse-free ``B_L = C V^H``.  Here one bond update is ONE jitted XLA
program over the packed layout —

    C      = U . (B_i . B_{i+1})          (packed tensordots; no left S)
    theta  = S_i . C                      (bond scale: the SVD input)
    A,S',B = split_truncate(theta)        (batched device decomposition)
    B_L    = (C . B'^H) / renorm          (inverse-free left tensor)

— with the sweep state (B tensors, bond S vectors) resident in device
memory, exactly like :class:`~tenpy_tpu.algorithms.packed_dmrg.DeviceSweepEngine`
for DMRG.  Shapes are static per bond thanks to the shared fixed-capacity
bond layouts (:func:`~tenpy_tpu.algorithms.packed_dmrg.capacity_bond_layouts`);
per update the host receives nothing (truncation errors accumulate on device
and are fetched once per :meth:`evolve`).

Real-time evolution uses complex bond gates — carried by the split re/im
channel storage of :class:`~tenpy_tpu.linalg.packed.PackedArray` (TPU has no
complex128).  Trotter orders 1/2/4 via the same Suzuki-Trotter tables as the
host engine (reference ``tebd.py:183``).
"""

from __future__ import annotations

import logging
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..linalg import packed as pk
from ..linalg import packed_split as ps
from ..linalg.charges import QTYPE
from ..linalg.padding import embed_array
from ..linalg.truncation import TruncationError
from .tebd import TEBDEngine
from .packed_dmrg import capacity_bond_layouts, pack_bond_S

logger = logging.getLogger(__name__)

__all__ = ['DeviceTEBDEngine']


class DeviceTEBDEngine:
    """Device-resident TEBD starting from a (host-prepared) MPS.

    Parameters
    ----------
    psi : MPS
        Finite or infinite MPS in canonical (B) form.  Updated in place by
        :meth:`write_back` (called from :meth:`run`).
    model : NearestNeighborModel
        Provides ``H_bond``.
    options : dict
        dt : float — time step (default 0.1).
        N_steps : int — Trotter steps per :meth:`run` (default 5).
        order : int — Trotter order 1/2/4 (default 2).
        type_evo : 'real' | 'imag' (default 'real').
        chi_max, svd_min, backend, multiple, cap_factor, total_cap_factor :
            as for :class:`~tenpy_tpu.algorithms.packed_dmrg.DeviceSweepEngine`.
    """

    def __init__(self, psi, model, options):
        self.psi = psi
        self.model = model
        opts = dict(options)
        self.chi_max = int(opts.get('chi_max', max(psi.chi)))
        self.svd_min = float(opts.get('svd_min', 1e-10))
        self.dt = float(opts.get('dt', 0.1))
        self.N_steps = int(opts.get('N_steps', 5))
        self.order = int(opts.get('order', 2))
        self.type_evo = opts.get('type_evo', 'real')
        self.backend = opts.get('backend', None)
        self.multiple = int(opts.get('multiple', 64))
        self.cap_factor = float(opts.get('cap_factor', 1.2))
        self.total_cap_factor = float(opts.get('total_cap_factor', 1.5))
        self.finite = psi.bc == 'finite'
        self.L = psi.L
        if self.L < 2:
            raise ValueError("DeviceTEBDEngine needs L >= 2")
        self.n_bonds = self.L + 1 if self.finite else self.L
        self.evolved_time = 0.
        self.trunc_err = TruncationError()
        self._jit_cache = {}
        self._plan_cache = {}
        pk.start_transfer_keepalive()   # no-op on CPU
        self._setup()

    # ----------------------------------------------------------- setup
    def _bond(self, i):
        return self.bond[i if self.finite else i % self.L]

    def _setup(self):
        psi, L = self.psi, self.L
        psi.real_if_close()
        self.bond, _ = capacity_bond_layouts(
            psi, self.chi_max, self.multiple, self.cap_factor,
            self.total_cap_factor, self.finite)
        complex_evo = self.type_evo == 'real'
        self.Bp = []
        self.qtotal_site = []
        for i in range(L):
            B = psi.get_B(i, 'B').transpose(['vL', 'p', 'vR'])
            if complex_evo and not np.issubdtype(np.dtype(str(B.dtype)),
                                                 np.complexfloating):
                B = B.astype(np.complex128)
            self.qtotal_site.append(
                tuple(int(x) for x in np.asarray(B.qtotal, QTYPE).ravel()))
            padded = embed_array(B, {'vL': self._bond(i),
                                     'vR': self._bond(i + 1).conj()})
            self.Bp.append(pk.pack(padded, pad=False))
        self.Sp = [pack_bond_S(psi, i, self._bond(i), self.finite)
                   for i in range(self.n_bonds)]
        self._calc_U()

    def _calc_U(self):
        """Bond gates for every Trotter substep, packed (host eigh + pack)."""
        # host-side exp(-i dt H_bond) via blockwise eigendecomposition —
        # reuses the host engine's routine (pure function of its arguments;
        # reference tebd.py:585)
        def calc(h, dt, type_evo, E_offset):
            return TEBDEngine._calc_U_bond(None, h, dt, type_evo, E_offset)
        self.Up = []
        for dt_frac in TEBDEngine.suzuki_trotter_time_steps(self.order):
            row = [None] * self.L
            for i, h in enumerate(self.model.H_bond):
                if h is None:
                    continue
                U = calc(h, dt_frac * self.dt, self.type_evo, None)
                U.itranspose(['p0', 'p1', 'p0*', 'p1*'])
                row[i] = pk.pack(U, pad=False)
            self.Up.append(row)

    # ----------------------------------------------------------- bond update
    def _get_step(self, key, plan):
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        chi, smin, backend = self.chi_max, self.svd_min, self.backend

        def step(B0, B1, S_left, U):
            C = pk.tensordot(B0.replace_labels(['p'], ['p0']),
                             B1.replace_labels(['p'], ['p1']),
                             axes=(['vR'], ['vL']))
            C = pk.tensordot(U, C, axes=(['p0*', 'p1*'], ['p0', 'p1']))
            C = C.transpose(['vL', 'p0', 'p1', 'vR'])
            theta = ps.scale_bond(C, S_left, ps.scale_bond_plan(C, 'vL'))
            A, S, Bn, err, renorm, n_kept = ps.split_truncate(
                theta, plan, chi, smin, backend)
            BL = pk.tensordot(C, Bn.conj(), axes=(['p1', 'vR'],
                                                  ['p*', 'vR*']))
            BL = BL.replace_labels(['p0', 'vL*'], ['p', 'vR'])
            BL = BL.transpose(['vL', 'p', 'vR'])
            inv = jnp.where(renorm > 0., 1. / jnp.where(renorm > 0., renorm,
                                                        1.), 0.)
            BL = BL * inv
            return BL, S, Bn, err, renorm

        fn = jax.jit(step)
        self._jit_cache[key] = fn
        return fn

    def update_bond(self, i, Up):
        """Update bond ``i`` (sites i-1, i) with the packed gate ``Up``.

        Follows the reference bond-update convention
        (``tenpy/algorithms/tebd.py:416``): returns device scalars
        ``(err, renorm)`` without synchronizing.
        """
        L = self.L
        i0, i1 = (i - 1) % L, i % L
        B0, B1 = self.Bp[i0], self.Bp[i1]
        S_left = self.Sp[(i - 1) % self.n_bonds if not self.finite else i - 1]
        mid = i % self.n_bonds if not self.finite else i
        # plan on the theta structure C = B0.B1 (U preserves p legs/qtotal 0)
        pkey = (B0.struct_sig(), B1.struct_sig(), Up.struct_sig(), mid)
        plan = self._plan_cache.get(pkey)
        if plan is None:
            struct = self._theta_struct(B0, B1, Up)
            plan = ps.split_plan(struct, self._bond(i), self.qtotal_site[i0])
            self._plan_cache[pkey] = plan
        step = self._get_step((id(plan), B0.struct_sig(), B1.struct_sig(),
                               Up.struct_sig()), plan)
        BL, S, Bn, err, renorm = step(B0, B1, S_left, Up)
        self.Bp[i0] = BL
        self.Bp[i1] = Bn
        self.Sp[mid] = S
        return err, renorm

    def _theta_struct(self, B0, B1, Up):
        """Structure-only packed theta of ``U . (B0 . B1)``."""
        chinfo = B0.legs[0].chinfo
        out_legs = (B0.legs[0], B0.legs[1], B1.legs[1], B1.legs[2])
        qtotal = tuple(int(x) for x in chinfo.make_valid(
            np.asarray(B0.qtotal, QTYPE) + np.asarray(B1.qtotal, QTYPE)
            + np.asarray(Up.qtotal, QTYPE)))
        shapes, qdatas = pk.complete_structure(out_legs, qtotal)
        dtype = jnp.result_type(B0.dtype, B1.dtype, Up.dtype)
        return pk.PackedArray(out_legs, qtotal, ('vL', 'p0', 'p1', 'vR'),
                              shapes, qdatas, [None] * len(shapes), dtype)

    # ----------------------------------------------------------- evolution
    def evolve_step(self, U_idx, odd):
        """Apply the U[U_idx] gates to all odd/even bonds (one brickwall
        layer).  Returns the bonds' device (err, renorm) scalars."""
        Us = self.Up[U_idx]
        bonds = range(1, self.L) if self.finite else range(0, self.L)
        out = []
        for i in bonds:
            if i % 2 == (1 if odd else 0):
                U = Us[i % self.L]
                if U is None:
                    continue
                out.append(self.update_bond(i, U))
        return out

    def evolve(self, N_steps=None, dt=None):
        """Trotter-evolve by ``N_steps * dt``; fetch the accumulated
        truncation error once at the end (single device sync)."""
        if N_steps is None:
            N_steps = self.N_steps
        if dt is not None and dt != self.dt:
            self.dt = float(dt)
            self._calc_U()
        scalars = []
        for U_idx, odd in TEBDEngine.suzuki_trotter_decomposition(self.order,
                                                                  N_steps):
            scalars.extend(self.evolve_step(U_idx, odd))
        with pk.transfer_guard():
            host = jax.device_get([list(x) for x in scalars])
        err = TruncationError()
        for e, r in host:
            err = err + TruncationError(float(e), 1. - 2. * float(e))
        self.evolved_time += N_steps * self.dt
        self.trunc_err = self.trunc_err + err
        return err

    def run(self):
        t0 = time.time()
        err = self.evolve(self.N_steps)
        logger.info("device TEBD: %d steps dt=%s in %.2fs (trunc_err %.2e)",
                    self.N_steps, self.dt, time.time() - t0, err.eps)
        self.write_back()
        return err

    # ----------------------------------------------------------- write-back
    def write_back(self):
        """Unpack the device state into ``self.psi`` (prunes zero-S)."""
        psi, L = self.psi, self.L
        with pk.transfer_guard():
            Ss = [np.asarray(jax.device_get(s)) for s in self.Sp]
        keeps = []
        for S in Ss:
            keep = S > 0.
            if not keep.any():
                keep = np.zeros(len(S), bool)
                keep[0] = True
            keeps.append(keep)

        def keepL(i):
            return keeps[i if self.finite else i % L]

        for i in range(L):
            T = pk.unpack(self.Bp[i])
            T = T.iproject(keepL(i), T.get_leg_index('vL'))
            T = T.iproject(keepL(i + 1), T.get_leg_index('vR'))
            psi.set_B(i, T, form='B')
        for i in range(self.n_bonds):
            if self.finite and i == self.n_bonds - 1:
                psi.set_SR(L - 1, Ss[i][keeps[i]])
            else:
                psi.set_SL(i % L, Ss[i][keeps[i]])
        psi.real_if_close()
