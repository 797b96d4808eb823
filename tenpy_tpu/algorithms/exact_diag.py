"""Exact diagonalization: build the full Hamiltonian in a charge sector.

Rebuild of ``tenpy/algorithms/exact_diag.py`` (ExactDiag :30).  Used as the correctness
oracle for the MPS algorithms (reference test strategy, SURVEY.md §4).
"""

from __future__ import annotations

import warnings

import numpy as np
import jax.numpy as jnp

from ..linalg import np_conserved as npc
from ..linalg.charges import LegPipe, LegCharge
from ..networks.mps import MPS

__all__ = ['ExactDiag', 'get_numpy_Hamiltonian', 'get_scipy_sparse_Hamiltonian']


class ExactDiag:
    """Full Hamiltonian of a finite system as a 2-leg Array (optionally charge-sector).

    Parameters
    ----------
    model : :class:`~tenpy_tpu.models.model.MPOModel`
    charge_sector : charges | None
        If given, project onto this total-charge sector.
    """

    def __init__(self, model, charge_sector=None, sparse=False, max_size=2e6):
        self.model = model
        self.chinfo = model.lat.unit_cell[0].leg.chinfo
        self.charge_sector = charge_sector
        self.max_size = max_size
        sites = model.lat.mps_sites()
        self.sites = sites
        self.L = len(sites)
        legs = [s.leg for s in sites]
        self.pipe = LegPipe(legs, qconj=+1)
        if self.pipe.ind_len > max_size:
            raise ValueError(f"system too large for ED: {self.pipe.ind_len}")
        self.full_H = None
        self.E = None
        self.V = None
        self._mask = None
        if charge_sector is not None:
            self.charge_sector = tuple(int(q) for q in
                                       self.chinfo.make_valid(charge_sector))

    @classmethod
    def from_H_mpo(cls, H_MPO, *args, **kwargs):
        """Wrap a bare MPO (no model) for ED."""
        class _FakeLat:
            def __init__(self, sites):
                self._s = sites
                self.unit_cell = [sites[0]]

            def mps_sites(self):
                return self._s

        class _FakeModel:
            pass

        m = _FakeModel()
        m.lat = _FakeLat(H_MPO.sites)
        m.H_MPO = H_MPO
        return cls(m, *args, **kwargs)

    def build_full_H_from_mpo(self):
        """Contract the MPO to the full H. Reference: ``exact_diag.py:158``."""
        H_mat = self.model.H_MPO.to_matrix()  # legs (p, p*) with p = product pipe
        self.full_H = H_mat
        self._maybe_project()
        return self.full_H

    def build_full_H_from_bonds(self):
        """Sum up H_bond terms into the full H. Reference: ``exact_diag.py`` same name."""
        from .tebd import _bond_to_full  # local helper if needed
        raise NotImplementedError("use build_full_H_from_mpo")

    def _maybe_project(self):
        if self.charge_sector is None:
            return
        leg = self.full_H.legs[0]
        qflat = leg.to_qflat() * leg.qconj
        want = np.asarray(self.charge_sector)
        mask = np.all(self.chinfo.make_valid(qflat) == want[None, :], axis=1)
        self._mask = mask
        self.full_H = self.full_H.copy(deep=False).iproject([mask, mask], [0, 1])

    def full_diagonalization(self):
        """Diagonalize the (hermitian) full H. Reference: ``exact_diag.py:215``."""
        if self.full_H is None:
            self.build_full_H_from_mpo()
        E, V = npc.eigh(self.full_H)
        self.E = np.asarray(E)
        self.V = V

    def groundstate(self, charge_sector=None):
        """(E0, V0_column) of the ground state. Reference: ``exact_diag.py:227``."""
        if self.E is None:
            self.full_diagonalization()
        i0 = int(np.argmin(self.E))
        E0 = float(self.E[i0])
        # extract column i0 of V
        Vd = np.asarray(self.V.to_ndarray())
        return E0, Vd[:, i0]

    def exp_H(self, dt):
        """expm(-i dt H) as a 2-leg Array. Reference: ``exact_diag.py:258``."""
        if self.E is None:
            self.full_diagonalization()
        phases = jnp.exp(-1j * dt * np.asarray(self.E))
        Vs = self.V.copy(deep=False).astype(jnp.complex128).iscale_axis(phases, 1)
        return npc.tensordot(Vs, self.V.conj().itranspose([1, 0]).astype(jnp.complex128),
                             axes=[[1], [0]])

    def mps_to_full(self, psi):
        """Contract an MPS to a dense vector (in the pipe basis).

        Reference: ``exact_diag.py:264``."""
        theta = psi.get_theta(0, psi.L)
        theta = theta.squeeze(['vL' if False else theta.get_leg_index('vL')]) \
            if False else theta
        # remove trivial vL/vR legs
        labels = [f'p{i}' for i in range(psi.L)]
        theta = theta.combine_legs([labels], pipes=[self.pipe])
        # squeeze vL, vR
        out = theta
        for lab in ['vL', 'vR']:
            idx = out.get_leg_index(lab)
            if out.legs[idx].ind_len == 1:
                out = out.squeeze([idx])
        vec = np.asarray(out.to_ndarray()).reshape(-1)
        if self._mask is not None:
            vec = vec[self._mask]
        return vec * psi.norm

    def full_to_mps(self, psi_vec, canonical_form='B'):
        """Dense vector -> exact MPS. Reference: ``exact_diag.py:288``."""
        full = np.asarray(psi_vec)
        if self._mask is not None:
            tmp = np.zeros(self.pipe.ind_len, dtype=full.dtype)
            tmp[self._mask] = full
            full = tmp
        qtotal = self.charge_sector
        arr = npc.Array.from_ndarray(np.asarray(full), [self.pipe.to_LegCharge()],
                                     qtotal=qtotal, warn_wrong_sector=True)
        arr.legs = (self.pipe,)
        psi_full = arr.split_legs([0])
        return MPS.from_full(self.sites, psi_full)

    def matvec(self, psi_vec):
        if self.full_H is None:
            self.build_full_H_from_mpo()
        dense = np.asarray(self.full_H.to_ndarray())
        return dense @ np.asarray(psi_vec)


def get_numpy_Hamiltonian(model):
    """Dense numpy matrix of a finite model's H (full Hilbert space)."""
    ed = ExactDiag(model)
    ed.build_full_H_from_mpo()
    return np.asarray(ed.full_H.to_ndarray())


def get_scipy_sparse_Hamiltonian(model):
    import scipy.sparse
    return scipy.sparse.csr_matrix(get_numpy_Hamiltonian(model))
