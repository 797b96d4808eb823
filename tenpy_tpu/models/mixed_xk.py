r"""Mixed real- and momentum-space representation for cylinder DMRG.

Rebuild of ``tenpy/models/mixed_xk.py`` (MixedXKLattice :81, MixedXKModel :340,
SpinlessMixedXKSquare :724, HubbardMixedXKSquare :780); method of motruk2016.

Infinite cylinders are kept in real space along the axis but Fourier
transformed around the circumference:

.. math ::
    c^\dagger_{x,k,l} = \frac{1}{\sqrt{L_y}} \sum_y e^{-2\pi i k y / L_y}
                        c^\dagger_{x,y,l}

One cylinder "ring" becomes the unit cell of a 1D lattice whose ``Ly * N_orb``
sites carry distinct ``ky`` charges, so y-momentum is conserved exactly by the
charge bookkeeping and the MPO bond dimension drops substantially.
"""

from __future__ import annotations

import numpy as np

from ..linalg.charges import ChargeInfo, LegCharge
from ..networks.site import FermionSite
from ..tools.misc import to_array
from .lattice import Lattice
from .model import CouplingMPOModel

__all__ = ['MixedXKLattice', 'MixedXKModel', 'SpinlessMixedXKSquare',
           'HubbardMixedXKSquare']


class MixedXKLattice(Lattice):
    r"""Cylinder lattice with momentum space around the circumference.

    Unit-cell index ``u = k * N_orb + l`` combines the y-momentum ``k`` and the
    orbital ``l``; rings repeat along the cylinder axis.
    Reference: ``tenpy/models/mixed_xk.py:81``.
    """

    def __init__(self, N_rings, Ly, N_orb, sites, ring_order=None,
                 orbital_names=None, orbital_values=None, **kwargs):
        self.N_orb = N_orb
        self.Ly = Ly
        self.N_rings = N_rings
        self._init_extra_attributes(Ly)
        N_sites_per_ring_ = Ly * N_orb
        if ring_order is None:
            self.ring_order = np.arange(N_sites_per_ring_, dtype=np.intp)
        else:
            self.ring_order = np.asarray(ring_order, dtype=np.intp)
        kwargs.setdefault('bc', 'periodic')
        kwargs.setdefault('bc_MPS', 'infinite')
        if 'order' in kwargs:
            raise NotImplementedError("use ring_order to change the order")
        super().__init__([N_rings], sites, **kwargs)
        order = np.zeros((self.N_sites, 2), np.intp)
        for x in range(N_rings):
            order[x * N_sites_per_ring_:(x + 1) * N_sites_per_ring_, 0] = x
            order[x * N_sites_per_ring_:(x + 1) * N_sites_per_ring_, 1] = \
                self.ring_order
        self.order = order
        self.orbital_names = orbital_names
        self.orbital_values = orbital_values

    def _init_extra_attributes(self, Ly):
        # delta_q[q][k1, k2] = delta_{(k1+q) mod Ly, k2}
        delta_q = np.zeros((Ly, Ly, Ly))
        for q in range(Ly):
            for k1 in range(Ly):
                delta_q[q, k1, (k1 + q) % Ly] = 1.
        self.delta_q = delta_q

    @classmethod
    def from_charges_of_orbitals(cls, N_rings, Ly, N_orb, chinfo, charges,
                                 conserve_k=True, ring_order=None, **kwargs):
        """Build the lattice with per-(k, l) FermionSites carrying the given
        orbital charges plus (optionally) the ``ky`` momentum charge.

        Reference: ``mixed_xk.py:172``."""
        charges = np.asarray(charges, int)
        assert charges.shape[0] == N_orb
        if conserve_k:
            chinfo_k = ChargeInfo([Ly], ['ky'])
            chinfo = ChargeInfo.add([chinfo, chinfo_k])
        unit_cell = [None] * (Ly * N_orb)
        for l in range(N_orb):
            for k in range(Ly):
                qflat = np.zeros((2, chinfo.qnumber), int)
                if conserve_k:
                    qflat[1, :-1] = charges[l]
                    qflat[1, -1] = k
                else:
                    qflat[1, :] = charges[l]
                leg_unsorted = LegCharge.from_qflat(chinfo, qflat, qconj=+1)
                perm_flat, leg = leg_unsorted.sort(bunch=False)
                site = FermionSite(conserve=None)
                site.change_charge(leg, np.asarray(perm_flat))
                unit_cell[k * N_orb + l] = site
        return cls(N_rings, Ly, N_orb, unit_cell, ring_order=ring_order,
                   **kwargs)

    # ------------------------------------------------------------- index maps
    def get_u(self, k, l):
        return k * self.N_orb + l

    def get_k(self, u):
        return u // self.N_orb

    def get_l(self, u):
        return u % self.N_orb

    def get_exp_ik(self, k):
        """exp(2 pi i k / Ly) (element-wise)."""
        return np.exp(2.j * np.pi * np.asarray(k) / self.Ly)


class MixedXKModel(CouplingMPOModel):
    """Base class for Hamiltonians in the mixed x-k basis.

    Options: ``Lx`` (number of rings), ``Ly``, ``ring_order``, ``conserve_k``,
    ``bc_MPS``.  Reference: ``tenpy/models/mixed_xk.py:340``.
    """

    def init_lattice(self, model_params, N_orb, chinfo, charges):
        xy_lattice = model_params.get('xy_lattice', 'Square')
        if xy_lattice != 'Square':
            raise NotImplementedError("only Square real-space geometry")
        N_rings = model_params.get('Lx', 1, int)
        Ly = model_params.get('Ly', 2, int)
        ring_order = model_params.get('ring_order', None)
        conserve_k = model_params.get('conserve_k', True, bool)
        bc_MPS = model_params.get('bc_MPS', 'infinite', str)
        bc = 'periodic' if bc_MPS == 'infinite' else 'open'
        return MixedXKLattice.from_charges_of_orbitals(
            N_rings, Ly, N_orb, chinfo, charges, conserve_k,
            ring_order=ring_order, bc=bc, bc_MPS=bc_MPS)

    # ------------------------------------------------------------- term adders
    def add_intra_ring_hopping(self, couplings):
        r"""``sum_x couplings[x, k1, l1, k2, l2] c^dag_{x,k1,l1} c_{x,k2,l2}``.

        Reference: ``mixed_xk.py:400``."""
        N_orb, Lx, Ly = self.lat.N_orb, self.lat.N_rings, self.lat.Ly
        N_r = Ly * N_orb
        couplings = np.asarray(couplings)
        if couplings.ndim == 4:
            couplings = couplings[np.newaxis, ...]
        couplings = to_array(couplings, (Lx, Ly, N_orb, Ly, N_orb))
        couplings = np.reshape(couplings, (Lx, N_r, N_r), order='C')
        for u1, u2 in zip(*(np.linalg.norm(couplings, axis=0).nonzero())):
            strength = couplings[:, u1, u2]
            if u1 == u2:
                self.add_onsite(np.real_if_close(strength), int(u1), 'N')
            else:
                self.add_coupling(strength, int(u1), 'Cd', int(u2), 'C', 0,
                                  op_string='JW')

    def add_inter_ring_hopping(self, couplings, dx=+1):
        r"""``sum_x couplings[...] c^dag_{x,k1,l1} c_{x+dx,k2,l2} + h.c.``.

        Reference: ``mixed_xk.py:428``."""
        assert dx != 0
        N_orb, Ly = self.lat.N_orb, self.lat.Ly
        Nx = self.lat.N_rings - int(bool(self.lat.bc[0])) * abs(dx)
        if Nx <= 0:
            return  # open boundary: no ring pairs at this distance
        N_r = Ly * N_orb
        couplings = np.asarray(couplings)
        if couplings.ndim == 4:
            couplings = couplings[np.newaxis, ...]
        couplings = to_array(couplings, (Nx, Ly, N_orb, Ly, N_orb))
        couplings = np.reshape(couplings, (Nx, N_r, N_r), order='C')
        for u1, u2 in zip(*(np.linalg.norm(couplings, axis=0).nonzero())):
            strength = couplings[:, u1, u2]
            self.add_coupling(strength, int(u1), 'Cd', int(u2), 'C', dx,
                              op_string='JW', plus_hc=True)

    def add_intra_ring_interaction(self, couplings,
                                   operators=('Cd', 'C', 'Cd', 'C')):
        r"""``sum_x couplings[x, ...] A_{x,k1,l1} B_{x,k2,l2} C_{x,k3,l3}
        D_{x,k4,l4}``.  Reference: ``mixed_xk.py:456``."""
        N_orb, Lx, Ly = self.lat.N_orb, self.lat.N_rings, self.lat.Ly
        N_r = Ly * N_orb
        couplings = np.asarray(couplings)
        if couplings.ndim == 8:
            couplings = couplings[np.newaxis, ...]
        couplings = to_array(couplings, (Lx,) + (Ly, N_orb) * 4)
        couplings = np.reshape(couplings, (Lx,) + (N_r,) * 4, order='C')
        A, B, C, D = operators
        for u1, u2, u3, u4 in zip(
                *(np.linalg.norm(couplings, axis=0).nonzero())):
            strength = couplings[:, u1, u2, u3, u4]
            if u1 == u2 == u3 == u4:
                self.add_onsite(np.real_if_close(strength), int(u1),
                                ' '.join([A, B, C, D]))
            else:
                self.add_multi_coupling(
                    strength, [(A, 0, int(u1)), (B, 0, int(u2)),
                               (C, 0, int(u3)), (D, 0, int(u4))])

    def add_inter_ring_interaction(self, couplings, dx,
                                   operators=('Cd', 'C', 'Cd', 'C')):
        r"""``sum_x couplings[x, ...] A_{x,k1,l1} B_{x,k2,l2} C_{x+dx,k3,l3}
        D_{x+dx,k4,l4}``.  Reference: ``mixed_xk.py:490``."""
        assert dx != 0
        N_orb, Ly = self.lat.N_orb, self.lat.Ly
        Nx = self.lat.N_rings - int(bool(self.lat.bc[0])) * abs(dx)
        if Nx <= 0:
            return  # open boundary: no ring pairs at this distance
        N_r = Ly * N_orb
        couplings = np.asarray(couplings)
        if couplings.ndim == 8:
            couplings = couplings[np.newaxis, ...]
        couplings = to_array(couplings, (Nx,) + (Ly, N_orb) * 4)
        couplings = np.reshape(couplings, (Nx,) + (N_r,) * 4, order='C')
        A, B, C, D = operators
        for u1, u2, u3, u4 in zip(
                *(np.linalg.norm(couplings, axis=0).nonzero())):
            strength = couplings[:, u1, u2, u3, u4]
            self.add_multi_coupling(
                strength, [(A, 0, int(u1)), (B, 0, int(u2)),
                           (C, dx, int(u3)), (D, dx, int(u4))])

    # ------------------------------------------------------------- measurement
    def _conserve_k(self):
        return 'ky' in self.lat.site(0).leg.chinfo.names

    def real_to_mixed_onsite(self, A, A_coord):
        r"""TermList measuring the real-space onsite observable
        ``sum_{l1,l2} A[l1,l2] c^dag_{x,y,l1} c_{x,y,l2}`` at ``A_coord=(x,y)``.

        Evaluate with :meth:`MPS.expectation_value_terms_sum`.
        Reference: ``mixed_xk.py:534``."""
        from ..networks.terms import TermList
        x, y = A_coord
        lat = self.lat
        Ly, N_orb = lat.Ly, lat.N_orb
        conserve_k = self._conserve_k()
        A = np.asarray(A)
        if A.shape != (N_orb, N_orb):
            raise ValueError("wrong shape of A")
        terms = []
        strengths = []
        for l1, l2 in zip(*A.nonzero()):
            for k1 in range(Ly):
                i1 = int(lat.lat2mps_idx([x, lat.get_u(k1, l1)]))
                for k2 in range(Ly):
                    if conserve_k and (k1 - k2) % Ly != 0:
                        continue  # momentum not conserved: <term> vanishes
                    i2 = int(lat.lat2mps_idx([x, lat.get_u(k2, l2)]))
                    terms.append([('Cd', i1), ('C', i2)])
                    strengths.append(A[l1, l2] * lat.get_exp_ik((k1 - k2) * y)
                                     / Ly)
        return TermList(terms, strengths)

    def real_to_mixed_two_site(self, A, A_coord, B, B_coord):
        r"""TermList for the real-space correlation ``A_{x1,y1} B_{x2,y2}``
        of two onsite (orbital-matrix) operators.  Reference: ``:583``."""
        return self.real_to_mixed_n_site([A, B], [A_coord, B_coord])

    def real_to_mixed_n_site(self, orbital_coeffs, rs_coords):
        r"""TermList for an n-point real-space correlation function of onsite
        density-like operators ``sum_{l1,l2} M[l1,l2] c^dag_{x,y,l1}
        c_{x,y,l2}``.  Reference: ``mixed_xk.py:613``."""
        import itertools as it
        from ..networks.terms import TermList
        num_ops = len(orbital_coeffs)
        orbital_coeffs = [np.asarray(op) for op in orbital_coeffs]
        assert num_ops == len(rs_coords)
        lat = self.lat
        Ly = lat.Ly
        conserve_k = self._conserve_k()
        terms = []
        strengths = []
        xx_ind = np.repeat([x for x, y in rs_coords], 2)
        y_ind = [y for x, y in rs_coords]
        ops = ['Cd', 'C'] * num_ops
        for l_ind in it.product(*[zip(*op_i.nonzero())
                                  for op_i in orbital_coeffs]):
            coeff = np.prod([op_i[l_i]
                             for op_i, l_i in zip(orbital_coeffs, l_ind)])
            for k_ind in it.product(range(Ly), repeat=2 * num_ops):
                if conserve_k and \
                        (sum(k_ind[::2]) - sum(k_ind[1::2])) % Ly != 0:
                    continue
                kdiff_y = sum((k1 - k2) * y for k1, k2, y
                              in zip(k_ind[::2], k_ind[1::2], y_ind))
                strengths.append(coeff * lat.get_exp_ik(kdiff_y)
                                 / Ly**num_ops)
                u_ind = lat.get_u(np.array(k_ind),
                                  np.array(l_ind).flatten())
                i_ind = lat.lat2mps_idx(
                    np.hstack([xx_ind[:, np.newaxis], u_ind[:, np.newaxis]]))
                terms.append(list(zip(ops, (int(i) for i in i_ind))))
        return TermList(terms, strengths)

    def real_to_mixed_correlations_any(self, ops, coeff_orbitals, rs_coords):
        r"""TermList for an arbitrary real-space string of 'C'/'Cd' operators
        with given orbital coefficients.  Reference: ``mixed_xk.py:662``."""
        import itertools as it
        from ..networks.terms import TermList
        num_ops = len(ops)
        assert num_ops == len(rs_coords)
        assert all(num_ops == len(orbs) for _, orbs in coeff_orbitals)
        lat = self.lat
        Ly = lat.Ly
        conserve_k = self._conserve_k()
        terms = []
        strengths = []
        x_ind = np.array([x for x, y in rs_coords])
        y_ind = np.array([y for x, y in rs_coords])
        k_sign = np.array([(+1 if op == 'Cd' else -1) for op in ops])
        coeff_orbitals = [(c, np.asarray(l_ind)) for c, l_ind in
                          coeff_orbitals]
        for k_ind in it.product(range(Ly), repeat=num_ops):
            k_ind = np.array(k_ind)
            if conserve_k and np.sum(k_ind * k_sign) % Ly != 0:
                continue
            k_y = np.sum(k_ind * k_sign * y_ind)
            fourier_coeff = lat.get_exp_ik(k_y) / Ly**(num_ops / 2.)
            for coeff, l_ind in coeff_orbitals:
                strengths.append(coeff * fourier_coeff)
                u_ind = lat.get_u(k_ind, l_ind)
                i_ind = lat.lat2mps_idx(
                    np.hstack([x_ind[:, np.newaxis], u_ind[:, np.newaxis]]))
                terms.append(list(zip(ops, (int(i) for i in i_ind))))
        return TermList(terms, strengths)


class SpinlessMixedXKSquare(MixedXKModel):
    r"""Spinless fermions on a square-lattice cylinder in the x-k basis.

    Nearest-neighbor hopping ``t`` and nearest-neighbor interaction ``V``;
    ``N_orb = 1``.  Intra-ring hopping is diagonal in k with dispersion
    ``-2 t cos(2 pi k / Ly)``; the density-density interaction becomes a
    momentum-transfer sum over ``delta_q``.  Reference: ``mixed_xk.py:724``.
    """

    def init_lattice(self, model_params):
        N_orb = 1
        chinfo = ChargeInfo([1], ['Charge'])
        charges = [[1]]
        return MixedXKModel.init_lattice(self, model_params, N_orb, chinfo,
                                         charges)

    def init_terms(self, model_params):
        t = model_params.get('t', 1., 'real_or_array')
        V = model_params.get('V', 1., 'real_or_array')
        lat = self.lat
        Ly, N_orb = lat.Ly, lat.N_orb
        assert N_orb == 1

        intra_hopping = np.zeros((Ly, N_orb, Ly, N_orb), dtype=complex)
        inter_hopping = np.zeros((Ly, N_orb, Ly, N_orb))
        cos_k = np.real(lat.get_exp_ik(np.arange(Ly)))
        for k in range(Ly):
            intra_hopping[k, 0, k, 0] = -t * 2. * cos_k[k]
            inter_hopping[k, 0, k, 0] = -t
        self.add_intra_ring_hopping(intra_hopping)
        self.add_inter_ring_hopping(inter_hopping, dx=1)

        n_q = lat.delta_q
        intra_int = np.zeros((Ly, N_orb) * 4)
        inter_int = np.zeros((Ly, N_orb) * 4)
        for q in range(Ly):
            nn = (n_q[q][:, :, np.newaxis, np.newaxis]
                  * n_q[-q][np.newaxis, np.newaxis, :, :])
            intra_int[:, 0, :, 0, :, 0, :, 0] += V / Ly * cos_k[q] * nn
            inter_int[:, 0, :, 0, :, 0, :, 0] += V / Ly * nn
        self.add_intra_ring_interaction(intra_int)
        self.add_inter_ring_interaction(inter_int, 1)


class HubbardMixedXKSquare(MixedXKModel):
    r"""Spinful Hubbard model on a square-lattice cylinder in the x-k basis.

    ``N_orb = 2`` for spin up (l=0) / down (l=1); nearest-neighbor hopping
    ``t`` and onsite ``U`` (a momentum-transfer sum in the k basis).
    Reference: ``mixed_xk.py:780``.
    """

    def init_lattice(self, model_params):
        N_orb = 2
        chinfo = ChargeInfo([1, 1], ['Charge', 'Spin'])
        charges = [[1, 1], [1, -1]]
        return MixedXKModel.init_lattice(self, model_params, N_orb, chinfo,
                                         charges)

    def init_terms(self, model_params):
        t = model_params.get('t', 1., 'real_or_array')
        U = model_params.get('U', 1., 'real_or_array')
        lat = self.lat
        Ly, N_orb = lat.Ly, lat.N_orb

        intra_hopping = np.zeros((Ly, N_orb, Ly, N_orb), dtype=complex)
        inter_hopping = np.zeros((Ly, N_orb, Ly, N_orb))
        cos_k = np.real(lat.get_exp_ik(np.arange(Ly)))
        for k in range(Ly):
            for l in range(N_orb):  # hopping is diagonal in spin
                intra_hopping[k, l, k, l] = -2. * t * cos_k[k]
                inter_hopping[k, l, k, l] = -t
        self.add_intra_ring_hopping(intra_hopping)
        self.add_inter_ring_hopping(inter_hopping, dx=1)

        n_q = lat.delta_q
        intra_int = np.zeros((Ly, N_orb) * 4)
        for q in range(Ly):
            intra_int[:, 0, :, 0, :, 1, :, 1] += (
                U / Ly * n_q[q][:, :, np.newaxis, np.newaxis]
                * n_q[-q][np.newaxis, np.newaxis, :, :])
        self.add_intra_ring_interaction(intra_int)
