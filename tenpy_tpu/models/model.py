r"""Model base classes and the coupling DSL.

Rebuild of ``tenpy/models/model.py`` (Model :61, NearestNeighborModel :315, MPOModel
:667, CouplingModel :854 with add_onsite :971 / add_coupling :1064 /
add_multi_coupling :1302 / add_exponentially_decaying_coupling :1498 /
calc_H_bond :1773 / calc_H_MPO :1828, CouplingMPOModel :1958 template).

A model = lattice geometry + Hamiltonian terms, compiled to an MPO (via
:class:`~tenpy_tpu.networks.mpo.MPOGraph`) and/or nearest-neighbor bond operators.
"""

from __future__ import annotations

import logging

import numpy as np

from .lattice import Lattice, get_lattice, Chain, TrivialLattice
from ..networks import mpo
from ..networks.site import Site
from ..networks.terms import (OnsiteTerms, CouplingTerms, MultiCouplingTerms,
                              ExponentiallyDecayingTerms, TermList,
                              order_combine_term)
from ..linalg import np_conserved as npc
from ..tools.params import asConfig
from ..tools.misc import to_array

logger = logging.getLogger(__name__)

__all__ = ['Model', 'NearestNeighborModel', 'MPOModel', 'CouplingModel',
           'CouplingMPOModel']


class Model:
    """Base class for models: a lattice + some Hamiltonian representation.

    Reference: ``tenpy/models/model.py:61``.
    """

    def __init__(self, lattice):
        self.lat = lattice
        self._rng = None

    @property
    def rng(self):
        """Per-model RNG (reference ``model.py:98``)."""
        if self._rng is None:
            self._rng = np.random.default_rng(12345)
        return self._rng

    def copy(self):
        import copy
        return copy.copy(self)

    def enlarge_mps_unit_cell(self, factor=2):
        self.lat = self.lat.enlarge_mps_unit_cell(factor)

    def update_time_parameter(self, new_time):
        """Rebuild the model at a new time (time-dependent H).

        Reference: ``model.py:249``."""
        options = self.options.as_dict() if hasattr(self, 'options') else {}
        options['time'] = new_time
        return self.__class__(options)

    def estimate_RAM_saving_factor(self):
        """Rough memory-saving factor from charge conservation (``model.py:282``)."""
        site = self.lat.unit_cell[0]
        n_sec = max(site.leg.block_number, 1)
        return float(n_sec)

    def extract_segment(self, first=0, last=None, enlarge=None):
        """Shallow copy with lattice (and H, in subclasses) on a segment.

        Reference: ``tenpy/models/model.py:167``."""
        cp = self.copy()
        cp.lat = self.lat.extract_segment(first, last, enlarge)
        return cp


class NearestNeighborModel(Model):
    """Model with ``H_bond``: ``H_bond[i]`` acts on sites ``(i-1, i)``.

    Reference: ``tenpy/models/model.py:315``.
    """

    def __init__(self, lattice, H_bond):
        Model.__init__(self, lattice)
        self.H_bond = list(H_bond)

    def extract_segment(self, first=0, last=None, enlarge=None):
        cp = super().extract_segment(first, last, enlarge)
        first, last = cp.lat.segment_first_last
        L = len(self.H_bond)
        cp.H_bond = [self.H_bond[i % L] for i in range(first, last + 1)]
        return cp

    @classmethod
    def from_MPOModel(cls, mpo_model):
        """Convert an MPOModel with nearest-neighbor H to bond terms.

        Reference: ``model.py:364``."""
        return cls(mpo_model.lat, mpo_model.calc_H_bond_from_MPO())

    def bond_energies(self, psi):
        """<psi|H_bond[i]|psi> per bond. Reference: ``model.py:422``."""
        E = []
        L = psi.L
        bonds = range(1, L) if psi.finite else range(L)
        for i in bonds:
            h = self.H_bond[i % L]
            if h is None:
                E.append(0.)
                continue
            theta = psi.get_theta(i - 1, 2)
            h_th = npc.tensordot(h, theta, axes=[['p0*', 'p1*'], ['p0', 'p1']])
            val = npc.tensordot(theta.conj(), h_th,
                                axes=[['vL*', 'p0*', 'p1*', 'vR*'],
                                      ['vL', 'p0', 'p1', 'vR']])
            E.append(float(np.real(complex(val))))
        return np.array(E)

    def calc_H_MPO_from_bond(self, tol_zero=1e-15):
        """Compile the bond terms into an MPO. Reference: ``model.py:573``."""
        sites = self.lat.mps_sites()
        L = len(sites)
        bc = self.lat.bc_MPS if self.lat.bc_MPS != 'segment' else 'finite'
        graph = mpo.MPOGraph(sites, 'finite' if bc == 'finite' else 'infinite')
        for i, h in enumerate(self.H_bond):
            if h is None:
                continue
            # decompose the bond operator into sums of single-site products via SVD
            i0 = (i - 1) % L
            h2 = h.combine_legs([['p0', 'p0*'], ['p1', 'p1*']], qconj=[+1, -1])
            U, S, VH = npc.svd(h2, inner_labels=['vR', 'vL'])
            S = np.asarray(S)
            keep = S > tol_zero * max(S.max(), 1e-300)
            for k in np.nonzero(keep)[0]:
                mask = np.zeros(len(S), bool)
                mask[k] = True
                u_k = U.copy(deep=False).iproject([mask], [1]).squeeze([1])
                v_k = VH.copy(deep=False).iproject([mask], [0]).squeeze([0])
                opL = u_k.split_legs([0]).iset_leg_labels(['p', 'p*']) * S[k]
                opR = v_k.split_legs([0]).iset_leg_labels(['p', 'p*'])
                key = ('bond', i, int(k))
                graph.add(i0, 'IdL', key, opL, 1., check_op=False)
                graph.add(i0 + 1, key, 'IdR', opR, 1., check_op=False)
        graph.add_missing_IdL_IdR()
        return _build_graph_with_array_ops(graph)


class MPOModel(Model):
    """Model with an MPO Hamiltonian. Reference: ``tenpy/models/model.py:667``."""

    def __init__(self, lattice, H_MPO):
        Model.__init__(self, lattice)
        self.H_MPO = H_MPO

    def extract_segment(self, first=0, last=None, enlarge=None):
        cp = super().extract_segment(first, last, enlarge)
        first, last = cp.lat.segment_first_last
        cp.H_MPO = self.H_MPO.extract_segment(first, last)
        return cp

    def calc_H_bond_from_MPO(self, tol_zero=1e-15):
        """Extract nearest-neighbor bond terms from the MPO (max_range <= 1 only).

        For a Schur-form MPO: coupling channels are the bond states other than
        IdL/IdR; onsite terms (the ``W[IdL, IdR]`` entries) are distributed
        half-half onto the adjacent bonds (full weight at finite-chain ends).
        Reference: ``tenpy/models/model.py:752``."""
        H = self.H_MPO
        L = H.L
        sites = self.lat.mps_sites()
        finite = H.finite
        H_bond = [None] * L
        for i1 in range(0 if not finite else 1, L):
            i0 = (i1 - 1) % L
            W0 = np.asarray(H.get_W(i0).to_ndarray())
            W1 = np.asarray(H.get_W(i1 % L).to_ndarray())
            IdL0 = H.get_IdL(i0)
            IdR0 = H.get_IdR(i0)      # on the shared bond
            IdL_mid = H.get_IdL(i1 % L)  # on the shared bond
            IdR1 = H.get_IdR(i1 % L)
            d0, d1 = W0.shape[2], W1.shape[3]
            h = np.zeros((d0, d0, d1, d1), dtype=np.result_type(W0, W1))
            for a in range(W0.shape[1]):
                if a in (IdR0, IdL_mid):
                    continue
                h += np.einsum('pq,rs->pqrs', W0[IdL0, a], W1[a, IdR1])
            ons0 = W0[IdL0, IdR0]
            ons1 = W1[IdL_mid, IdR1]
            w0 = 1.0 if (finite and i0 == 0) else 0.5
            w1 = 1.0 if (finite and i1 == L - 1) else 0.5
            h += w0 * np.einsum('pq,rs->pqrs', ons0, np.eye(d1))
            h += w1 * np.einsum('pq,rs->pqrs', np.eye(d0), ons1)
            legs = [sites[i0].leg, sites[i0].leg.conj(),
                    sites[i1 % L].leg, sites[i1 % L].leg.conj()]
            H_bond[i1 % L] = npc.Array.from_ndarray(
                h, legs, labels=['p0', 'p0*', 'p1', 'p1*'],
                warn_wrong_sector=False)
        return H_bond


def _build_graph_with_array_ops(graph):
    """Build an MPO from a graph whose edges hold npc Arrays instead of names."""
    ordered = graph._order_states()
    L = graph.L
    grids = []
    for i in range(L):
        bL = graph._bond(i)
        bR = graph._bond(i + 1)
        nL = len(ordered[bL])
        nR = len(ordered[bR])
        grid = [[None] * nR for _ in range(nL)]
        for keyL, d in graph.graph[i].items():
            a = ordered[bL][keyL]
            for keyR, entries in d.items():
                b = ordered[bR][keyR]
                op_sum = None
                for op, c in entries:
                    term = (graph.sites[i].get_op(op) if isinstance(op, str)
                            else op) * c
                    op_sum = term if op_sum is None else op_sum + term
                grid[a][b] = op_sum
        grids.append(grid)
    IdL = [s.get('IdL', None) for s in ordered]
    IdR = [s.get('IdR', None) for s in ordered]
    if graph.bc == 'infinite':
        IdL = (IdL + [IdL[0]])[:L + 1]
        IdR = (IdR + [IdR[0]])[:L + 1]
    return mpo.MPO.from_grids(graph.sites, grids, graph.bc, IdL, IdR)


class CouplingModel(Model):
    """Base class providing the term DSL. Reference: ``tenpy/models/model.py:854``."""

    def __init__(self, lattice, explicit_plus_hc=False):
        Model.__init__(self, lattice)
        self.explicit_plus_hc = explicit_plus_hc
        L = lattice.N_sites
        sites = lattice.mps_sites()
        self.onsite_terms = {}       # category -> OnsiteTerms
        self.coupling_terms = {}     # category -> (Multi)CouplingTerms
        self.exp_decaying_terms = ExponentiallyDecayingTerms(L)

    # ---------------------------------------------------------------- term access
    def _get_onsite(self, category):
        if category not in self.onsite_terms:
            self.onsite_terms[category] = OnsiteTerms(self.lat.N_sites)
        return self.onsite_terms[category]

    def _get_coupling(self, category, multi=False):
        ct = self.coupling_terms.get(category)
        if ct is None:
            cls = MultiCouplingTerms if multi else CouplingTerms
            ct = self.coupling_terms[category] = cls(self.lat.N_sites)
        elif multi and not isinstance(ct, MultiCouplingTerms):
            new = MultiCouplingTerms(self.lat.N_sites)
            new += ct
            ct = self.coupling_terms[category] = new
        return ct

    def all_onsite_terms(self):
        total = OnsiteTerms(self.lat.N_sites)
        for ot in self.onsite_terms.values():
            total += ot
        return total

    def all_coupling_terms(self):
        if any(isinstance(ct, MultiCouplingTerms)
               for ct in self.coupling_terms.values()):
            total = MultiCouplingTerms(self.lat.N_sites)
        else:
            total = CouplingTerms(self.lat.N_sites)
        for ct in self.coupling_terms.values():
            total += ct
        return total

    # ---------------------------------------------------------------- DSL
    def add_onsite(self, strength, u, opname, category=None, plus_hc=False):
        r"""Add ``sum_x strength[x] * opname`` on all sites of unit-cell index u.

        Reference: ``tenpy/models/model.py:971``."""
        if self.explicit_plus_hc:
            if plus_hc:
                plus_hc = False  # the MPO adds the h.c. implicitly
            else:
                strength = strength / 2.  # h.c. added implicitly: avoid double count
        strength = to_array(strength, self.lat.Ls)
        if not np.any(strength != 0.):
            return
        category = category or f"{opname}_{u}"
        ot = self._get_onsite(category)
        idx, lat_idx = self.lat.mps_lat_idx_fix_u(u)
        site = self.lat.unit_cell[u]
        if not site.valid_opname(opname):
            raise ValueError(f"unknown onsite op {opname!r}")
        for i, lat in zip(idx, lat_idx):
            ot.add_onsite_term(strength[tuple(lat)], int(i), opname)
        if plus_hc:
            hc = site.get_hc_op_name(opname)
            if hc != opname:
                self.add_onsite(np.conj(strength), u, hc,
                                category=category + '_hc')
            else:
                # hermitian op: adding hc doubles it
                for i, lat in zip(idx, lat_idx):
                    ot.add_onsite_term(np.conj(strength[tuple(lat)]), int(i), opname)

    def add_onsite_term(self, strength, i, op, category=None, plus_hc=False):
        if self.explicit_plus_hc:
            if plus_hc:
                plus_hc = False  # the MPO adds the h.c. implicitly
            else:
                strength = strength / 2.  # h.c. added implicitly: avoid double count
        category = category or op
        self._get_onsite(category).add_onsite_term(strength, i, op)
        if plus_hc:
            site = self.lat.mps_sites()[i]
            self._get_onsite(category).add_onsite_term(
                np.conj(strength), i, site.get_hc_op_name(op))

    def add_coupling(self, strength, u1, op1, u2, op2, dx, op_string=None,
                     str_on_first=True, raise_op2_left=False, category=None,
                     plus_hc=False):
        r"""Add ``sum_x strength[x] op1_{u1,x} op2_{u2,x+dx}`` couplings.

        Jordan-Wigner strings are inserted automatically when both operators are
        fermionic.  Reference: ``tenpy/models/model.py:1064``.
        """
        if self.explicit_plus_hc:
            if plus_hc:
                plus_hc = False  # the MPO adds the h.c. implicitly
            else:
                strength = np.asarray(strength) / 2.
        dx = np.atleast_1d(np.asarray(dx, int))
        if len(dx) < self.lat.dim:  # scalar dx on a 1D lattice etc.
            dx = np.concatenate([dx, np.zeros(self.lat.dim - len(dx), int)])
        mps_i, mps_j, lat_idx, coupling_shape = self.lat.possible_couplings(u1, u2, dx)
        if min(coupling_shape) == 0:
            return  # no coupling fits (e.g. dx beyond an open boundary)
        strength = to_array(strength, coupling_shape)
        category = category or f"{op1}_{u1}-{op2}_{u2}-{tuple(dx)}"
        sites = self.lat.mps_sites()
        ct = self._get_coupling(category)
        for i, j, lat in zip(mps_i, mps_j, lat_idx):
            s = strength[tuple(lat)]
            if s == 0.:
                continue
            term = [(op1, int(i)), (op2, int(j))]
            term, sign = order_combine_term(term, sites)
            if len(term) == 1:
                # i == j (should not happen for dx != 0)
                self._get_onsite(category).add_onsite_term(s * sign, term[0][1],
                                                           term[0][0])
                continue
            # shift into the unit cell for infinite bc
            i0 = term[0][1]
            if not 0 <= i0 < self.lat.N_sites:
                shift = (i0 % self.lat.N_sites) - i0
                term = [(op, x + shift) for op, x in term]
            args = ct.coupling_term_handle_JW(s * sign, term, sites, op_string)
            ct.add_coupling_term(*args)
        if plus_hc:
            site1 = self.lat.unit_cell[u1]
            site2 = self.lat.unit_cell[u2]
            hc1 = site1.get_hc_op_name(op1)
            hc2 = site2.get_hc_op_name(op2)
            self.add_coupling(np.conj(strength), u2, hc2, u1, hc1, -dx,
                              op_string=op_string, category=category + '_hc')

    def add_coupling_term(self, strength, i, j, op_i, op_j, op_string='Id',
                          category=None, plus_hc=False):
        if self.explicit_plus_hc:
            if plus_hc:
                plus_hc = False  # the MPO adds the h.c. implicitly
            else:
                strength = strength / 2.  # h.c. added implicitly: avoid double count
        category = category or f"{op_i}_i {op_j}_j"
        ct = self._get_coupling(category)
        ct.add_coupling_term(strength, i, j, op_i, op_j, op_string)
        if plus_hc:
            sites = self.lat.mps_sites()
            hi = sites[i % len(sites)].get_hc_op_name(op_i)
            hj = sites[j % len(sites)].get_hc_op_name(op_j)
            ct.add_coupling_term(np.conj(strength), i, j, hi, hj, op_string)

    def add_multi_coupling(self, strength, ops, category=None, plus_hc=False):
        r"""Add multi-site couplings; ``ops = [(opname, dx, u), ...]``.

        Reference: ``tenpy/models/model.py:1302``."""
        if self.explicit_plus_hc:
            if plus_hc:
                plus_hc = False  # the MPO adds the h.c. implicitly
            else:
                strength = np.asarray(strength) / 2.
        ops = [(op,
                np.concatenate([dx_ := np.atleast_1d(np.asarray(dx, int)),
                                np.zeros(self.lat.dim - len(dx_), int)]), u)
               for op, dx, u in ops]
        mps_ijkl, lat_idx, coupling_shape = self.lat.possible_multi_couplings(ops)
        if min(coupling_shape) == 0:
            return  # no coupling fits (e.g. dx beyond an open boundary)
        strength = to_array(strength, coupling_shape)
        category = category or 'multi_' + '_'.join(op for op, _, _ in ops)
        sites = self.lat.mps_sites()
        ct = self._get_coupling(category, multi=True)
        opnames = [op for op, _, _ in ops]
        for ijkl, lat in zip(mps_ijkl, lat_idx):
            s = strength[tuple(lat)]
            if s == 0.:
                continue
            term = list(zip(opnames, (int(x) for x in ijkl)))
            term, sign = order_combine_term(term, sites)
            i0 = term[0][1]
            if not 0 <= i0 < self.lat.N_sites:
                shift = (i0 % self.lat.N_sites) - i0
                term = [(op, x + shift) for op, x in term]
            if len(term) == 1:
                self._get_onsite(category).add_onsite_term(s * sign, term[0][1],
                                                           term[0][0])
                continue
            if len(term) == 2:
                args = ct.coupling_term_handle_JW(s * sign, term, sites)
                ct.add_coupling_term(*args)
            else:
                args = ct.multi_coupling_term_handle_JW(s * sign, term, sites)
                ct.add_multi_coupling_term(*args)
        if plus_hc:
            hc_ops = [(self.lat.unit_cell[u].get_hc_op_name(op), dx, u)
                      for op, dx, u in reversed(ops)]
            self.add_multi_coupling(np.conj(strength), hc_ops,
                                    category=category + '_hc')

    def add_multi_coupling_term(self, strength, ijkl, ops_ijkl, op_string='Id',
                                category=None, plus_hc=False):
        category = category or 'multi_' + '_'.join(ops_ijkl)
        ct = self._get_coupling(category, multi=True)
        ct.add_multi_coupling_term(strength, ijkl, ops_ijkl, op_string)
        if plus_hc:
            sites = self.lat.mps_sites()
            hc = [sites[i % len(sites)].get_hc_op_name(op)
                  for op, i in zip(ops_ijkl, ijkl)]
            ct.add_multi_coupling_term(np.conj(strength), ijkl, hc, op_string)

    def add_exponentially_decaying_coupling(self, strength, lambda_, op_i, op_j,
                                            subsites=None, subsites_start=None,
                                            op_string=None, plus_hc=False):
        """Reference: ``tenpy/models/model.py:1498``."""
        sites = self.lat.mps_sites()
        if op_string is None:
            need_i = sites[0].op_needs_JW(op_i)
            need_j = sites[0].op_needs_JW(op_j)
            if need_i and need_j:
                op_string = 'JW'
                op_i = sites[0].multiply_op_names([op_i, 'JW'])
            elif need_i or need_j:
                raise ValueError("only one op needs JW?")
            else:
                op_string = 'Id'
        self.exp_decaying_terms.add_exponentially_decaying_coupling(
            strength, lambda_, op_i, op_j, subsites, subsites_start, op_string)
        if plus_hc:
            hc_i = sites[0].get_hc_op_name(op_i)
            hc_j = sites[0].get_hc_op_name(op_j)
            self.exp_decaying_terms.add_exponentially_decaying_coupling(
                np.conj(strength), np.conj(lambda_), hc_i, hc_j, subsites,
                subsites_start, op_string)

    def add_local_term(self, strength, term, category=None, plus_hc=False):
        """Add a single term given as ``[(op, lat_idx), ...]`` with lattice indices."""
        sites = self.lat.mps_sites()
        term_mps = [(op, int(self.lat.lat2mps_idx(idx))) for op, idx in term]
        term_mps, sign = order_combine_term(term_mps, sites)
        category = category or 'local'
        if len(term_mps) == 1:
            self._get_onsite(category).add_onsite_term(strength * sign,
                                                       term_mps[0][1],
                                                       term_mps[0][0])
        elif len(term_mps) == 2:
            ct = self._get_coupling(category)
            args = ct.coupling_term_handle_JW(strength * sign, term_mps, sites)
            ct.add_coupling_term(*args)
        else:
            ct = self._get_coupling(category, multi=True)
            args = ct.multi_coupling_term_handle_JW(strength * sign, term_mps, sites)
            ct.add_multi_coupling_term(*args)

    def coupling_strength_add_ext_flux(self, strength, dx, phase):
        """Add an external flux phase to coupling strengths crossing the boundary.

        Reference: ``tenpy/models/model.py:1859``."""
        dx = np.asarray(dx, int)
        coupling_shape, shift = self.lat.coupling_shape(dx)
        strength = to_array(strength, coupling_shape).astype(complex)
        for a in range(1, self.lat.dim):
            if self.lat.bc[a] or phase[a] == 0:
                continue
            La = self.lat.Ls[a]
            # couplings wrapping axis a pick up the phase
            idx = [slice(None)] * len(coupling_shape)
            if dx[a] > 0:
                idx[a] = slice(La - dx[a], La)
            elif dx[a] < 0:
                idx[a] = slice(0, -dx[a])
            else:
                continue
            strength[tuple(idx)] = strength[tuple(idx)] * np.exp(1j * phase[a])
        return strength

    # ---------------------------------------------------------------- compile
    def calc_H_MPO(self, tol_zero=1e-15):
        """Compile all terms to an MPO. Reference: ``tenpy/models/model.py:1828``."""
        ot = self.all_onsite_terms()
        ct = self.all_coupling_terms()
        ot.remove_zeros(tol_zero)
        ct.remove_zeros(tol_zero)
        terms = [ot, ct]
        if not self.exp_decaying_terms.is_empty:
            terms.append(self.exp_decaying_terms)
        sites = self.lat.mps_sites()
        bc = 'infinite' if self.lat.bc_MPS == 'infinite' else 'finite'
        graph = mpo.MPOGraph.from_terms(terms, sites, bc)
        H = graph.build_MPO()
        H.max_range = max(ot.max_range(), ct.max_range(),
                          self.exp_decaying_terms.max_range()
                          if not self.exp_decaying_terms.is_empty else 0)
        H.explicit_plus_hc = self.explicit_plus_hc
        return H

    def calc_H_onsite(self, tol_zero=1e-15):
        ot = self.all_onsite_terms()
        ot.remove_zeros(tol_zero)
        return ot.to_Arrays(self.lat.mps_sites())

    def calc_H_bond(self, tol_zero=1e-15):
        """Bond operators H_bond[i] on sites (i-1, i) (requires NN couplings only).

        Reference: ``tenpy/models/model.py:1773``."""
        sites = self.lat.mps_sites()
        ct = self.all_coupling_terms()
        ct.remove_zeros(tol_zero)
        ot = self.all_onsite_terms()
        ot.remove_zeros(tol_zero)
        if not self.exp_decaying_terms.is_empty:
            raise ValueError("exp. decaying terms have no bond representation")
        H_bond = ct.to_nn_bond_Arrays(sites)
        finite = self.lat.bc_MPS == 'finite'
        H_bond = ot.add_to_nn_bond_Arrays(H_bond, sites, finite)
        if self.explicit_plus_hc:
            for i, h in enumerate(H_bond):
                if h is None:
                    continue
                hd = h.conj().itranspose(['p0', 'p0*', 'p1', 'p1*'])
                hd.iset_leg_labels(['p0*', 'p0', 'p1*', 'p1'])
                hd.itranspose(['p0', 'p0*', 'p1', 'p1*'])
                hd.legs = h.legs
                H_bond[i] = h._binary(hd, lambda a, b: a + b)
        return H_bond


class CouplingMPOModel(CouplingModel, MPOModel):
    """Template-method model: init_lattice -> init_sites -> init_terms -> H_MPO.

    Subclasses override :meth:`init_sites` and :meth:`init_terms`.
    Options: ``lattice`` (name or class), ``bc_MPS``, ``bc_x/bc_y``, ``L``/``Lx``/
    ``Ly``, ``explicit_plus_hc``, ``sort_mpo_legs``.
    Reference: ``tenpy/models/model.py:1958``.
    """

    default_lattice = Chain
    force_default_lattice = False

    def __init__(self, model_params):
        if getattr(self, 'manually_call_init_H', False):
            return
        self.name = self.__class__.__name__
        self.options = model_params = asConfig(model_params, self.name)
        self.explicit_plus_hc = model_params.get('explicit_plus_hc', False, bool)
        lat = self.init_lattice(model_params)
        CouplingModel.__init__(self, lat, self.explicit_plus_hc)
        self.init_terms(model_params)
        self.init_H_from_terms()

    def init_H_from_terms(self):
        """Compile terms into H_MPO (and H_bond if possible). Reference: ``:2040``."""
        H_MPO = self.calc_H_MPO()
        if self.options.get('sort_mpo_legs', False, bool):
            H_MPO.sort_legcharges()
        MPOModel.__init__(self, self.lat, H_MPO)
        if isinstance(self, NearestNeighborModel):
            self.H_bond = self.calc_H_bond()

    def init_lattice(self, model_params):
        """Build the lattice from options. Reference: ``model.py:2058``."""
        lat = model_params.get('lattice', self.default_lattice)
        if isinstance(lat, Lattice):
            return lat
        if isinstance(lat, str):
            lat = get_lattice(lat)
        bc_MPS = model_params.get('bc_MPS', 'finite', str)
        kwargs = {'bc_MPS': bc_MPS}
        sites = self.init_sites(model_params)
        species = None
        if isinstance(sites, tuple) and len(sites) == 2 \
                and isinstance(sites[1], (list, tuple)) and sites[1] \
                and all(isinstance(n, str) for n in sites[1]):
            # init_sites returned (species_sites, species_names): build the
            # simple lattice first, then wrap it in a MultiSpeciesLattice
            # (reference model.py:2090 special syntax)
            species = (list(sites[0]), list(sites[1]))
            sites = species[0][0]   # placeholder site for construction
        dim = getattr(lat, 'dim', 1)
        if dim == 1:
            L = model_params.get('L', 2, int)
            bc_x = model_params.get('bc_x',
                                    'periodic' if bc_MPS == 'infinite' else 'open',
                                    str)
            kwargs['bc'] = [bc_x]
            args = (L, sites)
        elif dim == 2:
            Lx = model_params.get('Lx', 2, int)
            Ly = model_params.get('Ly', 2, int)
            bc_x = model_params.get('bc_x',
                                    'periodic' if bc_MPS == 'infinite' else 'open',
                                    str)
            bc_y = model_params.get('bc_y', 'cylinder', str)
            bc_y_ = 'periodic' if bc_y == 'cylinder' else 'open'
            kwargs['bc'] = [bc_x, bc_y_]
            args = (Lx, Ly, sites)
        else:
            raise ValueError("unsupported lattice dimension")
        order = model_params.get('order', 'default', str)
        kwargs['order'] = order
        lat_obj = lat(*args, **kwargs)
        if species is not None:
            from .lattice import MultiSpeciesLattice
            lat_obj = MultiSpeciesLattice(lat_obj, species[0], species[1])
        return lat_obj

    def init_sites(self, model_params):
        """Build the local Hilbert space (override in subclasses)."""
        raise NotImplementedError("subclass must implement init_sites")

    def init_terms(self, model_params):
        """Add the Hamiltonian terms (override in subclasses)."""
        pass
