r"""Matrix product operators: MPO, the MPOGraph compiler, and MPO environments.

Rebuild of ``tenpy/networks/mpo.py`` (MPO :72, MPOGraph :2227, MPOEnvironment :2740,
MPOTransferMatrix :3694).

Conventions (matching the reference):

* W tensors have labels ``wL, wR, p, p*`` with ``qconj=+1`` (wL) / ``-1`` (wR).
* ``IdL[b]`` / ``IdR[b]`` give the index of the "only identities to the left/right"
  state on bond ``b`` (or None).  A finite MPO starts in ``IdL[0]`` and ends in
  ``IdR[L]``.
* The MPOGraph is a finite-state machine: states (bond indices) keyed by hashable labels,
  edges carrying ``(opname, strength)``.

All graph compilation is host-side metadata work; the W tensors are charge-blocked
device Arrays.
"""

from __future__ import annotations

import logging
import warnings

import numpy as np
import jax.numpy as jnp

from ..linalg import np_conserved as npc
from ..linalg.charges import ChargeInfo, LegCharge, LegPipe, QTYPE
from ..linalg.truncation import TruncationError, svd_theta
from .mps import MPS, BaseEnvironment
from .site import Site

logger = logging.getLogger(__name__)

__all__ = ['MPO', 'MPOGraph', 'MPOEnvironment', 'MPOTransferMatrix', 'grid_insert_ops']


class MPO:
    """Matrix product operator with IdL/IdR bookkeeping.

    Parameters
    ----------
    sites : list of Site
    Ws : list of Array
        Tensors with labels ``wL, wR, p, p*``.
    bc : 'finite' | 'segment' | 'infinite'
    IdL, IdR : list of {int | None}
        Indices of the IdL/IdR states on each of the L+1 bonds (or None per bond).
    max_range : int | None
    explicit_plus_hc : bool
        If True, the MPO represents ``W + W^dagger`` (stored once, halved bond dim).
    """

    _valid_bc = ('finite', 'segment', 'infinite')

    def __init__(self, sites, Ws, bc='finite', IdL=None, IdR=None, max_range=None,
                 explicit_plus_hc=False):
        self.sites = list(sites)
        self.chinfo = self.sites[0].leg.chinfo
        self.dtype = jnp.result_type(*[W.dtype for W in Ws])
        self._W = [W.copy(deep=False).itranspose(['wL', 'wR', 'p', 'p*'])
                   for W in Ws]
        self.IdL = self._get_Id(IdL, len(sites))
        self.IdR = self._get_Id(IdR, len(sites))
        self.grouped = 1
        self.bc = bc
        self.max_range = max_range
        self.explicit_plus_hc = explicit_plus_hc
        if bc not in self._valid_bc:
            raise ValueError(f"invalid bc {bc!r}")
        self.test_sanity()

    @staticmethod
    def _get_Id(Id, L):
        if Id is None:
            return [None] * (L + 1)
        Id = list(Id)
        if len(Id) != L + 1:
            raise ValueError("IdL/IdR must have L+1 entries")
        return Id

    @property
    def L(self):
        return len(self.sites)

    @property
    def dim(self):
        return [s.dim for s in self.sites]

    @property
    def finite(self):
        """True for 'finite' and 'segment' bc, False for 'infinite'."""
        return self.bc != 'infinite'

    @property
    def chi(self):
        """MPO bond dimensions."""
        return [W.get_leg('wL').ind_len for W in self._W] + \
            [self._W[-1].get_leg('wR').ind_len]

    def extract_segment(self, first, last):
        """Copy of self on sites [first, last] with 'segment' bc.

        Reference: ``tenpy/networks/mpo.py:873``."""
        L = self.L
        sites = [self.sites[i % L] for i in range(first, last + 1)]
        Ws = [self.get_W(i, copy=True) for i in range(first, last + 1)]
        IdL = [self.IdL[i % L] for i in range(first, last + 1)]
        IdL.append(self.IdL[(last % L) + 1])
        IdR = [self.IdR[i % L] for i in range(first, last + 1)]
        IdR.append(self.IdR[(last % L) + 1])
        return self.__class__(sites, Ws, 'segment', IdL, IdR, self.max_range,
                              self.explicit_plus_hc)

    def test_sanity(self):
        assert len(self._W) == self.L
        for i in range(self.L):
            W = self._W[i]
            assert set(W.get_leg_labels()) == {'wL', 'wR', 'p', 'p*'}
            if self.bc == 'infinite' or i + 1 < self.L:
                W2 = self._W[(i + 1) % self.L]
                W.get_leg('wR').test_contractible(W2.get_leg('wL'))

    def copy(self):
        res = MPO(self.sites, [W.copy(deep=False) for W in self._W], self.bc,
                  list(self.IdL), list(self.IdR), self.max_range,
                  self.explicit_plus_hc)
        return res

    # ---------------------------------------------------------------- hdf5
    def save_hdf5(self, hdf5_saver, h5gr, subpath):
        """Reference layout (``tenpy/networks/mpo.py`` MPO.save_hdf5)."""
        hdf5_saver.save(self.sites, subpath + 'sites')
        hdf5_saver.save(self.chinfo, subpath + 'chinfo')
        hdf5_saver.save(self._W, subpath + 'tensors')
        hdf5_saver.save(list(self.IdL), subpath + 'index_identity_left')
        hdf5_saver.save(list(self.IdR), subpath + 'index_identity_right')
        hdf5_saver.save(self.bc, subpath + 'boundary_condition')
        hdf5_saver.save(self.max_range, subpath + 'max_range')
        h5gr.attrs['grouped'] = self.grouped
        h5gr.attrs['explicit_plus_hc'] = self.explicit_plus_hc
        h5gr.attrs['L'] = self.L

    @classmethod
    def from_hdf5(cls, hdf5_loader, h5gr, subpath):
        obj = cls.__new__(cls)
        hdf5_loader.memorize_load(h5gr, obj)
        obj.sites = list(hdf5_loader.load(subpath + 'sites'))
        obj.chinfo = hdf5_loader.load(subpath + 'chinfo')
        obj._W = list(hdf5_loader.load(subpath + 'tensors'))
        obj.IdL = list(hdf5_loader.load(subpath + 'index_identity_left'))
        obj.IdR = list(hdf5_loader.load(subpath + 'index_identity_right'))
        obj.bc = hdf5_loader.load(subpath + 'boundary_condition')
        obj.max_range = hdf5_loader.load(subpath + 'max_range')
        obj.grouped = int(h5gr.attrs.get('grouped', 1))
        obj.explicit_plus_hc = bool(h5gr.attrs.get('explicit_plus_hc', False))
        obj.dtype = jnp.result_type(*[W.dtype for W in obj._W])
        return obj

    def __repr__(self):
        return f"<MPO L={self.L} bc={self.bc!r} max_chi={max(self.chi)}>"

    # ---------------------------------------------------------------- access
    def get_W(self, i, copy=False):
        i = self._to_valid_index(i)
        W = self._W[i]
        return W.copy(deep=False) if copy else W

    def set_W(self, i, W):
        self._W[self._to_valid_index(i)] = W

    def get_IdL(self, i):
        """IdL index on the bond *left* of site i."""
        return self.IdL[self._to_valid_index(i)]

    def get_IdR(self, i):
        """IdR index on the bond *right* of site i."""
        i = self._to_valid_index(i)
        if i + 1 == self.L and self.bc == 'infinite':
            return self.IdR[0]
        return self.IdR[i + 1]

    def _to_valid_index(self, i):
        if self.finite or self.bc == 'segment':
            if i < 0:
                i += self.L
            if not 0 <= i < self.L:
                raise IndexError(i)
            return i
        return i % self.L

    # ---------------------------------------------------------------- constructors
    @classmethod
    def from_grids(cls, sites, grids, bc='finite', IdL=None, IdR=None, Ws_qtotal=None,
                   legs=None, max_range=None, explicit_plus_hc=False):
        """Build an MPO from per-site grids of operator entries.

        Grid entries: ``None`` | opname str | ``[(opname, strength), ...]`` | npc Array.
        Reference: ``tenpy/networks/mpo.py:496``.
        """
        sites = list(sites)
        L = len(sites)
        chinfo = sites[0].leg.chinfo
        grids = [grid_insert_ops(sites[i], grids[i]) for i in range(L)]
        if legs is None:
            legs = _calc_grid_legs(chinfo, grids, bc, IdL, IdR)
        Ws = []
        for i in range(L):
            grid = grids[i]
            legL = legs[i]
            legR = legs[i + 1] if i + 1 < len(legs) else legs[0]
            grid_obj = np.empty((len(grid), len(grid[0])), dtype=object)
            for a, row in enumerate(grid):
                for b, entry in enumerate(row):
                    grid_obj[a, b] = entry
            W = npc.grid_outer(grid_obj, [legL, legR.conj()],
                               grid_labels=['wL', 'wR'])
            Ws.append(W)
        return cls(sites, Ws, bc, IdL, IdR, max_range, explicit_plus_hc)

    @classmethod
    def from_wavepacket(cls, sites, coeff, op, eps=1e-15):
        r"""MPO for ``sum_i coeff[i] op_i`` (e.g. a wavepacket creation operator).

        Reference: ``tenpy/networks/mpo.py:589``."""
        L = len(sites)
        graph = MPOGraph(sites, 'finite')
        for i, c in enumerate(coeff):
            if abs(c) > eps:
                graph.add(i, 'IdL', 'IdR', op, c)
        graph.add_missing_IdL_IdR()
        return graph.build_MPO()

    # ---------------------------------------------------------------- arithmetic
    def dagger(self):
        """Hermitian conjugate MPO. Reference: ``mpo.py:1491``."""
        Ws = []
        for W in self._W:
            Wd = W.conj().itranspose(['wL*', 'wR*', 'p*', 'p'])
            Wd.iset_leg_labels(['wL', 'wR', 'p', 'p*'])
            # conjugated w legs have flipped charges; gauge back to standard qconj
            Ws.append(Wd)
        res = MPO(self.sites, Ws, self.bc, list(self.IdL), list(self.IdR),
                  self.max_range)
        return res

    def is_hermitian(self, eps=1e-10, max_range=None):
        """Check hermiticity (finite: dense check for small L; else W-wise check)."""
        if self.finite and self.L <= 8 and np.prod(self.dim) <= 256:
            H = self.to_matrix()
            Hd = H.conj().itranspose([1, 0])
            Hd.legs = H.legs
            return npc.norm(H._binary(Hd, lambda a, b: a - b)) < eps * max(
                npc.norm(H), 1e-10)
        # W-wise: compare W with its dagger up to leg permutations (heuristic)
        try:
            d = self.dagger()
        except Exception:
            return False
        for W, Wd in zip(self._W, d._W):
            a = np.asarray(W.to_ndarray())
            b = np.asarray(Wd.to_ndarray())
            if a.shape != b.shape or not np.allclose(a, b, atol=eps):
                return False
        return True

    def to_matrix(self):
        """Contract the full (finite) MPO to a 2-leg Array (small systems only)."""
        assert self.finite
        res = None
        for i in range(self.L):
            W = self.get_W(i).replace_labels(['p', 'p*'], [f'p{i}', f'p{i}*'])
            if res is None:
                res = W
            else:
                res = npc.tensordot(res, W, axes=[['wR'], ['wL']])
        # project onto IdL on left, IdR on right
        res = _project_onto_w_index(res, 'wL', self.IdL[0])
        res = _project_onto_w_index(res, 'wR', self.IdR[-1])
        combine = [[f'p{i}' for i in range(self.L)], [f'p{i}*' for i in range(self.L)]]
        res = res.combine_legs(combine, qconj=[+1, -1])
        res.iset_leg_labels(['p', 'p*'])
        if self.explicit_plus_hc:
            resd = res.conj().itranspose([1, 0])
            resd.legs = res.legs
            res = res._binary(resd, lambda a, b: a + b)
        return res

    def __add__(self, other):
        """Direct sum of MPOs sharing the IdL/IdR channels. Reference: ``mpo.py:2031``."""
        if not isinstance(other, MPO):
            return NotImplemented
        assert self.L == other.L and self.bc == other.bc
        L = self.L
        # per-bond index maps: shared IdL -> 0, shared IdR -> last, rest in order
        n_bonds = L + 1
        maps1 = [None] * n_bonds
        maps2 = [None] * n_bonds
        new_IdL = [None] * n_bonds
        new_IdR = [None] * n_bonds
        new_qflat = [None] * n_bonds
        for b in range(n_bonds):
            if self.bc == 'infinite' and b == L:
                maps1[b], maps2[b] = maps1[0], maps2[0]
                new_IdL[b], new_IdR[b] = new_IdL[0], new_IdR[0]
                continue
            W1 = self.get_W(min(b, L - 1))
            W2 = other.get_W(min(b, L - 1))
            legname = 'wL' if b < L else 'wR'
            leg1 = W1.get_leg(legname)
            leg2 = W2.get_leg(legname)
            n1, n2 = leg1.ind_len, leg2.ind_len
            IdL1, IdL2 = self.IdL[b], other.IdL[b]
            IdR1, IdR2 = self.IdR[b], other.IdR[b]
            share_IdL = IdL1 is not None and IdL2 is not None
            share_IdR = IdR1 is not None and IdR2 is not None
            rest1 = [x for x in range(n1)
                     if not (share_IdL and x == IdL1) and not (share_IdR and x == IdR1)]
            rest2 = [x for x in range(n2)
                     if not (share_IdL and x == IdL2) and not (share_IdR and x == IdR2)]
            n_new = len(rest1) + len(rest2) + (1 if share_IdL else 0) + \
                (1 if share_IdR else 0)
            m1 = np.full(n1, -1, int)
            m2 = np.full(n2, -1, int)
            pos = 0
            if share_IdL:
                m1[IdL1] = 0
                m2[IdL2] = 0
                new_IdL[b] = 0
                pos = 1
            for x in rest1:
                m1[x] = pos
                pos += 1
            for x in rest2:
                m2[x] = pos
                pos += 1
            if share_IdR:
                m1[IdR1] = n_new - 1
                m2[IdR2] = n_new - 1
                new_IdR[b] = n_new - 1
            if not share_IdL:
                new_IdL[b] = m1[IdL1] if IdL1 is not None else \
                    (m2[IdL2] if IdL2 is not None else None)
            if not share_IdR:
                new_IdR[b] = m1[IdR1] if IdR1 is not None else \
                    (m2[IdR2] if IdR2 is not None else None)
            maps1[b], maps2[b] = m1, m2
            # new leg charges
            qf1 = leg1.to_qflat() * (leg1.qconj if legname == 'wL' else -leg1.qconj)
            qf2 = leg2.to_qflat() * (leg2.qconj if legname == 'wL' else -leg2.qconj)
            qnew = np.zeros((n_new, self.chinfo.qnumber), QTYPE)
            for x in range(n1):
                qnew[m1[x]] = qf1[x]
            for x in range(n2):
                qnew[m2[x]] = qf2[x]
            new_qflat[b] = qnew
        legs = [LegCharge.from_qflat(self.chinfo, self.chinfo.make_valid(q), +1)
                for q in new_qflat[:L]]
        if self.bc == 'infinite':
            legs.append(legs[0])
        else:
            legs.append(LegCharge.from_qflat(self.chinfo,
                                             self.chinfo.make_valid(new_qflat[L]), +1))
        Ws = []
        for i in range(L):
            W1 = np.asarray(self.get_W(i).to_ndarray())
            W2 = np.asarray(other.get_W(i).to_ndarray())
            d = W1.shape[2]
            m1L, m2L = maps1[i], maps2[i]
            m1R, m2R = maps1[i + 1], maps2[i + 1]
            nL = len(new_qflat[i]) if new_qflat[i] is not None else len(new_qflat[0])
            nR = len(new_qflat[(i + 1) % n_bonds]) \
                if new_qflat[(i + 1) % n_bonds] is not None else len(new_qflat[0])
            if self.bc == 'infinite':
                nL = legs[i].ind_len
                nR = legs[i + 1].ind_len if i + 1 < L else legs[0].ind_len
            U = np.zeros((nL, nR, d, d), np.result_type(W1, W2))
            IdL1_L, IdR1_L = self.IdL[i], self.IdR[i]
            IdL1_R, IdR1_R = self.IdL[i + 1], self.IdR[i + 1]
            IdL2_L, IdR2_L = other.IdL[i], other.IdR[i]
            IdL2_R, IdR2_R = other.IdL[i + 1], other.IdR[i + 1]
            for a in range(W1.shape[0]):
                for b in range(W1.shape[1]):
                    U[m1L[a], m1R[b]] += W1[a, b]
            for a in range(W2.shape[0]):
                for b in range(W2.shape[1]):
                    # skip the identity-string cells already present from W1
                    if (a == IdL2_L and b == IdL2_R and IdL1_L is not None
                            and IdL1_R is not None):
                        continue
                    if (a == IdR2_L and b == IdR2_R and IdR1_L is not None
                            and IdR1_R is not None):
                        continue
                    U[m2L[a], m2R[b]] += W2[a, b]
            legL = legs[i]
            legR = legs[i + 1] if i + 1 < L else legs[L] if self.bc != 'infinite' \
                else legs[0]
            W = npc.Array.from_ndarray(
                np.asarray(U), [legL, legR.conj(), self.get_W(i).get_leg('p'),
                                 self.get_W(i).get_leg('p*')],
                labels=['wL', 'wR', 'p', 'p*'], warn_wrong_sector=False)
            Ws.append(W)
        mr = None
        if self.max_range is not None and other.max_range is not None:
            mr = max(self.max_range, other.max_range)
        return MPO(self.sites, Ws, self.bc, new_IdL, new_IdR, mr,
                   self.explicit_plus_hc and other.explicit_plus_hc)

    # ---------------------------------------------------------------- application
    def expectation_value(self, psi, tol=1e-10, max_range=100, init_env_data=None):
        """<psi|H|psi> (finite: exact contraction; infinite: energy density per site).

        Reference: ``tenpy/networks/mpo.py:1111``."""
        if psi.finite:
            env = MPOEnvironment(psi, self, psi)
            return np.real_if_close(env.full_contraction(0))
        return self.expectation_value_TM(psi, tol=tol, max_range=max_range)

    def expectation_value_TM(self, psi, tol=1e-10, max_range=100):
        """Energy density of an iMPS from the MPO transfer-matrix fixed point.

        Reference: ``mpo.py:1173``."""
        _, Es, _ = MPOTransferMatrix.find_init_LP_RP(self, psi, calc_E=True)
        return float(np.real(np.mean(Es)))

    def variance(self, psi, exact_E=None):
        """<psi|H^2|psi> - <psi|H|psi>^2 for finite psi. Reference: ``mpo.py:1296``."""
        assert psi.finite
        Hpsi = self.apply_naively(psi.copy())
        norm_Hpsi2 = Hpsi.overlap(Hpsi)  # overlap includes the norm factors
        if exact_E is None:
            exact_E = self.expectation_value(psi)
        return np.real(norm_Hpsi2 - exact_E ** 2)

    def apply(self, psi, options):
        """Apply the MPO to an MPS in place, compressing afterwards.

        Options: ``compression_method`` in {'SVD', 'zip_up', 'variational'},
        ``trunc_params``.  Reference: ``mpo.py:1562``.
        """
        from ..tools.params import asConfig
        options = asConfig(options, 'MPO_apply')
        method = options.get('compression_method', 'zip_up')
        if method == 'SVD':
            self.apply_naively(psi)
            return psi.compress_svd(options.subconfig('trunc_params'))
        elif method == 'zip_up':
            trunc_err = self.apply_zipup(psi, options)
            trunc_err += psi.compress_svd(options.subconfig('trunc_params'))
            return trunc_err
        elif method == 'variational':
            from ..algorithms.mps_common import VariationalApplyMPO
            return VariationalApplyMPO(psi, self, options).run()
        raise ValueError(f"unknown compression_method {method!r}")

    def apply_naively(self, psi):
        """Contract W into each B (bond dimension multiplies). Reference: ``mpo.py:1672``-ish."""
        bc = psi.bc
        if bc == 'finite':
            for i in range(psi.L):
                # 'B' form, NOT the raw stored tensor: a mixed-canonical
                # state (e.g. fresh out of DMRG, A-forms left of the center)
                # is only the product of its raw tensors with diag(S)
                # inserted at the A/B boundary — right-canonical B-forms with
                # the trivial S[0] boundary ARE the state (measured: raw
                # form=None on a mixed state inflated <H^2> by ~2x)
                B = psi.get_B(i, 'B')
                W = self.get_W(i)
                B = npc.tensordot(B, W, axes=[['p'], ['p*']])
                if i == 0 and self.IdL[0] is not None:
                    B = _project_onto_w_index(B, 'wL', self.IdL[0])
                    B = B.combine_legs([['wR', 'vR']], qconj=[-1])
                    B.ireplace_label('(wR.vR)', 'vR')
                elif i == psi.L - 1 and self.IdR[-1] is not None:
                    B = _project_onto_w_index(B, 'wR', self.IdR[-1])
                    B = B.combine_legs([['wL', 'vL']], qconj=[+1])
                    B.ireplace_label('(wL.vL)', 'vL')
                else:
                    B = B.combine_legs([['wL', 'vL'], ['wR', 'vR']], qconj=[+1, -1])
                    B.ireplace_labels(['(wL.vL)', '(wR.vR)'], ['vL', 'vR'])
                B.itranspose(['vL', 'p', 'vR'])
                psi.set_B(i, B, None)
        else:
            for i in range(psi.L):
                B = psi.get_B(i, 'B')
                W = self.get_W(i)
                B = npc.tensordot(B, W, axes=[['p'], ['p*']])
                B = B.combine_legs([['wL', 'vL'], ['wR', 'vR']], qconj=[+1, -1])
                B.ireplace_labels(['(wL.vL)', '(wR.vR)'], ['vL', 'vR'])
                B.itranspose(['vL', 'p', 'vR'])
                psi.set_B(i, B, None)
        # new Schmidt values unknown; placeholders
        for b in range(psi.L + 1):
            n = psi.get_B(min(b, psi.L - 1), None).get_leg(
                'vL' if b < psi.L else 'vR').ind_len
            psi._S[b] = np.ones(n) / np.sqrt(n)
        if bc == 'finite':
            psi.canonical_form_finite(renormalize=False)
        else:
            psi.canonical_form_infinite()
        return psi

    def apply_zipup(self, psi, options):
        """Zip-up application: contract + truncate on the fly (cheaper than naive).

        Reference: ``tenpy/networks/mpo.py:1679`` / arXiv:1002.1305.
        """
        from ..tools.params import asConfig
        options = asConfig(options, 'zip_up')
        trunc_params = options.subconfig('trunc_params')
        trunc_weight = options.get('trunc_weight', 1., 'real')
        relax = dict(trunc_params.as_dict())
        if trunc_weight < 1. and relax.get('svd_min') is not None:
            relax['svd_min'] = relax['svd_min'] * trunc_weight
        if relax.get('chi_max') is not None:
            relax['chi_max'] = int(relax['chi_max'] * (2 if trunc_weight < 1. else 1))
        assert psi.finite
        trunc_err = TruncationError()
        carry = None  # tensor with legs vL, wL, p? no: (vL) pending
        for i in range(psi.L):
            B = psi.get_B(i, 'B' if i > 0 else 'Th')
            W = self.get_W(i)
            if carry is None:
                C = npc.tensordot(B, W, axes=[['p'], ['p*']])
                C = _project_onto_w_index(C, 'wL', self.IdL[0])
                C.itranspose(['vL', 'p', 'wR', 'vR'])
            else:
                C = npc.tensordot(carry, B, axes=[['vR'], ['vL']])
                C = npc.tensordot(C, W, axes=[['wR', 'p'], ['wL', 'p*']])
                C.itranspose(['vL', 'p', 'wR', 'vR'])
            if i == psi.L - 1:
                C = _project_onto_w_index(C, 'wR', self.IdR[-1])
                psi.set_B(i, C.itranspose(['vL', 'p', 'vR']), None)
                break
            theta = C.combine_legs([['vL', 'p'], ['wR', 'vR']], qconj=[+1, -1])
            U, S, VH, err, renorm = svd_theta(theta, relax)
            trunc_err += err
            A = U.split_legs([0])
            psi.set_B(i, A, 'A')
            psi.set_SR(i, S)
            carry = VH.iscale_axis(np.asarray((S)) * renorm, 0).split_legs([1])
        psi.canonical_form_finite(renormalize=False)
        return trunc_err

    # ---------------------------------------------------------------- time evolution
    def make_U(self, dt, approximation='II'):
        """U ~= exp(-dt H) as an MPO (W_I / W_II approximation).

        ``dt`` may be complex (``1j*delta_t`` for real-time evolution convention:
        U = exp(-dt H) with the reference's sign handling done by the caller).
        Reference: ``tenpy/networks/mpo.py:959``.
        """
        if approximation == 'II':
            return self.make_U_II(dt)
        elif approximation == 'I':
            return self.make_U_I(dt)
        raise ValueError(f"unknown approximation {approximation!r}")

    def make_U_I(self, dt):
        """W_I approximation: U_ij = 1_ij + dt sum_ab A_a ... (first order in the MPO
        decomposition H = sum 1 x ... x A x ... ).  Reference: ``mpo.py:959-1110``."""
        keeps, bond_legs = _wII_bond_data(self)
        U = []
        for i in range(self.L):
            W = self.get_W(i)
            IdL = self.get_IdL(i)
            IdR = self.get_IdR(i)
            if IdL is None or IdR is None:
                raise ValueError("W_I needs IdL/IdR")
            bR = (i + 1) % self.L if self.bc == 'infinite' else i + 1
            U.append(_make_WI_tensor(W, IdL, IdR, dt, keeps[i], keeps[bR],
                                     bond_legs[i], bond_legs[bR].conj()))
        return MPO(self.sites, U, self.bc,
                   IdL=[0] * (self.L + 1), IdR=[0] * (self.L + 1),
                   max_range=self.max_range)

    def make_U_II(self, dt):
        """W_II approximation (arXiv:1407.1832). Reference: ``mpo.py:2149`` make_W_II."""
        keeps, bond_legs = _wII_bond_data(self)
        U = []
        for i in range(self.L):
            W = self.get_W(i)
            IdL = self.get_IdL(i)
            IdR = self.get_IdR(i)
            if IdL is None or IdR is None:
                raise ValueError("W_II needs IdL/IdR")
            bR = (i + 1) % self.L if self.bc == 'infinite' else i + 1
            U.append(_make_WII_tensor(W, IdL, IdR, dt, keeps[i], keeps[bR],
                                      bond_legs[i], bond_legs[bR].conj()))
        return MPO(self.sites, U, self.bc,
                   IdL=[0] * (self.L + 1), IdR=[0] * (self.L + 1),
                   max_range=self.max_range)

    def sort_legcharges(self):
        """Sort virtual legs by charge (permuting IdL/IdR indices accordingly).

        Reference: ``mpo.py:909``."""
        perms = [None] * (self.L + 1)
        new_legs = [None] * (self.L + 1)
        for i in range(self.L):
            leg = self._W[i].get_leg('wL')
            if not leg.is_sorted():
                perm, new_leg = leg.sort(bunch=False)
                perms[i] = np.asarray(perm)
                new_legs[i] = new_leg
        # apply permutations: W[i] legs wL (perm[i]) and wR (perm[i+1])
        for i in range(self.L):
            W = self._W[i]
            pL = perms[i]
            pR = perms[(i + 1) % self.L] if self.bc == 'infinite' else \
                (perms[i + 1] if i + 1 <= self.L - 1 else None)
            if pL is None and pR is None:
                continue
            dense = np.asarray(W.to_ndarray())
            if pL is not None:
                dense = dense[pL, :, :, :]
            if pR is not None:
                dense = dense[:, pR, :, :]
            legL = new_legs[i] if new_legs[i] is not None else W.get_leg('wL')
            if self.bc == 'infinite':
                legR_src = new_legs[(i + 1) % self.L]
            else:
                legR_src = new_legs[i + 1] if i + 1 < self.L else None
            legR = legR_src.conj() if legR_src is not None else W.get_leg('wR')
            self._W[i] = npc.Array.from_ndarray(
                np.asarray(dense), [legL, legR, W.get_leg('p'), W.get_leg('p*')],
                labels=['wL', 'wR', 'p', 'p*'], warn_wrong_sector=False)
        # update IdL/IdR
        from ..tools.misc import inverse_permutation
        for b in range(self.L + 1):
            p = perms[b % self.L] if self.bc == 'infinite' else \
                (perms[b] if b < self.L else None)
            if p is None:
                continue
            inv = inverse_permutation(p)
            if self.IdL[b] is not None:
                self.IdL[b] = int(inv[self.IdL[b]])
            if self.IdR[b] is not None:
                self.IdR[b] = int(inv[self.IdR[b]])
        return self


def grid_insert_ops(site, grid):
    """Convert grid entries (str | [(str, strength)] | Array | None) to npc ops."""
    new_grid = []
    for row in grid:
        new_row = []
        for entry in row:
            if entry is None:
                new_row.append(None)
            elif isinstance(entry, npc.Array):
                new_row.append(entry)
            elif isinstance(entry, str):
                new_row.append(site.get_op(entry))
            else:
                op = None
                for opname, strength in entry:
                    term = site.get_op(opname) * strength
                    op = term if op is None else op + term
                new_row.append(op)
        new_grid.append(new_row)
    return new_grid


def _calc_grid_legs(chinfo, grids, bc, IdL, IdR):
    """Propagate charges through the grids to determine the virtual leg charges."""
    L = len(grids)
    n_states = [len(grids[i]) for i in range(L)] + [len(grids[L - 1][0])]
    qs = [[None] * n for n in n_states]
    qs[0][IdL[0] if IdL and IdL[0] is not None else 0] = chinfo.make_valid()
    if bc == 'finite':
        passes = 1
    else:
        # bond L == bond 0
        passes = L + 2
    for _ in range(passes):
        for i in range(L):
            grid = grids[i]
            for a, row in enumerate(grid):
                if qs[i][a] is None:
                    continue
                for b, op in enumerate(row):
                    if op is None:
                        continue
                    q = chinfo.make_valid(qs[i][a] + np.asarray(op.qtotal, QTYPE))
                    j = i + 1
                    if j == L and bc == 'infinite':
                        tgt = qs[0]
                        b_eff = b
                        if tgt[b_eff] is None:
                            tgt[b_eff] = q
                    else:
                        if qs[j][b] is None:
                            qs[j][b] = q
        if bc == 'infinite':
            qs[L] = qs[0]
    # fill remaining with 0
    legs = []
    for bqs in qs[:L] + ([qs[L]] if bc != 'infinite' else []):
        qflat = np.array([q if q is not None else chinfo.make_valid()
                          for q in bqs], QTYPE).reshape(len(bqs), chinfo.qnumber)
        legs.append(LegCharge.from_qflat(chinfo, qflat, qconj=+1))
    if bc == 'infinite':
        legs.append(legs[0])
    return legs


def _project_onto_w_index(a, label, idx):
    """Select a single index of the `label` leg (removing the leg)."""
    leg = a.get_leg(label)
    mask = np.zeros(leg.ind_len, bool)
    mask[idx] = True
    res = a.copy(deep=False).iproject([mask], [label])
    return res.squeeze([res.get_leg_index(label)])


def _wII_bond_data(H):
    """Per-bond kept-index lists and new bond legs for U^I/U^II.

    On each bond the original IdL *and* IdR channels are merged into the single
    new Id channel (index 0); all other states are kept.  Building ONE leg per
    bond (and conjugating it for the wR side of the left site) guarantees that
    adjacent U tensors share contractible virtual legs, even when IdL != IdR.
    """
    L = H.L
    n_bonds = L if H.bc == 'infinite' else L + 1
    keeps, legs = [], []
    for b in range(n_bonds):
        if b < L:
            leg = H.get_W(b).get_leg('wL')
        else:
            leg = H.get_W(L - 1).get_leg('wR').conj()
        drop = {x for x in (H.IdL[b], H.IdR[b]) if x is not None}
        keep = [x for x in range(leg.ind_len) if x not in drop]
        chinfo = leg.chinfo
        qflat = leg.to_qflat()
        rows = [chinfo.make_valid()] + [qflat[x] * leg.qconj for x in keep]
        new_leg = LegCharge.from_qflat(chinfo, chinfo.make_valid(np.array(rows)), +1)
        keeps.append(keep)
        legs.append(new_leg)
    return keeps, legs


def _make_WI_tensor(W, IdL, IdR, dt, keepL, keepR, legL, legR):
    """U^I tensor with the block structure [[1 + dt D, sqrt(dt) C],
    [sqrt(dt) B, A]] when W = [[1, C, D], [0, A, B], [0, 0, 1]]:
    A = W[keepL, keepR], B = W[keepL, IdR], C = W[IdL, keepR], D = W[IdL, IdR],
    where keepL/keepR drop both Id channels of the respective bond
    (see :func:`_wII_bond_data`).
    """
    dense = np.asarray(W.to_ndarray())  # (wL, wR, p, p*)
    DL, DR, d, _ = dense.shape
    A = dense[np.ix_(keepL, keepR)]
    B = dense[keepL, IdR]          # (nL, d, d)
    C = dense[IdL, keepR]          # (nR, d, d)
    D = dense[IdL, IdR]            # (d, d)
    dt = -dt  # convention: make_U(dt) = exp(-dt*H) ~= 1 - dt*H
    sqdt = np.sqrt(complex(dt)) if not np.isrealobj(np.array(dt)) or dt < 0 \
        else np.sqrt(dt)
    nL, nR = len(keepL), len(keepR)
    U = np.zeros((1 + nL, 1 + nR, d, d), complex if np.iscomplexobj(sqdt) or
                 np.iscomplexobj(dense) else float)
    eye = np.eye(d)
    U[0, 0] = eye + dt * D
    for b in range(nR):
        U[0, 1 + b] = sqdt * C[b]
    for a in range(nL):
        U[1 + a, 0] = sqdt * B[a]
        for b in range(nR):
            U[1 + a, 1 + b] = A[a, b]
    legs = [legL, legR, W.get_leg('p'), W.get_leg('p*')]
    return npc.Array.from_ndarray(np.asarray(U), legs,
                                  labels=['wL', 'wR', 'p', 'p*'],
                                  warn_wrong_sector=False)


def _make_WII_tensor(W, IdL, IdR, dt, keepL, keepR, legL, legR):
    r"""W_II tensor (arXiv:1407.1832 eq. 11-12): matrix elements built from the
    exponential of the local [[D, C], [B, A]] structure via auxiliary bosonic modes.

    Practical evaluation (as in the reference ``make_W_II``): for each pair of "in"
    row a and "out" column b, compute phi = exp(t*(D + ...)) expansions:
    U[0,0] = exp(dt D); U[0,b] = sqrt(dt) [exp-series with C_b]; U[a,0] likewise with
    B_a; U[a,b] = [series with B_a, C_b, A_ab].  We evaluate with the auxiliary
    2-dimensional hard-core boson trick: represent each of the two auxiliary modes by
    a 2x2 nilpotent matrix and matrix-exponentiate the d*4 x d*4 generator.
    """
    import scipy.linalg
    dense = np.asarray(W.to_ndarray())
    DL, DR, d, _ = dense.shape
    A = dense[np.ix_(keepL, keepR)]
    B = dense[keepL, IdR]
    C = dense[IdL, keepR]
    D = dense[IdL, IdR]
    t = -dt  # convention: make_U(dt) = exp(-dt*H)
    sq_t = np.sqrt(complex(t)) if np.iscomplexobj(np.asarray(t)) or \
        (np.isrealobj(np.asarray(t)) and np.real(t) < 0) else np.sqrt(t)
    nL, nR = len(keepL), len(keepR)
    dtype = complex if (np.iscomplexobj(np.asarray(sq_t)) or np.iscomplexobj(dense)) \
        else float
    U = np.zeros((1 + nL, 1 + nR, d, d), dtype)
    # auxiliary hard-core bosons: creation ops on C2
    cdag = np.array([[0., 0.], [1., 0.]])
    proj0 = np.array([1., 0.])  # vacuum
    proj1 = np.array([0., 1.])
    for a in range(nL + 1):
        for b in range(nR + 1):
            # generator on (aux_a 2) x (aux_b 2) x (phys d)
            Ba = B[a - 1] if a > 0 else np.zeros((d, d))
            Cb = C[b - 1] if b > 0 else np.zeros((d, d))
            Aab = A[a - 1, b - 1] if (a > 0 and b > 0) else np.zeros((d, d))
            G = (np.kron(np.kron(np.eye(2), np.eye(2)), t * D)
                 + np.kron(np.kron(cdag, np.eye(2)), sq_t * Ba)
                 + np.kron(np.kron(np.eye(2), cdag), sq_t * Cb)
                 + np.kron(np.kron(cdag, cdag), Aab))
            expG = scipy.linalg.expm(G)
            # project: <n_a=a>0, n_b=b>0 | expG | 0, 0>
            va = proj1 if a > 0 else proj0
            vb = proj1 if b > 0 else proj0
            vec_out = np.kron(np.kron(va, vb), np.eye(d))
            vec_in = np.kron(np.kron(proj0, proj0), np.eye(d))
            U[a, b] = vec_out @ expG @ vec_in.T
    legs = [legL, legR, W.get_leg('p'), W.get_leg('p*')]
    return npc.Array.from_ndarray(np.asarray(U), legs,
                                  labels=['wL', 'wR', 'p', 'p*'],
                                  warn_wrong_sector=False)


# ======================================================================== MPOGraph
class MPOGraph:
    """Finite-state-machine representation of a sum of terms -> MPO compiler.

    States live on bonds; edges on sites carry ``(opname, strength)``.
    Reference: ``tenpy/networks/mpo.py:2227``.
    """

    def __init__(self, sites, bc='finite', max_range=None):
        self.sites = list(sites)
        self.chinfo = self.sites[0].leg.chinfo
        self.bc = bc
        self.max_range = max_range
        self.L = L = len(self.sites)
        n_bonds = L + 1 if bc == 'finite' else L
        self.states = [dict() for _ in range(n_bonds)]   # key -> index (index later)
        self.graph = [dict() for _ in range(L)]          # keyL -> keyR -> [(op, c)]
        self._ordered_states = None

    @classmethod
    def from_terms(cls, terms, sites, bc, insert_all_id=True):
        """Build graph from (onsite_terms, coupling_terms, exp_decaying_terms, ...).

        Reference: ``mpo.py:2286``."""
        graph = cls(sites, bc)
        for t in terms:
            if t is not None:
                t.add_to_graph(graph)
        graph.add_missing_IdL_IdR(insert_all_id)
        return graph

    @classmethod
    def from_term_list(cls, term_list, sites, bc, insert_all_id=True):
        """Build graph from a :class:`~tenpy_tpu.networks.terms.TermList`."""
        ot, ct = term_list.to_OnsiteTerms_CouplingTerms(sites)
        return cls.from_terms([ot, ct], sites, bc, insert_all_id)

    def _bond(self, b):
        if self.bc == 'finite':
            return b
        return b % self.L

    def add(self, i, keyL, keyR, opname, strength, check_op=True, skip_existing=False):
        """Add edge keyL --opname*strength--> keyR at site i."""
        site_i = i % self.L
        if check_op and not self.sites[site_i].valid_opname(opname):
            raise ValueError(f"unknown op {opname!r} on site {site_i}")
        self.states[self._bond(i)].setdefault(keyL, None)
        self.states[self._bond(i + 1)].setdefault(keyR, None)
        d = self.graph[site_i].setdefault(keyL, {})
        entries = d.setdefault(keyR, [])
        if skip_existing and any(op == opname for op, _ in entries):
            return
        entries.append((opname, strength))

    def add_string_left_to_right(self, i, j, key, op_string, check_op=True):
        """Insert `op_string` edges on sites i+1..j-1 carrying `key`; return the key
        valid on bond j.

        For infinite bc, a string longer than the unit cell visits the same
        bond more than once; re-using one key there would create a CYCLE in the
        FSM (spurious arbitrarily-long couplings).  Keys therefore carry the
        winding number once the string wraps."""
        if isinstance(op_string, npc.Array):
            raise NotImplementedError("Array op_string not supported")

        def bond_key(b):
            if self.bc == 'finite':
                return key
            w = (b - (i + 1)) // self.L
            return key if w == 0 else (key, 'wind', w)

        for x in range(i + 1, j):
            self.add(x, bond_key(x), bond_key(x + 1), op_string, 1.,
                     check_op=check_op, skip_existing=True)
        return bond_key(j)

    def add_string_right_to_left(self, j, i, key, op_string, check_op=True):
        return self.add_string_left_to_right(i, j, key, op_string, check_op)

    def add_missing_IdL_IdR(self, insert_all_id=True):
        """Ensure IdL/IdR states exist on all bonds, connected by identity strings."""
        L = self.L
        if self.bc == 'finite':
            bonds_L = range(0, L)      # IdL on bonds 0..L-1
            bonds_R = range(1, L + 1)  # IdR on bonds 1..L
        else:
            bonds_L = range(0, L)
            bonds_R = range(0, L)
        for b in bonds_L:
            self.states[self._bond(b)].setdefault('IdL', None)
        for b in bonds_R:
            self.states[self._bond(b)].setdefault('IdR', None)
        # identity strings: IdL -> IdL on every site (except last for finite),
        # IdR -> IdR on every site (except first for finite)
        for i in range(L):
            if self.bc != 'finite' or i + 1 < L:
                d = self.graph[i].setdefault('IdL', {})
                if 'IdL' not in d:
                    d['IdL'] = [('Id', 1.)]
            if self.bc != 'finite' or i > 0:
                d = self.graph[i].setdefault('IdR', {})
                if 'IdR' not in d:
                    d['IdR'] = [('Id', 1.)]
        # ensure states dict includes them
        for i in range(L):
            for keyL, d in self.graph[i].items():
                self.states[self._bond(i)].setdefault(keyL, None)
                for keyR in d:
                    self.states[self._bond(i + 1)].setdefault(keyR, None)

    def test_sanity(self):
        for i in range(self.L):
            for keyL, d in self.graph[i].items():
                assert keyL in self.states[self._bond(i)]
                for keyR in d:
                    assert keyR in self.states[self._bond(i + 1)]

    def _order_states(self):
        """Assign indices: IdL first, IdR last, everything else in insertion order."""
        ordered = []
        for b, states in enumerate(self.states):
            keys = [k for k in states if k not in ('IdL', 'IdR')]
            res = []
            if 'IdL' in states:
                res.append('IdL')
            res.extend(keys)
            if 'IdR' in states:
                res.append('IdR')
            ordered.append({k: x for x, k in enumerate(res)})
        self._ordered_states = ordered
        return ordered

    def build_MPO(self, Ws_qtotal=None):
        """Compile the graph into an MPO (computing virtual leg charges).

        Reference: ``tenpy/networks/mpo.py:2523``."""
        self.test_sanity()
        if self.bc == 'infinite' and \
                not self.sites[0].leg.chinfo.trivial_shift:
            raise NotImplementedError(
                "infinite MPOs with position-dependent charges (dipole "
                "conservation) need charge shifts at the unit-cell wrap "
                "(reference mpo.py:2680) — use bc_MPS='finite'")
        ordered = self._order_states()
        L = self.L
        grids = []
        for i in range(L):
            bL = self._bond(i)
            bR = self._bond(i + 1)
            nL = len(ordered[bL])
            nR = len(ordered[bR])
            grid = [[None] * nR for _ in range(nL)]
            for keyL, d in self.graph[i].items():
                a = ordered[bL][keyL]
                for keyR, entries in d.items():
                    b = ordered[bR][keyR]
                    cell = grid[a][b]
                    if cell is None:
                        grid[a][b] = list(entries)
                    else:
                        cell.extend(entries)
            grids.append(grid)
        IdL = [s.get('IdL', None) for s in
               (ordered + [ordered[0]] if self.bc == 'infinite' else ordered)]
        IdR = [s.get('IdR', None) for s in
               (ordered + [ordered[0]] if self.bc == 'infinite' else ordered)]
        if self.bc == 'infinite':
            IdL = IdL[:L + 1]
            IdR = IdR[:L + 1]
        max_range = self.max_range
        H = MPO.from_grids(self.sites, grids, self.bc, IdL, IdR, Ws_qtotal,
                           max_range=max_range)
        return H

    def __repr__(self):
        return f"<MPOGraph L={self.L} bc={self.bc!r}>"


# ======================================================================== environments
class MPOEnvironment(BaseEnvironment):
    """Partial contractions of <bra|H|ket>.

    ``LP[i]`` has labels ``('vR*', 'wR', 'vR')``, ``RP[i]`` has ``('vL*', 'wL', 'vL')``.
    Reference: ``tenpy/networks/mpo.py:2740``.
    """

    def __init__(self, bra, H, ket, cache=None, **init_env_data):
        # signature matches the reference: (bra, H, ket)
        self.H = H
        super().__init__(bra, ket, cache, **init_env_data)
        self.dtype = jnp.result_type(bra.dtype, ket.dtype, H.dtype)

    def init_LP(self, i, start_env_sites=0):
        """Trivial LP: identity on the virtual legs, IdL index on the w leg."""
        i0 = i - start_env_sites
        leg_v = self.ket.get_B(i0, None).get_leg('vL')
        leg_w = self.H.get_W(i0).get_leg('wL')
        IdL = self.H.get_IdL(i0)
        if IdL is None:
            raise ValueError(f"no IdL on bond {i0}: can't initialize LP")
        LP = _env_init(leg_v, leg_w, IdL, self.dtype, left=True)
        for j in range(i0, i):
            LP = self._contract_LP(j, LP)
        return LP

    def init_RP(self, i, start_env_sites=0):
        i0 = i + start_env_sites
        leg_v = self.ket.get_B(i0, None).get_leg('vR')
        leg_w = self.H.get_W(i0).get_leg('wR')
        IdR = self.H.get_IdR(i0)
        if IdR is None:
            raise ValueError(f"no IdR on bond {i0 + 1}: can't initialize RP")
        RP = _env_init(leg_v, leg_w, IdR, self.dtype, left=False)
        for j in range(i0, i, -1):
            RP = self._contract_RP(j, RP)
        return RP

    def _extra_p(self):
        """Physical legs of the state beyond the MPO's 'p' (e.g. 'q' of a
        PurificationMPS): the MPO acts as identity on them — they contract
        bra-ket directly."""
        return [l for l in getattr(self.ket, '_p_label', ['p']) if l != 'p']

    def _contract_LP(self, i, LP):
        extra = self._extra_p()
        LP = npc.tensordot(LP, self.ket.get_B(i, 'A'), axes=[['vR'], ['vL']])
        LP = npc.tensordot(self.H.get_W(i), LP, axes=[['wL', 'p*'], ['wR', 'p']])
        LP = npc.tensordot(self.bra.get_B(i, 'A').conj(), LP,
                           axes=[['vL*', 'p*'] + [l + '*' for l in extra],
                                 ['vR*', 'p'] + extra])
        return LP.itranspose(['vR*', 'wR', 'vR'])

    def _contract_RP(self, i, RP):
        extra = self._extra_p()
        RP = npc.tensordot(self.ket.get_B(i, 'B'), RP, axes=[['vR'], ['vL']])
        RP = npc.tensordot(RP, self.H.get_W(i), axes=[['p', 'wL'], ['p*', 'wR']])
        RP = npc.tensordot(RP, self.bra.get_B(i, 'B').conj(),
                           axes=[['p', 'vL*'] + extra,
                                 ['p*', 'vR*'] + [l + '*' for l in extra]])
        return RP.itranspose(['vL*', 'wL', 'vL'])

    def full_contraction(self, i0):
        """<bra|H|ket>: contract LP[i0] with RP[i0-1] (S matrices inserted).

        Reference: ``mpo.py:3065``."""
        if self.ket.finite and i0 == 0:
            LP0 = self.init_LP(0)
            LP = self._contract_LP(0, LP0)
            RP = self.get_RP(0)
            LP = self._scale_S_axis(LP, self.bra.get_SR(0), 'vR*', conj=True)
            LP = self._scale_S_axis(LP, self.ket.get_SR(0), 'vR', conj=False)
            contr = npc.tensordot(LP, RP, axes=[['vR*', 'wR', 'vR'],
                                                ['vL*', 'wL', 'vL']])
        elif self.ket.finite and i0 == self.ket.L:
            # right edge: LP[L] would wrap mod L; contract the last site into
            # a fresh RP instead (bond L carries trivial S for finite bc).
            L = self.ket.L
            RP0 = self.init_RP(L - 1)
            RP = self._contract_RP(L - 1, RP0)
            LP = self.get_LP(L - 1)
            LP = self._scale_S_axis(LP, self.bra.get_SL(L - 1), 'vR*', conj=True)
            LP = self._scale_S_axis(LP, self.ket.get_SL(L - 1), 'vR', conj=False)
            contr = npc.tensordot(LP, RP, axes=[['vR*', 'wR', 'vR'],
                                                ['vL*', 'wL', 'vL']])
        else:
            LP = self.get_LP(i0)
            RP = self.get_RP(i0 - 1)
            LP = self._scale_S_axis(LP, self.bra.get_SL(i0), 'vR*', conj=True)
            LP = self._scale_S_axis(LP, self.ket.get_SL(i0), 'vR', conj=False)
            contr = npc.tensordot(LP, RP, axes=[['vR*', 'wR', 'vR'],
                                                ['vL*', 'wL', 'vL']])
        return complex(contr) * self.bra.norm * self.ket.norm

    @staticmethod
    def _scale_S_axis(T, S, axis, conj):
        """Multiply the Schmidt values onto one leg; S may be matrix-valued."""
        if isinstance(S, npc.Array):
            if conj:
                Sc = S.conj()
                T = npc.tensordot(T, Sc, axes=[[axis], ['vL*']])
                return T.ireplace_label('vR*', axis)
            T = npc.tensordot(T, S, axes=[[axis], ['vL']])
            return T.ireplace_label('vR', axis)
        arr = np.asarray(S)
        if conj:
            arr = np.conj(arr)
        return T.copy(deep=False).iscale_axis(arr, axis)

    def _contract_LHeff(self, LP, A):
        """LP * A for the effective Hamiltonian (combined legs handled by caller)."""
        return npc.tensordot(LP, A, axes=[['vR'], ['vL']])

    def expectation_value(self, *args, **kwargs):
        raise NotImplementedError("use full_contraction for <bra|H|ket>")


def _env_init(leg_v, leg_w, w_idx, dtype, left=True):
    """Build LP/RP init tensor: delta on virtual legs x unit vector on w leg."""
    if left:
        # legs (vR*, wR, vR):  vR* = leg_v (+1), wR = leg_w.conj() (-1), vR = leg_v.conj()
        diag = npc.diag(1., leg_v, dtype=dtype, labels=['vR*', 'vR'])
        w_leg = leg_w.conj()
        labels = ['vR*', 'wR', 'vR']
    else:
        # legs (vL*, wL, vL): vL* = leg_v.conj()? -- leg_v is the ket vR leg (qconj -1).
        # vL (contracting ket vR) needs +1: leg_v.conj(); vL* needs -1: leg_v.
        diag = npc.diag(1., leg_v.conj(), dtype=dtype, labels=['vL', 'vL*'])
        w_leg = leg_w.conj()
        labels = ['vL', 'wL', 'vL*']
    w_charge = w_leg.to_qflat()[w_idx]
    n_w = w_leg.ind_len
    vec = np.zeros(n_w)
    vec[w_idx] = 1.
    w_arr = npc.Array.from_ndarray(np.asarray(vec), [w_leg],
                                   qtotal=w_charge * w_leg.qconj,
                                   warn_wrong_sector=False)
    res = npc.outer(diag, w_arr)
    res.iset_leg_labels(labels[:1] + [labels[2] if left else labels[2]] + ['w']) \
        if False else None
    # outer gives legs (vR*, vR, w) / (vL, vL*, w); relabel & transpose
    if left:
        res.iset_leg_labels(['vR*', 'vR', 'wR'])
        res.itranspose(['vR*', 'wR', 'vR'])
    else:
        res.iset_leg_labels(['vL', 'vL*', 'wL'])
        res.itranspose(['vL*', 'wL', 'vL'])
    return res


class MPOTransferMatrix:
    """Transfer matrix of a Hamiltonian-like MPO sandwiched between canonical iMPS.

    With the MPO virtual leg split into IdL / interior / IdR channels (Schur
    form), the transfer matrix has a Jordan-block structure: its generalized
    dominant eigenvector is the converged environment and the linear-growth
    coefficient is the energy density.  :meth:`matvec` applies one unit cell and
    projects out the additive part, so a plain Arnoldi iteration converges to the
    fixed point with eigenvalue 1.  Reference: ``tenpy/networks/mpo.py:3694``.

    Parameters
    ----------
    transpose : bool
        False: ``matvec`` acts on RP (legs ``vL wL vL*``);
        True: on LP (legs ``vR* wR vR``).
    subtraction_gauge : 'rho' | 'trace'
        Which projector fixes the additive gauge freedom of the generalized
        eigenvector ('rho': density-matrix weighted -- the choice for which
        ``energy`` gives the energy density).
    """

    def __init__(self, H, psi, transpose=False, guess=None,
                 subtraction_gauge='rho'):
        if psi.finite or H.bc != 'infinite':
            raise ValueError("MPOTransferMatrix needs an infinite MPS/MPO")
        self.L = L = int(np.lcm(H.L, psi.L))
        norm_err = np.linalg.norm(psi.norm_test())
        if norm_err > 1e-6:
            logger.warning("MPOTransferMatrix: psi not in canonical form "
                           "(norm_err=%.2e); fixed point may be inaccurate", norm_err)
        self.H = H
        self.psi = psi
        self.transpose = transpose
        self.dtype = dtype = np.promote_types(
            np.dtype(str(H.dtype)), np.dtype(str(psi.get_B(0, None).dtype)))
        self.IdL = H.get_IdL(0)
        self.IdR = H.get_IdR(-1)
        if self.IdL is None or self.IdR is None:
            raise ValueError("MPO needs IdL/IdR structure")
        S = psi.get_SL(0)
        S_is_matrix = isinstance(S, npc.Array)
        if not S_is_matrix:
            S = np.asarray(S)
        self._M, self._W, self._Mc = [], [], []
        if not transpose:  # fixed point of RP (right-to-left)
            wR = H.get_W(L - 1).get_leg('wR')
            wL_leg = wR.conj()
            vR = psi.get_B(psi.L - 1, 'B').get_leg('vR')
            if S_is_matrix:  # e.g. UniformMPS center matrix C
                rho = npc.tensordot(S, S.conj(), axes=[['vL'], ['vL*']])
                rho.iset_leg_labels(['vR', 'vR*'])
            else:
                rho = npc.diag(S ** 2, vR, labels=['vR', 'vR*'])
            for i in range(L):
                B = psi.get_B(i, 'B')
                self._M.append(B)
                self._W.append(H.get_W(i))
                self._Mc.append(B.conj())
            self._chi0 = chi0 = vR.ind_len
            eye_R = npc.diag(1., vR.conj(), dtype=dtype, labels=['vL', 'vL*'])
            self._E_shift = eye_R.add_leg(wL_leg, self.IdL, axis=1, label='wL')
            self._proj_trace = self._E_shift.conj().iset_leg_labels(
                ['vR', 'wR', 'vR*']) / chi0
            self._proj_norm = eye_R.add_leg(wL_leg, self.IdR, axis=1,
                                            label='wL').conj()
            self._proj_rho = rho.add_leg(wR, self.IdL, axis=1, label='wR')
            self._guess_default = eye_R.add_leg(wL_leg, self.IdR, axis=1,
                                                label='wL')
            self._axes = (['vL', 'wL', 'vL*'], ['vR', 'wR', 'vR*'])
        else:  # fixed point of LP (left-to-right)
            wL = H.get_W(0).get_leg('wL')
            wR_leg = wL.conj()
            vL = psi.get_B(0, 'A').get_leg('vL')
            if S_is_matrix:
                rho = npc.tensordot(S.conj(), S, axes=[['vR*'], ['vR']])
                rho.iset_leg_labels(['vL*', 'vL'])
            else:
                rho = npc.diag(S ** 2, vL.conj(), labels=['vL*', 'vL'])
            for i in range(L):
                A = psi.get_B(i, 'A')
                self._M.append(A)
                self._W.append(H.get_W(i))
                self._Mc.append(A.conj())
            self._chi0 = chi0 = vL.ind_len
            eye_L = npc.diag(1., vL, dtype=dtype, labels=['vR*', 'vR'])
            self._E_shift = eye_L.add_leg(wR_leg, self.IdR, axis=1, label='wR')
            self._proj_trace = self._E_shift.conj().iset_leg_labels(
                ['vL*', 'wL', 'vL']) / chi0
            self._proj_norm = eye_L.add_leg(wR_leg, self.IdL, axis=1,
                                            label='wR').conj()
            self._proj_rho = rho.add_leg(wL, self.IdR, axis=1, label='wL')
            self._guess_default = eye_L.add_leg(wR_leg, self.IdL, axis=1,
                                                label='wR')
            self._axes = (['vR*', 'wR', 'vR'], ['vL*', 'wL', 'vL'])
        self._proj_subtr = self._proj_rho if subtraction_gauge == 'rho' \
            else self._proj_trace
        if guess is not None:
            try:
                guess = guess.transpose(self._axes[0])
                for lbl, leg in zip(self._axes[0], self._guess_default.legs):
                    guess.get_leg(lbl).test_equal(leg)
            except (ValueError, KeyError):
                logger.warning("MPOTransferMatrix: dropping incompatible guess")
                guess = None
            else:
                guess = self._project(guess)
        self.guess = guess if guess is not None else self._guess_default

    def matvec(self, vec, project=True):
        """Apply one unit cell of the transfer matrix (and project if requested)."""
        labels = ['vR*', 'wR', 'vR'] if self.transpose else ['vL', 'wL', 'vL*']
        if any(l is None for l in vec.get_leg_labels()):
            # coming from FlatLinearOperator's pipe roundtrip: order is preserved
            vec = vec.copy(deep=False)
            vec.iset_leg_labels(labels)
        if not self.transpose:
            vec = vec.transpose(['vL', 'wL', 'vL*'])
            for i in range(self.L - 1, -1, -1):
                vec = npc.tensordot(self._M[i], vec, axes=[['vR'], ['vL']])
                vec = npc.tensordot(vec, self._W[i],
                                    axes=[['p', 'wL'], ['p*', 'wR']])
                vec = npc.tensordot(vec, self._Mc[i],
                                    axes=[['vL*', 'p'], ['vR*', 'p*']])
                vec.itranspose(['vL', 'wL', 'vL*'])
        else:
            vec = vec.transpose(['vR*', 'wR', 'vR'])
            for i in range(self.L):
                vec = npc.tensordot(vec, self._M[i], axes=[['vR'], ['vL']])
                vec = npc.tensordot(self._W[i], vec,
                                    axes=[['wL', 'p*'], ['wR', 'p']])
                vec = npc.tensordot(self._Mc[i], vec,
                                    axes=[['p*', 'vL*'], ['p', 'vR*']])
                vec.itranspose(['vR*', 'wR', 'vR'])
        if project:
            vec = self._project(vec)
        return vec

    def _project(self, vec):
        """Subtract the additive (linearly growing) part from vec."""
        E = npc.inner(vec, self._proj_subtr, axes=self._axes, do_conj=False)
        return vec - self._E_shift * E

    def dominant_eigenvector(self, options=None):
        """Dominant eigenvector of the projected transfer matrix via Arnoldi.

        Returns ``(val, vec)`` with val ~ 1 and vec normalized such that the
        trace of its Id channel is chi0."""
        from ..linalg.sparse import FlatLinearOperator
        linop, v0 = FlatLinearOperator.from_guess_with_pipe(
            self.matvec, self.guess, dtype=self.dtype)
        n = linop.shape[0]
        if n <= 8:  # ARPACK needs k < n-1; tiny sectors (chi=1 states) go dense
            basis = np.eye(n, dtype=self.dtype)
            mat = np.stack([linop._matvec(basis[:, j]) for j in range(n)], axis=1)
            evals, evecs = np.linalg.eig(mat)
            order = np.argsort(-np.abs(evals))
            # the top eigenvalue can be degenerate (e.g. operator strings
            # passing through the whole unit cell): among the near-top
            # eigenvectors pick the one with the largest Id-channel trace,
            # which is the physical environment
            top = [j for j in order
                   if abs(abs(evals[j]) - abs(evals[order[0]])) < 1e-8]
            best = None
            for j in top:
                v_npc = linop.flat_to_npc(evecs[:, j]).split_legs([0])
                v_npc.iset_leg_labels(list(self._axes[0]))
                tr = abs(complex(npc.inner(self._proj_norm, v_npc,
                                           axes='range', do_conj=False)))
                if best is None or tr > best[0]:
                    best = (tr, j)
            val = evals[best[1]]
            vec = linop.flat_to_npc(evecs[:, best[1]])
        else:
            opts = dict(options or {})
            vals, vecs = linop.eigenvectors(num_ev=1, which='LM', v0_npc=v0,
                                            **opts)
            val, vec = vals[0], vecs[0]
        vec = vec.split_legs([0])
        vec.iset_leg_labels(list(self._axes[0]))
        norm = npc.inner(self._proj_norm, vec, axes='range',
                         do_conj=False) / self._chi0
        return val, vec / norm

    def energy(self, dom_vec):
        """Energy per MPS site, from the growth rate of the dominant eigenvector."""
        E0 = npc.inner(dom_vec, self._proj_rho, axes=self._axes, do_conj=False)
        vec = self.matvec(dom_vec, project=False)
        E = npc.inner(vec, self._proj_rho, axes=self._axes, do_conj=False)
        return (E - E0) / self.L

    @classmethod
    def find_init_LP_RP(cls, H, psi, calc_E=False, guess_init_env_data=None,
                        tol_ev0=1e-8, subtraction_gauge='rho', options=None,
                        method='auto'):
        """Converged initial LP/RP environments of an infinite MPS.

        Returns ``init_env_data`` dict (keys ``init_LP, init_RP, age_LP, age_RP``),
        plus ``(Es, E0)`` if calc_E: ``Es = [e_R, e_L]`` energy densities from
        either fixed point and ``E0`` the full <LP|S^2|RP> contraction.
        Reference: ``tenpy/networks/mpo.py`` same name.

        ``method='auto'`` first tries the channel-wise GMRES construction
        (:class:`~tenpy_tpu.networks.mpo_env_builder.MPOEnvironmentBuilder`,
        reference ``mpo.py:3373``), which stays accurate for states carrying
        noise-floor Schmidt values; MPOs without the required Schur structure
        fall back to the Arnoldi eigensolver (``method='arnoldi'``).
        """
        if method == 'auto' and psi.L == H.L:
            from .mpo_env_builder import MPOEnvironmentBuilder
            try:
                builder = MPOEnvironmentBuilder(H, psi)
                return builder.init_LP_RP_iterative(which='both', calc_E=calc_E)
            except (ValueError, NotImplementedError) as e:
                logger.debug("iterative env init not applicable (%s); "
                             "falling back to Arnoldi", e)
        if guess_init_env_data is None:
            guess_init_env_data = {}
        envs, Es = [], []
        for transpose in [False, True]:
            guess = guess_init_env_data.get(
                'init_LP' if transpose else 'init_RP', None)
            TM = cls(H, psi, transpose=transpose, guess=guess,
                     subtraction_gauge=subtraction_gauge)
            val, vec = TM.dominant_eigenvector(options=options)
            if abs(1. - val) > tol_ev0:
                logger.warning("MPOTransferMatrix eigenvalue not 1: got %s", val)
            if not jnp.issubdtype(psi.dtype, jnp.complexfloating) and \
                    not jnp.issubdtype(H.dtype, jnp.complexfloating):
                # real H, real psi: the dominant fixed point can be chosen
                # real; the Arnoldi eigenvector must not upcast the whole
                # downstream state (complex128 has no TPU support)
                vec = vec.real_if_close(tol=1e-10)
            envs.append(vec)
            if calc_E:
                Es.append(np.real_if_close(TM.energy(vec)))
        init_env_data = {'init_LP': envs[1], 'init_RP': envs[0],
                         'age_LP': 0, 'age_RP': 0}
        if not calc_E:
            return init_env_data
        SL = psi.get_SL(0)
        if isinstance(SL, npc.Array):
            E0 = npc.tensordot(envs[1], SL, axes=[['vR'], ['vL']])
            E0 = npc.tensordot(E0, SL.conj(), axes=[['vR*'], ['vL*']])
            E0 = npc.tensordot(E0, envs[0],
                               axes=[['vR', 'wR', 'vR*'], ['vL', 'wL', 'vL*']])
        else:
            SL = np.asarray(SL)
            LP = envs[1].copy(deep=False).iscale_axis(SL, 'vR')
            LP = LP.iscale_axis(SL, 'vR*')
            E0 = npc.tensordot(LP, envs[0],
                               axes=[['vR', 'wR', 'vR*'], ['vL', 'wL', 'vL*']])
        return init_env_data, Es, complex(E0)


def _take_w_index(a, label, idx):
    leg = a.get_leg(label)
    mask = np.zeros(leg.ind_len, bool)
    mask[idx] = True
    res = a.copy(deep=False).iproject([mask], [label])
    return res.squeeze([res.get_leg_index(label)])
