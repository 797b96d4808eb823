r"""Purification MPS for finite-temperature simulations.

Rebuild of ``tenpy/networks/purification_mps.py`` (PurificationMPS :132,
from_infiniteT :165; the purification scheme is documented in the reference module
header :1-130): each tensor has legs ``vL, p, q, vR`` where ``q`` is the ancilla
(auxiliary) leg purifying the density matrix,
``rho = Tr_q |psi><psi|``.  Physical operators act on ``p`` only.

The infinite-temperature state is the product of maximally entangled p-q pairs;
imaginary-time evolution ``exp(-beta H / 2)`` on the ``p`` legs produces Gibbs
states at inverse temperature ``beta``.
"""

from __future__ import annotations

import numpy as np

from ..linalg import np_conserved as npc
from ..linalg.charges import LegCharge
from .mps import MPS
from ..tools.math import entropy

__all__ = ['PurificationMPS']


class PurificationMPS(MPS):
    """MPS with a physical leg ``p`` and an ancilla leg ``q`` per site."""

    _p_label = ['p', 'q']

    # canonical forms act on both p and q; conventions identical to MPS otherwise

    def test_sanity(self):
        assert len(self._B) == self.L
        for B in self._B:
            assert set(B.get_leg_labels()) == {'vL', 'p', 'q', 'vR'}

    @classmethod
    def from_infiniteT(cls, sites, bc='finite', form='B', dtype=np.float64):
        """Infinite-temperature (identity) purification. Reference: ``:165``."""
        sites = list(sites)
        L = len(sites)
        Bs = []
        SVs = [np.ones(1)] * (L + 1)
        chinfo = sites[0].leg.chinfo
        legL = LegCharge.from_trivial(1, chinfo, qconj=+1)
        for site in sites:
            d = site.dim
            B = np.eye(d).reshape(1, d, d, 1) / np.sqrt(d)
            legs = [legL, site.leg, site.leg.conj(), legL.conj()]
            B_npc = npc.Array.from_ndarray(B, legs, labels=['vL', 'p', 'q', 'vR'],
                                           dtype=dtype, warn_wrong_sector=False)
            Bs.append(B_npc)
        res = cls.__new__(cls)
        MPS.__init__(res, sites, Bs, SVs, bc=bc, form=form)
        return res

    @classmethod
    def from_infiniteT_canonical(cls, sites, charge_sector, dtype=np.float64,
                                 conserve_ancilla_charge=False):
        r"""Infinite-temperature purification of the *canonical* ensemble:
        equal weight over all basis states with total charge ``charge_sector``
        (barthel2016, section VI.C).  Finite boundary conditions only.

        ``B[vL, p, q, vR] = delta_{p,q} delta_{Q(vL)+Q(p), Q(vR)}`` with bond
        legs enumerating the reachable partial charges; the ancilla leg is
        charge-less (``conserve_ancilla_charge=True`` is a round-2 item).
        Reference: ``tenpy/networks/purification_mps.py:262``.
        """
        if conserve_ancilla_charge:
            raise NotImplementedError("separate ancilla charges: round 2")
        sites = list(sites)
        L = len(sites)
        chinfo = sites[0].leg.chinfo
        charge_sector = tuple(int(q) for q in chinfo.make_valid(charge_sector))
        # forward / backward reachable partial charges
        site_charges = []
        for s in sites:
            leg = s.leg
            qs = [tuple(int(x) for x in np.asarray(leg.to_qflat()[i]) * leg.qconj)
                  for i in range(s.dim)]
            site_charges.append(qs)
        fwd = [{tuple([0] * chinfo.qnumber)}]
        for i in range(L):
            fwd.append({tuple(chinfo.make_valid(np.asarray(q) + np.asarray(qp)))
                        for q in fwd[-1] for qp in site_charges[i]})
        bwd = [None] * (L + 1)
        bwd[L] = {charge_sector}
        for i in range(L - 1, -1, -1):
            bwd[i] = {tuple(chinfo.make_valid(np.asarray(q) - np.asarray(qp)))
                      for q in bwd[i + 1] for qp in site_charges[i]}
        keep = [sorted(fwd[i] & bwd[i]) for i in range(L + 1)]
        if not keep[0] or not keep[L]:
            raise ValueError(f"charge sector {charge_sector} unreachable")
        legs_v = [LegCharge.from_qflat(chinfo,
                                       np.array(k, np.int64).reshape(len(k),
                                                                     chinfo.qnumber),
                                       qconj=+1)
                  for k in keep]
        Bs = []
        for i, site in enumerate(sites):
            d = site.dim
            nL, nR = len(keep[i]), len(keep[i + 1])
            idxR = {q: a for a, q in enumerate(keep[i + 1])}
            dense = np.zeros((nL, d, d, nR))
            for a, qL in enumerate(keep[i]):
                for p in range(d):
                    qR = tuple(chinfo.make_valid(np.asarray(qL)
                                                 + np.asarray(site_charges[i][p])))
                    b = idxR.get(qR)
                    if b is not None:
                        dense[a, p, p, b] = 1.
            q_leg = LegCharge.from_trivial(d, chinfo, qconj=-1)
            B = npc.Array.from_ndarray(
                dense, [legs_v[i], site.leg, q_leg, legs_v[i + 1].conj()],
                labels=['vL', 'p', 'q', 'vR'], dtype=dtype,
                warn_wrong_sector=False)
            Bs.append(B)
        SVs = [np.ones(l.ind_len) / np.sqrt(l.ind_len) for l in legs_v]
        res = cls.__new__(cls)
        MPS.__init__(res, sites, Bs, SVs, bc='finite', form=None)
        res.canonical_form_finite(renormalize=True)
        return res

    @classmethod
    def from_density_matrix(cls, sites, rho, cutoff=1e-16, normalize=True):
        r"""Purify a full density matrix: diagonalize ``rho = U D U^dag`` and build
        ``|psi> = sum_k sqrt(D_k) (U)_{ik} (U*)_{jk} |i>_p |j>_q``, then split into
        a (p, q)-legged MPS by successive SVDs.  Boundary conditions are finite.

        ``rho`` must have labels ``p0, p0*, ..., p{L-1}, p{L-1}*``.
        Reference: ``tenpy/networks/purification_mps.py:165``.
        """
        L = len(sites)
        rho = rho.combine_legs([[f'p{i}' for i in range(L)],
                                [f'p{i}*' for i in range(L)]], qconj=[+1, -1])
        D, U = npc.eigh(rho)
        D = np.asarray(D)
        if np.any(D < -1e-12):
            raise ValueError("density matrix is not positive semi-definite")
        D = np.where(D < 0, 0., D)
        psi = npc.tensordot(U.scale_axis(np.sqrt(D), 1), U.conj(),
                            axes=[[1], [1]])
        lab_p = '(' + '.'.join(f'p{i}' for i in range(L)) + ')'
        lab_ps = '(' + '.'.join(f'p{i}*' for i in range(L)) + ')'
        psi.iset_leg_labels([lab_p, lab_ps])
        psi = psi.split_legs()
        psi.ireplace_labels([f'p{i}*' for i in range(L)],
                            [f'q{i}' for i in range(L)])
        # split into B-form tensors pairing (p_i, q_i) per site
        from ..linalg.charges import LegCharge
        chinfo = sites[0].leg.chinfo
        triv = LegCharge.from_trivial(1, chinfo, qconj=+1)
        psi = psi.add_leg(triv, 0, axis=0, label='vL')
        psi = psi.add_leg(triv.conj(), 0, axis=psi.rank, label='vR')
        Bs = [None] * L
        SVs = [np.ones(1)] * (L + 1)
        norm = 1.
        rest = psi
        for i in range(L - 1, 0, -1):
            legsL = ['vL'] + [x for k in range(i) for x in (f'p{k}', f'q{k}')]
            legsR = [f'p{i}', f'q{i}', 'vR']
            mat = rest.combine_legs([legsL, legsR], qconj=[+1, -1])
            Uc, S, VH = npc.svd(mat, cutoff=cutoff if cutoff else None,
                                inner_labels=['vR', 'vL'])
            S = np.asarray(S)
            nrm = np.linalg.norm(S)
            norm *= nrm if i == L - 1 else 1.
            S = S / nrm
            Bs[i] = VH.split_legs([1]).ireplace_labels([f'p{i}', f'q{i}'],
                                                       ['p', 'q'])
            SVs[i] = S
            rest = Uc.split_legs([0]).iscale_axis(S * nrm, 'vR')
        Bs[0] = rest.ireplace_labels(['p0', 'q0'], ['p', 'q'])
        res = cls.__new__(cls)
        MPS.__init__(res, sites, Bs, SVs, bc='finite', form='B')
        res.canonical_form_finite(renormalize=normalize)
        if normalize:
            res.norm = 1.
        return res

    # ---------------------------------------------------------------- overrides
    def get_theta(self, i, n=2, cutoff=1e-16, formL=1., formR=1.):
        """Like MPS.get_theta but with additional q legs (labels q0..q{n-1})."""
        i = self._to_valid_index(i)
        theta = self.get_B(i, (formL, 1.) if n > 1 else (formL, formR), copy=True)
        theta.ireplace_labels(['p', 'q'], ['p0', 'q0'])
        for k in range(1, n):
            j = i + k
            form = (0., 1.) if k < n - 1 else (0., formR)
            B = self.get_B(j, form, copy=True)
            B.ireplace_labels(['p', 'q'], [f'p{k}', f'q{k}'])
            theta = npc.tensordot(theta, B, axes=[['vR'], ['vL']])
        return theta

    def expectation_value(self, ops, sites=None, axes=None):
        """<psi|op on p|psi> (ancilla traced out automatically)."""
        if isinstance(ops, str):
            ops = [ops]
        if sites is None:
            sites = range(self.L)
        res = []
        for i in sites:
            op = self.get_op(ops, i)
            theta = self.get_theta(i, 1)
            val = npc.tensordot(op, theta, axes=[['p*'], ['p0']])
            val = npc.tensordot(
                theta.conj(), val,
                axes=[['vL*', 'p0*', 'q0*', 'vR*'], ['vL', 'p', 'q0', 'vR']])
            res.append(complex(val))
        res = np.array(res)
        if np.allclose(res.imag, 0., atol=1e-14):
            res = res.real
        return res

    def expectation_value_multi_sites(self, operators, i0):
        """<psi| op_{i0} ... |psi> with ops on the physical legs; ancilla legs
        are traced over automatically (contracted bra-ket)."""
        ops = [self.get_op([op], i0 + k) if isinstance(op, str) else op
               for k, op in enumerate(operators)]
        theta = self.get_theta(i0, len(ops))
        ctheta = theta.conj()
        for k, op in enumerate(ops):
            theta = npc.tensordot(op, theta, axes=[['p*'], [f'p{k}']])
            theta.ireplace_label('p', f'p{k}')
        n = len(ops)
        axes = [['vL*', 'vR*'] + [f'p{k}*' for k in range(n)]
                + [f'q{k}*' for k in range(n)],
                ['vL', 'vR'] + [f'p{k}' for k in range(n)]
                + [f'q{k}' for k in range(n)]]
        return complex(npc.tensordot(ctheta, theta, axes=axes))

    def norm_test(self):
        res = np.empty((self.L, 2))
        for i in range(self.L):
            A = self.get_B(i, 'A')
            c = npc.tensordot(A.conj(), A,
                              axes=[['vL*', 'p*', 'q*'], ['vL', 'p', 'q']])
            res[i, 0] = npc.norm(c - npc.eye_like(c, 0))
            B = self.get_B(i, 'B')
            c = npc.tensordot(B, B.conj(),
                              axes=[['p', 'q', 'vR'], ['p*', 'q*', 'vR*']])
            res[i, 1] = npc.norm(c - npc.eye_like(c, 0))
        return res

    def entanglement_entropy_segment(self, segment, n=1):
        raise NotImplementedError

    def canonical_form_finite(self, renormalize=True, cutoff=0., envs_to_update=None):
        """QR/SVD sweeps treating (p, q) as one fat physical leg."""
        L = self.L
        Ms = self._stripped_tensors()
        R = None
        for i in range(L):
            M = Ms[i]
            if R is not None:
                M = npc.tensordot(R, M, axes=[['vR'], ['vL']])
            Q, R = npc.qr(M.combine_legs([['vL', 'p', 'q']]),
                          inner_labels=['vR', 'vL'])
            Ms[i] = Q.split_legs([0])
        norm_fact = npc.norm(R)
        if renormalize:
            self.norm = 1.
        else:
            self.norm = self.norm * norm_fact
        R = R / norm_fact
        M = npc.tensordot(Ms[L - 1], R, axes=[['vR'], ['vL']])
        self.set_SR(L - 1, np.ones(M.get_leg('vR').ind_len))
        for i in range(L - 1, 0, -1):
            M_c = M.combine_legs([['p', 'q', 'vR']], qconj=[-1])
            U, S, VH = npc.svd(M_c, cutoff=cutoff if cutoff else None,
                               inner_labels=['vR', 'vL'])
            S = np.asarray(S)
            S = S / np.linalg.norm(S)
            self._B[i] = VH.split_legs([1])
            self.form[i] = self._valid_forms['B']
            self.set_SL(i, S)
            M = npc.tensordot(Ms[i - 1], U.iscale_axis(S, 'vR'),
                              axes=[['vR'], ['vL']])
        SL0 = self.get_SL(0)
        self._B[0] = M.copy(deep=False).iscale_axis(self._scale_S(SL0, -1.), 'vL')
        self.form[0] = self._valid_forms['B']
        return self
