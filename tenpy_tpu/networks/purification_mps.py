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

import copy

import numpy as np

from ..linalg import np_conserved as npc
from ..linalg.charges import ChargeInfo, LegCharge
from .mps import MPS
from ..tools.math import entropy

__all__ = ['PurificationMPS',
           'convert_model_purification_canonical_conserve_ancilla_charge']


def _doubled_chinfo(chinfo):
    """ChargeInfo with a second copy of every charge for the ancilla space.

    Reference scheme: ``tenpy/networks/purification_mps.py:310`` — physical
    operators act on the first half, ancilla bookkeeping on the second.
    """
    names = list(chinfo.names) + [n + ' ancilla' for n in chinfo.names]
    return ChargeInfo(list(chinfo.mod) * 2, names)


def _doubled_leg(leg, chinfo2, which):
    """Embed a LegCharge into the doubled charge space.

    which = 'p'   : charges ``[Q, 0]``   (physical half)
    which = 'q'   : charges ``[0, Q]``   (ancilla half)
    which = 'bond': charges ``[Q, -Q]``  (bond legs carry opposite ancilla
                    flow, so that ``delta_{p,q}`` tensors are charge-0)
    """
    Q = np.asarray(leg.charges)
    if which == 'p':
        Q2 = np.hstack([Q, np.zeros_like(Q)])
    elif which == 'q':
        Q2 = np.hstack([np.zeros_like(Q), Q])
    else:
        Q2 = np.hstack([Q, -Q])
    return LegCharge(chinfo2, leg.slices, chinfo2.make_valid(Q2), leg.qconj)


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
        legs enumerating the reachable partial charges.

        With ``conserve_ancilla_charge=True`` the number of conserved charges
        is doubled: physical legs carry ``[Q, 0]``, ancilla legs ``[0, Q]``
        and bond legs ``[Q, -Q]``, so physical and ancilla charge are
        conserved *separately* (reference scheme:
        ``tenpy/networks/purification_mps.py:310``).  The returned MPS's
        ``sites`` are then converted copies; use
        :func:`convert_model_purification_canonical_conserve_ancilla_charge`
        on the model before running algorithms against this state.
        Reference: ``tenpy/networks/purification_mps.py:262``.
        """
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

        def _v_qflat(k):
            return np.array(k, np.int64).reshape(len(k), chinfo.qnumber)

        if conserve_ancilla_charge:
            chinfo2 = _doubled_chinfo(chinfo)
            legs_v = [LegCharge.from_qflat(
                chinfo2,
                chinfo2.make_valid(np.hstack([_v_qflat(k), -_v_qflat(k)])),
                qconj=+1) for k in keep]
            sites = [copy.copy(s) for s in sites]
            for s in sites:
                s.change_charge(_doubled_leg(s.leg, chinfo2, 'p'))
        else:
            legs_v = [LegCharge.from_qflat(chinfo, _v_qflat(k), qconj=+1)
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
            if conserve_ancilla_charge:
                # charges [0, Q_p] with qconj=-1: the entry rule then reads
                # physical: Q(vL) + Q(p) = Q(vR); ancilla: -Q(vL) + Q(q) =
                # -Q(vR) — separately conserved, delta_{p,q} entries charge-0
                Qp = np.asarray(site.leg.charges)[:, :chinfo.qnumber]
                q_leg = LegCharge(
                    chinfo2, site.leg.slices,
                    chinfo2.make_valid(np.hstack([np.zeros_like(Qp), Qp])),
                    -1)
            else:
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

    def get_rho_segment(self, segment):
        """Reduced density matrix of the given sites, keeping both p and q
        legs (labels ``p0, q0, p0*, q0*, ...``); traced sites trace over both.
        Reference: ``tenpy/networks/purification_mps.py`` (via the base
        class's ``_p_label`` machinery)."""
        segment = np.sort(np.asarray(segment, int))
        if len(segment) > 10:
            raise ValueError("segment too large: exponentially expensive")
        if np.all(segment[1:] == segment[:-1] + 1):
            # contiguous: the overridden get_theta already carries q labels
            theta = self.get_theta(int(segment[0]),
                                   int(segment[-1] - segment[0] + 1))
            return npc.tensordot(theta, theta.conj(),
                                 axes=[['vL', 'vR'], ['vL*', 'vR*']])
        rho = self.get_theta(int(segment[0]), 1)
        rho = npc.tensordot(rho, rho.conj(), axes=[['vL'], ['vL*']])
        k = 1
        for i in range(int(segment[0]) + 1, int(segment[-1])):
            B = self.get_B(i, 'B')
            if k < len(segment) and i == segment[k]:
                B = B.replace_labels(['p', 'q'], [f'p{k}', f'q{k}'])
                k += 1
                rho = npc.tensordot(rho, B, axes=[['vR'], ['vL']])
                rho = npc.tensordot(rho, B.conj(), axes=[['vR*'], ['vL*']])
            else:
                rho = npc.tensordot(rho, B, axes=[['vR'], ['vL']])
                rho = npc.tensordot(rho, B.conj(),
                                    axes=[['vR*', 'p', 'q'],
                                          ['vL*', 'p*', 'q*']])
        B = self.get_B(int(segment[-1]), 'B').replace_labels(
            ['p', 'q'], [f'p{k}', f'q{k}'])
        rho = npc.tensordot(rho, B, axes=[['vR'], ['vL']])
        rho = npc.tensordot(rho, B.conj(),
                            axes=[['vR*', 'vR'], ['vL*', 'vR*']])
        return rho

    @staticmethod
    def _pq_tr_comb(legs, N):
        """(trace-legs, combine-legs) label pairs for a p/q/pq choice."""
        def labels(choice):
            res1 = [c + str(k) for k in range(N) for c in choice]
            res2 = [c + str(k) + '*' for k in range(N) for c in choice]
            return res1, res2
        if legs == 'pq':
            return ([], []), labels(['p', 'q'])
        if legs == 'p':
            return labels(['q']), labels(['p'])
        if legs == 'q':
            return labels(['p']), labels(['q'])
        raise ValueError(f"legs must be 'p', 'q' or 'pq', got {legs!r}")

    def entanglement_entropy_segment(self, segment=[0], first_site=None, n=1,
                                     legs='p'):
        r"""Entanglement entropy of a segment's reduced density matrix,
        in the physical (``legs='p'``), ancilla (``'q'``) or combined
        (``'pq'``) space.  Reference:
        ``tenpy/networks/purification_mps.py:380``."""
        segment = np.sort(segment)
        if first_site is None:
            if self.finite:
                first_site = range(0, self.L - segment[-1])
            else:
                first_site = range(self.L)
        N = len(segment)
        tr_legs, comb_legs = self._pq_tr_comb(legs, N)
        res = []
        for i0 in first_site:
            rho = self.get_rho_segment(segment + i0)
            for a, b in zip(*tr_legs):
                rho = npc.trace(rho, a, b)
            rho = rho.combine_legs(comb_legs, qconj=[+1, -1])
            p = np.asarray(npc.eigvalsh(rho))
            res.append(entropy(p, n))
        return np.array(res)

    def mutinf_two_site(self, max_range=None, n=1, legs='p'):
        """Two-site mutual information ``I(i:j) = S(i) + S(j) - S(i,j)`` in
        the chosen (p/q/pq) space.  Reference:
        ``tenpy/networks/purification_mps.py:425``."""
        if max_range is None:
            max_range = self.L
        S_i = self.entanglement_entropy_segment(n=n, legs=legs)
        tr_legs, comb_legs = self._pq_tr_comb(legs, 2)
        mutinf = []
        coords = []
        for i in range(self.L):
            jmax = i + max_range + 1
            if self.finite:
                jmax = min(jmax, self.L)
            for j in range(i + 1, jmax):
                rho_ij = self.get_rho_segment([i, j])
                for a, b in zip(*tr_legs):
                    rho_ij = npc.trace(rho_ij, a, b)
                rho_ij = rho_ij.combine_legs(comb_legs, qconj=[+1, -1])
                S_ij = entropy(np.asarray(npc.eigvalsh(rho_ij)), n)
                mutinf.append(S_i[i] + S_i[j % self.L] - S_ij)
                coords.append((i, j))
        return np.array(coords), np.array(mutinf)

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


def convert_model_purification_canonical_conserve_ancilla_charge(model):
    """Shallow model copy with charges doubled for the separate-ancilla
    scheme of :meth:`PurificationMPS.from_infiniteT_canonical`
    (``conserve_ancilla_charge=True``).

    Site legs get charges ``[Q, 0]``, MPO wL/wR legs ``[Q, -Q]`` and MPO
    qtotals ``[Q, 0]``, so ``H_MPO``/``H_bond`` act on the physical half and
    are neutral in the ancilla half.  Reference:
    ``tenpy/networks/purification_mps.py:695``.
    """
    model = model.copy()
    chinfo = model.lat.unit_cell[0].leg.chinfo
    chinfo2 = _doubled_chinfo(chinfo)
    converted = {}

    def _site(site):
        s2 = converted.get(id(site))
        if s2 is None:
            s2 = copy.copy(site)
            s2.change_charge(_doubled_leg(site.leg, chinfo2, 'p'))
            converted[id(site)] = s2
        return s2

    model.lat = copy.copy(model.lat)
    model.lat.unit_cell = [_site(s) for s in model.lat.unit_cell]

    if hasattr(model, 'H_MPO'):
        H = model.H_MPO.copy()
        H.sites = [_site(s) for s in H.sites]
        H.chinfo = chinfo2
        Ws = []
        for W in H._W:
            W = W.copy(deep=False).itranspose(['wL', 'wR', 'p', 'p*'])
            legs = list(W.legs)
            legs[0] = _doubled_leg(legs[0], chinfo2, 'bond')
            legs[1] = _doubled_leg(legs[1], chinfo2, 'bond')
            legs[2] = _doubled_leg(legs[2], chinfo2, 'p')
            legs[3] = legs[2].conj()
            W.legs = tuple(legs)
            qt = np.asarray(W.qtotal)
            W.qtotal = tuple(int(q) for q in chinfo2.make_valid(
                np.hstack([qt, np.zeros_like(qt)])))
            Ws.append(W)
        H._W = Ws
        model.H_MPO = H

    if hasattr(model, 'H_bond'):
        sites = model.lat.mps_sites()   # already converted
        L = len(sites)
        H_bond = list(model.H_bond)
        for i, Hb in enumerate(H_bond):
            if Hb is None:
                continue
            leg0 = sites[(i - 1) % L].leg
            leg1 = sites[i].leg
            Hb = Hb.transpose(['p0', 'p1', 'p0*', 'p1*'])
            Hb.legs = (leg0, leg1, leg0.conj(), leg1.conj())
            qt = np.asarray(Hb.qtotal)
            Hb.qtotal = tuple(int(q) for q in chinfo2.make_valid(
                np.hstack([qt, np.zeros_like(qt)])))
            Hb.test_sanity()
            H_bond[i] = Hb
        model.H_bond = H_bond
    return model
