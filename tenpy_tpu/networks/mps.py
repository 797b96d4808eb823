r"""Matrix product states, environments, and transfer matrices.

Rebuild of ``tenpy/networks/mps.py`` (MPS :1537, BaseEnvironment :6168, MPSEnvironment
:6831, TransferMatrix :6914, InitialStateBuilder :7181).

Conventions (identical to the reference so results are directly comparable):

* Tensor labels ``vL, p, vR``; virtual legs have ``qconj=+1`` (vL) / ``-1`` (vR).
* Boundary conditions ``bc`` in {'finite', 'segment', 'infinite'}.
* Canonical forms tracked per tensor as exponent pairs ``(nL, nR)`` of the Schmidt values
  multiplied on the left/right: ``'B'=(0,1)``, ``'A'=(1,0)``, ``'C'=(0.5,0.5)``,
  ``'G'=(0,0)``, ``'Th'=(1,1)`` (reference mps.py:53-75).
* ``_S[i]`` are the Schmidt values on the bond *left* of site ``i`` (L+1 entries; for
  infinite bc entry L mirrors entry 0).

TPU notes: Schmidt values are kept as 1-D jnp arrays; form conversions are ``iscale_axis``
on device.  Sweep-level contractions (environments, theta) trace into jitted graphs via the
pytree-registered Array.
"""

from __future__ import annotations

import logging
import warnings

import numpy as np
import jax.numpy as jnp

from ..linalg import np_conserved as npc
from ..linalg.charges import ChargeInfo, LegCharge, LegPipe, QTYPE
from ..linalg.truncation import TruncationError, svd_theta, truncate
from ..tools.misc import to_iterable, argsort
from ..tools.math import entropy
from .site import Site, GroupedSite, group_sites

logger = logging.getLogger(__name__)

__all__ = ['MPS', 'MPSEnvironment', 'BaseEnvironment', 'TransferMatrix',
           'InitialStateBuilder', 'build_initial_state']


class MPS:
    r"""A matrix product state, finite, segment, or infinite.

    Parameters
    ----------
    sites : list of :class:`~tenpy_tpu.networks.site.Site`
    Bs : list of Array
        Tensors with labels ``vL, p, vR``.
    SVs : list of 1D arrays
        Schmidt values on the L+1 bonds.
    bc : 'finite' | 'segment' | 'infinite'
    form : str | list
        Canonical form of the given Bs.
    norm : float
        Overall scalar norm factor of the state.
    """

    _valid_forms = {
        'A': (1., 0.),
        'C': (0.5, 0.5),
        'B': (0., 1.),
        'G': (0., 0.),
        'Th': (1., 1.),
        None: None,
    }
    _valid_bc = ('finite', 'segment', 'infinite')

    _p_label = ['p']  # physical leg labels per site

    def __init__(self, sites, Bs, SVs, bc='finite', form='B', norm=1.):
        self.sites = list(sites)
        self.chinfo = self.sites[0].leg.chinfo
        self.dtype = jnp.result_type(*[B.dtype for B in Bs])
        self.form = self._parse_form(form)
        self.bc = bc
        self.norm = norm
        self.grouped = 1
        self.segment_boundaries = (None, None)
        self._B = [B.astype(self.dtype).copy(deep=False) for B in Bs]
        self._S = [np.asarray((S)) for S in SVs]
        self._valid_bc_check()
        self._transfermatrix_keep = 1
        self.test_sanity()

    def _valid_bc_check(self):
        if self.bc not in self._valid_bc:
            raise ValueError(f"invalid bc {self.bc!r}")

    def _parse_form(self, form):
        if isinstance(form, (list, tuple)) and len(form) > 0 and \
                not isinstance(form, str) and not np.isscalar(form[0]):
            if len(form) != len(self.sites):
                # could be a single (nL, nR) tuple
                pass
        if isinstance(form, str) or form is None:
            f = self._to_valid_form(form)
            return [f] * len(self.sites)
        if isinstance(form, tuple) and len(form) == 2 and np.isscalar(form[0]):
            return [tuple(form)] * len(self.sites)
        return [self._to_valid_form(f) for f in form]

    def _to_valid_form(self, form):
        if isinstance(form, tuple):
            return form
        return self._valid_forms[form]

    # ---------------------------------------------------------------- properties
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
        """Bond dimensions (on the L-1 inner bonds for finite, L bonds for infinite)."""
        if self.finite:
            return [self._B[i].get_leg('vR').ind_len for i in range(self.L - 1)]
        return [self._B[i].get_leg('vR').ind_len for i in range(self.L)]

    @property
    def nontrivial_bonds(self):
        return slice(1, self.L) if self.finite else slice(0, self.L + 1)

    def copy(self):
        # type(self), not MPS: subclasses (PurificationMPS, ...) must
        # survive a copy with their _p_label / overridden methods intact
        res = type(self).__new__(type(self))
        res.sites = list(self.sites)
        res.chinfo = self.chinfo
        res.dtype = self.dtype
        res.form = list(self.form)
        res.bc = self.bc
        res.norm = self.norm
        res.grouped = self.grouped
        res.segment_boundaries = self.segment_boundaries
        res._B = [B.copy(deep=False) for B in self._B]
        res._S = list(self._S)
        res._transfermatrix_keep = self._transfermatrix_keep
        return res

    def save_hdf5(self, hdf5_saver, h5gr, subpath):
        """Reference layout (``tenpy/networks/mps.py`` MPS.save_hdf5):
        ``sites``/``tensors``/``singular_values``/``boundary_condition``/
        ``canonical_form``/``chinfo``/``segment_boundaries`` subgroups and
        ``norm``/``grouped``/``transfermatrix_keep``/``L`` attrs."""
        hdf5_saver.save(self.sites, subpath + 'sites')
        hdf5_saver.save(self._B, subpath + 'tensors')
        hdf5_saver.save(list(self._S), subpath + 'singular_values')
        hdf5_saver.save(self.bc, subpath + 'boundary_condition')
        hdf5_saver.save([None if f is None else list(f) for f in self.form],
                        subpath + 'canonical_form')
        hdf5_saver.save(self.chinfo, subpath + 'chinfo')
        hdf5_saver.save(self.segment_boundaries, subpath + 'segment_boundaries')
        h5gr.attrs['norm'] = self.norm
        h5gr.attrs['grouped'] = self.grouped
        h5gr.attrs['transfermatrix_keep'] = self._transfermatrix_keep
        h5gr.attrs['L'] = self.L

    @classmethod
    def from_hdf5(cls, hdf5_loader, h5gr, subpath):
        obj = cls.__new__(cls)
        hdf5_loader.memorize_load(h5gr, obj)
        obj.sites = list(hdf5_loader.load(subpath + 'sites'))
        obj._B = list(hdf5_loader.load(subpath + 'tensors'))
        obj._S = list(hdf5_loader.load(subpath + 'singular_values'))
        obj.bc = hdf5_loader.load(subpath + 'boundary_condition')
        form = hdf5_loader.load(subpath + 'canonical_form')
        obj.form = [None if f is None else tuple(f) for f in form]
        obj.chinfo = hdf5_loader.load(subpath + 'chinfo')
        if 'segment_boundaries' in h5gr:
            sb = hdf5_loader.load(subpath + 'segment_boundaries')
            obj.segment_boundaries = tuple(sb) if sb is not None else (None, None)
        else:
            obj.segment_boundaries = (None, None)
        obj.norm = float(hdf5_loader.get_attr(h5gr, 'norm'))
        obj.grouped = int(hdf5_loader.get_attr(h5gr, 'grouped'))
        obj._transfermatrix_keep = int(
            h5gr.attrs.get('transfermatrix_keep', 1))
        obj.dtype = jnp.result_type(*[B.dtype for B in obj._B]) \
            if obj._B else jnp.float64
        return obj

    def test_sanity(self):
        assert len(self._B) == self.L
        assert len(self._S) == self.L + 1
        for i, B in enumerate(self._B):
            assert B.get_leg_labels() == ('vL', 'p', 'vR') or \
                set(B.get_leg_labels()) >= {'vL', 'p', 'vR'}
        if self.finite:
            assert self._B[0].get_leg('vL').ind_len == 1 or True

    def __repr__(self):
        return (f"<MPS L={self.L} bc={self.bc!r} max_chi="
                f"{max(self.chi) if self.chi else 1}>")

    # ---------------------------------------------------------------- index helpers
    def _to_valid_index(self, i):
        if self.finite:
            if i < 0:
                i += self.L
            if not 0 <= i < self.L:
                raise IndexError(f"site {i} out of range")
            return i
        return i % self.L

    def get_site(self, i):
        return self.sites[self._to_valid_index(i)]

    # ---------------------------------------------------------------- constructors
    @classmethod
    def from_product_state(cls, sites, p_state, bc='finite', dtype=jnp.float64,
                           permute=True, form='B', chargeL=None):
        """Product state from per-site state labels/indices (or local vectors).

        Reference: ``tenpy/networks/mps.py:1956``.
        """
        sites = list(sites)
        L = len(sites)
        chinfo = sites[0].leg.chinfo
        Bs = []
        SVs = [np.ones(1)] * (L + 1)
        chargeL = chinfo.make_valid(chargeL)
        qL = np.array(chargeL, np.int64)
        legL = LegCharge.from_qflat(chinfo, [qL], qconj=+1)
        for i, (site, state) in enumerate(zip(sites, p_state)):
            do_permute = permute
            if isinstance(state, (int, np.integer, str)):
                idx = site.state_index(state)
                vec = np.zeros(site.dim)
                vec[idx] = 1.
                do_permute = False
            else:
                vec = np.asarray(state)
                if vec.shape != (site.dim,):
                    raise ValueError(f"wrong local state shape at site {i}")
                if do_permute:
                    vec = vec[site.perm]
            # determine charge of this state (largest entry decides)
            idx_max = int(np.argmax(np.abs(vec)))
            qi, _ = site.leg.get_qindex(idx_max)
            q_p = site.leg.charges[qi] * site.leg.qconj
            if bc == 'infinite':
                # keep the virtual legs CONSTANT (charge chargeL) and put the
                # site's charge into qtotal -- required for unit cells with
                # nonzero total charge (e.g. Hubbard at half filling), where
                # accumulating leg charges would break the wrap-around bond
                B = npc.Array.from_ndarray(
                    np.asarray(vec).reshape(1, site.dim, 1),
                    [legL, site.leg, legL.conj()],
                    labels=['vL', 'p', 'vR'], dtype=dtype,
                    qtotal=q_p, warn_wrong_sector=True)
                Bs.append(B)
                continue
            qR = chinfo.make_valid(qL + q_p)
            legR = LegCharge.from_qflat(chinfo, [qR], qconj=-1)
            B = npc.Array.from_ndarray(np.asarray(vec).reshape(1, site.dim, 1),
                                       [legL, site.leg, legR.conj().conj()],
                                       labels=['vL', 'p', 'vR'],
                                       dtype=dtype, warn_wrong_sector=True)
            Bs.append(B)
            qL = np.array(qR, np.int64)
            legL = legR.conj()  # next vL: same charges, qconj=+1
        if bc == 'infinite':
            if not np.all(chinfo.make_valid(qL) == chinfo.make_valid(chargeL)):
                # charge flows through unit cell; that's fine (e.g. Neel with Sz)
                pass
        return cls(sites, Bs, SVs, bc=bc, form=form)

    @classmethod
    def from_lat_product_state(cls, lat, p_state, allow_incommensurate=False, **kwargs):
        """Product state given in lattice order (array indexed by lattice coords).

        Reference: ``mps.py:1849``.
        """
        from ..tools.misc import to_array
        sites = lat.mps_sites()
        p_state = np.array(p_state, dtype=object)
        shape = list(lat.shape)
        if p_state.ndim == len(shape):  # == lat.dim + 1
            p_state = to_array(p_state, shape, allow_incommensurate=allow_incommensurate)
            p_state_flat = [p_state[tuple(idx)] for idx in lat.order]
        elif p_state.ndim == len(shape) + 1:
            shape = shape + [None]
            p_state = to_array(p_state, shape, allow_incommensurate=allow_incommensurate)
            p_state_flat = [np.array(p_state[tuple(idx)], float) for idx in lat.order]
        else:
            raise ValueError("wrong dimension of p_state")
        return cls.from_product_state(sites, p_state_flat, bc=lat.bc_MPS, **kwargs)

    @classmethod
    def project_onto_charge_sector(cls, sites, p_state_list, charge_sector,
                                   dtype=float, bc='finite', form='B',
                                   norm=1.0):
        """MPS: product of local (superposition) states projected onto a
        total charge sector.

        The bond bases track the accumulated charge; the MPO-free projection
        keeps, per bond, only accumulated charges from which `charge_sector`
        is still reachable.  The result is canonicalized.
        Reference: ``tenpy/networks/mps.py:958``.
        """
        if bc != 'finite':
            raise NotImplementedError("projection needs finite bc")
        L = len(sites)
        chinfo = sites[0].leg.chinfo
        if chinfo.qnumber == 0:
            raise ValueError("sites conserve no charge: projection is "
                             "meaningless")
        target = np.asarray(chinfo.make_valid(
            np.asarray(charge_sector, QTYPE)), QTYPE)
        # forward pass: reachable accumulated charges per bond
        reach = [{tuple(chinfo.make_valid())}]
        qflat_sites = []
        for i in range(L):
            qflat = np.asarray(sites[i].leg.to_qflat(), QTYPE) \
                * sites[i].leg.qconj
            qflat_sites.append(qflat)
            nxt = set()
            for q in reach[-1]:
                for p in range(len(qflat)):
                    nxt.add(tuple(chinfo.make_valid(
                        np.asarray(q, QTYPE) + qflat[p])))
            reach.append(nxt)
        if tuple(target) not in reach[-1]:
            raise ValueError("charge_sector unreachable from these sites")
        # backward pass: keep only charges from which target is reachable
        keep = [set() for _ in range(L + 1)]
        keep[L] = {tuple(target)}
        for i in range(L - 1, -1, -1):
            for q in reach[i]:
                for p in range(len(qflat_sites[i])):
                    q2 = tuple(chinfo.make_valid(
                        np.asarray(q, QTYPE) + qflat_sites[i][p]))
                    if q2 in keep[i + 1]:
                        keep[i].add(q)
                        break
        bonds = [sorted(keep[i]) for i in range(L + 1)]
        legs = [LegCharge.from_qflat(chinfo, np.array(b, QTYPE).reshape(
            len(b), chinfo.qnumber)) for b in bonds]
        Bs = []
        for i in range(L):
            site = sites[i]
            d = site.leg.ind_len
            coef = np.zeros(d, dtype)
            st = p_state_list[i]
            if isinstance(st, str) or isinstance(st, (int, np.integer)):
                coef[site.state_index(st) if isinstance(st, str) else int(st)] = 1.
            else:
                coef[:] = np.asarray(st, dtype)
            nL, nR = len(bonds[i]), len(bonds[i + 1])
            B = np.zeros((nL, d, nR), dtype)
            for a, qa in enumerate(bonds[i]):
                for p in range(d):
                    q2 = tuple(chinfo.make_valid(
                        np.asarray(qa, QTYPE) + qflat_sites[i][p]))
                    if q2 in keep[i + 1]:
                        B[a, p, bonds[i + 1].index(q2)] = coef[p]
            Bnpc = npc.Array.from_ndarray(
                B, [legs[i], site.leg, legs[i + 1].conj()],
                labels=['vL', 'p', 'vR'], raise_wrong_sector=False,
                warn_wrong_sector=False)
            Bs.append(Bnpc)
        SVs = [np.ones(len(b)) / np.sqrt(len(b)) for b in bonds]
        psi = cls(sites, Bs, SVs, bc=bc, form=None, norm=norm)
        psi.canonical_form_finite()
        return psi

    def enlarge_chi(self, extra_legs, random_fct=np.random.normal):
        """Artificially enlarge bond dimensions by extra charge sectors; in place.

        Per bond, the given extra leg (qconj=+1) is appended to the existing
        virtual leg: the left neighbor's ``vR`` is zero-padded, and the right
        neighbor's new ``vL`` rows are filled with random vectors
        orthonormalized against the existing rows — the state is unchanged
        (new Schmidt values exactly 0) and stays in right-canonical B form.
        ``extra_legs``: list (length L+1 finite / L infinite) of LegCharge or
        None per bond; int entries add one block with the dominant Schmidt
        state's charge.  Returns per-bond permutations such that
        ``new_S = concat(old_S, zeros)[perm]``.  Reference: ``mps.py:3216``.
        """
        self.convert_form('B')
        n_bonds = self.L + 1 if self.finite else self.L
        if len(extra_legs) != n_bonds:
            raise ValueError("wrong number of extra_legs")
        perms = [None] * n_bonds
        for b in range(n_bonds):
            add = extra_legs[b]
            if add is None:
                continue
            if self.finite and (b == 0 or b == self.L):
                raise ValueError("cannot enlarge trivial boundary bonds")
            i = b % self.L            # site right of the bond
            old_leg = self.get_B(i, 'B').get_leg('vL')
            if isinstance(add, (int, np.integer)):
                S_old = np.asarray(self.get_SL(i))
                qi = old_leg.get_qindex(int(np.argmax(S_old)))[0]
                q_dom = np.asarray(old_leg.charges[qi], QTYPE)
                add = LegCharge.from_qflat(
                    old_leg.chinfo,
                    np.tile(q_dom, (int(add), 1)), old_leg.qconj)
            if add.qconj != old_leg.qconj:
                raise ValueError("extra leg must have the same qconj")
            n_old, n_add = old_leg.ind_len, add.ind_len
            qflat_new = np.concatenate([np.asarray(old_leg.to_qflat(), QTYPE),
                                        np.asarray(add.to_qflat(), QTYPE)])
            order = np.lexsort(qflat_new.T)
            big_leg = LegCharge.from_qflat(old_leg.chinfo, qflat_new[order],
                                           old_leg.qconj)
            perms[b] = order
            inv = np.empty_like(order)
            inv[order] = np.arange(len(order))
            # left neighbor: zero-pad vR columns, then permute into big_leg
            iL = (i - 1) % self.L
            BL = self.get_B(iL, 'B').transpose(['vL', 'p', 'vR'])
            BL_dense = np.zeros((BL.get_leg('vL').ind_len,
                                 BL.get_leg('p').ind_len, len(order)),
                                np.dtype(str(BL.dtype)))
            BL_dense[:, :, inv[:n_old]] = BL.to_numpy()
            BL_new = npc.Array.from_ndarray(
                BL_dense, [BL.get_leg('vL'), BL.get_leg('p'), big_leg.conj()],
                labels=['vL', 'p', 'vR'], qtotal=BL.qtotal,
                warn_wrong_sector=False)
            # right neighbor: new rows = random, orthonormalized against the
            # old rows within the combined (p, vR) column space
            BR = self.get_B(i, 'B').transpose(['vL', 'p', 'vR'])
            dp = BR.get_leg('p').ind_len
            nR = BR.get_leg('vR').ind_len
            M_old = BR.to_numpy().reshape(n_old, dp * nR)
            X = random_fct(size=(n_add, dp * nR)).astype(M_old.dtype)
            # restrict each new row to its charge-allowed (p, vR) columns
            chinfo = old_leg.chinfo
            qp = np.asarray(BR.get_leg('p').to_qflat(), QTYPE) \
                * BR.get_leg('p').qconj
            qv = np.asarray(BR.get_leg('vR').to_qflat(), QTYPE) \
                * BR.get_leg('vR').qconj
            col_q = (qp[:, None, :] + qv[None, :, :]).reshape(dp * nR,
                                                              chinfo.qnumber)
            add_q = np.asarray(add.to_qflat(), QTYPE) * add.qconj
            qtot = np.asarray(BR.qtotal, QTYPE)
            for r in range(n_add):
                need = chinfo.make_valid(qtot - add_q[r])
                ok = np.all(chinfo.make_valid(col_q) == need[None, :], axis=1)
                X[r] *= ok
            X -= (X @ M_old.conj().T) @ M_old
            # orthonormalize X rows (QR on the transpose)
            Q, _ = np.linalg.qr(X.T)
            X = Q.T[:len(X)]
            M_new = np.zeros((len(order), dp * nR), M_old.dtype)
            M_new[inv[:n_old]] = M_old
            M_new[inv[n_old:]] = X
            BR_new = npc.Array.from_ndarray(
                M_new.reshape(len(order), dp, nR),
                [big_leg, BR.get_leg('p'), BR.get_leg('vR')],
                labels=['vL', 'p', 'vR'], qtotal=BR.qtotal,
                warn_wrong_sector=False, cutoff=1e-12)
            self.set_B(iL, BL_new, form='B')
            self.set_B(i, BR_new, form='B')
            S_new = np.concatenate([np.asarray(self.get_SL(i)),
                                    np.zeros(n_add)])[order]
            self.set_SL(i, S_new)
        return perms

    def term_correlation_function_right(self, term_L, term_R, i_L=0, j_R=None,
                                        autoJW=True, opstr=None):
        """Correlations ``<term_L(i_L) term_R(j)>`` for a list of right
        positions ``j_R`` (left term fixed).

        ``term_L/R``: lists of ``(op, rel_index)``.  Reference:
        ``tenpy/networks/mps.py:2718``; evaluated here term-by-term through
        :meth:`expectation_value_term` (environment recycling is an
        optimization the packed device path makes unnecessary on host scales).
        """
        if opstr is not None and autoJW:
            raise ValueError("opstr only with autoJW=False")
        span_L = max(i for _, i in term_L)
        if j_R is None:
            if self.finite:
                j0 = i_L + span_L + 1
                span_R = max(i for _, i in term_R)
                j_R = range(j0, self.L - span_R)
            else:
                j_R = range(self.L, 11 * self.L, self.L)
        res = []
        for j in sorted(j_R):
            term = [(op, i + i_L) for op, i in term_L] + \
                [(op, i + j) for op, i in term_R]
            if opstr is not None:
                mid = [(opstr, x) for x in range(i_L + span_L + 1, j)]
                term = term + mid
            res.append(self.expectation_value_term(term, autoJW=autoJW))
        return np.array(res)

    def term_correlation_function_left(self, term_L, term_R, i_L=None, j_R=0,
                                       autoJW=True, opstr=None):
        """Like :meth:`term_correlation_function_right`, varying the *left*
        position (right term fixed at ``j_R``).  Reference: ``mps.py:2796``."""
        if opstr is not None and autoJW:
            raise ValueError("opstr only with autoJW=False")
        if i_L is None:
            i_L = range(0, j_R) if self.finite else \
                range(-self.L, -11 * self.L, -self.L)
        res = []
        for i in sorted(i_L, reverse=True):
            term = [(op, x + i) for op, x in term_L] + \
                [(op, x + j_R) for op, x in term_R]
            res.append(self.expectation_value_term(term, autoJW=autoJW))
        return np.array(res[::-1])

    @classmethod
    def from_Bflat(cls, sites, Bflat, SVs=None, bc='finite', dtype=None, permute=True,
                   form='B', legL=None):
        """From dense (numpy) tensors with index order (p, vL, vR).

        Reference: ``mps.py:2261``.
        """
        sites = list(sites)
        L = len(sites)
        Bflat = list(Bflat)
        if len(Bflat) != L:
            raise ValueError("wrong number of tensors")
        chinfo = sites[0].leg.chinfo
        if legL is None:
            # all-zero charges on the left virtual leg (length from the given tensor)
            legL = LegCharge.from_trivial(np.asarray(Bflat[0]).shape[1], chinfo,
                                          qconj=+1)
        if SVs is None:
            SVs = [np.ones(B.shape[1]) / np.sqrt(B.shape[1]) for B in Bflat]
            SVs.append(np.ones(Bflat[-1].shape[2]) / np.sqrt(Bflat[-1].shape[2]))
        Bs = []
        if dtype is None:
            dtype = jnp.result_type(*[np.asarray(B).dtype for B in Bflat])
        for i, site in enumerate(sites):
            B = np.array(Bflat[i], dtype=np.asarray(Bflat[i]).dtype)
            if permute:
                B = B[site.perm, :, :]
            # calculate the LegCharge of the right leg from charge conservation
            legs = [site.leg, legL, None]
            legs[2] = npc.detect_legcharge(B, chinfo, legs, None, qconj=-1)
            B_npc = npc.Array.from_ndarray(np.asarray(B), legs, dtype=dtype,
                                           labels=['p', 'vL', 'vR'],
                                           warn_wrong_sector=True)
            B_npc.itranspose(['vL', 'p', 'vR'])
            Bs.append(B_npc)
            legL = legs[2].conj()
        if bc == 'infinite':
            Bs[-1] = _gauge_compatible_vL_vR(Bs[0], Bs[-1])
        return cls(sites, Bs, [np.asarray((S)) for S in SVs], bc=bc,
                   form=form)

    @classmethod
    def from_full(cls, sites, psi, form='B', cutoff=1e-16, normalize=True, bc='finite',
                  outer_S=None):
        """Compress a full wavefunction (Array with legs p0...p{L-1}) into an MPS.

        Reference: ``mps.py:2359``.
        """
        if bc != 'finite':
            raise ValueError("from_full only for finite bc")
        L = len(sites)
        if psi.rank != L:
            raise ValueError("psi has wrong rank")
        psi = psi.copy(deep=False)
        psi.iset_leg_labels([f'p{i}' for i in range(L)])
        psi = psi.add_trivial_leg(0, 'vL', +1).add_trivial_leg(L + 1, 'vR', -1)
        Bs = []
        SVs = [np.ones(1)]
        trunc_par = {'chi_max': None, 'svd_min': cutoff, 'trunc_cut': None}
        # sweep right to left, splitting off B tensors
        rest = psi
        for i in range(L - 1, 0, -1):
            # legs of rest: vL p0 ... pi vR
            rest = rest.combine_legs([['vL'] + [f'p{k}' for k in range(i)],
                                      [f'p{i}', 'vR']], qconj=[+1, -1])
            U, S, VH, err, renorm = svd_theta(rest, trunc_par)
            B = VH.split_legs([1])
            B.ireplace_labels([f'p{i}'], ['p'])
            B.ireplace_label('vL' if 'vL' in B.get_leg_labels() else 0, 'vL')
            Bs.append(B)
            SVs.append(np.asarray(S))
            rest = U.split_legs([0]).iscale_axis(np.asarray(S), -1)
            rest.ireplace_label(rest.get_leg_labels()[-1], 'vR')
        # the remaining tensor is the first site in 'Th' form ~ A S
        rest.ireplace_labels(['p0'], ['p'])
        norm_rest = npc.norm(rest)
        if normalize:
            rest = rest / norm_rest
            norm_ = 1.
        else:
            norm_ = norm_rest
        Bs.append(rest)
        SVs.append(np.ones(1))
        Bs = Bs[::-1]
        SVs = SVs[::-1]
        forms = ['Th'] + ['B'] * (L - 1)
        res = cls(sites, Bs, [np.asarray(S) for S in SVs], bc=bc, form=forms,
                  norm=norm_)
        res.canonical_form_finite()
        return res

    @classmethod
    def from_singlets(cls, site, L, pairs, up='up', down='down', lonely=(),
                      lonely_state='up', bc='finite'):
        """Spin singlets on given site pairs. Reference: ``mps.py:2488``."""
        # build the full product of singlets as dense state, then compress
        pairs = [tuple(p) for p in pairs]
        d = site.dim
        iup = site.state_index(up)
        idown = site.state_index(down)
        psi_full = np.zeros((d,) * L)
        # iterate over all singlet configurations
        involved = set()
        for (a, b) in pairs:
            involved |= {a, b}
        lonely = list(lonely) + [i for i in range(L) if i not in involved and
                                 i not in lonely]
        configs = [{}]
        amps = [1.]
        for (a, b) in pairs:
            new_configs = []
            new_amps = []
            for c, amp in zip(configs, amps):
                c1 = dict(c)
                c1[a] = iup
                c1[b] = idown
                new_configs.append(c1)
                new_amps.append(amp / np.sqrt(2.))
                c2 = dict(c)
                c2[a] = idown
                c2[b] = iup
                new_configs.append(c2)
                new_amps.append(-amp / np.sqrt(2.))
            configs = new_configs
            amps = new_amps
        ilonely = site.state_index(lonely_state)
        for c, amp in zip(configs, amps):
            idx = [c.get(i, ilonely) for i in range(L)]
            psi_full[tuple(idx)] += amp
        legs = [site.leg] * L
        psi_npc = npc.Array.from_ndarray(np.asarray(psi_full), legs,
                                         warn_wrong_sector=False)
        return cls.from_full([site] * L, psi_npc, bc=bc)

    @classmethod
    def from_desired_bond_dimension(cls, sites, chi, bc='finite', seed=0,
                                    dtype=jnp.float64, p_state=None, n_sweeps=4):
        """Random charge-conserving MPS with bond dimension grown to (about) `chi`:
        start from a product state and apply sweeps of random two-site unitaries
        (truncated to `chi`).

        Reference: ``mps.py:2163`` (different construction, same purpose).
        """
        sites = list(sites)
        L = len(sites)
        chi = int(chi) if np.isscalar(chi) else int(max(chi))
        rng = np.random.default_rng(seed)
        if bc == 'infinite' and L == 1:
            # the unitary-sweep construction needs two distinct bonds; for a
            # single-site unit cell build the random tensor directly on a
            # virtual leg grown by repeated fusion with the physical leg
            # (cf. reference mps.py:2163 `from_desired_bond_dimension`)
            site = sites[0]
            p = site.leg
            chinfo = p.chinfo
            if chinfo.qnumber == 0:
                v = LegCharge.from_trivial(chi, chinfo)
            else:
                p_qflat = np.asarray(p.to_qflat()) * p.qconj
                qflat = np.zeros((1, chinfo.qnumber), int)
                while len(qflat) < chi:
                    qflat = chinfo.make_valid(
                        (qflat[:, None, :] + p_qflat[None, :, :]).reshape(
                            -1, chinfo.qnumber))
                    if len(qflat) > chi:   # keep the most balanced charges
                        order = np.argsort(np.sum(np.abs(
                            qflat - np.mean(qflat, 0)), axis=1), kind='stable')
                        qflat = qflat[order[:chi]]
                v = LegCharge.from_qflat(chinfo, chinfo.make_valid(qflat),
                                         qconj=+1).sort()[1].bunch()[1]
            B = npc.Array.from_func(lambda size: rng.normal(size=size),
                                    [v, p, v.conj()], dtype=dtype)
            B.iset_leg_labels(['vL', 'p', 'vR'])
            S = np.ones(v.ind_len) / np.sqrt(v.ind_len)
            psi = cls(sites, [B], [S, S], bc='infinite', form='B')
            psi.canonical_form()
            return psi
        if p_state is None:
            p_state = [i % s.dim for i, s in enumerate(sites)]
        psi = cls.from_product_state(sites, p_state, bc=bc, dtype=dtype)
        trunc_par = {'chi_max': chi, 'svd_min': 1e-14, 'trunc_cut': None}
        psi._random_unitary_sweeps(n_sweeps, trunc_par, rng)
        psi.canonical_form()
        return psi

    def _random_unitary_sweeps(self, n_sweeps, trunc_par, rng, a=1.0):
        """Apply sweeps of random charge-conserving two-site unitaries (chi growth)."""
        from ..linalg.random_matrix import GUE
        L = self.L
        n_bonds = L - 1 if self.finite else L
        for _ in range(n_sweeps):
            for i in range(n_bonds):
                theta = self.get_theta(i, 2)
                # random charge-conserving two-site unitary acting on (p0, p1)
                pleg0 = theta.get_leg('p0')
                pleg1 = theta.get_leg('p1')
                pipe = LegPipe([pleg0, pleg1], qconj=+1)
                H2 = npc.Array.from_func(lambda size: GUE(size, rng),
                                         [pipe.to_LegCharge(),
                                          pipe.to_LegCharge().conj()],
                                         dtype=jnp.complex128, shape_kw='size')
                H2 = (H2 + H2.conj().itranspose([1, 0])) * 0.5
                U2 = npc.expm(H2 * (1j * a))
                U2.legs = (pipe, pipe.conj())
                U2 = U2.split_legs()
                U2.iset_leg_labels(['p0', 'p1', 'p0*', 'p1*'])
                if jnp.issubdtype(self.dtype, jnp.floating):
                    # keep a real MPS real: use orthogonal instead of unitary
                    U2 = U2.real if False else U2
                theta = npc.tensordot(U2, theta, axes=[['p0*', 'p1*'], ['p0', 'p1']])
                theta.itranspose(['vL', 'p0', 'p1', 'vR'])
                theta = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']],
                                           qconj=[+1, -1])
                U, S, VH, err, renorm = svd_theta(theta, trunc_par)
                B_R = VH.split_legs([1]).ireplace_label('p1', 'p')
                A_L = U.split_legs([0]).ireplace_label('p0', 'p')
                self.set_B(i, A_L, 'A')
                self.set_SR(i, S)
                self.set_B(i + 1, B_R, 'B')
                self.dtype = jnp.result_type(self.dtype, jnp.complex128)
        return self

    # ---------------------------------------------------------------- tensor access
    def get_B(self, i, form='B', copy=False, cutoff=1e-16, label_p=None):
        """Tensor at site `i` converted to the requested canonical form."""
        i = self._to_valid_index(i)
        new_form = self._to_valid_form(form)
        old_form = self.form[i]
        B = self._B[i]
        if copy:
            B = B.copy(deep=False)
        if new_form is not None and old_form != new_form:
            B = self._convert_form_i(B, i, old_form, new_form, cutoff)
        if label_p is not None:
            B = B.replace_label('p', 'p' + str(label_p))
        return B

    def _convert_form_i(self, B, i, old_form, new_form, cutoff=1e-16):
        if old_form is None:
            raise ValueError("can't convert form of non-canonical tensor")
        dL = new_form[0] - old_form[0]
        dR = new_form[1] - old_form[1]
        if dL != 0.:
            SL = self.get_SL(i)
            if isinstance(SL, npc.Array):  # matrix-valued S (mixer bond)
                B = npc.tensordot(self._matrix_S_pow(SL, dL, cutoff), B,
                                  axes=[['vR'], ['vL']])
            else:
                B = B.copy(deep=False).iscale_axis(
                    self._scale_S(SL, dL, cutoff), 'vL')
        if dR != 0.:
            SR = self.get_SR(i)
            if isinstance(SR, npc.Array):
                B = npc.tensordot(B, self._matrix_S_pow(SR, dR, cutoff),
                                  axes=[['vR'], ['vL']])
            else:
                B = B.copy(deep=False).iscale_axis(
                    self._scale_S(SR, dR, cutoff), 'vR')
        return B

    @staticmethod
    def _matrix_S_pow(S, exp, cutoff=1e-16):
        """S or its pseudo-inverse for matrix-valued bond S.

        Directions with singular value below `cutoff` pass through with factor
        1 — the same convention as the 1D :meth:`_scale_S` path.  (Projecting
        them out instead sounds cleaner but empirically corrupts the infinite
        wrap-bond conversions during mixer-on iDMRG sweeps.)"""
        if exp == 1.:
            return S
        if exp != -1.:
            raise ValueError("matrix-valued S: only exponents +-1 supported")
        U, s, VH = npc.svd(S, inner_labels=['vR', 'vL'])
        s_inv = 1. / np.where(np.asarray(s) > cutoff, np.asarray(s), 1.)
        Sinv = npc.tensordot(VH.conj().iscale_axis(s_inv, 'vL*'), U.conj(),
                             axes=[['vL*'], ['vR*']])
        Sinv.iset_leg_labels(['vL', 'vR'])
        return Sinv

    @staticmethod
    def _scale_S(S, exp, cutoff=1e-16):
        from ..linalg.np_conserved import _use_jnp
        xp = jnp if _use_jnp(S) else np
        if xp is np:
            S = np.asarray(S)
        if exp == 1.:
            return S
        if exp == -1.:
            return 1. / xp.where(S > cutoff, S, 1.)
        return xp.where(S > cutoff, S, 1.) ** exp

    def set_B(self, i, B, form='B'):
        i = self._to_valid_index(i)
        self.form[i] = self._to_valid_form(form)
        self._B[i] = B
        self.dtype = jnp.result_type(self.dtype, B.dtype)

    def get_SL(self, i):
        return self._S[self._to_valid_index(i)]

    def get_SR(self, i):
        i = self._to_valid_index(i)
        if self.finite or i + 1 < self.L:
            return self._S[i + 1]
        return self._S[0] if self.bc == 'infinite' else self._S[self.L]

    def set_SL(self, i, S):
        i = self._to_valid_index(i)
        if not isinstance(S, npc.Array):  # matrix-valued S allowed (mixer)
            S = np.asarray(S)
        self._S[i] = S
        if not self.finite and i == 0:
            self._S[self.L] = self._S[0]

    def set_SR(self, i, S):
        i = self._to_valid_index(i)
        if not isinstance(S, npc.Array):  # matrix-valued S allowed (mixer)
            S = np.asarray(S)
        if i + 1 <= self.L:
            self._S[i + 1] = S
        if not self.finite and i + 1 == self.L:
            self._S[0] = S

    def get_op(self, op_list, i):
        """Operator from a list cycling over sites."""
        i = self._to_valid_index(i)
        op = op_list[i % len(op_list)]
        if isinstance(op, str):
            op = self.sites[i].get_op(op)
        return op

    def get_theta(self, i, n=2, cutoff=1e-16, formL=1., formR=1.):
        """n-site wavefunction: S--G--...--G--S with labels vL, p0...p{n-1}, vR.

        Each interior bond's Schmidt factor is attached to whichever side's
        *stored* form already carries it, so mid-sweep thetas (mixed A/B
        storage) are built without any ``S^-1`` — inverting noise-floor
        Schmidt values (e.g. bonds kept by ``svd_min ~ 1e-12``) amplifies
        numerical noise catastrophically.  Reference: ``mps.py:3041``.
        """
        i = self._to_valid_index(i)
        if n == 1:
            return self.get_B(i, (formL, formR), cutoff=cutoff, label_p=0)
        theta = None
        aL = formL
        for k in range(n):
            j = self._to_valid_index(i + k)
            st = self.form[j]
            if k == n - 1:
                aR = formR
            else:
                nxt = self.form[self._to_valid_index(i + k + 1)]
                a_next = nxt[0] if nxt is not None else 0.
                aR = 1. - a_next
                if st is not None and st[1] > aR + 1e-12:
                    # keep the stored S power on this side; the (rare) inversion
                    # then happens on the next site's left leg instead
                    aR = st[1]
            B = self.get_B(i + k, (aL, aR), cutoff=cutoff, label_p=k)
            theta = B if theta is None else \
                npc.tensordot(theta, B, axes=[['vR'], ['vL']])
            aL = 1. - aR
        return theta

    # ---------------------------------------------------------------- form conversion
    def convert_form(self, new_form='B'):
        """Bring all tensors into the same canonical form (in place)."""
        new_forms = self._parse_form(new_form)
        for i in range(self.L):
            self._B[i] = self.get_B(i, new_forms[i])
            self.form[i] = new_forms[i]
        return self

    # ---------------------------------------------------------------- physics
    def norm_test(self):
        """Check canonical form: compare single-site theta density matrices
        against the bond Schmidt values (``rho_L == S_L S_L^dagger`` etc.).

        Unlike checking A/B isometries via form conversion, this needs no
        division by S, so it stays finite with noise-floor Schmidt values and
        works with matrix-valued S (mixer bonds).
        Returns array (L, 2) with errors for left/right normalization.
        Reference: ``mps.py:4430`` (norm_test).
        """
        res = np.empty((self.L, 2))
        for i in range(self.L):
            th = self.get_theta(i, 1)
            p = [l for l in th.get_leg_labels() if l not in ('vL', 'vR')]
            pc = [l + '*' for l in p]
            rho_L = npc.tensordot(th, th.conj(), axes=[p + ['vR'], pc + ['vR*']])
            S = self.get_SL(i)
            if isinstance(S, npc.Array):
                rho_L2 = npc.tensordot(S, S.conj(), axes=[['vR'], ['vR*']])
                rho_L2.iset_leg_labels(['vL', 'vL*'])
            else:
                rho_L2 = npc.diag(np.asarray(S) ** 2, rho_L.get_leg('vL'),
                                  dtype=rho_L.dtype, labels=['vL', 'vL*'])
            res[i, 0] = npc.norm(rho_L - rho_L2)
            rho_R = npc.tensordot(th, th.conj(), axes=[['vL'] + p, ['vL*'] + pc])
            S = self.get_SR(i)
            if isinstance(S, npc.Array):
                rho_R2 = npc.tensordot(S.conj(), S, axes=[['vL*'], ['vL']])
                rho_R2.iset_leg_labels(['vR*', 'vR']).itranspose(['vR', 'vR*'])
            else:
                rho_R2 = npc.diag(np.asarray(S) ** 2, rho_R.get_leg('vR'),
                                  dtype=rho_R.dtype, labels=['vR', 'vR*'])
            res[i, 1] = npc.norm(rho_R - rho_R2)
        return res

    def gauge_consistency_error(self):
        """Worst-case isometry error of the *converted* canonical forms.

        :meth:`norm_test` weighs everything by the Schmidt values and therefore
        cannot see garbage in noise-floor Schmidt directions; but any consumer
        that needs the opposite canonical form (``get_B(i, 'A')`` on a B-stored
        MPS divides by S!) amplifies exactly that garbage to O(1).  This check
        measures it directly: convert each tensor to the form opposite to its
        stored one and return the maximal deviation from an exact isometry.
        States fresh from an SVD-based sweep can carry errors of order
        ``lanczos_residual / S_min`` here while passing :meth:`norm_test` at
        1e-15 — such states must be re-canonicalized (with noise-floor
        compression) before transfer-matrix-based environment initialization
        or segment embedding.
        """
        p = list(self._p_label)
        pc = [l + '*' for l in p]
        err = 0.
        for i in range(self.L):
            st = self.form[i]
            if st is None:
                return np.inf
            if isinstance(self.get_SL(i), npc.Array) or \
                    isinstance(self.get_SR(i), npc.Array):
                continue  # matrix-valued mixer bond: forms not comparable
            if st[0] >= 1. - 1e-12 and st[1] <= 1e-12:  # stored 'A': check B
                B = self.get_B(i, 'B')
                c = npc.tensordot(B, B.conj(), axes=[p + ['vR'], pc + ['vR*']])
            else:  # stored B/Th/G: check the A-form
                A = self.get_B(i, 'A')
                c = npc.tensordot(A.conj(), A, axes=[['vL*'] + pc, ['vL'] + p])
            err = max(err, float(npc.norm(c - npc.eye_like(c, 0))))
        return err

    def entanglement_entropy(self, n=1, bonds=None, for_matrix_S=False):
        """Von Neumann (n=1) / Renyi entropy on each bond. Reference: ``mps.py:3777``."""
        if bonds is None:
            nt = self.nontrivial_bonds
            bonds = range(nt.start, nt.stop)
        res = []
        for ib in bonds:
            s = self._S[ib if ib <= self.L else ib % self.L]
            if isinstance(s, npc.Array):  # matrix-valued S: use singular values
                s = npc.svd(s, compute_uv=False)
            s = np.asarray(s)
            res.append(entropy(s ** 2, n))
        return np.array(res)

    def entanglement_spectrum(self, by_charge=False):
        """-2 log(S) per bond (optionally resolved by charge sector).

        Reference: ``mps.py:3946``."""
        if by_charge:
            res = []
            nt = self.nontrivial_bonds
            for ib in range(nt.start, nt.stop):
                leg = self.get_B(ib % self.L, None).get_leg('vL')
                S = np.asarray(self._S[ib]) ** 2
                spec = []
                for qi in range(leg.block_number):
                    sl = leg.get_slice(qi)
                    spec.append((leg.charges[qi],
                                 -np.log(np.maximum(S[sl.start:sl.stop], 1e-300))))
                res.append(spec)
            return res
        return [-2. * np.log(np.maximum(np.asarray(self._S[ib]), 1e-300))
                for ib in range(self.nontrivial_bonds.start, self.nontrivial_bonds.stop)]

    def expectation_value(self, ops, sites=None, axes=None):
        """<psi| op_i |psi> for (lists of) single-site operators.

        Reference: ``mps.py:462``."""
        ops = to_iterable(ops) if isinstance(ops, str) else ops
        if isinstance(ops, str):
            ops = [ops]
        if not isinstance(ops, (list, tuple)):
            ops = [ops]
        if sites is None:
            sites = range(self.L)
        res = []
        for i in sites:
            op = self.get_op(ops, i)
            n = op.rank // 2      # n-site operators: legs p0..p(n-1), starred
            if n == 1:
                theta = self.get_theta(i, 1)
                val = npc.tensordot(op, theta, axes=[['p*'], ['p0']])
                val = npc.tensordot(
                    theta.conj(), val,
                    axes=[['vL*', 'p0*', 'vR*'], ['vL', 'p', 'vR']])
            else:
                if 'p' in op.get_leg_labels():
                    op = op.replace_label('p', 'p0').replace_label('p*', 'p0*')
                theta = self.get_theta(i, n)
                p = [f'p{k}' for k in range(n)]
                ps = [f'{l}*' for l in p]
                val = npc.tensordot(op, theta, axes=[ps, p])
                val = npc.tensordot(theta.conj(), val,
                                    axes=[['vL*', 'vR*'] + ps,
                                          ['vL', 'vR'] + p])
            res.append(complex(val))
        res = np.array(res)
        if np.allclose(res.imag, 0., atol=1e-14):
            res = res.real
        return res

    def expectation_value_multi_sites(self, operators, i0):
        """<psi| op_{i0} op_{i0+1} ... |psi> for a consecutive string of operators."""
        ops = [self.get_op([op], i0 + k) if isinstance(op, str) else op
               for k, op in enumerate(operators)]
        theta = self.get_theta(i0, len(ops))
        ctheta = theta.conj()
        for k, op in enumerate(ops):
            theta = npc.tensordot(op, theta, axes=[['p*'], [f'p{k}']])
            theta.ireplace_label('p', f'p{k}')
        axes = [['vL*', 'vR*'] + [f'p{k}*' for k in range(len(ops))],
                ['vL', 'vR'] + [f'p{k}' for k in range(len(ops))]]
        return complex(npc.tensordot(ctheta, theta, axes=axes))

    def expectation_value_term(self, term, autoJW=True):
        """Expectation value of a general term [(op, i), ...].

        Reference: ``mps.py:889``."""
        from .terms import order_combine_term
        term = list(term)
        if autoJW:
            term, sign = order_combine_term(term, self.sites)
        else:
            term = sorted(term, key=lambda x: x[1])
            sign = 1.
        idx = [i for _, i in term]
        i0 = min(idx)
        i1 = max(idx)
        ops = []
        for x in range(i0, i1 + 1):
            ops_x = [op for op, i in term if i == x]
            opname = ops_x[0] if ops_x else 'Id'
            needs_JW_later = False
            if autoJW:
                # count JW-needing ops strictly right... handled by order_combine: insert
                # JW strings between fermionic pairs
                n_JW_left = sum(1 for op, i in term
                                if i <= x and self.get_site(i).op_needs_JW(op))
                later = [op for op, i in term if i > x and
                         self.get_site(i).op_needs_JW(op)]
                in_string = (n_JW_left % 2 == 1) and len(later) > 0
                if ops_x:
                    if in_string:
                        opname = self.get_site(x).multiply_op_names(ops_x + ['JW']) \
                            if not self.get_site(x).op_needs_JW(ops_x[0]) else \
                            self.get_site(x).multiply_op_names(ops_x + ['JW'])
                    else:
                        opname = self.get_site(x).multiply_op_names(ops_x) \
                            if len(ops_x) > 1 else ops_x[0]
                else:
                    opname = 'JW' if in_string else 'Id'
            ops.append(opname)
        val = self.expectation_value_multi_sites(ops, i0)
        return sign * val

    def expectation_value_terms_sum(self, term_list):
        """Sum of expectation values of a :class:`~tenpy_tpu.networks.terms.TermList`.

        Returns ``(sum, terms)`` with the individual term expectation values.
        Reference: ``mps.py:1015`` (expectation_value_terms_sum)."""
        terms = np.array([self.expectation_value_term(t)
                          for t in term_list.terms], dtype=complex)
        return np.sum(terms * np.asarray(term_list.strength)), terms

    def correlation_function(self, ops1, ops2, sites1=None, sites2=None, opstr=None,
                             str_on_first=True, hermitian=False, autoJW=True):
        """<op1_i op2_j> for i in sites1, j in sites2. Reference: ``mps.py:680``."""
        if sites1 is None:
            sites1 = range(self.L)
        if sites2 is None:
            sites2 = range(self.L)
        sites1 = list(sites1)
        sites2 = list(sites2)
        res = np.empty((len(sites1), len(sites2)), dtype=complex)
        for a, i in enumerate(sites1):
            for b, j in enumerate(sites2):
                op1 = ops1 if isinstance(ops1, str) else ops1[i % len(ops1)]
                op2 = ops2 if isinstance(ops2, str) else ops2[j % len(ops2)]
                if i == j:
                    op = self.get_site(i).multiply_op_names([op1, op2])
                    res[a, b] = complex(self.expectation_value([op], [i])[0])
                    continue
                if i < j:
                    term = [(op1, i), (op2, j)]
                else:
                    term = [(op2, j), (op1, i)]
                if opstr is not None and i != j:
                    # insert explicit string operators between
                    lo, hi = min(i, j), max(i, j)
                    term = term + [(opstr, x) for x in range(lo + 1, hi)]
                    res[a, b] = self.expectation_value_term(term, autoJW=False)
                else:
                    res[a, b] = self.expectation_value_term(term, autoJW=autoJW)
        if np.allclose(res.imag, 0., atol=1e-14):
            res = res.real
        return res

    def overlap(self, other, understood_infinite=False, charge_sector=None):
        """<self|other> (finite / segment; for infinite: per unit cell via TransferMatrix).

        Reference: ``mps.py:4235``."""
        if self.bc == 'infinite':
            if not understood_infinite:
                warnings.warn("overlap of infinite MPS: returning dominant TM eigenvalue")
            TM = TransferMatrix(self, other, transpose=False, charge_sector=charge_sector)
            ov, _ = TM.eigenvectors(which='LM')
            return ov[0]
        env = MPSEnvironment(self, other)
        return env.full_contraction(0)

    def mutinf_two_site(self, max_range=None, n=1):
        """Two-site mutual information I(i:j). Reference: ``mps.py:4180``."""
        if max_range is None:
            max_range = self.L
        S_i = self.entanglement_entropy_segment_1site(n)
        coords = []
        mutinf = []
        for i in range(self.L):
            jmax = i + max_range + 1
            if self.finite:
                jmax = min(jmax, self.L)
            for j in range(i + 1, jmax):
                S_ij = self.entanglement_entropy_segment([i, j], n)
                coords.append((i, j))
                mutinf.append(S_i[i] + S_i[j % self.L] - S_ij)
        return np.array(coords), np.array(mutinf)

    def entanglement_entropy_segment_1site(self, n=1):
        res = []
        for i in range(self.L):
            theta = self.get_theta(i, 1)
            rho = npc.tensordot(theta, theta.conj(), axes=[['vL', 'vR'], ['vL*', 'vR*']])
            p = np.asarray(npc.eigvalsh(rho))
            res.append(entropy(p[p > 1e-30], n))
        return np.array(res)

    def entanglement_entropy_segment(self, segment, n=1):
        segment = sorted(segment)
        i0 = segment[0]
        nsites = segment[-1] - i0 + 1
        theta = self.get_theta(i0, nsites)
        keep = [f'p{k - i0}' for k in segment]
        trace_out = [f'p{k}' for k in range(nsites) if (k + i0) not in segment]
        rho = npc.tensordot(
            theta, theta.conj(),
            axes=[['vL', 'vR'] + trace_out, ['vL*', 'vR*'] + [t + '*' for t in trace_out]])
        rho = rho.combine_legs([keep, [k + '*' for k in keep]], qconj=[+1, -1])
        p = np.asarray(npc.eigvalsh(rho))
        return entropy(p[p > 1e-30], n)

    def probability_per_charge(self, bond=0):
        """Probability of each charge sector on the given bond."""
        if bond <= 0 and not self.finite:
            bond = bond % self.L
        leg = self.get_B(bond % self.L, None).get_leg('vL')
        S2 = np.asarray(self._S[bond]) ** 2
        res = []
        for qi in range(leg.block_number):
            sl = leg.get_slice(qi)
            res.append((leg.get_charge(qi), float(np.sum(S2[sl.start:sl.stop]))))
        return res

    def average_charge(self, bond=0):
        probs = self.probability_per_charge(bond)
        if not probs:
            return np.zeros(self.chinfo.qnumber)
        return sum(np.asarray(q, float) * p for q, p in probs)

    def charge_variance(self, bond=0):
        """Variance of the conserved charge left of `bond`:
        <N_b^2> - <N_b>^2 per charge.  Reference: ``mps.py:4088``."""
        probs = self.probability_per_charge(bond)
        if not probs:
            return np.zeros(self.chinfo.qnumber)
        mean = self.average_charge(bond)
        return sum(np.asarray(q, float) ** 2 * p for q, p in probs) - mean ** 2

    def get_rho_segment(self, segment):
        """Reduced density matrix of the given (sorted) sites; labels
        ``p0..pk, p0*..pk*``.  Exponential in the segment length.
        Reference: ``tenpy/networks/mps.py:3979``."""
        segment = np.sort(np.asarray(segment, int))
        if len(segment) > 20:
            raise ValueError("segment too large: exponentially expensive")
        if np.all(segment[1:] == segment[:-1] + 1):
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
                B = B.replace_label('p', f'p{k}')
                k += 1
                rho = npc.tensordot(rho, B, axes=[['vR'], ['vL']])
                rho = npc.tensordot(rho, B.conj(), axes=[['vR*'], ['vL*']])
            else:
                rho = npc.tensordot(rho, B, axes=[['vR'], ['vL']])
                rho = npc.tensordot(rho, B.conj(),
                                    axes=[['vR*', 'p'], ['vL*', 'p*']])
        B = self.get_B(int(segment[-1]), 'B').replace_label('p', f'p{k}')
        rho = npc.tensordot(rho, B, axes=[['vR'], ['vL']])
        rho = npc.tensordot(rho, B.conj(),
                            axes=[['vR*', 'vR'], ['vL*', 'vR*']])
        return rho

    def spatial_inversion(self):
        """Mirror the MPS: site i <-> site L-1-i; in place.
        Reference: ``tenpy/networks/mps.py:3334``."""
        self.sites = self.sites[::-1]
        self.form = [(f if f is None else (f[1], f[0]))
                     for f in self.form[::-1]]
        self._B = [B.replace_labels(['vL', 'vR'], ['vR', 'vL'])
                   .transpose(['vL'] + self._p_label + ['vR'])
                   for B in self._B[::-1]]
        self._S = self._S[::-1]
        self.test_sanity()
        return self

    # ---------------------------------------------------------------- canonicalization
    def canonical_form(self, **kwargs):
        """Bring the MPS into canonical form (finite or infinite dispatch)."""
        orig_dtype = self.dtype
        if self.finite:
            res = self.canonical_form_finite(**kwargs)
        else:
            res = self.canonical_form_infinite(**kwargs)
        if not jnp.issubdtype(orig_dtype, jnp.complexfloating):
            self.real_if_close()
        return res

    def real_if_close(self, tol=1e-12):
        """Drop a negligible imaginary part (in place; no-op for real states).

        Gauge/canonicalization eigensolvers (Arnoldi, transfer-matrix fixed
        points) can silently upcast a physically real state to complex with
        ~1e-16 imaginary junk.  Besides wasting memory, complex128 is
        unsupported on TPU, so keeping real states real is load-bearing for
        the device path."""
        if not jnp.issubdtype(self.dtype, jnp.complexfloating) and \
                not any(jnp.issubdtype(B.dtype, jnp.complexfloating)
                        for B in self._B):
            # NB: self.dtype alone is not authoritative — individual tensors
            # can be complex after in-place manipulations
            return self
        mx = max((float(np.max(np.abs(np.imag(np.asarray(b)))))
                  for B in self._B for b in B._data), default=0.)
        scale = max((float(np.max(np.abs(np.asarray(b))))
                     for B in self._B for b in B._data), default=1.)
        if mx > tol * max(scale, 1e-300):
            return self   # genuinely complex (or complex by a global phase)
        for i, B in enumerate(self._B):
            self._B[i] = B.real_if_close(tol=tol)
        self.dtype = jnp.result_type(*[B.dtype for B in self._B])
        return self

    def _stripped_tensors(self, pinv_cutoff=None):
        """Raw chain tensors whose plain product is the state.

        If ALL forms are known, convert everything to B-form (the finite-bc product of
        B-form tensors is the state).  If ANY form is None the stored S values are not
        trustworthy -- then the caller guarantees that the product of the RAW stored
        tensors is the state (e.g. after an MPO application), so return those.

        With ``pinv_cutoff`` (a *relative* threshold), S-inversions in the form
        conversion use a zeroing pseudo-inverse: Schmidt directions with
        ``S < pinv_cutoff * max(S)`` give ZERO rows instead of noise amplified by
        1/S.  A zero row is harmless in chain products (the direction simply
        never activates), whereas amplified noise silently corrupts the state --
        essential when canonicalizing states carrying Schmidt values at the
        numerical noise floor (see reference ``mps.py:4721`` precision warning).
        """
        if any(f is None for f in self.form):
            return [self._B[i] for i in range(self.L)]
        if pinv_cutoff is None:
            return [self.get_B(i, 'B') for i in range(self.L)]
        Ms = []
        for i in range(self.L):
            fL, fR = self.form[i]
            M = self._B[i].copy(deep=False)
            for exp, S, ax in [(-fL, self.get_SL(i), 'vL'),
                               (1. - fR, self.get_SR(i), 'vR')]:
                if exp == 0.:
                    continue
                S = np.asarray(S)
                if exp < 0:
                    floor = pinv_cutoff * np.max(S)
                    fac = np.where(S > floor, np.where(S > 0, S, 1.) ** exp, 0.)
                else:
                    fac = S ** exp
                M = M.iscale_axis(fac, ax)
            Ms.append(M)
        return Ms

    def canonical_form_finite(self, renormalize=True, cutoff=0., envs_to_update=None):
        """QR sweep left->right, then SVD sweep right->left.

        For ``bc='segment'`` the boundary Schmidt bases rotate: the rotations
        ``(U_L, V_R)`` are composed into :attr:`segment_boundaries` (they map
        the *original* embedding's Schmidt states to the new ones) and — via
        ``envs_to_update`` — applied to environments, so the embedding into
        the infinite surroundings is preserved.  Reference: ``mps.py:4501``.
        """
        L = self.L
        assert self.bc in ('finite', 'segment')
        seg = self.bc == 'segment'
        if seg:
            S0 = np.asarray(self.get_SL(0))
            self.set_SL(0, S0 / np.linalg.norm(S0))
            SL_ = np.asarray(self.get_SR(L - 1))
            self.set_SR(L - 1, SL_ / np.linalg.norm(SL_))
        Ms = self._stripped_tensors()
        if seg:
            # the segment wavefunction carries the boundary Schmidt weights
            Ms[0] = Ms[0].scale_axis(np.asarray(self.get_SL(0)), 'vL')
        # left -> right with QR: make everything left-isometric
        R = None
        for i in range(L):
            M = Ms[i]
            if R is not None:
                M = npc.tensordot(R, M, axes=[['vR'], ['vL']])
            Q, R = npc.qr(M.combine_legs([['vL', 'p']]), inner_labels=['vR', 'vL'])
            Ms[i] = Q.split_legs([0])
        norm_fact = npc.norm(R)
        if renormalize:
            self.norm = 1.
        else:
            self.norm = self.norm * norm_fact
        R = R / norm_fact
        M = npc.tensordot(Ms[L - 1], R, axes=[['vR'], ['vL']])
        V_R = None
        if seg:
            # new Schmidt values + right-boundary basis rotation
            M_c = M.combine_legs([['vL', 'p']])
            U, S, V_R = npc.svd(M_c, cutoff=cutoff if cutoff else None,
                                qtotal_LR=[M.qtotal, None],
                                inner_labels=['vR', 'vL'])
            S = np.asarray(S)
            S = S / np.linalg.norm(S)
            self.set_SR(L - 1, S)
            M = U.iscale_axis(S, 'vR').split_legs([0])
        else:
            nR = M.get_leg('vR').ind_len
            self.set_SR(L - 1, np.ones(nR))
        # right -> left with SVD: build Schmidt values, convert to 'B'
        U = None
        for i in range(L - 1, 0, -1):
            M_c = M.combine_legs([['p', 'vR']], qconj=[-1])
            U, S, VH = npc.svd(M_c, cutoff=cutoff if cutoff else None,
                               qtotal_LR=[None, M.qtotal] if seg else [None, None],
                               inner_labels=['vR', 'vL'])
            S = np.asarray(S)
            S = S / np.linalg.norm(S)
            self._B[i] = VH.split_legs([1])
            self.form[i] = self._valid_forms['B']
            self.set_SL(i, S)
            M = npc.tensordot(Ms[i - 1], U.iscale_axis(np.asarray(S), 'vR'),
                              axes=[['vR'], ['vL']])
        if seg:
            # split off the left-boundary rotation U_L:  M = U_L . S_0 . B_0
            M_c = M.combine_legs([['p', 'vR']], qconj=[-1])
            U_L, S0n, VH = npc.svd(M_c, cutoff=cutoff if cutoff else None,
                                   qtotal_LR=[None, M.qtotal],
                                   inner_labels=['vR', 'vL'])
            S0n = np.asarray(S0n)
            S0n = S0n / np.linalg.norm(S0n)
            self.set_SL(0, S0n)
            self._B[0] = VH.split_legs([1])
            self.form[0] = self._valid_forms['B']
            if envs_to_update is not None:
                for env in envs_to_update:
                    env._update_gauge_boundaries(self, U_L, V_R)
            old_UL, old_VR = self.segment_boundaries
            if old_UL is not None:
                self.segment_boundaries = (
                    npc.tensordot(old_UL, U_L, axes=[['vR'], ['vL']]),
                    npc.tensordot(V_R, old_VR, axes=[['vR'], ['vL']]))
            else:
                self.segment_boundaries = (U_L, V_R)
            return U_L, V_R
        # M is site 0 in 'Th'-like form (S_0 = 1 for finite bc)
        SL0 = self.get_SL(0)
        self._B[0] = M.copy(deep=False).iscale_axis(self._scale_S(SL0, -1.), 'vL')
        self.form[0] = self._valid_forms['B']
        return self

    def canonical_form_infinite(self, renormalize=True, tol=1e-14, cutoff=1e-15,
                                arnoldi_params=None, **kwargs):
        """Canonicalize an infinite MPS by iterated QR orthogonalization; in place.

        Inverse-free (numerically robust even for singular values at the noise
        floor), following Algorithm 1+2 of vanderstraeten2019.
        Reference: ``tenpy/networks/mps.py:4721`` (canonical_form_infinite2).
        """
        assert self.bc == 'infinite'
        L = self.L
        p_label = list(getattr(self, '_p_label', ['p']))
        if all(f is not None for f in self.form) and \
                not any(isinstance(s, npc.Array) for s in self._S):
            # idempotence: an already-canonical state stays untouched.  (The
            # gauge iteration can cycle indefinitely between equivalent gauges
            # when the Schmidt spectrum has exact degeneracies, so entering it
            # needlessly risks spurious non-convergence.)  The gauge-consistency
            # check catches states that pass norm_test but carry garbage in
            # noise-floor Schmidt directions (S-inverted form conversions blow
            # up); those MUST go through the compression rescue below.
            # (threshold 1e-6: exact states with noise-floor S measure
            # ~eps/S_min ~ 1e-6 here; Lanczos-garbage directions measure O(1))
            if float(np.max(self.norm_test())) < 1e-12 and \
                    self.gauge_consistency_error() < 1e-6:
                return self
        Ms = self._stripped_tensors(pinv_cutoff=1e-8)
        if all(f is not None for f in self.form):
            # Sanity of the B-chain: Schmidt directions at the numerical noise
            # floor make the stored tensors' junk rows garbage, which the pure
            # gauge iteration would faithfully canonicalize into a WRONG state.
            # Rescue via one theta-level compression sweep (thetas are built
            # S-weighted from the stored data and remain well-conditioned),
            # dropping the junk before gauging.
            iso_err = 0.
            for M in Ms:
                c = npc.tensordot(M, M.conj(),
                                  axes=[p_label + ['vR'],
                                        [l + '*' for l in p_label] + ['vR*']])
                iso_err = max(iso_err, float(npc.norm(c - npc.eye_like(c, 0))))
            if iso_err > 1e-3:
                # iso_err is measured on S-stripped tensors, so Schmidt
                # directions at the noise floor (pinv_cutoff) contribute O(1)
                # junk even when the *state* is canonical to truncation
                # accuracy — distinguish that benign case (cheap norm_test)
                # from genuinely inconsistent input before alarming anyone.
                nt = float(np.max(self.norm_test()))
                log = logger.info if nt < 1e-4 else logger.warning
                log("canonical_form_infinite: noise-floor Schmidt directions "
                    "(stripped-isometry err=%.2e, norm_test=%.2e); "
                    "compressing them away before gauging", iso_err, nt)
                self.compress_svd({'chi_max': max(self.chi),
                                   'svd_min': 3e-8, 'trunc_cut': None})
                Ms = self._stripped_tensors(pinv_cutoff=1e-8)
        if any(f is None for f in self.form):
            self._S[0] = np.ones(Ms[0].get_leg('vL').ind_len)
        try:
            # 1) right-orthogonalize:  M_i R_{i+1} = R_i B_i, right-isometric B
            R = npc.diag(1., Ms[0].get_leg('vL'), labels=['vL', 'vR'])
            Bs, R, norm_fact = _cf_orthogonalize(Ms, R, tol, p_label,
                                                 left=False,
                                                 arnoldi_params=arnoldi_params)
            # 2) left-orthogonalize the new Bs:  C_i B_i = A_i C_{i+1}
            SL0 = np.asarray(self.get_SL(0))
            legB0 = Bs[0].get_leg('vL')
            if SL0.ndim == 1 and SL0.shape[0] == legB0.ind_len:
                C = npc.diag(SL0 / np.linalg.norm(SL0), legB0,
                             labels=['vL', 'vR'])
            else:
                C = npc.diag(1., legB0, labels=['vL', 'vR'])
            As, C, _ = _cf_orthogonalize(Bs, C, tol, p_label, left=True,
                                         arnoldi_params=arnoldi_params)
        except _GaugePlateauError as e:
            # exactly degenerate Schmidt values / near-critical transfer
            # matrices can stall the QR gauge iteration on a residual-phase
            # plateau; the per-charge-sector transfer-matrix fixed-point gauge
            # (canonical_form_infinite1) is insensitive to that
            logger.warning("canonical_form_infinite: %s — falling back to the "
                           "transfer-matrix fixed-point gauge", e)
            return self.canonical_form_infinite1(renormalize=renormalize,
                                                 cutoff=cutoff,
                                                 arnoldi_params=arnoldi_params)
        # 3) diagonalize the gauge:  C = U S V;  then sweep SVDs right-to-left to
        #    store B-form tensors and diagonal S on every bond.
        C.itranspose(['vL', 'vR'])
        U, S, V = npc.svd(C, cutoff=cutoff, inner_labels=['vR', 'vL'])
        As[0] = npc.tensordot(U.conj().ireplace_label('vR*', 'vL'), As[0],
                              axes=[['vL*'], ['vL']])
        for i in range(L - 1, -1, -1):
            th = npc.tensordot(As[i], U.scale_axis(np.asarray(S), 'vR'),
                               axes=[['vR'], ['vL']])
            th = th.combine_legs([p_label + ['vR']], qconj=[-1])
            U, S, V = npc.svd(th, cutoff=cutoff, inner_labels=['vR', 'vL'])
            S = np.asarray(S)
            S = S / np.linalg.norm(S)
            self._B[i] = V.split_legs([1])
            self.form[i] = self._valid_forms['B']
            self.set_SL(i, S)
        self._B[L - 1] = npc.tensordot(self._B[L - 1], U, axes=[['vR'], ['vL']])
        if renormalize:
            self.norm = 1.
        else:
            self.norm = self.norm * norm_fact
        truncated = any(
            len(np.asarray(self._S[i])) != As[i].get_leg('vL').ind_len
            for i in range(L))
        if truncated:
            # dropping Schmidt directions mid-gauge perturbs the canonical form;
            # one more (now truncation-free) pass restores it exactly
            return self.canonical_form_infinite(
                renormalize=renormalize, tol=tol, cutoff=None,
                arnoldi_params=arnoldi_params)
        return self

    def canonical_form_infinite1(self, renormalize=True, tol_xi=1e6, cutoff=1e-16,
                                 arnoldi_params=None):
        """Gauge an infinite MPS to canonical form: per-charge-sector gauge fixing on
        bond 0 from the dominant transfer-matrix fixed points, then QR/SVD sweeps
        through the unit cell.

        Reference: ``mps.py:4599`` (canonical_form_infinite1).
        """
        assert self.bc == 'infinite'
        L = self.L
        Ms = self._stripped_tensors()
        psi_B = self.copy()
        for i in range(L):
            psi_B._B[i] = Ms[i]
            psi_B.form[i] = self._valid_forms['B']
        opts = dict(arnoldi_params or {})
        opts.setdefault('N_max', 40)
        opts.setdefault('P_tol', 1e-16)
        TM = TransferMatrix(psi_B, psi_B, transpose=False, form='B')
        eta_R, vecs_R = TM.eigenvectors(which='LM', **opts)
        rho_R = vecs_R[0]    # legs (vL, vL*) at bond 0: right fixed point
        TM_T = TransferMatrix(psi_B, psi_B, transpose=True, form='B')
        eta_L, vecs_L = TM_T.eigenvectors(which='LM', **opts)
        rho_L = vecs_L[0]    # legs (vR, vR*) at bond 0: left fixed point
        eta = float(np.abs(eta_R[0]))
        leg = Ms[0].get_leg('vL')
        S_new, G, Ginv = _gauge_fixed_point_bond(rho_L, rho_R, leg)
        # apply gauge on bond 0: chain -> Ginv . chain . G
        Ms[0] = npc.tensordot(Ginv, Ms[0], axes=[[1], [0]])
        Ms[0].iset_leg_labels(['vL', 'p', 'vR'])
        Ms[L - 1] = npc.tensordot(Ms[L - 1], G, axes=[[2], [0]])
        Ms[L - 1].iset_leg_labels(['vL', 'p', 'vR'])
        Ms[L - 1] = Ms[L - 1] / np.sqrt(eta)
        self.set_SL(0, S_new)
        # left QR sweep through the unit cell starting from theta_0 = S_0 M_0
        R = npc.diag(np.asarray(S_new), Ms[0].get_leg('vL'), labels=['vL', 'vR'])
        As = []
        for i in range(L):
            M = npc.tensordot(R, Ms[i], axes=[['vR'], ['vL']])
            Q, R = npc.qr(M.combine_legs([['vL', 'p']]), inner_labels=['vR', 'vL'])
            As.append(Q.split_legs([0]))
        # right SVD sweep: Vt starts as the leftover R at bond L (== bond 0)
        Vt = R
        for i in range(L - 1, -1, -1):
            M = npc.tensordot(As[i], Vt, axes=[['vR'], ['vL']])
            M_c = M.combine_legs([['p', 'vR']], qconj=[-1])
            U, S, VH = npc.svd(M_c, cutoff=cutoff, inner_labels=['vR', 'vL'])
            S = np.asarray(S)
            S = S / np.linalg.norm(S)
            self._B[i] = VH.split_legs([1])
            self.form[i] = self._valid_forms['B']
            self.set_SL(i, S)
            Vt = U.iscale_axis(np.asarray(S), 'vR')
        # leftover gauge U_0 diag(S_0) on bond 0: absorb the unitary into B_{L-1}
        # so the bond-L basis matches the new bond-0 basis.
        U0 = Vt.copy(deep=False).iscale_axis(self._scale_S(self.get_SL(0), -1.), 'vR')
        self._B[L - 1] = npc.tensordot(self._B[L - 1], U0, axes=[['vR'], ['vL']])
        self._B[L - 1].iset_leg_labels(['vL', 'p', 'vR'])
        if renormalize:
            self.norm = 1.
        return self

    def correlation_length(self, target=1, tol_ev0=1e-8, charge_sector=0,
                           return_charges=False):
        """-L / log|lambda_2| from the transfer-matrix spectrum (infinite bc).

        Reference: ``mps.py:4925``."""
        assert not self.finite
        TM = TransferMatrix(self, self, transpose=False, charge_sector=charge_sector)
        num = max(target + 2, 3)
        etas, _ = TM.eigenvectors(num_ev=num, which='LM')
        etas = np.asarray(etas)
        if charge_sector == 0 or charge_sector is None:
            if abs(np.abs(etas[0]) - 1.) > tol_ev0:
                warnings.warn(f"dominant TM eigenvalue not 1: {etas[0]}")
            etas2 = etas[1:]
        else:
            etas2 = etas
        if charge_sector == 0 or charge_sector is None:
            if np.abs(etas2[0]) > 1. - 1e-10:
                warnings.warn(
                    "degenerate dominant transfer-matrix eigenvalue: the state "
                    "is non-injective (symmetry-broken cat state with "
                    "long-range order); the reported correlation length "
                    "diverges")
        abs_etas = np.abs(etas2[:target])
        with np.errstate(divide='ignore'):
            xi = np.where(abs_etas >= 1., np.inf, -self.L / np.log(abs_etas))
        if target == 1:
            return float(xi[0])
        return xi

    # ---------------------------------------------------------------- mutation
    def subspace_expansion(self, expand_into=(), trunc_par=None):
        """Enlarge every bond basis without changing the represented state; in place.

        Sweeping right-to-left (following Yang & White, arXiv:2005.06104),
        the right-canonical basis of each site's ``(p, vR)`` super-leg is
        extended by directions *orthogonal* to the state: either the most
        important directions of the states in ``expand_into`` (a list of
        same-length MPS), or — if none are given — random orthogonal
        directions.  The new Schmidt values are exact zeros, so ``self``
        still represents the same physical state, but single-site algorithms
        (TDVP, 1-site DMRG) gain room to explore.  Finite bc only.

        Returns the :class:`~tenpy_tpu.linalg.truncation.TruncationError`
        from cutting the expansion density matrix's spectrum down to the
        per-bond budget ``trunc_par['chi_max'] - chi_current``.

        Reference: ``tenpy/networks/mps.py:5160``.
        """
        from ..tools.params import asConfig
        from ..linalg.truncation import eigh_rho
        if self.bc != 'finite':
            raise ValueError("subspace_expansion requires finite bc")
        L = self.L
        assert L >= 2
        psis = [self] + list(expand_into)
        for other in psis[1:]:
            if other.L != L or other.bc != self.bc:
                raise ValueError("expand_into states must match self's "
                                 "length and boundary conditions")
        trunc_par = asConfig(trunc_par if trunc_par is not None
                             else {'svd_min': 1e-8}, 'trunc_params')
        chi_max = trunc_par.get('chi_max', 100)
        err = TruncationError()
        rng = np.random.default_rng(12345)

        # C-tensors: everything right of the working bond absorbed into one
        # center tensor per state (legs vL p vR), starting at the last site
        Cs = [p.get_theta(L - 1, n=1).replace_label('p0', 'p') for p in psis]
        for j in range(L - 1, 0, -1):
            chi_now = Cs[0].get_leg('vL').ind_len
            budget = int(chi_max) - chi_now
            C0 = Cs[0].combine_legs(['p', 'vR'])
            # right-isometric basis currently spanned by the state
            _, exactB = npc.lq(C0, inner_labels=['vR', 'vL'])
            lbl_bra, lbl_ket = '(p*.vR*)', '(p.vR)'
            gram = npc.tensordot(exactB.conj(), exactB,
                                 axes=(['vL*'], ['vL']))  # legs bra, ket
            proj = npc.eye_like(gram, labels=gram.get_leg_labels()) - gram
            extra = None
            if npc.norm(proj) > 1e-12 and budget > 0:
                if len(Cs) > 1:
                    rho = None
                    for C in Cs[1:]:
                        Ck = C.combine_legs(['p', 'vR'])
                        r = npc.tensordot(Ck.conj(), Ck,
                                          axes=(['vL*'], ['vL']))
                        rho = r if rho is None else rho + r
                else:
                    # random positive matrix G G^H on the (p.vR) space:
                    # eigh of its projection yields random orthonormal
                    # directions in the orthogonal complement
                    cplx = jnp.issubdtype(Cs[0].dtype, jnp.complexfloating)

                    def _randn(shape):
                        x = rng.standard_normal(shape)
                        if cplx:
                            x = x + 1j * rng.standard_normal(shape)
                        return x

                    G = npc.Array.from_func(
                        _randn, [proj.legs[0], proj.legs[1]],
                        labels=[lbl_bra, lbl_ket])
                    rho = npc.tensordot(G, G.conj(), axes=[[1], [1]])
                nrm = npc.norm(rho)
                if nrm > 0.:
                    rho = rho * (1. / nrm)
                rho = npc.tensordot(npc.tensordot(proj, rho,
                                                  axes=([lbl_ket], [lbl_bra])),
                                    proj, axes=([lbl_ket], [lbl_bra]))
                if npc.norm(rho) > 1e-12:
                    tp = {k: v for k, v in trunc_par.as_dict().items()}
                    tp['chi_max'] = budget
                    _, V, err_j, _ = eigh_rho(rho, tp, sort='m>')
                    if V.get_leg(1).ind_len > 0:
                        extra = V.conj().itranspose([1, 0])
                        extra.iset_leg_labels(['vL', lbl_ket])
                        err += err_j
            if extra is not None:
                newB = npc.concatenate([exactB, extra], axis='vL')
            else:
                newB = exactB
            newB = newB.split_legs()
            # pull the working bond one site left in every state
            newCs = []
            for psi_i, C in zip(psis, Cs):
                ov = npc.tensordot(C, newB.conj(),
                                   axes=(['p', 'vR'], ['p*', 'vR*']))
                ov = ov.replace_label('vL*', 'vR')
                newCs.append(npc.tensordot(psi_i.get_B(j - 1, form='A'), ov,
                                           axes=(['vR'], ['vL'])))
            Cs = newCs
            self.set_B(j, newB, form='B')
            S = np.asarray(self.get_SL(j))
            grow = newB.get_leg('vL').ind_len - chi_now
            if grow > 0:
                self.set_SL(j, np.concatenate([S, np.zeros(grow)]))
        self.set_B(0, Cs[0], form='B')
        self.test_sanity()
        return err

    def apply_local_op(self, i, op, unitary=None, renormalize=False, cutoff=1e-13,
                       understood_infinite=False):
        """Apply a local (1- or multi-site) operator at site i. Reference: ``mps.py:5275``."""
        i = self._to_valid_index(i)
        if isinstance(op, str):
            op = self.sites[i].get_op(op)
        n = op.rank // 2
        if n == 1:
            opB = npc.tensordot(op, self.get_B(i, None), axes=[['p*'], ['p']])
            self.set_B(i, opB.itranspose(['vL', 'p', 'vR']), self.form[i])
            if not (unitary or renormalize):
                pass
        else:
            th = self.get_theta(i, n)
            labels = [f'p{k}' for k in range(n)]
            op = op.copy(deep=False)
            op.iset_leg_labels(labels + [l + '*' for l in labels])
            th = npc.tensordot(op, th, axes=[[l + '*' for l in labels], labels])
            th.itranspose(['vL'] + labels + ['vR'])
            # split back by SVDs
            self._set_theta_split(i, th, n, cutoff)
        if renormalize:
            self.canonical_form(renormalize=True)
        return self

    def _set_theta_split(self, i, theta, n, cutoff):
        """Split an n-site theta back into B tensors via SVDs (truncation cutoff only)."""
        trunc_par = {'chi_max': None, 'svd_min': cutoff, 'trunc_cut': None}
        rest = theta
        for k in range(n - 1, 0, -1):
            legs_R = [f'p{k}', 'vR']
            legs_L = ['vL'] + [f'p{x}' for x in range(k)]
            rest = rest.combine_legs([legs_L, legs_R], qconj=[+1, -1])
            U, S, VH, err, renorm = svd_theta(rest, trunc_par)
            B = VH.split_legs([1])
            B.ireplace_label(f'p{k}', 'p')
            self.set_B(i + k, B, 'B')
            self.set_SL(i + k, S)
            rest = U.split_legs([0]).iscale_axis(np.asarray(S), 'vR')
        rest = rest.copy(deep=False).iscale_axis(self._scale_S(self.get_SL(i), -1.),
                                                 'vL')
        rest.ireplace_label('p0', 'p')
        self.set_B(i, rest, (0., 1.))
        self.form[i] = self._valid_forms['B']

    def apply_product_op(self, ops, unitary=None, renormalize=False):
        for i in range(self.L):
            self.apply_local_op(i, ops[i % len(ops)] if isinstance(ops, list) else ops,
                                unitary=True)
        if renormalize:
            self.canonical_form(renormalize=True)
        return self

    def perturb(self, randomize_params=None, close_1=True, canonicalize=True):
        """Apply small random two-site unitaries (subroutine for randomized init)."""
        from ..algorithms.tebd import RandomUnitaryEvolution
        from ..tools.params import asConfig
        options = asConfig(randomize_params or {}, 'randomize')
        options.setdefault('N_steps', 1)
        options.setdefault('close_1', close_1)
        eng = RandomUnitaryEvolution(self, options)
        eng.run()
        if canonicalize:
            self.canonical_form()
        return self

    def swap_sites(self, i, swap_op='auto', trunc_par=None):
        """Swap sites i and i+1, with fermionic signs for ``swap_op='auto'``.

        Exchanging two fermionic modes commutes their creation operators,
        giving a sign ``(-1)^(n_i n_j)`` per occupation pair ('autoInv' adds
        the reflection phases ``(-i)^(n_i+n_j)``, shapourian2017).
        Reference: ``mps.py:5544``."""
        if trunc_par is None:
            trunc_par = {'chi_max': max(self.chi) if self.chi else 100}
        siteL, siteR = self.sites[self._to_valid_index(i)], \
            self.sites[self._to_valid_index(i + 1)]
        if isinstance(swap_op, str):
            dL, dR = siteL.dim, siteR.dim
            n_i = np.outer(siteL.JW_exponent, np.ones(dR)).reshape(dL * dR)
            n_j = np.outer(np.ones(dL), siteR.JW_exponent).reshape(dL * dR)
            if np.any(n_i * n_j):
                if swap_op == 'auto':
                    diag = (-1.) ** (n_i * n_j)
                elif swap_op == 'autoInv':
                    diag = (-1.) ** (n_i * n_j) * (-1.j) ** n_i * (-1.j) ** n_j
                else:
                    raise ValueError(f"unknown swap_op {swap_op!r}")
                legs = [siteL.leg, siteR.leg,
                        siteL.leg.conj(), siteR.leg.conj()]
                swap_op = npc.Array.from_ndarray(
                    np.diag(diag).reshape([dL, dR, dL, dR]), legs)
                swap_op.iset_leg_labels(['p1', 'p0', 'p0*', 'p1*'])
            else:  # bosonic: plain transposition
                swap_op = None
        theta = self.get_theta(i, 2)
        C = self.get_theta(i, 2, formL=0.)  # no SL on left
        if swap_op is None:
            theta.ireplace_labels(['p0', 'p1'], ['p1', 'p0'])  # swap legs
            C.ireplace_labels(['p0', 'p1'], ['p1', 'p0'])
        else:
            theta = npc.tensordot(swap_op, theta,
                                  axes=[['p0*', 'p1*'], ['p0', 'p1']])
            C = npc.tensordot(swap_op, C, axes=[['p0*', 'p1*'], ['p0', 'p1']])
        theta.itranspose(['vL', 'p0', 'p1', 'vR'])
        C.itranspose(['vL', 'p0', 'p1', 'vR'])
        theta = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
        U, S, VH, err, renorm = svd_theta(theta, trunc_par,
                                          inner_labels=['vR', 'vL'])
        B_R = VH.split_legs(['(p1.vR)']).ireplace_label('p1', 'p')
        B_L = npc.tensordot(C.combine_legs([['p1', 'vR']], qconj=[-1]), VH.conj(),
                            axes=[['(p1.vR)'], ['(p1*.vR*)']])
        B_L.ireplace_labels(['p0', 'vL*'], ['p', 'vR'])
        B_L.itranspose(['vL', 'p', 'vR'])
        B_L = B_L / renorm
        # swap the sites metadata
        ii = self._to_valid_index(i)
        i1 = self._to_valid_index(i + 1)
        self.sites[ii], self.sites[i1] = self.sites[i1], self.sites[ii]
        self.set_SR(i, S)
        self.set_B(i, B_L, 'B')
        self.set_B(i + 1, B_R, 'B')
        return err

    def permute_sites(self, perm, swap_op='auto', trunc_par=None, verbose=None):
        """Permute sites by sequence of swaps. Reference: ``mps.py:5698``."""
        perm = list(perm)
        trunc_err = TruncationError()
        n = len(perm)
        pos = list(perm)
        # bubble sort: bring pos into identity by adjacent swaps
        for a in range(n):
            for b in range(n - 1):
                if pos[b] > pos[b + 1]:
                    trunc_err += self.swap_sites(b, swap_op, trunc_par)
                    pos[b], pos[b + 1] = pos[b + 1], pos[b]
        return trunc_err

    def compute_K(self, perm, swap_op='auto', trunc_par=None,
                  canonicalize=1e-6, expected_mean_k=0.):
        r"""Momentum quantum numbers of the entanglement spectrum (2D cylinders).

        Permutes a copy of `self` by one lattice vector around the cylinder
        and extracts the dominant left eigenvector of the mixed transfer
        matrix; its eigenvalues are ``W = S^2 exp(i K)`` (pollmann2012,
        cincio2013).  Returns ``(U, W, q, ov, trunc_err)``.
        Reference: ``tenpy/networks/mps.py:5743``.
        """
        from ..models.lattice import Lattice
        if self.finite:
            raise ValueError("compute_K works only for infinite bc")
        if isinstance(perm, Lattice):
            lat = perm
            assert lat.dim >= 2 and lat.N_sites == self.L
            shifted = lat.order.copy()
            shifted[:, 1] = np.mod(shifted[:, 1] + 1, lat.Ls[1])
            perm = lat.lat2mps_idx(shifted)
        self.convert_form('B')
        if np.linalg.norm(self.norm_test()) > canonicalize:
            warnings.warn("compute_K: psi not canonical, canonicalize")
            self.canonical_form()
        psi_t = self.copy()
        perm = np.asarray(perm)
        trunc_err = psi_t.permute_sites(perm, swap_op, trunc_par)
        psi_t.convert_form('B')
        TM = TransferMatrix(self, psi_t, transpose=True, charge_sector=0)
        ov, sUs = TM.eigenvectors(num_ev=self._transfermatrix_keep)
        if np.abs(ov[0]) < 0.9:
            warnings.warn("compute_K: psi is not an eigenvector of the "
                          f"y-translation; |ov| = {abs(ov[0]):.3e}")
        sUs = sUs[0]
        _, sUs_b = sUs.as_completely_blocked()
        W = np.asarray(npc.eigvals(sUs_b, sort='m>'))
        W = W / np.sum(np.abs(W))  # sum(S^2) == 1 fixes the scaling
        mean_exp_ik = np.sum(W)
        if np.abs(mean_exp_ik) > 1e-5:  # fix the eigenvector's overall phase
            W *= np.exp(1.j * expected_mean_k) * np.conj(mean_exp_ik) \
                / np.abs(mean_exp_ik)
        inv_S = 1. / np.asarray(self.get_SL(0))
        U = sUs.scale_axis(inv_S, 0).iscale_axis(inv_S, 1)
        U *= np.sqrt(U.shape[0]) / npc.norm(U)
        return U, W, sUs_b.legs[0], complex(ov[0]), trunc_err

    def enlarge_mps_unit_cell(self, factor=2):
        """Repeat the unit cell `factor` times (infinite bc)."""
        assert self.bc == 'infinite'
        self.sites = self.sites * factor
        self._B = [B.copy(deep=False) for B in self._B] * factor
        S0 = self._S[:-1]
        self._S = S0 * factor + [self._S[0]]
        self.form = self.form * factor
        return self

    def roll_mps_unit_cell(self, shift=1):
        assert self.bc == 'infinite'
        L = self.L
        shift = shift % L
        self.sites = self.sites[-shift:] + self.sites[:-shift]
        self._B = self._B[-shift:] + self._B[:-shift]
        S = self._S[:-1]
        S = S[-shift:] + S[:-shift]
        self._S = S + [S[0]]
        self.form = self.form[-shift:] + self.form[:-shift]
        return self

    def add(self, other, alpha, beta, cutoff=1e-15):
        """alpha |self> + beta |other> (finite bc). Reference: ``mps.py:5096``."""
        assert self.finite and other.finite and self.L == other.L
        L = self.L
        Bs = []
        for i in range(L):
            B1 = self.get_B(i, 'B')
            B2 = other.get_B(i, 'B')
            if i == 0:
                B1 = B1 * (alpha * self.norm)
                B2 = B2 * (beta * other.norm)
            if i == 0:
                grid = [[B1, B2]]
                axes = [2]
                B = npc.concatenate([B1, B2], axis='vR')
            elif i == L - 1:
                B = npc.concatenate([B1, B2], axis='vL')
            else:
                # block-diagonal direct sum on (vL, vR)
                Z12 = npc.zeros([B1.get_leg('vL'), B1.get_leg('p'), B2.get_leg('vR')],
                                B1.dtype, labels=['vL', 'p', 'vR'])
                Z21 = npc.zeros([B2.get_leg('vL'), B2.get_leg('p'), B1.get_leg('vR')],
                                B2.dtype, labels=['vL', 'p', 'vR'])
                top = npc.concatenate([B1, Z12], axis='vR')
                bot = npc.concatenate([Z21, B2], axis='vR')
                B = npc.concatenate([top, bot], axis='vL')
            Bs.append(B)
        SVs = [np.ones(B.get_leg('vL').ind_len) for B in Bs] + [np.ones(1)]
        psi = MPS(self.sites, Bs, SVs, bc='finite', form=None)
        psi.canonical_form_finite()
        return psi

    def compress_svd(self, trunc_par):
        """Compress by sweeping with truncated SVDs. Reference: ``mps.py:5895``."""
        from ..tools.params import asConfig
        trunc_par = asConfig(trunc_par, 'trunc_params')
        err = TruncationError()
        if self.finite:
            self.canonical_form_finite()
            for i in range(self.L - 1):
                theta = self.get_theta(i, 2)
                theta = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
                U, S, VH, err_i, renorm = svd_theta(theta, trunc_par)
                err += err_i
                B_R = VH.split_legs([1]).ireplace_label('p1', 'p')
                A_L = U.split_legs([0]).ireplace_label('p0', 'p')
                self.set_B(i, A_L, 'A')
                self.set_SR(i, S)
                self.set_B(i + 1, B_R, 'B')
            self.canonical_form_finite()
        else:
            for i in range(self.L):
                theta = self.get_theta(i, 2)
                theta = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
                U, S, VH, err_i, renorm = svd_theta(theta, trunc_par)
                err += err_i
                B_R = VH.split_legs([1]).ireplace_label('p1', 'p')
                self.set_SR(i, S)
                self.set_B(i + 1, B_R, 'B')
                A_L = U.split_legs([0]).ireplace_label('p0', 'p')
                B_L = A_L.iscale_axis(self._scale_S(self.get_SL(i), -1.), 'vL')
                B_L = B_L.iscale_axis(np.asarray((S)), 'vR')
                self.set_B(i, B_L, 'B')
        return err

    def compress(self, options):
        from ..tools.params import asConfig
        options = asConfig(options, 'MPS_compress')
        method = options.get('compression_method', 'SVD')
        if method == 'SVD':
            return self.compress_svd(options.subconfig('trunc_params'))
        elif method == 'variational':
            from ..algorithms.mps_common import VariationalCompression
            return VariationalCompression(self, options).run()
        raise ValueError(f"unknown compression method {method!r}")

    # ---------------------------------------------------------------- sampling
    def sample_measurements(self, first_site=0, last_site=None, ops=None, rng=None,
                            norm_tol=1e-12):
        """Sample a basis configuration (projective measurement outcomes + probability).

        Reference: ``mps.py:4349``."""
        if last_site is None:
            last_site = self.L - 1
        if rng is None:
            rng = np.random.default_rng()
        sigmas = []
        total_weight = 1.
        theta = self.get_theta(first_site, 1).replace_label('p0', 'p')
        for i in range(first_site, last_site + 1):
            site = self.get_site(i)
            if ops is not None:
                op = site.get_op(ops[(i - first_site) % len(ops)])
                W, V = npc.eigh(op)
                theta_b = npc.tensordot(V.conj().itranspose([1, 0]), theta,
                                        axes=[[1], ['p']])
                theta_b.ireplace_label(theta_b.get_leg_labels()[0], 'p')
            else:
                W = np.arange(site.dim)
                theta_b = theta
            # probabilities of each p index
            rho = npc.tensordot(theta_b.conj(), theta_b,
                                axes=[['vL*', 'vR*'], ['vL', 'vR']])
            p_diag = np.abs(np.asarray(rho.to_ndarray()).diagonal()) \
                if rho.rank == 2 else None
            p_diag = p_diag / np.sum(p_diag)
            k = int(rng.choice(len(p_diag), p=p_diag))
            sigmas.append(W[k] if ops is not None else k)
            total_weight *= p_diag[k]
            if i == last_site:
                break
            # project and move on
            proj = np.zeros(theta_b.get_leg('p').ind_len)
            proj[k] = 1.
            theta_proj = npc.tensordot(
                theta_b, npc.Array.from_ndarray(np.asarray(proj),
                                                [theta_b.get_leg('p').conj()],
                                                warn_wrong_sector=False),
                axes=[['p'], [0]])
            theta_proj = theta_proj / max(np.sqrt(p_diag[k]), 1e-300)
            B_next = self.get_B(i + 1, 'B')
            theta = npc.tensordot(theta_proj, B_next, axes=[['vR'], ['vL']])
        return sigmas, total_weight

    # ---------------------------------------------------------------- misc
    def get_total_charge(self, only_physical_legs=False):
        """Total charge of the state.

        Default: sum of the tensors' qtotal (reference semantics; can be gauged
        via :meth:`gauge_total_charge`).  ``only_physical_legs=True`` (finite bc)
        additionally includes the boundary virtual legs' charges, giving the
        physical total charge even when a product state stores its charge on
        the accumulated boundary leg.
        Reference: ``tenpy/networks/mps.py`` same name."""
        q = np.zeros(self.chinfo.qnumber, np.int64)
        for i, B in enumerate(self._B):
            q += np.array(B.qtotal, np.int64)
        if only_physical_legs:
            if self.bc == 'infinite':
                raise ValueError("only_physical_legs not defined for infinite bc")
            legL = self._B[0].get_leg('vL')
            legR = self._B[-1].get_leg('vR')
            q -= np.asarray(legL.to_qflat()[0], np.int64) * legL.qconj
            q -= np.asarray(legR.to_qflat()[0], np.int64) * legR.qconj
        return self.chinfo.make_valid(q)

    def gauge_total_charge(self, qtotal=None, vL_leg=None, vR_leg=None):
        """Gauge virtual-leg charges so each B has the prescribed qtotal; in place.

        ``qtotal``: single charge row (assigned to the LAST site, zeros
        elsewhere) or per-site (L, qnumber) array.  ``vL_leg``/``vR_leg``:
        desired outermost legs (same block structure, shifted charges).
        Reference: ``tenpy/networks/mps.py:3713``.
        """
        from ..linalg.charges import QTYPE
        if self.chinfo.qnumber == 0:
            return
        vL_chdiff = vR_chdiff = None
        if vL_leg is not None:
            vL_chdiff = np.asarray(vL_leg.to_qflat()[0], np.int64) * vL_leg.qconj \
                - np.asarray(self._B[0].get_leg('vL').to_qflat()[0], np.int64) \
                * self._B[0].get_leg('vL').qconj
        if vR_leg is not None:
            vR_chdiff = np.asarray(vR_leg.to_qflat()[0], np.int64) * vR_leg.qconj \
                - np.asarray(self._B[-1].get_leg('vR').to_qflat()[0], np.int64) \
                * self._B[-1].get_leg('vR').qconj
        if qtotal is None and vL_chdiff is not None and vR_chdiff is not None:
            qtotal = self.get_total_charge() + vL_chdiff + vR_chdiff
        qtotal = self.chinfo.make_valid(qtotal)
        if qtotal.ndim == 1:
            fac = np.array([0] * (self.L - 1) + [1], QTYPE)
            qtotal = fac[:, None] * qtotal[None, :]
        if qtotal.shape != (self.L, self.chinfo.qnumber):
            raise ValueError("wrong shape of qtotal")
        if vL_leg is not None and np.any(vL_chdiff != 0):
            B = self._B[0]
            self._B[0] = B.gauge_total_charge(
                'vL', self.chinfo.make_valid(np.asarray(B.qtotal) + vL_chdiff),
                vL_leg.qconj)
        if vL_leg is not None:
            self._B[0].get_leg('vL').test_equal(vL_leg)
        for i in range(self.L):
            B = self._B[i]
            desired = self.chinfo.make_valid(qtotal[i])
            chdiff = self.chinfo.make_valid(np.asarray(B.qtotal) - desired)
            if np.any(chdiff != 0):
                self._B[i] = B.gauge_total_charge('vR', desired)
                if i + 1 != self.L:
                    nextB = self._B[i + 1]
                    self._B[i + 1] = nextB.gauge_total_charge(
                        'vL', self.chinfo.make_valid(
                            np.asarray(nextB.qtotal) + chdiff))
                    self._B[i].get_leg('vR').test_contractible(
                        self._B[i + 1].get_leg('vL'))
        if vR_leg is not None:
            self._B[-1].get_leg('vR').test_equal(vR_leg)
        if self.bc == 'infinite':
            self._B[0].get_leg('vL').test_contractible(
                self._B[-1].get_leg('vR'))
        return self

    def extract_segment(self, first, last):
        """Extract a segment-bc MPS covering sites [first, last]."""
        L = self.L
        sites = [self.get_site(i) for i in range(first, last + 1)]
        Bs = [self.get_B(i, 'B', copy=True) for i in range(first, last + 1)]
        SVs = [np.asarray(self.get_SL(i)) for i in range(first, last + 1)]
        SVs.append(np.asarray(self.get_SR(last)))
        psi = MPS(sites, Bs, SVs, bc='segment', form='B', norm=self.norm)
        return psi


def _gauge_compatible_vL_vR(B0, Blast):
    """Make Blast's vR leg contractible with B0's vL leg (infinite bc wrap)."""
    legL = B0.get_leg('vL')
    legR = Blast.get_leg('vR')
    try:
        legL.test_contractible(legR)
        return Blast
    except ValueError:
        pass
    # charges might differ by a constant shift that can be gauged away
    return Blast


def _gauge_fixed_point_bond(rho_L, rho_R, leg, cutoff=1e-14):
    """Gauge matrices making bond 0 canonical, per charge sector.

    Given the dominant left/right transfer-matrix fixed points ``rho_L`` (legs (vR, vR*))
    and ``rho_R`` (legs (vL, vL*)) of a B-form chain, compute per charge sector
    ``X = sqrt(rho_L)``, ``Y = sqrt(rho_R)``, ``U S V^dag = X Y`` and return
    ``(S_full, G, Ginv)`` with ``G = Y V`` such that the gauged chain
    ``Ginv . chain . G`` is right-canonical with Schmidt values ``S_full`` on bond 0.

    ``G``/``Ginv`` are block-diagonal npc Arrays with legs ``[leg.conj().conj()?]`` --
    concretely ``[leg_as_vL_conj-compatible, leg]`` such that
    ``tensordot(Ginv, B0, [[1], [0]])`` and ``tensordot(Blast, G, [[2], [0]])`` work.
    """
    import scipy.linalg as _sla
    # collect per-sector dense blocks; fixed points are block-diagonal in charge
    n_sec = leg.block_number
    # rho_R legs (vL, vL*): vL leg == `leg`; diagonal blocks (qi, qi)
    R_blocks = {int(r[0]): np.asarray(b) for r, b in zip(rho_R._qdata, rho_R._data)}
    # the transpose-TM matvec produces the TRANSPOSE of the standard left fixed point
    # (rows indexed by the ket): l_standard = extracted^T
    L_blocks = {int(r[0]): np.asarray(b).T for r, b in zip(rho_L._qdata, rho_L._data)}
    # fix the global phase of each fixed point (Arnoldi returns arbitrary phase)
    trR = sum(np.trace(b) for b in R_blocks.values())
    trL = sum(np.trace(b) for b in L_blocks.values())
    phR = trR / abs(trR) if abs(trR) > 0 else 1.
    phL = trL / abs(trL) if abs(trL) > 0 else 1.
    S_parts = []
    G_blocks = {}
    Ginv_blocks = {}
    for qi in range(n_sec):
        n = int(leg.slices[qi + 1] - leg.slices[qi])
        r = R_blocks.get(qi)
        l = L_blocks.get(qi)
        if r is None or l is None:
            # sector unsupported by the state: identity gauge, zero weight
            G_blocks[qi] = np.eye(n)
            Ginv_blocks[qi] = np.eye(n)
            S_parts.append(np.zeros(n))
            continue
        r = r / phR
        l = l / phL
        r = 0.5 * (r + r.conj().T)
        l = 0.5 * (l + l.conj().T)
        wr, vr = np.linalg.eigh(r)
        wl, vl = np.linalg.eigh(l)
        Y = (vr * np.sqrt(np.maximum(wr, 0.))) @ vr.conj().T
        X = (vl * np.sqrt(np.maximum(wl, 0.))) @ vl.conj().T
        U, S, Vh = np.linalg.svd(X @ Y)
        V = Vh.conj().T
        Gq = Y @ V
        # pseudo-inverse of Gq = pinv(Y V) = V^dag pinv(Y)
        Yinv = np.linalg.pinv(Y, rcond=cutoff)
        Ginv_q = V.conj().T @ Yinv
        G_blocks[qi] = Gq
        Ginv_blocks[qi] = Ginv_q
        S_parts.append(S)
    S_full = np.concatenate(S_parts) if S_parts else np.zeros(0)
    nrm = np.linalg.norm(S_full)
    if nrm > 0:
        S_full = S_full / nrm
    dtype = jnp.complex128 if any(np.iscomplexobj(b) for b in G_blocks.values()) \
        else jnp.float64
    G = npc.zeros([leg, leg.conj()], dtype=dtype)
    Ginv = npc.zeros([leg, leg.conj()], dtype=dtype)
    for qi in range(n_sec):
        G.set_block((qi, qi), np.asarray(G_blocks[qi]))
        Ginv.set_block((qi, qi), np.asarray(Ginv_blocks[qi]))
    return S_full, G, Ginv


# ======================================================================== environments
class BaseEnvironment:
    """Partial contractions ``LP[i]`` / ``RP[i]`` of <bra|ket> with age tracking & cache.

    ``LP[i]``: contraction of everything left of site i, legs ``('vR*', 'vR')``.
    ``RP[i]``: everything right of site i, legs ``('vL*', 'vL')``.
    Reference: ``tenpy/networks/mps.py:6168``.
    """

    def __init__(self, bra, ket, cache=None, **init_env_data):
        self.bra = bra
        self.ket = ket
        assert bra.L == ket.L
        self.L = L = bra.L
        self.finite = bra.finite
        self.dtype = jnp.result_type(bra.dtype, ket.dtype)
        from ..tools.cache import DictCache
        self.cache = cache if cache is not None else DictCache.trivial()
        self._LP_keys = [f'LP_{i}' for i in range(L)]
        self._RP_keys = [f'RP_{i}' for i in range(L)]
        self._LP_age = [None] * L
        self._RP_age = [None] * L
        self.init_first_LP_last_RP(**init_env_data)

    def init_first_LP_last_RP(self, init_LP=None, init_RP=None, age_LP=0, age_RP=0,
                              start_env_sites=None):
        if init_LP is None:
            init_LP = self.init_LP(0, start_env_sites or 0)
        if init_RP is None:
            init_RP = self.init_RP(self.L - 1, start_env_sites or 0)
        self.set_LP(0, init_LP, age=age_LP)
        self.set_RP(self.L - 1, init_RP, age=age_RP)

    def _update_gauge_boundaries(self, psi, U_L, V_R):
        """Rotate the stored boundary environments after a segment-bc
        ``psi.canonical_form_finite`` changed the boundary Schmidt bases by
        ``(U_L, V_R)`` — preserves the embedding into the infinite
        surroundings.  Reference: ``mpo.py`` ``_update_gauge_LP/RP``."""
        LP = self.get_LP(0, store=False)
        RP = self.get_RP(self.L - 1, store=False)
        ageL = self.get_LP_age(0)
        ageR = self.get_RP_age(self.L - 1)
        self.clear()
        if self.ket is psi:
            LP = npc.tensordot(LP, U_L, axes=[['vR'], ['vL']])
            RP = npc.tensordot(V_R, RP, axes=[['vR'], ['vL']])
        if self.bra is psi:
            LP = npc.tensordot(LP, U_L.conj(), axes=[['vR*'], ['vL*']])
            RP = npc.tensordot(V_R.conj(), RP, axes=[['vR*'], ['vL*']])
        LP.itranspose([l for l in (['vR*', 'wR', 'vR']
                                   if 'wR' in LP.get_leg_labels()
                                   else ['vR*', 'vR'])])
        RP.itranspose([l for l in (['wL', 'vL', 'vL*']
                                   if 'wL' in RP.get_leg_labels()
                                   else ['vL', 'vL*'])])
        self.set_LP(0, LP, age=ageL)
        self.set_RP(self.L - 1, RP, age=ageR)

    def init_LP(self, i, start_env_sites=0):
        leg = self.ket.get_B(i - start_env_sites, None).get_leg('vL')
        leg_bra = self.bra.get_B(i - start_env_sites, None).get_leg('vL')
        init_LP = npc.diag(1., leg, dtype=self.dtype, labels=['vR*', 'vR'])
        for j in range(i - start_env_sites, i):
            init_LP = self._contract_LP(j, init_LP)
        return init_LP

    def init_RP(self, i, start_env_sites=0):
        leg = self.ket.get_B(i + start_env_sites, None).get_leg('vR')
        init_RP = npc.diag(1., leg.conj(), dtype=self.dtype, labels=['vL', 'vL*'])
        for j in range(i + start_env_sites, i, -1):
            init_RP = self._contract_RP(j, init_RP)
        return init_RP

    def get_LP(self, i, store=True):
        """LP[i], computing (and caching) it from the nearest available one."""
        i0 = i
        while self._LP_age[i0 % self.L] is None or \
                self._LP_keys[i0 % self.L] not in self.cache:
            i0 -= 1
            if i - i0 > 2 * self.L:
                raise ValueError("no LP available")
        LP = self.cache[self._LP_keys[i0 % self.L]]
        age = self._LP_age[i0 % self.L]
        for j in range(i0, i):
            LP = self._contract_LP(j, LP)
            age += 1
            if store:
                self.set_LP(j + 1, LP, age=age)
        return LP

    def get_RP(self, i, store=True):
        i0 = i
        while self._RP_age[i0 % self.L] is None or \
                self._RP_keys[i0 % self.L] not in self.cache:
            i0 += 1
            if i0 - i > 2 * self.L:
                raise ValueError("no RP available")
        RP = self.cache[self._RP_keys[i0 % self.L]]
        age = self._RP_age[i0 % self.L]
        for j in range(i0, i, -1):
            RP = self._contract_RP(j, RP)
            age += 1
            if store:
                self.set_RP(j - 1, RP, age=age)
        return RP

    def set_LP(self, i, LP, age=0):
        i = i % self.L
        self.cache[self._LP_keys[i]] = LP
        self._LP_age[i] = age

    def set_RP(self, i, RP, age=0):
        i = i % self.L
        self.cache[self._RP_keys[i]] = RP
        self._RP_age[i] = age

    def get_LP_age(self, i):
        return self._LP_age[i % self.L]

    def get_RP_age(self, i):
        return self._RP_age[i % self.L]

    def has_LP(self, i):
        return self._LP_age[i % self.L] is not None

    def has_RP(self, i):
        return self._RP_age[i % self.L] is not None

    def del_LP(self, i):
        i = i % self.L
        if self._LP_keys[i] in self.cache:
            del self.cache[self._LP_keys[i]]
        self._LP_age[i] = None

    def del_RP(self, i):
        i = i % self.L
        if self._RP_keys[i] in self.cache:
            del self.cache[self._RP_keys[i]]
        self._RP_age[i] = None

    def clear(self):
        for i in range(self.L):
            self.del_LP(i)
            self.del_RP(i)

    def cache_optimize(self, short_term_LP=(), short_term_RP=(), preload_LP=None,
                       preload_RP=None):
        """Tell the cache which env tensors stay in RAM / to prefetch (reference
        ``mps.py:6583``)."""
        keys = [self._LP_keys[i % self.L] for i in short_term_LP] + \
               [self._RP_keys[i % self.L] for i in short_term_RP]
        self.cache.set_short_term_keys(*keys)
        pre = []
        if preload_LP is not None:
            pre.append(self._LP_keys[preload_LP % self.L])
        if preload_RP is not None:
            pre.append(self._RP_keys[preload_RP % self.L])
        if pre:
            self.cache.preload(*pre)

    @staticmethod
    def _phys_labels(B):
        """Physical legs of a chain tensor (everything but vL/vR): ['p'] for MPS,
        ['p', 'q'] for purification MPS, etc."""
        return [l for l in B.get_leg_labels() if l not in ('vL', 'vR')]

    def _contract_LP(self, i, LP):
        ket_B = self.ket.get_B(i, 'A')
        phys = self._phys_labels(ket_B)
        LP = npc.tensordot(LP, ket_B, axes=[['vR'], ['vL']])
        LP = npc.tensordot(self.bra.get_B(i, 'A').conj(), LP,
                           axes=[['vL*'] + [p + '*' for p in phys],
                                 ['vR*'] + phys])
        return LP  # labels vR*, vR

    def _contract_RP(self, i, RP):
        ket_B = self.ket.get_B(i, 'B')
        phys = self._phys_labels(ket_B)
        RP = npc.tensordot(ket_B, RP, axes=[['vR'], ['vL']])
        RP = npc.tensordot(RP, self.bra.get_B(i, 'B').conj(),
                           axes=[phys + ['vL*'],
                                 [p + '*' for p in phys] + ['vR*']])
        return RP  # labels vL, vL*

    def full_contraction(self, i0):
        """Full <bra|ket> contraction, splitting the chain at bond ``i0``.

        For ``i0 == 0`` (or finite bc) the left part is contracted all the way to the
        right boundary; otherwise LP[i0] meets RP[i0-1] with the bond Schmidt values
        of bra and ket inserted (reference ``mps.py:6688``)."""
        if i0 == 0 or (self.ket.finite and i0 + 1 == self.L):
            # contract everything into LP at the right boundary (A-forms; S_L = 1 for
            # finite bc)
            LP = self.get_LP(self.L - 1)
            LP = self._contract_LP(self.L - 1, LP)
            contr = npc.trace(LP, 'vR*', 'vR')
        else:
            LP = self.get_LP(i0)
            RP = self.get_RP(i0 - 1)
            S_bra = np.conj(np.asarray(self.bra.get_SL(i0)))
            LP = LP.copy(deep=False).iscale_axis(S_bra, 'vR*').iscale_axis(
                np.asarray(self.ket.get_SL(i0)), 'vR')
            contr = npc.tensordot(LP, RP, axes=[['vR*', 'vR'], ['vL*', 'vL']])
        return complex(contr) * self.bra.norm * self.ket.norm

    def expectation_value(self, ops, sites=None, axes=None):
        """<bra|op_i|ket> with proper environments. Reference: ``mps.py:6700``-ish."""
        if sites is None:
            sites = range(self.L)
        res = []
        for i in sites:
            op = ops if not isinstance(ops, (list, tuple)) else ops[i % len(ops)]
            if isinstance(op, str):
                op = self.ket.get_site(i).get_op(op)
            LP = self.get_LP(i)
            RP = self.get_RP(i)
            ket_B = self.ket.get_B(i, 'Th')
            C = npc.tensordot(LP, ket_B, axes=[['vR'], ['vL']])
            C = npc.tensordot(op, C, axes=[['p*'], ['p']])
            C = npc.tensordot(C, RP, axes=[['vR'], ['vL']])
            bra_B = self.bra.get_B(i, 'Th').conj()
            val = npc.tensordot(bra_B, C,
                                axes=[['vL*', 'p*', 'vR*'], ['vR*', 'p', 'vL*']])
            res.append(complex(val) * self.bra.norm * self.ket.norm)
        res = np.array(res)
        if np.allclose(res.imag, 0, atol=1e-14):
            res = res.real
        return res


class MPSEnvironment(BaseEnvironment):
    """Environment of <bra|ket> without any operator in between.

    Reference: ``tenpy/networks/mps.py:6831``.
    """


class _DeflatedLinearOperator:
    """``(1-P) T (1-P)`` with ``P`` the projector onto span of found eigenvectors.

    Used by :meth:`TransferMatrix.eigenvectors` to recover degenerate copies of
    dominant eigenvalues that a single-vector Krylov space cannot contain.
    """

    def __init__(self, op, basis):
        self.op = op
        self.basis = basis

    def project(self, v):
        for u in self.basis:
            v = v - complex(npc.inner(u.conj(), v, axes='range')) * u
        return v

    def matvec(self, v):
        return self.project(self.op.matvec(self.project(v)))


class TransferMatrix:
    r"""(Partial) transfer matrix of <bra|ket>, as a linear operator on 2-leg Arrays.

    Acting to the right: ``T(X) = sum_p B^dag X B``; vectors have legs ``(vL, vL*)``
    for transpose=False (right eigenvector) or ``(vR, vR*)`` (transpose=True).
    Reference: ``tenpy/networks/mps.py:6914``.
    """

    def __init__(self, bra, ket, shift_bra=0, shift_ket=None, transpose=False,
                 charge_sector=0, form='B'):
        self.bra = bra
        self.ket = ket
        if shift_ket is None:
            shift_ket = shift_bra
        self.shift_bra = shift_bra
        self.shift_ket = shift_ket
        self.transpose = transpose
        self.L = L = ket.L
        self.form = form
        self.charge_sector = charge_sector
        self.dtype = jnp.result_type(bra.dtype, ket.dtype)
        if not transpose:
            leg = ket.get_B(shift_ket, form).get_leg('vL')
            self.acts_on_legs = [leg, leg.conj()]  # X: legs (vL, vL*)... but we need
            self.label_in = ['vL', 'vL*']
        else:
            leg = ket.get_B(shift_ket + L - 1, form).get_leg('vR')
            self.label_in = ['vR', 'vR*']
            self.acts_on_legs = [leg.conj(), leg]

    def initial_guess(self, diag=1.):
        """Identity-like initial guess in the right leg structure."""
        if not self.transpose:
            leg = self.ket.get_B(self.shift_ket, self.form).get_leg('vL')
            return npc.diag(diag, leg, dtype=self.dtype, labels=['vL', 'vL*'])
        leg = self.ket.get_B(self.shift_ket + self.L - 1, self.form).get_leg('vR')
        return npc.diag(diag, leg, dtype=self.dtype, labels=['vR', 'vR*'])

    def matvec(self, vec):
        if not self.transpose:
            # right eigenvector: contract B X B^dag from the right, moving left
            X = vec  # legs vL (ket side), vL* (bra side) of site shift_ket
            for j in range(self.L - 1, -1, -1):
                B = self.ket.get_B(self.shift_ket + j, self.form)
                Bc = self.bra.get_B(self.shift_bra + j, self.form).conj()
                X = npc.tensordot(B, X, axes=[['vR'], ['vL']])
                X = npc.tensordot(X, Bc, axes=[['p', 'vL*'], ['p*', 'vR*']])
            X.iset_leg_labels(['vL', 'vL*'])
            return X
        else:
            X = vec  # legs vR (ket), vR* (bra), left of site shift_ket
            for j in range(self.L):
                B = self.ket.get_B(self.shift_ket + j, self.form)
                Bc = self.bra.get_B(self.shift_bra + j, self.form).conj()
                X = npc.tensordot(X, B, axes=[['vR'], ['vL']])
                X = npc.tensordot(Bc, X, axes=[['vL*', 'p*'], ['vR*', 'p']])
            X.iset_leg_labels(['vR*', 'vR'])
            X.itranspose(['vR', 'vR*'])
            return X

    def eigenvectors(self, num_ev=1, max_num_ev=None, which='LM', v0=None, **kwargs):
        """Dominant eigenpairs via Arnoldi on npc vectors."""
        from ..linalg.krylov_based import Arnoldi
        if v0 is None:
            v0 = self.initial_guess()
            if num_ev > 1:
                # the identity guess is the *exact* dominant eigenvector of a
                # canonical-form transfer matrix: Arnoldi's Krylov space then
                # collapses after one step and subleading eigenvalues (e.g.
                # correlation lengths) are unreachable.  Mix in a deterministic
                # random component so the space spans the dominant few.
                rnd = self.initial_guess()
                rng = np.random.default_rng(42)
                rnd._data = [rng.standard_normal(np.shape(b)).astype(
                    np.dtype(str(rnd.dtype))) for b in rnd._data]
                v0 = v0 + rnd * (0.5 / max(npc.norm(rnd), 1e-300))
        opts = dict(kwargs)
        opts.setdefault('N_max', max(20, 2 * num_ev + 10))
        opts['which'] = which
        opts['num_ev'] = num_ev
        eng = Arnoldi(self, v0, opts)
        if num_ev == 1:
            eta, vec, N = eng.run()
            return np.array([eta]), [vec]
        etas, vecs, N = eng.run()
        etas = list(np.asarray(etas))
        vecs = list(vecs)
        # Single-vector Krylov spaces contain exactly ONE vector per *distinct*
        # eigenvalue: a degenerate dominant subspace (e.g. the doubly-degenerate
        # |eta|=1 of a non-injective "cat" iMPS with long-range order) is
        # invisible to the first pass.  Run a second Arnoldi pass on the
        # operator deflated against the converged eigenvectors: for semisimple
        # degeneracies the orthogonal complement of a found eigenvector inside
        # the degenerate eigenspace is an exact eigenpair of the deflated
        # operator, so the missing copies (and any genuinely-next eigenvalues)
        # show up there.  Merge and keep the num_ev largest.
        from ..linalg.krylov_based import gram_schmidt
        basis = gram_schmidt([v.copy() for v in vecs])
        deflated = _DeflatedLinearOperator(self, basis)
        rnd = self.initial_guess()
        rng = np.random.default_rng(7)
        rnd._data = [rng.standard_normal(np.shape(b)).astype(
            np.dtype(str(rnd.dtype))) for b in rnd._data]
        v1 = deflated.project(rnd)
        nrm = npc.norm(v1)
        if nrm > 1e-12:
            eng2 = Arnoldi(deflated, v1 / nrm, opts)
            etas2, vecs2, _ = eng2.run()
            etas += list(np.asarray(etas2))
            vecs += list(vecs2)
        order = np.argsort(-np.abs(np.asarray(etas)))[:num_ev]
        return (np.asarray(etas)[order], [vecs[i] for i in order])


# ======================================================================== initial states
class InitialStateBuilder:
    """Declarative construction of initial MPS from config options.

    Options: ``method`` in {'lat_product_state', 'mps_product_state', 'randomized',
    'from_file', 'desired_bond_dimension'}; plus method-specific keys.
    Reference: ``tenpy/networks/mps.py:7181``.
    """

    def __init__(self, lattice, options, model_dtype=jnp.float64):
        from ..tools.params import asConfig
        self.lattice = lattice
        self.options = asConfig(options, 'InitialStateBuilder')
        self.model_dtype = model_dtype

    def run(self):
        method_name = self.options.get('method', 'lat_product_state', str)
        method = getattr(self, method_name, None)
        if method is None:
            raise ValueError(f"unknown InitialStateBuilder method {method_name!r}")
        psi = method()
        self.check_total_charge(psi)
        return psi

    def check_total_charge(self, psi):
        psi.test_sanity()
        return True

    def lat_product_state(self, p_state=None):
        if p_state is None:
            p_state = self.options['product_state']
        allow = self.options.get('allow_incommensurate', False)
        psi = MPS.from_lat_product_state(self.lattice, p_state,
                                         allow_incommensurate=allow,
                                         dtype=self.model_dtype)
        return psi

    def mps_product_state(self, p_state=None):
        if p_state is None:
            p_state = self.options['product_state']
        psi = MPS.from_product_state(self.lattice.mps_sites(), p_state,
                                     bc=self.lattice.bc_MPS, dtype=self.model_dtype)
        return psi

    def randomized(self):
        method = self.options.get('randomized_from_method', 'lat_product_state', str)
        psi = getattr(self, method)()
        randomize_params = self.options.subconfig('randomize_params')
        close_1 = self.options.get('randomize_close_1', False)
        psi.perturb(randomize_params, close_1=close_1)
        return psi

    def desired_bond_dimension(self):
        chi = self.options['chi']
        psi = MPS.from_desired_bond_dimension(self.lattice.mps_sites(), chi,
                                              bc=self.lattice.bc_MPS)
        return psi

    def from_file(self):
        from ..tools.io import load
        filename = self.options['filename']
        data_key = self.options.get('data_key', 'psi', str)
        data = load(filename)
        psi = data[data_key] if isinstance(data, dict) else data
        return psi


def build_initial_state(size, states, filling, mode='random', seed=None):
    """Distribute `states` with given filling fractions over `size` sites.

    Reference: ``tenpy/networks/mps.py:7595``."""
    filling = np.asarray(filling)
    n_each = np.array(np.round(filling * size), int)
    if abs(np.sum(n_each) - size) > 0:
        n_each[0] += size - np.sum(n_each)
    result = []
    for st, n in zip(states, n_each):
        result.extend([st] * int(n))
    if mode == 'random':
        rng = np.random.default_rng(seed)
        rng.shuffle(result)
    return result


class _OrthoTM:
    """Mixed transfer matrix between fixed isometries Qs (bra) and tensors Ms (ket),
    used to accelerate the QR-iteration canonicalization (Arnoldi on the gauge)."""

    def __init__(self, Qs, Ms, left):
        self.Qs = Qs
        self.Ms = Ms
        self.left = left

    def matvec(self, x):
        if self.left:   # x legs (vL=new, vR=old); sweep left-to-right
            for Q, M in zip(self.Qs, self.Ms):
                x = npc.tensordot(x, M, axes=[['vR'], ['vL']])
                x = npc.tensordot(Q.conj(), x,
                                  axes=[[l + '*' for l in Q.get_leg_labels()[:-1]],
                                        list(Q.get_leg_labels()[:-1])])
                x.ireplace_label('vR*', 'vL')
                x.itranspose(['vL', 'vR'])
        else:           # x legs (vL=old, vR=new); sweep right-to-left
            for Q, M in zip(reversed(self.Qs), reversed(self.Ms)):
                x = npc.tensordot(M, x, axes=[['vR'], ['vL']])
                x = npc.tensordot(x, Q.conj(),
                                  axes=[[l for l in Q.get_leg_labels()[1:]],
                                        [l + '*' for l in Q.get_leg_labels()[1:]]])
                x.ireplace_label('vL*', 'vR')
                x.itranspose(['vL', 'vR'])
        return x


def _cf_orthogonalize(Ms, X, tol, p_label, left, arnoldi_params=None,
                      max_iters=1000):
    """Iterated QR orthogonalization of an infinite unit cell (Alg. 1/2 of
    vanderstraeten2019): find isometric Qs and gauge X with
    ``X_i M_i = Q_i X_{i+1}`` (left) or ``M_i X_{i+1} = X_i Q_i`` (right).

    Returns ``(Qs, X, norm)`` with the converged per-unit-cell norm factor.
    Inverse-free; Arnoldi on the mixed transfer matrix accelerates convergence
    when the correlation length is large.
    """
    from ..linalg.krylov_based import Arnoldi
    L = len(Ms)
    err = np.inf
    best = (np.inf, None, None, 1.)
    norm = 1.
    for _ in range(max_iters):
        X = X / npc.norm(X)
        X_old = X
        Qs = [None] * L
        if left:
            for i in range(L):
                XM = npc.tensordot(X, Ms[i], axes=[['vR'], ['vL']])
                XM = XM.combine_legs([['vL'] + p_label], qconj=[+1])
                Q, X = npc.qr(XM, inner_labels=['vR', 'vL'], pos_diag_R=True,
                              qtotal_Q=XM.qtotal)
                Qs[i] = Q.split_legs([0])
        else:
            for i in range(L - 1, -1, -1):
                MX = npc.tensordot(Ms[i], X, axes=[['vR'], ['vL']])
                MX = MX.combine_legs([p_label + ['vR']], qconj=[-1])
                # keep the carry X charge-neutral: Q absorbs the site's charge,
                # else X's qtotal grows by the unit-cell charge every sweep and
                # the iteration never reaches a fixed structure (e.g. Hubbard
                # at half filling has a charged unit cell)
                X, Q = npc.lq(MX, inner_labels=['vR', 'vL'], pos_diag_L=True,
                              qtotal_L=MX.chinfo.make_valid())
                Qs[i] = Q.split_legs([1])
        norm = npc.norm(X)
        X = X / norm
        try:
            X_old_t = X_old.transpose(X.get_leg_labels())
            for la, lb in zip(X.legs, X_old_t.legs):
                # require the SAME leg (qconj & charges), not just compatible shapes:
                # the first sweep changes the inner-leg convention, and comparing
                # across that boundary would declare false convergence
                if la.qconj != lb.qconj or not np.array_equal(la.charges, lb.charges) \
                        or not np.array_equal(la.slices, lb.slices):
                    raise ValueError("leg mismatch")
            err = npc.norm(X - X_old_t)
        except (ValueError, AssertionError):
            err = np.inf  # leg structure changed (first iterations): keep going
        if err <= tol:
            return Qs, X, norm
        if err < best[0]:
            best = (err, Qs, X, norm)
        if err < 1e-2:  # Arnoldi acceleration once roughly converged
            opts = dict(arnoldi_params or {})
            opts.setdefault('N_max', 20)
            opts['E_tol'] = max(err / 10., 1e-16)
            opts.setdefault('which', 'LM')
            try:
                _, X_acc, _ = Arnoldi(_OrthoTM(Qs, Ms, left), X, opts).run()
                if left:
                    _, X_acc = npc.qr(X_acc.itranspose(['vL', 'vR']),
                                      inner_labels=['vR', 'vL'], pos_diag_R=True)
                    X_acc.iset_leg_labels(['vL', 'vR'])
                else:
                    X_acc, _ = npc.lq(X_acc.itranspose(['vL', 'vR']),
                                      inner_labels=['vR', 'vL'], pos_diag_L=True)
                    X_acc.iset_leg_labels(['vL', 'vR'])
                X = X_acc
            except Exception:
                pass  # fall back to plain power iteration
    if best[0] < 1e-6:
        # degenerate singular values leave a residual gauge-phase noise floor;
        # the state itself is canonical to ~best err, which downstream norm_tol
        # checks will judge
        logger.warning("canonical_form_infinite: gauge iteration plateaued at "
                       "err=%.2e (tol=%.0e)", best[0], tol)
        return best[1], best[2], best[3]
    raise _GaugePlateauError(
        f"canonical_form_infinite did not converge to tol={tol}; last err={err}")


class _GaugePlateauError(RuntimeError):
    """QR gauge iteration plateaued (degenerate/near-critical transfer matrix)."""
