r"""Local Hilbert spaces: :class:`Site` and the concrete site zoo.

Rebuild of ``tenpy/networks/site.py`` (Site :34, GroupedSite :652, group_sites :812,
set_common_charges :840, kron :1170, SpinHalfSite :1205, SpinSite :1285, FermionSite :1386,
SpinHalfFermionSite :1466, SpinHalfHoleSite :1642, BosonSite :1816, spin_half_species :1911,
ClockSite :1979).  Conventions (state ordering, operator names, charge assignments, JW-string
bookkeeping) match the reference so that models built on top produce identical physics.

On-site operators are tiny (d x d); they are stored as charge-blocked
:class:`~tenpy_tpu.linalg.np_conserved.Array` s with legs ``['p', 'p*']`` and live happily on
device — they only enter contractions as small constants folded into jitted graphs.
"""

from __future__ import annotations

import itertools
import numpy as np
import jax.numpy as jnp

from ..linalg import np_conserved as npc
from ..linalg.charges import ChargeInfo, LegCharge
from ..tools.misc import inverse_permutation

__all__ = ['Site', 'GroupedSite', 'group_sites', 'set_common_charges', 'kron',
           'SpinHalfSite', 'SpinSite', 'FermionSite', 'SpinHalfFermionSite',
           'SpinHalfHoleSite', 'BosonSite', 'ClockSite', 'spin_half_species']


class Site:
    """A local Hilbert space: physical leg charges + named on-site operators.

    Parameters
    ----------
    leg : LegCharge
        Charges of the physical basis states.
    state_labels : None | list of str
        Optional names per basis state.
    sort_charge : bool
        Permute the local basis such that the leg is charge-sorted.
    **site_ops :
        Operators (dense matrices) added via :meth:`add_op`.

    Attributes
    ----------
    leg : LegCharge
    state_labels : dict str -> int
    opnames : set
    need_JW_string : set
        Names of operators needing a Jordan-Wigner string.
    hc_ops : dict str -> str
        Map operator name -> name of its hermitian conjugate.
    perm : ndarray
        Permutation applied to the original basis by charge sorting.
    charge_to_JW_parity : ndarray | None
        If set, ``(-1)^(charge_to_JW_parity . q)`` gives the fermion parity of charge
        sector ``q`` (used to apply JW strings on virtual legs).
    """

    def __init__(self, leg, state_labels=None, sort_charge=True, **site_ops):
        self.leg = leg
        self.state_labels = {}
        if state_labels is not None:
            for i, l in enumerate(state_labels):
                if l is not None:
                    self.state_labels[str(l)] = i
        self.opnames = set()
        self.need_JW_string = {'JW'}
        self.hc_ops = {}
        self.used_sort_charge = False
        self.perm = np.arange(leg.ind_len)
        self.charge_to_JW_parity = None
        self.add_op('Id', np.eye(leg.ind_len), hc='Id')
        for name, op in site_ops.items():
            self.add_op(name, op)
        if 'JW' not in self.opnames:
            self.add_op('JW', np.eye(leg.ind_len), hc='JW')
        if sort_charge:
            self.sort_charge()

    # ---------------------------------------------------------------- basic props
    @property
    def dim(self):
        return self.leg.ind_len

    @property
    def onsite_ops(self):
        return {name: getattr(self, name) for name in sorted(self.opnames)}

    def __repr__(self):
        return f"<Site d={self.dim}, ops={sorted(self.opnames)}>"

    # ---------------------------------------------------------------- hdf5
    def save_hdf5(self, hdf5_saver, h5gr, subpath):
        """Generic instance-dict layout (reference Site is Hdf5Exportable)."""
        from ..tools.io import ATTR_FORMAT
        type_repr = hdf5_saver.save_dict_content(
            {k: (sorted(v) if isinstance(v, set) else v)
             for k, v in self.__dict__.items()}, h5gr, subpath)
        h5gr.attrs[ATTR_FORMAT] = type_repr

    @classmethod
    def from_hdf5(cls, hdf5_loader, h5gr, subpath):
        from ..tools.io import ATTR_FORMAT
        obj = cls.__new__(cls)
        hdf5_loader.memorize_load(h5gr, obj)
        fmt = hdf5_loader.get_attr(h5gr, ATTR_FORMAT)
        data = hdf5_loader.load_dict(h5gr, fmt, subpath)
        for k in ('opnames', 'need_JW_string'):
            if k in data:
                data[k] = set(data[k])
        obj.__dict__.update(data)
        return obj

    def test_sanity(self):
        for lab, idx in self.state_labels.items():
            assert 0 <= idx < self.dim
        for op in self.need_JW_string:
            assert op in self.opnames or op == 'JW'
        for op1, op2 in self.hc_ops.items():
            assert op1 in self.opnames and op2 in self.opnames

    # ---------------------------------------------------------------- ops
    def add_op(self, name, op, need_JW=False, hc=None, permute_dense=None):
        """Add an on-site operator (dense matrix or npc Array).

        ``hc``: name of the hermitian conjugate (auto-detected if None; False disables).
        """
        if not name.isidentifier():
            raise ValueError(f"invalid operator name {name!r}")
        if name in self.opnames:
            raise ValueError(f"operator {name!r} already exists")
        if hasattr(self, name):
            raise ValueError(f"operator name {name!r} shadows an attribute")
        if isinstance(op, npc.Array):
            if op.rank != 2:
                raise ValueError("operator needs rank 2")
            op = op.copy(deep=False)
            op.iset_leg_labels(['p', 'p*'])
        else:
            op = np.asarray(op)
            if op.shape != (self.dim, self.dim):
                raise ValueError(f"wrong operator shape {op.shape}")
            if permute_dense is None:
                permute_dense = self.used_sort_charge
            if permute_dense:
                op = op[np.ix_(self.perm, self.perm)]
            op = npc.Array.from_ndarray(np.asarray(op), [self.leg, self.leg.conj()],
                                        labels=['p', 'p*'], warn_wrong_sector=True)
        setattr(self, name, op)
        self.opnames.add(name)
        if need_JW:
            self.need_JW_string.add(name)
        if hc is None:
            hc = self._auto_detect_hc(name, op)
        if hc:
            self.hc_ops[hc] = name
            self.hc_ops[name] = hc

    def _auto_detect_hc(self, name, op):
        """Find an existing operator that is the hermitian conjugate of `op`."""
        dagger = op.conj().itranspose([1, 0])
        dagger.iset_leg_labels(['p', 'p*'])
        if dagger.qtotal == op.qtotal:
            if npc.norm(dagger - op) < 1e-14 * max(npc.norm(op), 1e-10):
                return name
        for other in self.opnames:
            other_op = getattr(self, other)
            if other_op.qtotal == dagger.qtotal and other_op.dtype == dagger.dtype:
                try:
                    if npc.norm(dagger - other_op) < 1e-14 * max(npc.norm(op), 1e-10):
                        return other
                except ValueError:
                    continue
        return None

    def rename_op(self, old_name, new_name):
        if old_name == new_name:
            return
        if new_name in self.opnames:
            raise ValueError(f"{new_name!r} exists")
        op = getattr(self, old_name)
        hc = self.hc_ops.get(old_name, None)
        need_JW = old_name in self.need_JW_string
        self.remove_op(old_name)
        setattr(self, new_name, op)
        self.opnames.add(new_name)
        if need_JW:
            self.need_JW_string.add(new_name)
        if hc is not None:
            if hc == old_name:
                self.hc_ops[new_name] = new_name
            else:
                self.hc_ops[new_name] = hc
                self.hc_ops[hc] = new_name

    def remove_op(self, name):
        hc = self.hc_ops.get(name, None)
        if hc is not None:
            del self.hc_ops[name]
            if hc != name:
                del self.hc_ops[hc]
        delattr(self, name)
        self.opnames.discard(name)
        self.need_JW_string.discard(name)

    def change_charge(self, new_leg_charge=None, permute=None):
        """Change the charges of the leg (and thus of all operators)."""
        if new_leg_charge is None:
            new_leg_charge = LegCharge.from_trivial(self.dim)
        old_ops = {name: np.asarray(getattr(self, name).to_ndarray())
                   for name in self.opnames}
        need_JW = set(self.need_JW_string)
        hc_ops = dict(self.hc_ops)
        labels = {lab: i for lab, i in self.state_labels.items()}
        if permute is not None:
            permute = np.asarray(permute, np.intp)
            inv = inverse_permutation(permute)
            labels = {lab: int(inv[i]) for lab, i in labels.items()}
            old_ops = {name: op[np.ix_(permute, permute)] for name, op in old_ops.items()}
            self.perm = self.perm[permute]
        self.leg = new_leg_charge
        for name in list(self.opnames):
            delattr(self, name)
        self.opnames = set()
        self.hc_ops = {}
        self.need_JW_string = {'JW'}
        self.state_labels = labels
        for name, op in old_ops.items():
            self.add_op(name, op, need_JW=(name in need_JW),
                        hc=hc_ops.get(name, False) or None, permute_dense=False)

    def sort_charge(self, bunch=True):
        """Sort the physical leg by charge, permuting the local basis accordingly."""
        if self.leg.is_sorted() and self.leg.is_bunched():
            return np.arange(self.dim)
        perm_flat, leg_sorted = self.leg.sort(bunch=bunch)
        self.used_sort_charge = True
        self.change_charge(leg_sorted, perm_flat)
        return perm_flat

    # ---------------------------------------------------------------- states
    def state_index(self, label):
        if isinstance(label, (int, np.integer)):
            return int(label)
        try:
            return self.state_labels[str(label)]
        except KeyError:
            raise KeyError(f"unknown state label {label!r}; "
                           f"known: {sorted(self.state_labels)}") from None

    def state_indices(self, labels):
        return [self.state_index(l) for l in labels]

    # ---------------------------------------------------------------- op lookup
    def valid_opname(self, name):
        for op in str(name).split():
            if op not in self.opnames:
                return False
        return True

    def get_op(self, name):
        """Operator by name; space-separated names are multiplied (left to right)."""
        names = str(name).split()
        op = getattr(self, names[0])
        for n in names[1:]:
            op2 = getattr(self, n)
            op = npc.tensordot(op, op2, axes=[[1], [0]])
            op.iset_leg_labels(['p', 'p*'])
        return op

    def get_hc_op_name(self, name):
        names = str(name).split()
        hc_names = []
        for n in reversed(names):
            if n not in self.hc_ops:
                raise ValueError(f"hermitian conjugate of {n!r} unknown")
            hc_names.append(self.hc_ops[n])
        return ' '.join(hc_names)

    @property
    def JW_exponent(self):
        """Exponents n with ``diag(JW) = exp(i pi n)`` (fermion parity per state).

        Reference: ``tenpy/networks/site.py:92``."""
        if not self.valid_opname('JW'):
            return np.zeros(self.dim)
        diag = np.diag(self.get_op('JW').to_ndarray())
        return np.real_if_close(np.angle(np.real_if_close(diag)) / np.pi)

    def op_needs_JW(self, name):
        names = str(name).split()
        need = False
        for op in names:
            if op in self.need_JW_string:
                need = not need
        return need

    def multiply_op_names(self, names):
        return ' '.join(names)

    def multiply_operators(self, operators):
        """Product of operators (matrices or names), applied right to left as matrices."""
        ops = [self.get_op(op) if isinstance(op, str) else op for op in operators]
        res = ops[0]
        for op in ops[1:]:
            res = npc.tensordot(res, op, axes=[[1], [0]])
            res.iset_leg_labels(['p', 'p*'])
        return res

    def charge_to_JW_signs(self, charges):
        """(-1)^(N_fermions) for given charge values (needs `charge_to_JW_parity`)."""
        if self.charge_to_JW_parity is not None:
            parity = np.mod(np.tensordot(np.asarray(charges), self.charge_to_JW_parity,
                                         axes=[[-1], [0]]), 2)
            return 1. - 2. * parity
        raise ValueError("`charge_to_JW_parity` not defined for this site")


class GroupedSite(Site):
    """Several sites merged into one: the local dimension is the product.

    Operators are `opname0`, `opname1`, ... acting on the respective constituent, with
    JW signs inserted for fermionic ops to the left.  Reference: ``site.py:652``.
    """

    def __init__(self, sites, labels=None, charges='same'):
        self.n_sites = n = len(sites)
        self.sites = sites
        if labels is None:
            labels = [str(i) for i in range(n)]
        self.labels = labels
        if charges == 'same':
            pass
        elif charges in ('drop', 'independent'):
            sites = [copy_site(s) for s in sites]
            if charges == 'drop':
                for s in sites:
                    s.change_charge()
            else:
                # embed each site's charges into a direct sum
                all_chinfo_mods = sum((list(s.leg.chinfo.mod) for s in sites), [])
                all_names = sum((list(s.leg.chinfo.names) for s in sites), [])
                chinfo = ChargeInfo(all_chinfo_mods, all_names)
                offset = 0
                for s in sites:
                    qn = s.leg.chinfo.qnumber
                    qflat_old = s.leg.to_qflat()
                    qflat = np.zeros((s.dim, chinfo.qnumber), int)
                    qflat[:, offset:offset + qn] = qflat_old * s.leg.qconj
                    leg = LegCharge.from_qflat(chinfo, qflat, 1)
                    s.change_charge(leg)
                    offset += qn
            self.sites = sites
        else:
            raise ValueError(f"unknown charges {charges!r}")
        chinfo = sites[0].leg.chinfo
        for s in sites[1:]:
            if s.leg.chinfo != chinfo:
                raise ValueError("charges='same' requires identical ChargeInfo; "
                                 "use set_common_charges first")
        legs = [s.leg for s in sites]
        from ..linalg.charges import LegPipe
        pipe = LegPipe(legs, qconj=+1)
        self.leg_pipe = pipe
        # state labels: tuples of constituent labels
        dims = [s.dim for s in sites]
        state_labels = [None] * pipe.ind_len
        for idx in itertools.product(*[range(d) for d in dims]):
            flat = pipe.map_incoming_flat(list(idx))
            labs = []
            for s, i in zip(sites, idx):
                lab = [k for k, v in s.state_labels.items() if v == i]
                labs.append(lab[0] if lab else str(i))
            state_labels[flat] = ' '.join(labs)
        Site.__init__(self, pipe.to_LegCharge(), state_labels, sort_charge=False)
        # JW on the grouped site = tensor product of JWs
        JW_all = self.kroneckerproduct([s.JW for s in sites])
        self.remove_op('JW')
        self.add_op('JW', JW_all, hc='JW')
        self.need_JW_string = {'JW'}
        # add constituent ops
        Ids = [s.Id for s in sites]
        JWs = [s.JW for s in sites]
        for k, (site, label) in enumerate(zip(sites, labels)):
            for opname in sorted(site.opnames):
                if opname in ('Id',):
                    continue
                need_JW = opname in site.need_JW_string
                hc = site.hc_ops.get(opname, None)
                ops = list(Ids)
                ops[k] = getattr(site, opname)
                if need_JW:
                    for j in range(k):
                        ops[j] = JWs[j]
                name = opname + label
                if name in self.opnames:
                    continue
                self.add_op(name, self.kroneckerproduct(ops),
                            need_JW=need_JW,
                            hc=(hc + label) if (hc and hc != opname) else None)
        charge_parities = [s.charge_to_JW_parity for s in sites]
        if charges == 'same' and all(p is not None for p in charge_parities) and \
                all(np.array_equal(p, charge_parities[0]) for p in charge_parities):
            self.charge_to_JW_parity = charge_parities[0]

    def kroneckerproduct(self, ops):
        """Tensor product of one operator per constituent site, fused onto the pipe."""
        pipe = self.leg_pipe
        op = ops[0].replace_labels(['p', 'p*'], ['p0', 'p0*'])
        for k, o in enumerate(ops[1:], start=1):
            op = npc.outer(op, o.replace_labels(['p', 'p*'], [f'p{k}', f'p{k}*']))
        combine = [[f'p{k}' for k in range(self.n_sites)],
                   [f'p{k}*' for k in range(self.n_sites)]]
        res = op.combine_legs(combine, pipes=[pipe, pipe.conj()])
        return res.iset_leg_labels(['p', 'p*'])

    def __repr__(self):
        return f"GroupedSite({self.sites!r})"


def copy_site(site):
    import copy
    return copy.deepcopy(site)


def group_sites(sites, n=2, labels=None, charges='same'):
    """Group consecutive sites into :class:`GroupedSite` s (n at a time).

    Reference: ``site.py:812``.
    """
    grouped = []
    for i in range(0, len(sites), n):
        group = sites[i:i + n]
        lab = labels[i:i + n] if labels is not None else \
            [str(j) for j in range(len(group))]
        grouped.append(GroupedSite(group, lab, charges))
    return grouped


def set_common_charges(sites, new_charges='same', new_names=None, new_mod=None,
                       sort_charge=True):
    """Adjust the sites **in place** to share a single common ChargeInfo.

    `new_charges`:
    * ``'same'``: all sites must have the same charges already (only check/identity map).
    * ``'drop'``: drop all charges.
    * ``'independent'``: direct sum — each site's charges become separate entries.
    * explicit: list over new charges; each entry a list of ``(factor, site_idx, name)``
      linear combinations of old charges.

    Returns the list of per-site basis permutations.  Reference: ``site.py:840``.
    """
    for i, s in enumerate(sites):
        for j in range(i + 1, len(sites)):
            if s is sites[j]:
                raise ValueError("`sites` contains the same Site object twice; deepcopy")
    if new_charges == 'same':
        chinfo = sites[0].leg.chinfo
        for s in sites[1:]:
            if s.leg.chinfo != chinfo:
                raise ValueError("charges differ; use 'independent' or explicit map")
        return [np.arange(s.dim) for s in sites]
    if new_charges == 'drop':
        for s in sites:
            s.change_charge()
        return [np.arange(s.dim) for s in sites]
    if new_charges == 'independent':
        new_charges = []
        for i, s in enumerate(sites):
            for c in range(s.leg.chinfo.qnumber):
                new_charges.append([(1, i, c)])
    # explicit linear combinations
    n_new = len(new_charges)
    if new_mod is None:
        new_mod = []
        for comb in new_charges:
            factor, s_idx, c_idx = comb[0]
            old_mod = sites[s_idx].leg.chinfo.mod[_charge_index(sites[s_idx], c_idx)]
            new_mod.append(old_mod if abs(factor) == 1 else 1)
    if new_names is None:
        new_names = [f'q{i}' for i in range(n_new)]
    chinfo = ChargeInfo(new_mod, new_names)
    perms = []
    for s_idx, s in enumerate(sites):
        qflat_old = s.leg.to_qflat() * s.leg.qconj
        qflat = np.zeros((s.dim, n_new), int)
        for new_c, comb in enumerate(new_charges):
            for entry in comb:
                factor, site_idx, c_idx = entry
                if site_idx != s_idx:
                    continue
                qflat[:, new_c] += np.asarray(
                    factor * qflat_old[:, _charge_index(s, c_idx)], int)
        leg = LegCharge.from_qflat(chinfo, chinfo.make_valid(qflat), 1)
        s.change_charge(leg)
        perms.append(s.sort_charge() if sort_charge else np.arange(s.dim))
    return perms


def _charge_index(site, c):
    if isinstance(c, str):
        return list(site.leg.chinfo.names).index(c)
    return int(c)


def kron(*ops, group=True):
    """Dense tensor product of on-site operators (as npc Array on a LegPipe)."""
    from ..linalg.charges import LegPipe
    op = ops[0].replace_labels(['p', 'p*'], ['p0', 'p0*'])
    for k, o in enumerate(ops[1:], start=1):
        op = npc.outer(op, o.replace_labels(['p', 'p*'], [f'p{k}', f'p{k}*']))
    if not group:
        return op
    n = len(ops)
    res = op.combine_legs([[f'p{k}' for k in range(n)], [f'p{k}*' for k in range(n)]],
                          qconj=[+1, -1])
    return res.iset_leg_labels(['p', 'p*'])


# ======================================================================== concrete sites
class SpinHalfSite(Site):
    """Spin-1/2: states ['up', 'down']; ops Sx, Sy, Sz, Sp, Sm, Sigma*.

    conserve in {'Sz', 'parity', 'None'}. Reference: ``site.py:1205``.
    """

    def __init__(self, conserve='Sz', sort_charge=True):
        if not conserve:
            conserve = 'None'
        if conserve not in ('Sz', 'parity', 'None'):
            raise ValueError(f"invalid conserve {conserve!r}")
        Sx = [[0., 0.5], [0.5, 0.]]
        Sy = [[0., -0.5j], [0.5j, 0.]]
        Sz = [[0.5, 0.], [0., -0.5]]
        Sp = [[0., 1.], [0., 0.]]
        Sm = [[0., 0.], [1., 0.]]
        ops = dict(Sp=Sp, Sm=Sm, Sz=Sz)
        if conserve == 'Sz':
            chinfo = ChargeInfo([1], ['2*Sz'])
            leg = LegCharge.from_qflat(chinfo, [1, -1])
        else:
            ops.update(Sx=Sx, Sy=Sy)
            if conserve == 'parity':
                chinfo = ChargeInfo([2], ['parity_Sz'])
                leg = LegCharge.from_qflat(chinfo, [1, 0])
            else:
                leg = LegCharge.from_trivial(2)
        self.conserve = conserve
        Site.__init__(self, leg, ['up', 'down'], sort_charge=sort_charge, **ops)
        self.state_labels['-0.5'] = self.state_labels['down']
        self.state_labels['0.5'] = self.state_labels['up']
        if conserve != 'Sz':
            self.add_op('Sigmax', 2. * np.asarray(Sx), permute_dense=True)
            self.add_op('Sigmay', 2. * np.asarray(Sy), permute_dense=True)
        self.add_op('Sigmaz', 2. * np.asarray(Sz), permute_dense=True)
        self.charge_to_JW_parity = np.zeros(leg.chinfo.qnumber, int)

    def __repr__(self):
        return f"SpinHalfSite({self.conserve!r})"


class SpinSite(Site):
    """General spin-S site: 2S+1 states from 'down' (Sz=-S) to 'up' (Sz=+S).

    conserve in {'Sz', 'parity', 'None'}. Reference: ``site.py:1285``.
    """

    def __init__(self, S=0.5, conserve='Sz', sort_charge=True):
        if not conserve:
            conserve = 'None'
        if conserve not in ('dipole', 'Sz', 'parity', 'None'):
            raise ValueError(f"invalid conserve {conserve!r}")
        self.S = S = float(S)
        d = 2 * S + 1
        if d <= 1 or np.rint(d) != d:
            raise ValueError("S must be half-integer")
        d = int(d)
        Sz_diag = -S + np.arange(d)
        Sz = np.diag(Sz_diag)
        Sp = np.zeros((d, d))
        for n in range(d - 1):
            m = n - S
            Sp[n + 1, n] = np.sqrt(S * (S + 1) - m * (m + 1))
        Sm = Sp.T.copy()
        Sx = 0.5 * (Sp + Sm)
        Sy = 0.5j * (Sm - Sp)
        ops = dict(Sp=Sp, Sm=Sm, Sz=Sz)
        if conserve == 'dipole':
            # site defined at position 0: local dipole moments of all Sz
            # sectors are 0 there; Lattice.mps_sites shifts the charges to
            # each site's actual position.  Reference: ``site.py:1360``.
            from ..linalg.charges import DipolarChargeInfo
            chinfo = DipolarChargeInfo([1, 1], ['2*Sz', 'dipole'],
                                       charge_idcs=[0], dipole_idcs=[1])
            qflat = np.stack([np.array(2 * Sz_diag, np.int64),
                              np.zeros(d, np.int64)], axis=1)
            leg = LegCharge.from_qflat(chinfo, qflat)
        elif conserve == 'Sz':
            chinfo = ChargeInfo([1], ['2*Sz'])
            leg = LegCharge.from_qflat(chinfo, np.array(2 * Sz_diag, np.int64))
        else:
            ops.update(Sx=Sx, Sy=Sy)
            if conserve == 'parity':
                chinfo = ChargeInfo([2], ['parity_Sz'])
                leg = LegCharge.from_qflat(chinfo, np.mod(np.arange(d), 2))
            else:
                leg = LegCharge.from_trivial(d)
        self.conserve = conserve
        names = [str(i) for i in np.arange(-S, S + 1, 1.)]
        Site.__init__(self, leg, names, sort_charge=sort_charge, **ops)
        self.state_labels['down'] = self.state_labels[names[0]]
        self.state_labels['up'] = self.state_labels[names[-1]]
        self.charge_to_JW_parity = np.zeros(leg.chinfo.qnumber, int)

    def __repr__(self):
        return f"SpinSite(S={self.S}, {self.conserve!r})"


class FermionSite(Site):
    """Spinless fermions: states ['empty', 'full']; ops JW, C, Cd, N, dN, dNdN.

    `C`/`Cd` need a JW string to the left. conserve in {'N', 'parity', 'None'}.
    Reference: ``site.py:1386``.
    """

    def __init__(self, conserve='N', filling=0.5):
        if not conserve:
            conserve = 'None'
        if conserve not in ('N', 'parity', 'None'):
            raise ValueError(f"invalid conserve {conserve!r}")
        JW = np.array([[1., 0.], [0., -1.]])
        C = np.array([[0., 1.], [0., 0.]])
        Cd = np.array([[0., 0.], [1., 0.]])
        N = np.array([[0., 0.], [0., 1.]])
        dN = np.array([[-filling, 0.], [0., 1. - filling]])
        dNdN = dN ** 2
        ops = dict(JW=JW, C=C, Cd=Cd, N=N, dN=dN, dNdN=dNdN)
        if conserve == 'N':
            chinfo = ChargeInfo([1], ['N'])
            leg = LegCharge.from_qflat(chinfo, [0, 1])
            self.charge_to_JW_parity = np.array([1])
        elif conserve == 'parity':
            chinfo = ChargeInfo([2], ['parity_N'])
            leg = LegCharge.from_qflat(chinfo, [0, 1])
            self.charge_to_JW_parity = np.array([1])
        else:
            leg = LegCharge.from_trivial(2)
        self.conserve = conserve
        self.filling = filling
        Site.__init__(self, leg, ['empty', 'full'], sort_charge=True, **ops)
        self.need_JW_string |= {'C', 'Cd', 'JW'}

    def __repr__(self):
        return f"FermionSite({self.conserve!r}, filling={self.filling})"


class SpinHalfFermionSite(Site):
    """Spin-1/2 fermions: states ['empty', 'up', 'down', 'full'].

    Ops: JW/JWu/JWd, Cu/Cdu (annihilate/create up), Cd/Cdd (down), Nu/Nd/Ntot/NuNd/dN,
    Sx/Sy/Sz/Sp/Sm.  Convention: ``full = Cdu Cdd |empty>``.
    cons_N in {'N', 'parity', None}, cons_Sz in {'Sz', 'parity', None}.
    Reference: ``site.py:1466``.
    """

    def __init__(self, cons_N='N', cons_Sz='Sz', filling=1.):
        if not cons_N:
            cons_N = None
        if cons_N not in ('N', 'parity', None):
            raise ValueError(f"invalid cons_N {cons_N!r}")
        if not cons_Sz:
            cons_Sz = None
        if cons_Sz not in ('Sz', 'parity', None):
            raise ValueError(f"invalid cons_Sz {cons_Sz!r}")
        d = 4
        states = ['empty', 'up', 'down', 'full']
        Nu_diag = np.array([0., 1., 0., 1.])
        Nd_diag = np.array([0., 0., 1., 1.])
        Nu = np.diag(Nu_diag)
        Nd = np.diag(Nd_diag)
        Ntot = np.diag(Nu_diag + Nd_diag)
        dN = np.diag(Nu_diag + Nd_diag - filling)
        NuNd = np.diag(Nu_diag * Nd_diag)
        JWu = np.diag(1. - 2. * Nu_diag)
        JWd = np.diag(1. - 2. * Nd_diag)
        JW = JWu @ JWd
        Cu = np.zeros((d, d))
        Cu[0, 1] = Cu[2, 3] = 1.
        Cdu = Cu.T.copy()
        # annihilate down: sign from anticommuting past c_u in |full> = cd_u cd_d |0>
        Cd_ = np.zeros((d, d))
        Cd_[0, 2] = 1.
        Cd_[1, 3] = -1.
        Cdd = Cd_.T.copy()
        Sz = np.diag(0.5 * (Nu_diag - Nd_diag))
        Sp = Cdu @ Cd_  # S^+ = c^dag_up c_down
        Sm = Sp.T.copy()
        Sx = 0.5 * (Sp + Sm)
        Sy = 0.5j * (Sm - Sp)
        ops = dict(JW=JW, JWu=JWu, JWd=JWd, Cu=Cu, Cdu=Cdu, Cd=Cd_, Cdd=Cdd,
                   Nu=Nu, Nd=Nd, Ntot=Ntot, NuNd=NuNd, dN=dN, Sz=Sz, Sp=Sp, Sm=Sm)
        qmod = []
        qnames = []
        charges = []
        if cons_N == 'N':
            qnames.append('N')
            qmod.append(1)
            charges.append([0, 1, 1, 2])
        elif cons_N == 'parity':
            qnames.append('parity_N')
            qmod.append(2)
            charges.append([0, 1, 1, 0])
        if cons_Sz == 'Sz':
            qnames.append('2*Sz')
            qmod.append(1)
            charges.append([0, 1, -1, 0])
        elif cons_Sz == 'parity':
            qnames.append('parity_Sz')
            qmod.append(4)
            charges.append([0, 1, 3, 0])
        if cons_Sz is None:
            ops.update(Sx=Sx, Sy=Sy)
        if len(qmod) == 0:
            leg = LegCharge.from_trivial(d)
        else:
            chinfo = ChargeInfo(qmod, qnames)
            leg = LegCharge.from_qflat(chinfo, np.array(charges).T)
        self.cons_N = cons_N
        self.cons_Sz = cons_Sz
        self.filling = filling
        Site.__init__(self, leg, states, sort_charge=True, **ops)
        self.need_JW_string |= {'Cu', 'Cdu', 'Cd', 'Cdd', 'JWu', 'JWd', 'JW'}
        if cons_N == 'N':
            p = [1] + [0] * (len(qmod) - 1)
            self.charge_to_JW_parity = np.array(p)
        elif cons_N == 'parity':
            self.charge_to_JW_parity = np.array([1] + [0] * (len(qmod) - 1))

    def __repr__(self):
        return f"SpinHalfFermionSite({self.cons_N!r}, {self.cons_Sz!r}, {self.filling})"


class SpinHalfHoleSite(Site):
    """Spin-1/2 fermions with double occupancy projected out: ['empty', 'up', 'down'].

    Reference: ``site.py:1642``.
    """

    def __init__(self, cons_N='N', cons_Sz='Sz', filling=1.):
        if cons_N not in ('N', 'parity', None):
            raise ValueError(f"invalid cons_N {cons_N!r}")
        if cons_Sz not in ('Sz', 'parity', None):
            raise ValueError(f"invalid cons_Sz {cons_Sz!r}")
        d = 3
        states = ['empty', 'up', 'down']
        Nu_diag = np.array([0., 1., 0.])
        Nd_diag = np.array([0., 0., 1.])
        Nu = np.diag(Nu_diag)
        Nd = np.diag(Nd_diag)
        Ntot = np.diag(Nu_diag + Nd_diag)
        dN = np.diag(Nu_diag + Nd_diag - filling)
        JWu = np.diag(1. - 2. * Nu_diag)
        JWd = np.diag(1. - 2. * Nd_diag)
        JW = JWu @ JWd
        Cu = np.zeros((d, d))
        Cu[0, 1] = 1.
        Cdu = Cu.T.copy()
        Cd_ = np.zeros((d, d))
        Cd_[0, 2] = 1.
        Cdd = Cd_.T.copy()
        Sz = np.diag(0.5 * (Nu_diag - Nd_diag))
        Sp = Cdu @ Cd_
        Sm = Sp.T.copy()
        Sx = 0.5 * (Sp + Sm)
        Sy = 0.5j * (Sm - Sp)
        ops = dict(JW=JW, JWu=JWu, JWd=JWd, Cu=Cu, Cdu=Cdu, Cd=Cd_, Cdd=Cdd,
                   Nu=Nu, Nd=Nd, Ntot=Ntot, dN=dN, Sz=Sz, Sp=Sp, Sm=Sm)
        qmod = []
        qnames = []
        charges = []
        if cons_N == 'N':
            qnames.append('N')
            qmod.append(1)
            charges.append([0, 1, 1])
        elif cons_N == 'parity':
            qnames.append('parity_N')
            qmod.append(2)
            charges.append([0, 1, 1])
        if cons_Sz == 'Sz':
            qnames.append('2*Sz')
            qmod.append(1)
            charges.append([0, 1, -1])
        elif cons_Sz == 'parity':
            qnames.append('parity_Sz')
            qmod.append(4)
            charges.append([0, 1, 3])
        if cons_Sz is None:
            ops.update(Sx=Sx, Sy=Sy)
        if len(qmod) == 0:
            leg = LegCharge.from_trivial(d)
        else:
            chinfo = ChargeInfo(qmod, qnames)
            leg = LegCharge.from_qflat(chinfo, np.array(charges).T)
        self.cons_N = cons_N
        self.cons_Sz = cons_Sz
        self.filling = filling
        Site.__init__(self, leg, states, sort_charge=True, **ops)
        self.need_JW_string |= {'Cu', 'Cdu', 'Cd', 'Cdd', 'JWu', 'JWd', 'JW'}
        if cons_N in ('N', 'parity'):
            self.charge_to_JW_parity = np.array([1] + [0] * (len(qmod) - 1))

    def __repr__(self):
        return f"SpinHalfHoleSite({self.cons_N!r}, {self.cons_Sz!r}, {self.filling})"


class BosonSite(Site):
    """Bosons with cutoff Nmax: states ['vac', '1', ..., str(Nmax)].

    Ops: B (annihilate), Bd, N, NN, dN, dNdN, P (parity).
    conserve in {'N', 'parity', 'None'}.  Reference: ``site.py:1816``.
    """

    def __init__(self, Nmax=1, conserve='N', filling=0.):
        if not conserve:
            conserve = 'None'
        if conserve not in ('dipole', 'N', 'parity', 'None'):
            raise ValueError(f"invalid conserve {conserve!r}")
        d = Nmax + 1
        if d < 2:
            raise ValueError("need Nmax >= 1")
        n = np.arange(d)
        B = np.zeros((d, d))
        for m in range(d - 1):
            B[m, m + 1] = np.sqrt(m + 1.)
        Bd = B.T.copy()
        N = np.diag(n)
        NN = np.diag(n ** 2)
        dN = np.diag(n - filling)
        dNdN = np.diag((n - filling) ** 2)
        P = np.diag(1. - 2. * np.mod(n, 2))
        ops = dict(B=B, Bd=Bd, N=N, NN=NN, dN=dN, dNdN=dNdN, P=P)
        if conserve == 'dipole':
            # site defined at position 0 (cf. SpinSite); reference site.py:1886
            from ..linalg.charges import DipolarChargeInfo
            chinfo = DipolarChargeInfo([1, 1], ['N', 'dipole'],
                                       charge_idcs=[0], dipole_idcs=[1])
            leg = LegCharge.from_qflat(
                chinfo, np.stack([n, np.zeros(d, np.int64)], axis=1))
        elif conserve == 'N':
            chinfo = ChargeInfo([1], ['N'])
            leg = LegCharge.from_qflat(chinfo, n)
        elif conserve == 'parity':
            chinfo = ChargeInfo([2], ['parity_N'])
            leg = LegCharge.from_qflat(chinfo, np.mod(n, 2))
        else:
            leg = LegCharge.from_trivial(d)
        self.Nmax = Nmax
        self.conserve = conserve
        self.filling = filling
        states = ['vac'] + [str(m) for m in range(1, d)]
        Site.__init__(self, leg, states, sort_charge=True, **ops)
        self.state_labels['0'] = self.state_labels['vac']
        self.charge_to_JW_parity = np.zeros(leg.chinfo.qnumber, int)

    def __repr__(self):
        return f"BosonSite({self.Nmax}, {self.conserve!r}, {self.filling})"


class ClockSite(Site):
    """q-state clock model site: ops X, Z, Xphc=X+hc, Zphc=Z+hc.

    Z = diag(w^k) with w=exp(2 pi i/q), X |k> = |k+1 mod q>.
    conserve in {'Z', 'None'}. Reference: ``site.py:1979``.
    """

    def __init__(self, q, conserve='Z', sort_charge=True):
        if not conserve:
            conserve = 'None'
        if conserve not in ('Z', 'None'):
            raise ValueError(f"invalid conserve {conserve!r}")
        if q < 2:
            raise ValueError("q must be >= 2")
        self.q = q
        w = np.exp(2.j * np.pi / q)
        X = np.zeros((q, q))
        for k in range(q):
            X[(k + 1) % q, k] = 1.
        Z = np.diag(w ** np.arange(q))
        Xhc = X.T.copy()
        Zhc = Z.conj()
        ops = dict(X=X, Z=Z, Xhc=Xhc, Zhc=Zhc)
        if conserve == 'Z':
            chinfo = ChargeInfo([q], ['clock_phase'])
            leg = LegCharge.from_qflat(chinfo, np.arange(q))
        else:
            leg = LegCharge.from_trivial(q)
        self.conserve = conserve
        states = [str(k) for k in range(q)]
        Site.__init__(self, leg, states, sort_charge=sort_charge, **ops)
        if conserve != 'Z':
            # charge-inhomogeneous combinations (only without Z conservation)
            self.add_op('Xphc', X + Xhc, hc='Xphc', permute_dense=True)
            self.add_op('Zphc', (Z + Zhc).real, hc='Zphc', permute_dense=True)
        if q == 2:
            self.state_labels['up'] = self.state_labels['0']
            self.state_labels['down'] = self.state_labels['1']
        self.charge_to_JW_parity = np.zeros(leg.chinfo.qnumber, int)

    def __repr__(self):
        return f"ClockSite(q={self.q}, {self.conserve!r})"


def spin_half_species(SpeciesSite, cons_N, cons_Sz, **kwargs):
    """Two species (up/down) of a spinless site representing spin-1/2 fermions.

    Returns ``([site_up, site_down], ['up', 'down'])`` with common charges set.
    Reference: ``site.py:1911``.
    """
    conserve = 'N' if cons_N in ('N', 'parity') else None
    up = SpeciesSite(conserve=conserve, **kwargs)
    down = SpeciesSite(conserve=conserve, **kwargs)
    new_charges = []
    new_names = []
    new_mod = []
    if cons_N == 'N':
        new_charges.append([(1, 0, 'N'), (1, 1, 'N')])
        new_names.append('N')
        new_mod.append(1)
    elif cons_N == 'parity':
        new_charges.append([(1, 0, 'N'), (1, 1, 'N')])
        new_names.append('parity_N')
        new_mod.append(2)
    if cons_Sz == 'Sz':
        new_charges.append([(1, 0, 'N'), (-1, 1, 'N')])
        new_names.append('2*Sz')
        new_mod.append(1)
    set_common_charges([up, down], new_charges, new_names, new_mod)
    return [up, down], ['up', 'down']
