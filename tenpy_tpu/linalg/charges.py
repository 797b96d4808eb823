r"""Abelian charge bookkeeping: :class:`ChargeInfo`, :class:`LegCharge`, :class:`LegPipe`.

TPU-first design notes
----------------------
Unlike the reference implementation (tenpy ``tenpy/linalg/charges.py:39,552,1444``), every
object in this module is **immutable and hashable**.  Charge metadata is *static* information:
under ``jax.jit`` it lives in the pytree aux-data, so two tensors with the same charge
structure share one compiled executable.  All sector matching / fusion happens at *trace time*
on the host (in numpy), producing static contraction plans; only the dense block payloads are
traced JAX arrays.

Conventions (mirroring the reference semantics so that results are comparable):

* A charge vector has ``qnumber`` integer entries; entry ``k`` is defined modulo ``mod[k]``
  where ``mod[k] == 1`` means an (unbounded) U(1) charge and ``mod[k] == N`` a Z_N charge.
* A :class:`LegCharge` partitions the leg's index range ``[0, ind_len)`` into contiguous
  *sectors* ``slices[i]:slices[i+1]``, each carrying a charge vector ``charges[i]``.
* ``qconj`` is +1 if the leg's charges count toward the total charge with a plus sign
  (an "incoming" leg) and -1 otherwise.
* The block-sparsity invariant of an array with total charge ``qtotal``:
  ``sum_legs qconj * charges[sector] == qtotal  (mod)`` for every stored block.
"""

from __future__ import annotations

import itertools
import numpy as np

__all__ = [
    'QTYPE', 'ChargeInfo', 'DipolarChargeInfo', 'LegCharge', 'LegPipe',
]

QTYPE = np.int64


def _as_immutable(arr):
    a = np.ascontiguousarray(arr, dtype=QTYPE)
    a.setflags(write=False)
    return a


class ChargeInfo:
    """Metadata for the abelian symmetry group: number of charges and their modulo.

    Parameters
    ----------
    mod : iterable of int
        ``mod[k] == 1`` for a U(1) charge, ``N > 1`` for Z_N.
    names : iterable of str, optional
        Descriptive names per charge.

    .. note::
        Reference: ``tenpy/linalg/charges.py:39`` (``ChargeInfo``); re-designed here as a
        frozen value type usable as jit static argument.
    """

    __slots__ = ('mod', 'names', '_hash')

    @classmethod
    def add(cls, chinfos):
        """Concatenate several ChargeInfos into one (direct sum of charges).

        Reference: ``tenpy/linalg/charges.py`` same name."""
        mods = []
        names = []
        for ci in chinfos:
            mods.extend(ci.mod)
            names.extend(ci.names)
        return cls(mods, names)

    def __init__(self, mod=(), names=None):
        mod = tuple(int(m) for m in mod)
        if any(m < 1 for m in mod):
            raise ValueError("mod entries must be >= 1")
        if names is None:
            names = ('',) * len(mod)
        names = tuple(str(n) for n in names)
        if len(names) != len(mod):
            raise ValueError("names / mod length mismatch")
        object.__setattr__ if False else None
        self.mod = mod
        self.names = names
        self._hash = hash(('ChargeInfo', mod, names))

    @classmethod
    def trivial(cls):
        return cls(())

    @classmethod
    def drop(cls, chinfo, charge=None):
        """ChargeInfo with one charge (or all, if ``charge is None``) removed.

        Reference: ``tenpy/linalg/charges.py:189``."""
        if charge is None:
            return cls()
        if isinstance(charge, str):
            charge = chinfo.names.index(charge)
        mod = list(chinfo.mod)
        names = list(chinfo.names)
        mod.pop(charge)
        names.pop(charge)
        return cls(mod, names)

    @classmethod
    def change(cls, chinfo, charge, new_qmod, new_name=''):
        """ChargeInfo with the qmod (and name) of one charge changed.

        Reference: ``tenpy/linalg/charges.py:215``."""
        if isinstance(charge, str):
            charge = chinfo.names.index(charge)
        mod = list(chinfo.mod)
        names = list(chinfo.names)
        mod[charge] = int(new_qmod)
        names[charge] = new_name
        return cls(mod, names)

    @property
    def qnumber(self):
        return len(self.mod)

    def make_valid(self, charges=None):
        """Map charge values into the canonical range (mod N for Z_N charges)."""
        if charges is None:
            return np.zeros((self.qnumber,), QTYPE)
        charges = np.asarray(charges, dtype=QTYPE)
        if charges.shape[-1] != self.qnumber:
            raise ValueError(f"charges last dim {charges.shape} != qnumber {self.qnumber}")
        if self.qnumber == 0:
            return charges
        mod = np.array(self.mod, dtype=QTYPE)
        # U(1) (mod==1) entries pass through unchanged; Z_N entries wrap.
        wrapped = np.mod(charges, mod)
        return np.where(mod == 1, charges, wrapped)

    def check_valid(self, charges):
        charges = np.asarray(charges, dtype=QTYPE)
        return np.array_equal(self.make_valid(charges), charges)

    # Whether spatial translations act trivially on the charges; subclasses
    # with position-dependent charges (dipole conservation) override this.
    trivial_shift = True

    def shift_charges(self, charges, dx):
        """Charges after translating by lattice vector ``dx`` (trivial here)."""
        return np.asarray(charges, QTYPE)

    def shift_charges_horizontal(self, charges, dx_0):
        """Charges after translating by ``dx_0`` along the first lattice axis."""
        return np.asarray(charges, QTYPE)

    def __eq__(self, other):
        if self is other:
            return True
        if not isinstance(other, ChargeInfo):
            return NotImplemented
        if type(self) is not type(other):
            return False
        return self.mod == other.mod

    def __ne__(self, other):
        res = self.__eq__(other)
        return res if res is NotImplemented else not res

    def __hash__(self):
        return self._hash

    def __repr__(self):
        return f"ChargeInfo({list(self.mod)}, {list(self.names)})"

    # ---------------------------------------------------------------- hdf5
    def save_hdf5(self, hdf5_saver, h5gr, subpath):
        """Reference layout (``tenpy/linalg/charges.py:111``): ``mod`` as
        dataset ``'U1_ZN'``, ``names``, attr ``num_charges``."""
        h5gr.attrs['num_charges'] = self.qnumber
        hdf5_saver.save(np.array(self.mod, QTYPE), subpath + 'U1_ZN')
        hdf5_saver.save(list(self.names), subpath + 'names')

    @classmethod
    def from_hdf5(cls, hdf5_loader, h5gr, subpath):
        qmod = np.asarray(hdf5_loader.load(subpath + 'U1_ZN'), QTYPE)
        names = hdf5_loader.load(subpath + 'names') if 'names' in h5gr else None
        obj = cls(tuple(int(m) for m in qmod), names)
        hdf5_loader.memorize_load(h5gr, obj)
        return obj


class DipolarChargeInfo(ChargeInfo):
    r"""ChargeInfo with dipole-moment conservation (position-dependent shifts).

    One (or more) of the charges is the dipole moment ``p_i = r_i * q_i`` of
    another charge ``q_i``, with ``r_i`` the integer lattice position along
    ``dipole_dims[n]`` (origin at ``lattice.order[0]``).  Under a spatial
    translation by ``dx``, the dipole charges shift by ``dx[dim] * q``, so
    :attr:`trivial_shift` is False and sites/arrays must be charge-shifted
    when moved between positions (``Lattice.mps_sites``, infinite-MPS
    wrapping).  Reference: ``tenpy/linalg/charges.py:375``.

    Parameters
    ----------
    mod, names : as for :class:`ChargeInfo`
    charge_idcs : list of int
        Per dipole charge: index of the underlying charge ``q``.
    dipole_idcs : list of int
        Per dipole charge: index of the dipole charge ``p`` itself.
    dipole_dims : list of int, optional
        Per dipole charge: conserved spatial component (default all 0).
    """

    __slots__ = ('charge_idcs', 'dipole_idcs', 'dipole_dims')

    trivial_shift = False

    def __init__(self, mod=(), names=None, charge_idcs=(), dipole_idcs=(),
                 dipole_dims=None):
        if dipole_dims is None:
            dipole_dims = [0] * len(dipole_idcs)
        mod = tuple(int(m) for m in mod)
        for n, i in enumerate(charge_idcs):
            if not 0 <= i < len(mod):
                raise ValueError(f"charge_idcs[{n}] out of bounds")
        for n, i in enumerate(dipole_idcs):
            if not 0 <= i < len(mod):
                raise ValueError(f"dipole_idcs[{n}] out of bounds")
            if i in charge_idcs:
                raise ValueError("dipole_idcs and charge_idcs must be disjoint")
        for n, i in enumerate(dipole_idcs):
            qmod_p = mod[i]
            qmod_q = mod[charge_idcs[n]]
            if dipole_dims[n] > 0 and qmod_p == 1:
                raise ValueError("cannot conserve U(1) dipole charge along a "
                                 "periodic direction (dipole_dim > 0)")
            if qmod_q > 1 and (qmod_p == 1 or qmod_q % qmod_p != 0):
                raise ValueError(f"dipole qmod={qmod_p} is not a subgroup of "
                                 f"charge qmod={qmod_q}")
        self.charge_idcs = tuple(int(i) for i in charge_idcs)
        self.dipole_idcs = tuple(int(i) for i in dipole_idcs)
        self.dipole_dims = tuple(int(i) for i in dipole_dims)
        super().__init__(mod, names)
        self._hash = hash(('DipolarChargeInfo', self.mod, self.names,
                           self.charge_idcs, self.dipole_idcs,
                           self.dipole_dims))

    def shift_charges(self, charges, dx):
        """``p_i -> p_i + dx[dim] * q_i`` for every dipole charge."""
        charges = np.array(charges, QTYPE)
        dx = np.asarray(dx)
        if dx[-1] != 0:
            raise NotImplementedError(
                "shifts between sublattice positions are not supported")
        for c, d, dim in zip(self.charge_idcs, self.dipole_idcs,
                             self.dipole_dims):
            charges[..., d] += int(dx[dim]) * charges[..., c]
        return self.make_valid(charges)

    def shift_charges_horizontal(self, charges, dx_0):
        charges = np.array(charges, QTYPE)
        for c, d, dim in zip(self.charge_idcs, self.dipole_idcs,
                             self.dipole_dims):
            if dim != 0:
                continue
            charges[..., d] += int(dx_0) * charges[..., c]
        return self.make_valid(charges)

    def __eq__(self, other):
        res = ChargeInfo.__eq__(self, other)
        if res is not True:
            return res
        return (self.charge_idcs == other.charge_idcs
                and self.dipole_idcs == other.dipole_idcs
                and self.dipole_dims == other.dipole_dims)

    def __ne__(self, other):
        res = self.__eq__(other)
        return res if res is NotImplemented else not res

    def __hash__(self):
        return self._hash

    def __repr__(self):
        return (f"DipolarChargeInfo({list(self.mod)}, {list(self.names)}, "
                f"{list(self.charge_idcs)}, {list(self.dipole_idcs)}, "
                f"{list(self.dipole_dims)})")

    def save_hdf5(self, hdf5_saver, h5gr, subpath):
        super().save_hdf5(hdf5_saver, h5gr, subpath)
        hdf5_saver.save(list(self.charge_idcs), subpath + 'charge_idcs')
        hdf5_saver.save(list(self.dipole_idcs), subpath + 'dipole_idcs')
        hdf5_saver.save(list(self.dipole_dims), subpath + 'dipole_dims')

    @classmethod
    def from_hdf5(cls, hdf5_loader, h5gr, subpath):
        qmod = np.asarray(hdf5_loader.load(subpath + 'U1_ZN'), QTYPE)
        names = hdf5_loader.load(subpath + 'names') if 'names' in h5gr else None
        obj = cls(tuple(int(m) for m in qmod), names,
                  hdf5_loader.load(subpath + 'charge_idcs'),
                  hdf5_loader.load(subpath + 'dipole_idcs'),
                  hdf5_loader.load(subpath + 'dipole_dims'))
        hdf5_loader.memorize_load(h5gr, obj)
        return obj


class LegCharge:
    """Charge structure of one tensor leg: contiguous sectors with charge vectors.

    Attributes
    ----------
    chinfo : ChargeInfo
    slices : np.ndarray (block_number+1,), read-only
        Sector ``i`` covers flat indices ``slices[i]:slices[i+1]``.
    charges : np.ndarray (block_number, qnumber), read-only
    qconj : {+1, -1}

    .. note::
        Reference: ``tenpy/linalg/charges.py:552`` (``LegCharge``); here immutable/hashable.
    """

    __slots__ = ('chinfo', 'slices', 'charges', 'qconj', 'sorted', 'bunched', '_hash')

    def __init__(self, chinfo, slices, charges, qconj=1):
        self.chinfo = chinfo
        self.slices = _as_immutable(slices)
        n_sec = len(self.slices) - 1
        self.charges = _as_immutable(
            np.asarray(charges, dtype=QTYPE).reshape(n_sec, chinfo.qnumber))
        self.qconj = int(qconj)
        if self.qconj not in (1, -1):
            raise ValueError("qconj must be +-1")
        if self.slices.ndim != 1 or len(self.slices) != len(self.charges) + 1:
            raise ValueError("slices/charges shape mismatch")
        self.sorted = bool(self._compute_sorted())
        self.bunched = bool(self._compute_bunched())
        self._hash = hash((self.chinfo, self.slices.tobytes(), self.charges.tobytes(),
                           self.qconj))

    # ---------------------------------------------------------------- constructors
    @classmethod
    def from_trivial(cls, ind_len, chinfo=None, qconj=1):
        """Leg with a single sector of zero charge."""
        if chinfo is None:
            chinfo = ChargeInfo.trivial()
        return cls(chinfo, [0, ind_len], [chinfo.make_valid()], qconj)

    @classmethod
    def from_qflat(cls, chinfo, qflat, qconj=1):
        """From one charge vector per flat index (adjacent equal charges merged)."""
        qflat = np.asarray(qflat, dtype=QTYPE)
        if chinfo.qnumber == 0:
            qflat = qflat.reshape(len(qflat), 0)
        else:
            qflat = qflat.reshape(-1, chinfo.qnumber)
        ind_len = len(qflat)
        if ind_len == 0:
            return cls(chinfo, [0], np.zeros((0, chinfo.qnumber), QTYPE), qconj)
        diffs = _find_row_differences(qflat)
        charges = qflat[diffs[:-1]]
        return cls(chinfo, diffs, charges, qconj)

    @classmethod
    def from_qind(cls, chinfo, slices, charges, qconj=1):
        return cls(chinfo, slices, charges, qconj)

    @classmethod
    def from_add_charge(cls, legs, chargeinfo=None):
        """Combine the (independent) charges of several same-length legs.

        Sector boundaries are the union of the legs' boundaries; the result is
        neither sorted nor bunched.  Reference: ``charges.py:843``."""
        legs = list(legs)
        chinfo = ChargeInfo.add([l.chinfo for l in legs])
        if chargeinfo is not None:
            if chinfo != chargeinfo:
                raise ValueError("incompatible chargeinfo")
            chinfo = chargeinfo
        ind_len = legs[0].ind_len
        qconj = legs[0].qconj
        if any(l.ind_len != ind_len for l in legs):
            raise ValueError("different leg lengths")
        if any(l.qconj != qconj for l in legs):
            raise ValueError("different qconj")
        # union of all slice boundaries
        bounds = np.unique(np.concatenate([np.asarray(l.slices) for l in legs]))
        qflat_rows = []
        for b in bounds[:-1]:
            row = []
            for l in legs:
                s = int(np.searchsorted(np.asarray(l.slices), b, 'right')) - 1
                row.extend(np.asarray(l.charges[s], QTYPE))
            qflat_rows.append(row)
        charges = np.array(qflat_rows, QTYPE).reshape(len(qflat_rows),
                                                      chinfo.qnumber)
        return cls(chinfo, bounds.astype(np.intp), charges, qconj)

    @classmethod
    def from_drop_charge(cls, leg, charge=None, chargeinfo=None):
        """LegCharge with one charge (or all) removed. Reference: ``charges.py:908``."""
        if charge is None:
            return cls.from_trivial(leg.ind_len, chargeinfo, leg.qconj)
        chinfo = ChargeInfo.drop(leg.chinfo, charge)
        if chargeinfo is not None:
            if chinfo != chargeinfo:
                raise ValueError("incompatible chargeinfo")
            chinfo = chargeinfo
        if isinstance(charge, str):
            charge = leg.chinfo.names.index(charge)
        return cls(chinfo, leg.slices,
                   np.delete(np.asarray(leg.charges, QTYPE), charge, axis=1),
                   leg.qconj)

    @classmethod
    def from_change_charge(cls, leg, charge, new_qmod, new_name='',
                           chargeinfo=None):
        """LegCharge with the qmod of one charge changed (charges re-wrapped).

        Reference: ``charges.py:941``."""
        chinfo = ChargeInfo.change(leg.chinfo, charge, new_qmod, new_name)
        if chargeinfo is not None:
            if chinfo != chargeinfo:
                raise ValueError("incompatible chargeinfo")
            chinfo = chargeinfo
        charges = chinfo.make_valid(np.asarray(leg.charges, QTYPE))
        return cls(chinfo, leg.slices, charges, leg.qconj)

    @classmethod
    def from_qdict(cls, chinfo, qdict, qconj=1):
        """From ``{charge tuple: slice}`` mapping."""
        items = sorted(qdict.items(), key=lambda kv: kv[1].start)
        slices = [0]
        charges = []
        for q, sl in items:
            if sl.start != slices[-1]:
                raise ValueError("qdict slices not contiguous")
            slices.append(sl.stop)
            charges.append(q)
        return cls(chinfo, slices, charges, qconj)

    # ---------------------------------------------------------------- properties
    @property
    def ind_len(self):
        return int(self.slices[-1])

    @property
    def block_number(self):
        return len(self.charges)

    def sector_sizes(self):
        return self.slices[1:] - self.slices[:-1]

    def get_slice(self, qindex):
        return slice(int(self.slices[qindex]), int(self.slices[qindex + 1]))

    def get_charge(self, qindex):
        """Charge of sector as it counts toward qtotal (i.e. multiplied by qconj)."""
        return self.chinfo.make_valid(self.charges[qindex] * self.qconj)

    def get_qindex(self, flat_index):
        """Return ``(qindex, index_within_sector)`` for a flat leg index."""
        if flat_index < 0:
            flat_index += self.ind_len
        if not 0 <= flat_index < self.ind_len:
            raise IndexError(flat_index)
        qi = int(np.searchsorted(self.slices, flat_index, side='right')) - 1
        return qi, flat_index - int(self.slices[qi])

    def to_qflat(self):
        out = np.empty((self.ind_len, self.chinfo.qnumber), QTYPE)
        for i in range(self.block_number):
            out[self.slices[i]:self.slices[i + 1]] = self.charges[i]
        return out

    def to_qdict(self):
        return {tuple(self.charges[i]): slice(int(self.slices[i]), int(self.slices[i + 1]))
                for i in range(self.block_number)}

    # ---------------------------------------------------------------- hdf5
    def save_hdf5(self, hdf5_saver, h5gr, subpath):
        """Reference ``'blocks'`` layout (``charges.py:649``): datasets
        ``slices``/``charges``, subgroup ``chinfo``, attrs ``format``,
        ``ind_len``, ``qconj``, ``block_number``, ``sorted``, ``bunched``."""
        h5gr.attrs['format'] = 'blocks'
        h5gr.attrs['ind_len'] = self.ind_len
        h5gr.attrs['qconj'] = self.qconj
        h5gr.attrs['block_number'] = self.block_number
        h5gr.attrs['sorted'] = bool(self.sorted)
        h5gr.attrs['bunched'] = bool(self.bunched)
        hdf5_saver.save(self.chinfo, subpath + 'chinfo')
        hdf5_saver.save(np.asarray(self.slices), subpath + 'slices')
        hdf5_saver.save(np.asarray(self.charges), subpath + 'charges')

    @classmethod
    def from_hdf5(cls, hdf5_loader, h5gr, subpath):
        fmt = hdf5_loader.get_attr(h5gr, 'format')
        qconj = int(hdf5_loader.get_attr(h5gr, 'qconj'))
        chinfo = hdf5_loader.load(subpath + 'chinfo')
        if fmt == 'blocks':
            slices = hdf5_loader.load(subpath + 'slices')
            charges = hdf5_loader.load(subpath + 'charges')
        elif fmt == 'compact':
            bc = np.asarray(hdf5_loader.load(subpath + 'blockcharges'))
            slices = np.concatenate([bc[:, 0], bc[-1:, 1]])
            charges = np.asarray(bc[:, 2:], QTYPE)
        elif fmt == 'flat':
            qflat = np.asarray(hdf5_loader.load(subpath + 'charges'))
            obj = cls.from_qflat(chinfo, qflat, qconj)
            hdf5_loader.memorize_load(h5gr, obj)
            return obj
        else:
            raise ValueError(f"unknown LegCharge hdf5 format {fmt!r}")
        obj = cls(chinfo, slices, charges, qconj)
        hdf5_loader.memorize_load(h5gr, obj)
        return obj

    # ---------------------------------------------------------------- transformations
    def conj(self):
        """Flip ``qconj`` keeping ``charges`` — the contractible partner of self."""
        return LegCharge(self.chinfo, self.slices, self.charges, -self.qconj)

    def apply_charge_mapping(self, func, func_kwargs=None):
        """New LegCharge with ``charges = func(charges, **func_kwargs)``.

        Used for position-dependent charge shifts (dipole conservation);
        reference ``tenpy/linalg/charges.py`` same name."""
        charges = func(np.array(self.charges, QTYPE), **(func_kwargs or {}))
        return LegCharge(self.chinfo, self.slices, charges, self.qconj)

    def flip_charges_qconj(self):
        """Flip qconj *and* negate charges: same physical leg, opposite bookkeeping."""
        charges = self.chinfo.make_valid(-self.charges)
        res = LegCharge(self.chinfo, self.slices, charges, -self.qconj)
        return res

    def sort(self, bunch=True):
        """Return ``(perm_flat, sorted_leg)`` with sectors sorted lexicographically."""
        if self.block_number > 1 and self.chinfo.qnumber > 0:
            perm_qind = np.lexsort(self.charges.T)
        else:
            perm_qind = np.arange(self.block_number)
        sizes = self.sector_sizes()
        new_sizes = sizes[perm_qind]
        new_slices = np.concatenate([[0], np.cumsum(new_sizes)])
        new_charges = self.charges[perm_qind]
        perm_flat = np.concatenate(
            [np.arange(self.slices[qi], self.slices[qi + 1]) for qi in perm_qind]) \
            if self.block_number > 0 else np.zeros(0, np.intp)
        leg = LegCharge(self.chinfo, new_slices, new_charges, self.qconj)
        if bunch:
            _, leg = leg.bunch()
        return perm_flat, leg

    def bunch(self):
        """Merge adjacent sectors with equal charge. Returns ``(idx_kept, bunched_leg)``."""
        if self.block_number < 2:
            return np.arange(self.block_number + 1), self
        keep = _find_row_differences(self.charges)
        slices = self.slices[keep]
        charges = self.charges[keep[:-1]]
        return keep, LegCharge(self.chinfo, slices, charges, self.qconj)

    def project(self, mask):
        """Keep only indices where boolean ``mask`` is True.

        Returns ``(map_qind, block_masks, projected_leg)`` where ``map_qind[old_qi]`` is the
        new qindex (or -1 if the sector vanished) and ``block_masks[old_qi]`` the mask within
        the old sector.
        """
        mask = np.asarray(mask, dtype=bool)
        if len(mask) != self.ind_len:
            raise ValueError("mask length mismatch")
        block_masks = [mask[self.slices[i]:self.slices[i + 1]]
                       for i in range(self.block_number)]
        new_sizes = np.array([int(m.sum()) for m in block_masks], dtype=QTYPE)
        keep = new_sizes > 0
        map_qind = np.full(self.block_number, -1, dtype=QTYPE)
        map_qind[keep] = np.arange(int(keep.sum()))
        slices = np.concatenate([[0], np.cumsum(new_sizes[keep])])
        charges = self.charges[keep]
        leg = LegCharge(self.chinfo, slices, charges, self.qconj)
        return map_qind, block_masks, leg

    def extend(self, extra_len, charge=None):
        """Append ``extra_len`` indices in a (new) sector of given charge (default 0)."""
        if charge is None:
            charge = self.chinfo.make_valid()
        slices = np.concatenate([self.slices, [self.ind_len + extra_len]])
        charges = np.concatenate([self.charges,
                                  np.asarray(charge, QTYPE).reshape(1, -1)], axis=0)
        return LegCharge(self.chinfo, slices, charges, self.qconj)

    def charge_sectors(self):
        """Unique charges occurring on this leg (sorted)."""
        return np.unique(self.charges, axis=0)

    # ---------------------------------------------------------------- checks
    def _compute_sorted(self):
        if self.block_number < 2:
            return True
        c = self.charges
        for i in range(len(c) - 1):
            a, b = tuple(c[i][::-1]), tuple(c[i + 1][::-1])
            if a > b:
                return False
        return True

    def _compute_bunched(self):
        if self.block_number < 2:
            return True
        return bool(np.all(np.any(self.charges[1:] != self.charges[:-1], axis=1)))

    def is_sorted(self):
        return self.sorted

    def is_bunched(self):
        return self.bunched

    def test_sanity(self):
        assert np.all(self.slices[1:] >= self.slices[:-1])
        assert self.slices[0] == 0
        assert self.chinfo.check_valid(self.charges)

    def test_contractible(self, other):
        """Check that ``self`` and ``other`` can be contracted against each other."""
        if self.chinfo != other.chinfo:
            raise ValueError("different ChargeInfo")
        if self.ind_len != other.ind_len:
            raise ValueError(f"incompatible leg length {self.ind_len} vs {other.ind_len}")
        if self.qconj != -other.qconj:
            raise ValueError("same qconj on contracted legs")
        if not np.array_equal(self.slices, other.slices):
            raise ValueError("different sector boundaries")
        if not np.array_equal(self.charges, other.charges):
            raise ValueError("different charges")

    def test_equal(self, other):
        """Check that ``self`` and ``other`` describe the same charge structure."""
        if self.chinfo != other.chinfo:
            raise ValueError("different ChargeInfo")
        if self.qconj == other.qconj:
            if np.array_equal(self.slices, other.slices) and \
                    np.array_equal(self.charges, other.charges):
                return
            raise ValueError("unequal legs")
        # opposite qconj: charges must be negated
        if np.array_equal(self.slices, other.slices) and \
                np.array_equal(self.chinfo.make_valid(-self.charges), other.charges):
            return
        raise ValueError("unequal legs")

    # ---------------------------------------------------------------- dunder
    def __eq__(self, other):
        if self is other:
            return True
        if not isinstance(other, LegCharge):
            return NotImplemented
        return (self.qconj == other.qconj and self.chinfo == other.chinfo
                and self.slices.shape == other.slices.shape
                and np.array_equal(self.slices, other.slices)
                and np.array_equal(self.charges, other.charges))

    def __ne__(self, other):
        res = self.__eq__(other)
        return res if res is NotImplemented else not res

    def __hash__(self):
        return self._hash

    def __repr__(self):
        return (f"LegCharge(qconj={self.qconj:+d}, len={self.ind_len}, "
                f"sectors={self.block_number})")


class LegPipe(LegCharge):
    """A :class:`LegCharge` obtained by fusing several legs into one.

    The fused leg enumerates combinations of the constituent sectors, *sorted and bunched* by
    fused charge.  The mapping from combinations to positions in the fused leg is kept so the
    fusion can be undone exactly (``split_legs``).

    Attributes
    ----------
    legs : tuple of LegCharge
    q_map : np.ndarray (n_comb, 3 + nlegs)
        Rows ``[start, stop, fused_qindex, s_0, ..., s_{n-1}]``: the combination with
        constituent sector indices ``(s_0, ..)`` occupies ``fused_slice.start + start :
        ... + stop`` inside fused sector ``fused_qindex``. Sorted by (fused_qindex, start).
    q_map_slices : list of np.ndarray
        For each fused sector, the row-range of q_map belonging to it.

    .. note::
        Reference: ``tenpy/linalg/charges.py:1444`` (``LegPipe``); the combination→position
        map here is built once on the host and reused as static plan data.
    """

    __slots__ = ('legs', 'subshape', 'subqshape', 'q_map', 'q_map_slices', '_strides',
                 '_map_dict')

    def __init__(self, legs, qconj=1, sort=True, bunch=True):
        legs = tuple(legs)
        if len(legs) == 0:
            raise ValueError("need at least one leg")
        chinfo = legs[0].chinfo
        for l in legs[1:]:
            if l.chinfo != chinfo:
                raise ValueError("different ChargeInfo")
        if not (sort and bunch):
            raise NotImplementedError("LegPipe requires sort=bunch=True in this rebuild")
        self.legs = legs
        self.subshape = tuple(l.ind_len for l in legs)
        self.subqshape = tuple(l.block_number for l in legs)
        qconj = int(qconj)

        nlegs = len(legs)
        qnumber = chinfo.qnumber
        # enumerate all sector combinations (C-order: last leg fastest)
        grids = np.meshgrid(*[np.arange(n) for n in self.subqshape], indexing='ij')
        combs = np.stack([g.ravel() for g in grids], axis=1) if nlegs > 0 else \
            np.zeros((1, 0), QTYPE)  # (n_comb, nlegs)
        n_comb = combs.shape[0]
        sizes = np.ones(n_comb, dtype=QTYPE)
        fused_q = np.zeros((n_comb, qnumber), QTYPE)
        for k, l in enumerate(legs):
            sizes *= l.sector_sizes()[combs[:, k]]
            fused_q += l.charges[combs[:, k]] * l.qconj
        fused_q = chinfo.make_valid(fused_q * qconj)

        # sort combinations by fused charge (stable, so C-order preserved within a charge)
        order = np.lexsort(fused_q.T) if (n_comb > 1 and qnumber > 0) else np.arange(n_comb)
        fused_q_s = fused_q[order]
        sizes_s = sizes[order]
        combs_s = combs[order]
        diffs = _find_row_differences(fused_q_s) if n_comb > 0 else np.array([0])
        n_sector = len(diffs) - 1
        charges = fused_q_s[diffs[:-1]]  # already the pipe-oriented charges (see above)
        sector_sizes = np.add.reduceat(sizes_s, diffs[:-1]) if n_sector else \
            np.zeros(0, QTYPE)
        slices = np.concatenate([[0], np.cumsum(sector_sizes)]).astype(QTYPE)

        # build q_map: within-sector offsets
        q_map = np.empty((n_comb, 3 + nlegs), QTYPE)
        within = np.zeros(n_comb, QTYPE)
        for s in range(n_sector):
            lo, hi = diffs[s], diffs[s + 1]
            csum = np.concatenate([[0], np.cumsum(sizes_s[lo:hi])])
            within[lo:hi] = csum[:-1]
            q_map[lo:hi, 2] = s
        q_map[:, 0] = within
        q_map[:, 1] = within + sizes_s
        q_map[:, 3:] = combs_s
        self.q_map = _as_immutable(q_map)
        self.q_map_slices = diffs
        self._strides = _c_strides(self.subqshape)
        # dict: sector-combination tuple -> q_map row
        self._map_dict = {tuple(int(x) for x in q_map[r, 3:]): r
                          for r in range(n_comb)}
        LegCharge.__init__(self, chinfo, slices, charges, qconj)

    def to_LegCharge(self):
        return LegCharge(self.chinfo, self.slices, self.charges, self.qconj)

    # ---------------------------------------------------------------- hdf5
    def save_hdf5(self, hdf5_saver, h5gr, subpath):
        """LegCharge layout + constituent ``legs`` (reference ``charges.py:1598``)."""
        LegCharge.save_hdf5(self, hdf5_saver, h5gr, subpath)
        hdf5_saver.save(list(self.legs), subpath + 'legs')

    @classmethod
    def from_hdf5(cls, hdf5_loader, h5gr, subpath):
        qconj = int(hdf5_loader.get_attr(h5gr, 'qconj'))
        legs = hdf5_loader.load(subpath + 'legs')
        obj = cls(legs, qconj)
        hdf5_loader.memorize_load(h5gr, obj)
        return obj

    def conj(self):
        """Flip qconj of the pipe *and* of all constituent legs."""
        res = LegPipe([l.conj() for l in self.legs], qconj=-self.qconj)
        return res

    def outer_conj(self):
        """Flip only the pipe's qconj (keep constituent legs)."""
        return LegPipe(self.legs, qconj=-self.qconj)

    @property
    def nlegs(self):
        return len(self.legs)

    def map_comb(self, comb):
        """Return ``(offset_start, offset_stop, fused_qindex)`` for sector combination."""
        r = self._map_dict[tuple(int(c) for c in comb)]
        row = self.q_map[r]
        return int(row[0]), int(row[1]), int(row[2])

    def map_incoming_flat(self, incoming):
        """Flat fused-leg index for flat indices ``incoming`` on the constituent legs."""
        qis = []
        within = 0
        for l, i in zip(self.legs, incoming):
            qi, rem = l.get_qindex(i)
            qis.append((qi, rem))
        # position within the combination block (C-order over within-sector indices)
        sizes = [int(l.sector_sizes()[qi]) for l, (qi, _) in zip(self.legs, qis)]
        pos = 0
        for (qi, rem), sz in zip(qis, sizes):
            pos = pos * sz + rem
        start, stop, fqi = self.map_comb([qi for qi, _ in qis])
        return int(self.slices[fqi]) + start + pos

    def __repr__(self):
        return (f"LegPipe(nlegs={self.nlegs}, qconj={self.qconj:+d}, len={self.ind_len}, "
                f"sectors={self.block_number})")


def _find_row_differences(arr):
    """Indices ``i`` where row ``arr[i]`` differs from ``arr[i-1]``, framed by 0 and len."""
    if len(arr) == 0:
        return np.array([0], QTYPE)
    if arr.ndim == 1:
        arr = arr[:, None]
    diff = np.any(arr[1:] != arr[:-1], axis=1)
    return np.concatenate([[0], np.nonzero(diff)[0] + 1, [len(arr)]]).astype(QTYPE)


def _c_strides(shape):
    """C-order strides (in elements) for a given shape."""
    strides = np.ones(len(shape), QTYPE)
    for i in range(len(shape) - 2, -1, -1):
        strides[i] = strides[i + 1] * shape[i + 1]
    return strides
