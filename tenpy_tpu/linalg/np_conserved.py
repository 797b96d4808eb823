r"""Charge-conserving block-sparse tensors on TPU: :class:`Array` and free functions.

TPU-first design (vs reference ``tenpy/linalg/np_conserved.py:154``)
--------------------------------------------------------------------
The reference stores ragged numpy blocks and matches charge sectors *per call*, dispatching to
a Cython batched-BLAS worker (``tenpy/linalg/_npc_helper.pyx:1498``).  Here the same data model
is split into

* **static structure** — ``legs`` (hashable :class:`~tenpy_tpu.linalg.charges.LegCharge`),
  ``qtotal``, labels, and the block index ``_qdata`` — living in the pytree *aux data*, and
* **dynamic payload** — a list of dense ``jax.numpy`` blocks, the pytree *leaves*.

Every structural decision (which sectors match, output block layout, GEMM shapes) is made on
the host from static data only and cached as a *plan* (`_tensordot_plan`), so under ``jax.jit``
the whole contraction lowers to a handful of shape-bucketed batched matmuls on the MXU —
the TPU analogue of ``CblasGemmBatch`` (``_npc_helper.pyx:151``).

The public API mirrors the reference module (``tenpy/linalg/np_conserved.py:106-141``) so that
users of the reference can switch: ``Array``, ``tensordot``, ``svd``, ``qr``, ``eigh``,
``expm``, ``norm``, ``inner``, ``outer``, ``trace``, ``concatenate``, ``grid_concat``,
``grid_outer``, ``diag``, ``zeros``, ``detect_qtotal``, ``detect_legcharge``, ...
"""

from __future__ import annotations

import os

import functools
import itertools
import warnings
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from .charges import QTYPE, ChargeInfo, LegCharge, LegPipe


def _use_jnp(*xs):
    """True if any operand is a JAX value (device array or tracer).

    Block payloads are numpy on the host path (fast eager math, no XLA compiles) and
    jax arrays/tracers inside jitted graphs; every blockwise op dispatches on this.
    """
    for x in xs:
        if isinstance(x, (jax.Array, jax.core.Tracer)):
            return True
    return False


def _xp(*xs):
    return jnp if _use_jnp(*xs) else np


def _set_slice(arr, sl, val):
    if _use_jnp(arr, val):
        return arr.at[sl].set(val)
    arr[sl] = val
    return arr


def _add_slice(arr, sl, val):
    if _use_jnp(arr, val):
        return arr.at[sl].add(val)
    arr[sl] += val
    return arr

__all__ = [
    'Array', 'zeros', 'ones', 'eye_like', 'diag',
    'concatenate', 'grid_concat', 'grid_outer',
    'detect_grid_outer_legcharge', 'detect_qtotal', 'detect_legcharge',
    'trace', 'outer', 'inner', 'tensordot', 'svd', 'pinv', 'norm',
    'eigh', 'eig', 'eigvals', 'eigvalsh', 'expm', 'qr', 'lq', 'polar',
    'orthogonal_columns', 'to_iterable_arrays',
]


def _lexsort_rows(qdata):
    """Permutation sorting integer rows lexicographically (first column primary)."""
    if qdata.shape[0] < 2:
        return np.arange(qdata.shape[0])
    return np.lexsort(qdata.T[::-1])


def _block_shape(legs, row):
    return tuple(int(l.slices[s + 1] - l.slices[s]) for l, s in zip(legs, row))


class Array:
    """A charge-conserving block-sparse tensor.

    Parameters
    ----------
    legs : list of LegCharge
    dtype : jnp dtype
    qtotal : charges or None
    labels : list of {str | None}, optional

    Attributes
    ----------
    legs, qtotal, dtype
    _qdata : np.ndarray (n_blocks, rank), rows lexsorted
    _data : list of jnp.ndarray

    .. note::
        Reference: ``tenpy/linalg/np_conserved.py:154-205`` (class ``Array`` and its
        ``_data``/``_qdata`` layout).  Registered as a JAX pytree; see module docstring.
    """

    # numpy scalars must defer to our __rmul__/__radd__ instead of broadcasting
    # through __array__ (which would silently densify the block-sparse tensor).
    __array_ufunc__ = None
    __array_priority__ = 10000

    def __init__(self, legs, dtype=jnp.float64, qtotal=None, labels=None):
        legs = tuple(legs)
        if len(legs) == 0:
            raise ValueError("Array needs at least one leg; use scalars directly")
        chinfo = legs[0].chinfo
        for l in legs[1:]:
            if l.chinfo != chinfo:
                raise ValueError("legs with different ChargeInfo")
        self.legs = legs
        self.dtype = jnp.dtype(dtype)
        self.qtotal = tuple(int(q) for q in chinfo.make_valid(qtotal))
        if labels is None:
            labels = (None,) * len(legs)
        self._labels = tuple(labels)
        self._qdata = np.zeros((0, len(legs)), QTYPE)
        self._data = []

    # ------------------------------------------------------------------ basic props
    @property
    def chinfo(self):
        return self.legs[0].chinfo

    @property
    def rank(self):
        return len(self.legs)

    ndim = rank

    @property
    def shape(self):
        return tuple(l.ind_len for l in self.legs)

    @property
    def size(self):
        return int(np.prod(self.shape))

    @property
    def stored_blocks(self):
        return len(self._data)

    def __repr__(self):
        return (f"<Array shape={self.shape} labels={list(self._labels)} "
                f"blocks={self.stored_blocks} dtype={self.dtype}>")

    # ------------------------------------------------------------------ labels
    def get_leg_index(self, label):
        """Leg index from label or integer."""
        if isinstance(label, (int, np.integer)):
            k = int(label)
            if k < 0:
                k += self.rank
            if not 0 <= k < self.rank:
                raise IndexError(label)
            return k
        try:
            return self._labels.index(label)
        except ValueError:
            raise KeyError(f"label {label!r} not in {self._labels}") from None

    def get_leg_indices(self, labels):
        return [self.get_leg_index(l) for l in labels]

    def get_leg(self, label):
        return self.legs[self.get_leg_index(label)]

    def get_leg_labels(self):
        return self._labels

    def iset_leg_labels(self, labels):
        labels = tuple(labels)
        if len(labels) != self.rank:
            raise ValueError("wrong number of labels")
        self._labels = labels
        return self

    def set_leg_labels(self, labels):
        return self.copy(deep=False).iset_leg_labels(labels)

    def ireplace_label(self, old, new):
        i = self.get_leg_index(old)
        lab = list(self._labels)
        lab[i] = new
        self._labels = tuple(lab)
        return self

    def replace_label(self, old, new):
        return self.copy(deep=False).ireplace_label(old, new)

    def ireplace_labels(self, olds, news):
        idx = [self.get_leg_index(o) for o in olds]
        lab = list(self._labels)
        for i, n in zip(idx, news):
            lab[i] = n
        self._labels = tuple(lab)
        return self

    def replace_labels(self, olds, news):
        return self.copy(deep=False).ireplace_labels(olds, news)

    def idrop_labels(self, old=None):
        if old is None:
            self._labels = (None,) * self.rank
        else:
            lab = list(self._labels)
            for o in old:
                lab[self.get_leg_index(o)] = None
            self._labels = tuple(lab)
        return self

    # ------------------------------------------------------------------ construction
    @classmethod
    def from_ndarray_trivial(cls, data_flat, dtype=None, labels=None):
        """Dense array -> Array with trivial (chargeless) legs."""
        if not _use_jnp(data_flat):
            data_flat = np.asarray(data_flat)
        if dtype is not None:
            data_flat = data_flat.astype(dtype)
        chinfo = ChargeInfo.trivial()
        legs = [LegCharge.from_trivial(d, chinfo) for d in data_flat.shape]
        res = cls(legs, data_flat.dtype, None, labels)
        res._qdata = np.zeros((1, len(legs)), QTYPE)
        res._data = [data_flat]
        return res

    @classmethod
    def from_ndarray(cls, data_flat, legcharges, dtype=None, qtotal=None, cutoff=None,
                     labels=None, raise_wrong_sector=False, warn_wrong_sector=True):
        """Dense array -> block-sparse Array, given the charge structure of each leg.

        Entries outside charge-allowed blocks are dropped; if their norm exceeds ``cutoff``
        (default exact 0 tolerance 1e-12 of max) a warning/error is emitted.

        Reference: ``tenpy/linalg/np_conserved.py`` ``Array.from_ndarray``.
        """
        if not _use_jnp(data_flat):
            data_flat = np.asarray(data_flat)
        if dtype is not None:
            data_flat = data_flat.astype(dtype)
        legs = tuple(legcharges)
        if data_flat.shape != tuple(l.ind_len for l in legs):
            raise ValueError(f"shape mismatch {data_flat.shape} vs legs")
        chinfo = legs[0].chinfo
        if qtotal is None:
            qtotal = detect_qtotal(data_flat, legs)
        res = cls(legs, data_flat.dtype, qtotal, labels)
        qdata = []
        blocks = []
        kept = None
        for row in itertools.product(*[range(l.block_number) for l in legs]):
            q = _row_qtotal(legs, row)
            block = data_flat[tuple(l.get_slice(s) for l, s in zip(legs, row))]
            if tuple(q) == res.qtotal:
                qdata.append(row)
                blocks.append(block)
                if kept is None:
                    kept = float((abs(block) ** 2).sum())
                else:
                    kept += float((abs(block) ** 2).sum())
        total = float((abs(data_flat) ** 2).sum())
        dropped = total - (kept or 0.0)
        tol = (cutoff if cutoff is not None else 1e-12) ** 2 * max(total, 1e-300)
        if dropped > tol and total > 0:
            msg = (f"from_ndarray: dropped weight {dropped:.3e} outside charge-allowed "
                   f"blocks (qtotal={res.qtotal})")
            if raise_wrong_sector:
                raise ValueError(msg)
            elif warn_wrong_sector:
                warnings.warn(msg, stacklevel=2)
        res._set_blocks(np.array(qdata, QTYPE).reshape(len(qdata), len(legs)), blocks)
        return res

    @classmethod
    def from_func(cls, func, legcharges, dtype=None, qtotal=None, func_args=(),
                  labels=None, shape_kw=None):
        """Fill all charge-allowed blocks with ``func(size)`` (e.g. np.ones / rng)."""
        legs = tuple(legcharges)
        res = cls(legs, dtype if dtype is not None else jnp.float64, qtotal, labels)
        qdata = []
        blocks = []
        for row in itertools.product(*[range(l.block_number) for l in legs]):
            if tuple(_row_qtotal(legs, row)) != res.qtotal:
                continue
            shape = _block_shape(legs, row)
            if shape_kw is not None:
                block = func(*func_args, **{shape_kw: shape})
            else:
                block = func(shape, *func_args)
            if not _use_jnp(block):
                block = np.asarray(block)
            if dtype is not None:
                block = block.astype(dtype)
            qdata.append(row)
            blocks.append(block)
        if blocks:
            res.dtype = jnp.result_type(*[b.dtype for b in blocks])
        res._set_blocks(np.array(qdata, QTYPE).reshape(len(qdata), len(legs)), blocks)
        return res

    def zeros_like(self):
        res = Array(self.legs, self.dtype, self.qtotal, self._labels)
        return res

    def copy(self, deep=True):
        res = Array.__new__(Array)
        res.legs = self.legs
        res.dtype = self.dtype
        res.qtotal = self.qtotal
        res._labels = self._labels
        res._qdata = self._qdata
        res._data = list(self._data)
        return res

    def astype(self, dtype):
        res = self.copy(deep=False)
        res.dtype = jnp.dtype(dtype)
        res._data = [b.astype(dtype) for b in self._data]
        return res

    def real_if_close(self, tol=1e-12):
        """Real-dtype copy if every imaginary part is negligible, else self.

        Host-side on purpose: complex ops must never be dispatched to a TPU
        backend (no complex128 support there — they crash or hang)."""
        if not jnp.issubdtype(self.dtype, jnp.complexfloating):
            return self
        host = [np.asarray(b) for b in self._data]
        mx = max((float(np.max(np.abs(np.imag(b)))) for b in host), default=0.)
        scale = max((float(np.max(np.abs(b))) for b in host), default=1.)
        if mx > tol * max(scale, 1e-300):
            return self
        res = self.copy(deep=False)
        res.dtype = jnp.dtype(np.zeros(0, np.dtype(str(self.dtype))).real.dtype)
        res._data = [np.ascontiguousarray(np.real(b)) for b in host]
        return res

    def _set_blocks(self, qdata, data):
        """Set blocks, establishing canonical (row-lexsorted) order."""
        qdata = np.asarray(qdata, QTYPE).reshape(-1, self.rank)
        perm = _lexsort_rows(qdata)
        self._qdata = qdata[perm]
        self._qdata.setflags(write=False)
        self._data = [data[p] for p in perm]
        return self

    # ------------------------------------------------------------------ dense conversion
    def to_ndarray(self):
        """Convert to a dense array (zeros outside stored blocks)."""
        xp = _xp(*self._data)
        out = xp.zeros(self.shape, self.dtype)
        for row, block in zip(self._qdata, self._data):
            sl = tuple(l.get_slice(s) for l, s in zip(self.legs, row))
            out = _set_slice(out, sl, block.astype(self.dtype))
        return out

    def to_numpy(self):
        return np.asarray(self.to_ndarray())

    # ------------------------------------------------------------------ block access
    def get_block(self, qindices, insert_zeros=False):
        """Return the block for given sector indices (or None / zeros if not stored)."""
        row = np.asarray(qindices, QTYPE)
        idx = self._find_block(row)
        if idx is not None:
            return self._data[idx]
        if insert_zeros:
            return _xp(*self._data).zeros(_block_shape(self.legs, row), self.dtype)
        return None

    def _find_block(self, row):
        q = self._qdata
        lo, hi = 0, len(q)
        # binary search in lexsorted rows
        target = tuple(int(x) for x in row)
        while lo < hi:
            mid = (lo + hi) // 2
            r = tuple(int(x) for x in q[mid])
            if r < target:
                lo = mid + 1
            elif r > target:
                hi = mid
            else:
                return mid
        return None

    def set_block(self, qindices, block):
        """Insert/overwrite one block (must satisfy the charge rule)."""
        row = np.asarray(qindices, QTYPE)
        if tuple(_row_qtotal(self.legs, row)) != self.qtotal:
            raise ValueError("block violates charge rule")
        if not _use_jnp(block):
            block = np.asarray(block)
        block = block.astype(self.dtype)
        if block.shape != _block_shape(self.legs, row):
            raise ValueError(f"block shape {block.shape} != {_block_shape(self.legs, row)}")
        idx = self._find_block(row)
        if idx is not None:
            self._data[idx] = block
        else:
            qdata = np.concatenate([self._qdata, row[None, :]], axis=0)
            self._set_blocks(qdata, self._data + [block])
        return self

    def __getitem__(self, inds):
        """Indexing ``a[i, j, ...]``: ints fix legs, slices/masks project legs.

        - all ints: the single element (scalar);
        - mix of ints and slices / boolean masks / ``...``: ints are handled
          by :meth:`take_slice`, non-trivial slices by :meth:`iproject`.
        Reference: ``tenpy/linalg/np_conserved.py:920``.
        """
        inds = self._expand_ellipsis(inds)
        if all(isinstance(i, (int, np.integer)) for i in inds):
            row = []
            within = []
            for l, i in zip(self.legs, inds):
                qi, r = l.get_qindex(int(i))
                row.append(qi)
                within.append(r)
            blk = self.get_block(row)
            if blk is None:
                return np.zeros((), self.dtype)[()]
            return blk[tuple(within)]
        # partial indexing: project slices/masks first, then fix the ints
        res = self
        fix_axes, fix_inds = [], []
        proj_axes, proj_masks = [], []
        for a, (l, i) in enumerate(zip(self.legs, inds)):
            if isinstance(i, (int, np.integer)):
                fix_axes.append(a)
                fix_inds.append(int(i))
            elif isinstance(i, slice):
                if i != slice(None):
                    mask = np.zeros(l.ind_len, bool)
                    mask[i] = True
                    proj_axes.append(a)
                    proj_masks.append(mask)
            elif isinstance(i, np.ndarray) and i.dtype == bool:
                proj_axes.append(a)
                proj_masks.append(i)
            else:
                raise IndexError(f"unsupported index {i!r}")
        if proj_axes:
            res = res.copy(deep=False)
            res.iproject(proj_masks, proj_axes)
        if fix_axes:
            res = res.take_slice(fix_inds, fix_axes)
        return res

    def _expand_ellipsis(self, inds):
        if not isinstance(inds, tuple):
            inds = (inds,)
        if any(i is Ellipsis for i in inds):
            k = next(k for k, i in enumerate(inds) if i is Ellipsis)
            fill = self.rank - (len(inds) - 1)
            inds = inds[:k] + (slice(None),) * fill + inds[k + 1:]
        if len(inds) < self.rank:
            inds = inds + (slice(None),) * (self.rank - len(inds))
        if len(inds) != self.rank:
            raise IndexError(f"too many indices for rank-{self.rank} Array")
        return inds

    def __setitem__(self, inds, value):
        """Set a single element ``a[i, j, ...] = v`` (or assign a projected
        sub-Array with ``a[mask/slice, ...] = sub``).

        Setting an element whose block violates the charge rule raises unless
        the value is (numerically) zero.  Reference: ``np_conserved.py:971``.
        """
        inds = self._expand_ellipsis(inds)
        if not all(isinstance(i, (int, np.integer)) for i in inds):
            raise NotImplementedError(
                "only full integer indexing is supported for __setitem__")
        row = []
        within = []
        for l, i in zip(self.legs, inds):
            qi, r = l.get_qindex(int(i))
            row.append(qi)
            within.append(r)
        row = np.asarray(row, QTYPE)
        idx = self._find_block(row)
        if idx is None:
            if tuple(_row_qtotal(self.legs, row)) != self.qtotal:
                if value == 0:
                    return
                raise ValueError("can't set nonzero element: "
                                 "block violates the charge rule")
            blk = np.zeros(_block_shape(self.legs, row), self.dtype)
            blk[tuple(within)] = value
            self.set_block(row, blk)
            return
        blk = self._data[idx]
        if _use_jnp(blk):
            self._data[idx] = blk.at[tuple(within)].set(value)
        else:
            blk = np.array(blk)
            blk[tuple(within)] = value
            self._data[idx] = blk

    def take_slice(self, indices, axes):
        """Fix ``indices`` along ``axes``: rank-(r-k) copy, ``A[:, i, j, :]``-like.

        ``qtotal`` loses the charge of every fixed index.
        Reference: ``tenpy/linalg/np_conserved.py:1037``.
        """
        from .charges import ChargeInfo  # noqa: F401  (doc pointer)
        if not isinstance(axes, (list, tuple)):
            axes = [axes]
        if not isinstance(indices, (list, tuple, np.ndarray)):
            indices = [indices]
        axes = [self.get_leg_index(a) if isinstance(a, str) else int(a)
                for a in axes]
        indices = [int(i) for i in indices]
        if len(axes) != len(indices):
            raise ValueError("len(axes) != len(indices)")
        if len(axes) == 0:
            return self.copy(deep=True)
        if self.rank == len(axes):
            raise ValueError("cannot fix every leg; use a[i, j, ...] instead")
        pos = {a: self.legs[a].get_qindex(i) for a, i in zip(axes, indices)}
        keep_axes = [a for a in range(self.rank) if a not in pos]
        chinfo = self.chinfo
        qtotal = np.asarray(self.qtotal, QTYPE).copy()
        for a, (qi, _) in pos.items():
            qtotal -= np.asarray(self.legs[a].get_charge(qi), QTYPE)
        res = Array([self.legs[a] for a in keep_axes], self.dtype,
                    chinfo.make_valid(qtotal),
                    [self._labels[a] for a in keep_axes])
        sel = np.ones(len(self._qdata), bool)
        for a, (qi, _) in pos.items():
            sel &= self._qdata[:, a] == qi
        sl = tuple(pos[a][1] if a in pos else slice(None)
                   for a in range(self.rank))
        qdata = self._qdata[np.ix_(sel, np.asarray(keep_axes, np.intp))]
        data = [blk[sl] for blk, k in zip(self._data, sel) if k]
        res._set_blocks(qdata, data)
        return res

    # ------------------------------------------------------------------ sanity
    # ------------------------------------------------------------------ hdf5
    def save_hdf5(self, hdf5_saver, h5gr, subpath):
        """Reference layout (``np_conserved.py`` Array.save_hdf5): subgroups
        ``chinfo``/``legs``/``dtype``/``total_charge``/``labels``/``blocks``/
        ``block_inds``, attrs ``block_inds_sorted``/``rank``/``shape``."""
        hdf5_saver.save(self.chinfo, subpath + 'chinfo')
        hdf5_saver.save(list(self.legs), subpath + 'legs')
        hdf5_saver.save(np.dtype(str(self.dtype)), subpath + 'dtype')
        hdf5_saver.save(np.array(self.qtotal, QTYPE), subpath + 'total_charge')
        hdf5_saver.save(list(self._labels), subpath + 'labels')
        hdf5_saver.save([np.asarray(b) for b in self._data], subpath + 'blocks')
        hdf5_saver.save(np.asarray(self._qdata), subpath + 'block_inds')
        h5gr.attrs['block_inds_sorted'] = True
        h5gr.attrs['rank'] = self.rank
        h5gr.attrs['shape'] = np.array(self.shape, np.intp)

    @classmethod
    def from_hdf5(cls, hdf5_loader, h5gr, subpath):
        obj = cls.__new__(cls)
        hdf5_loader.memorize_load(h5gr, obj)
        legs = hdf5_loader.load(subpath + 'legs')
        dtype = hdf5_loader.load(subpath + 'dtype')
        qtotal = hdf5_loader.load(subpath + 'total_charge')
        labels = hdf5_loader.load(subpath + 'labels')
        blocks = hdf5_loader.load(subpath + 'blocks')
        qdata = np.asarray(hdf5_loader.load(subpath + 'block_inds'), QTYPE)
        obj.legs = tuple(legs)
        obj.dtype = jnp.dtype(np.dtype(dtype))
        chinfo = obj.legs[0].chinfo
        obj.qtotal = tuple(int(q) for q in chinfo.make_valid(qtotal))
        obj._labels = tuple(labels)
        obj._qdata = np.zeros((0, len(obj.legs)), QTYPE)
        obj._data = []
        obj._set_blocks(qdata.reshape(len(blocks), len(obj.legs)),
                        [np.asarray(b) for b in blocks])
        return obj

    def test_sanity(self):
        assert len(self._data) == len(self._qdata)
        for l in self.legs:
            l.test_sanity()
        for row, block in zip(self._qdata, self._data):
            assert tuple(_row_qtotal(self.legs, row)) == self.qtotal, "charge rule violated"
            assert tuple(block.shape) == _block_shape(self.legs, row), "block shape mismatch"
        # canonical order & no duplicates
        if len(self._qdata) > 1:
            rows = [tuple(r) for r in self._qdata]
            assert rows == sorted(rows), "qdata not sorted"
            assert len(set(rows)) == len(rows), "duplicate blocks"

    def sparse_stats(self):
        """Human-readable fill statistics (reference ``np_conserved.py:847``)."""
        nb = self.stored_blocks
        stored = sum(int(np.prod(b.shape)) for b in self._data)
        total = self.size
        return (f"{nb} blocks, {stored}/{total} entries "
                f"({100.0 * stored / max(total, 1):.1f}% filled)")

    # ------------------------------------------------------------------ transpose etc.
    def itranspose(self, perm=None):
        if perm is None:
            perm = tuple(range(self.rank))[::-1]
        perm = tuple(self.get_leg_index(p) for p in perm)
        if sorted(perm) != list(range(self.rank)):
            raise ValueError("invalid permutation")
        if perm == tuple(range(self.rank)):
            return self
        self.legs = tuple(self.legs[p] for p in perm)
        self._labels = tuple(self._labels[p] for p in perm)
        qdata = self._qdata[:, perm]
        data = [b.transpose(perm) for b in self._data]
        self._set_blocks(qdata, data)
        return self

    def permute(self, perm, axis):
        """General index permutation on one leg: ``res[i, ...] = self[perm[i], ...]``.

        Mixes charge blocks, so it reassembles every affected block row by
        row — slow, for small legs (basis reorderings).  For permutations
        that only reorder whole charge sectors use :meth:`sort_legcharge`.
        Reference: ``np_conserved.py:1987``.
        """
        ax = self.get_leg_index(axis)
        perm = np.asarray(perm, np.intp)
        oldleg = self.legs[ax]
        if len(perm) != oldleg.ind_len or \
                not np.array_equal(np.sort(perm), np.arange(oldleg.ind_len)):
            raise ValueError("not a permutation of the leg's indices")
        qflat_new = np.asarray(oldleg.to_qflat(), QTYPE)[perm]
        from .charges import LegCharge as _Leg
        newleg = _Leg.from_qflat(self.chinfo, qflat_new, oldleg.qconj)
        _, newleg = newleg.bunch()
        old_slices = np.asarray(oldleg.slices, np.intp)
        src_qi = np.searchsorted(old_slices, perm, side='right') - 1
        src_off = perm - old_slices[src_qi]
        by_old_qi = {}          # old qindex on ax -> list of data indices
        for d, row in enumerate(self._qdata):
            by_old_qi.setdefault(int(row[ax]), []).append(d)
        np_dtype = np.dtype(str(self.dtype))
        new_blocks = {}         # new qdata row -> ndarray with ax moved front
        new_slices = np.asarray(newleg.slices, np.intp)
        host = [np.asarray(b) for b in self._data]
        for ni in range(newleg.block_number):
            beg, end = int(new_slices[ni]), int(new_slices[ni + 1])
            qis, offs = src_qi[beg:end], src_off[beg:end]
            for qi in np.unique(qis):
                rows = np.nonzero(qis == qi)[0]
                for d in by_old_qi.get(int(qi), ()):
                    row = list(int(x) for x in self._qdata[d])
                    row[ax] = ni
                    key = tuple(row)
                    blk = new_blocks.get(key)
                    src = np.moveaxis(host[d], ax, 0)
                    if blk is None:
                        blk = np.zeros((end - beg,) + src.shape[1:], np_dtype)
                        new_blocks[key] = blk
                    blk[rows] = src[offs[rows]]
        res = self.copy(deep=False)
        res.legs = self.legs[:ax] + (newleg,) + self.legs[ax + 1:]
        qdata = np.array(sorted(new_blocks), QTYPE).reshape(-1, self.rank)
        res._set_blocks(qdata, [np.moveaxis(new_blocks[tuple(int(x) for x in r)],
                                            0, ax) for r in qdata])
        return res

    def sort_legcharge(self, sort=True, bunch=True):
        """Sort/bunch the charge sectors of every leg; returns ``(perms, res)``.

        ``perms[a]`` is the flat permutation applied to leg ``a`` such that
        ``res[i0, i1, ...] = self[perms[0][i0], perms[1][i1], ...]``.
        ``sort`` may be one bool, or one entry per leg where each entry is a
        bool or an explicit flat permutation to apply to that leg; ``bunch``
        is one bool or one bool per leg.  Legs with ``sort=False`` but
        ``bunch=True`` are still bunched (contiguous equal-charge sectors
        merged), matching the reference semantics.  Divergence: a leg given
        an *explicit* permutation is always bunched afterwards (``permute``
        rebuilds the leg bunched), even with ``bunch=False`` — the reference
        (``np_conserved.py:1372``) would keep it unbunched.  Built on
        :meth:`permute` (one pass per affected leg).
        """
        sort = [sort] * self.rank if isinstance(sort, (bool, np.bool_)) \
            else list(sort)
        bunch = [bunch] * self.rank if isinstance(bunch, (bool, np.bool_)) \
            else list(bunch)
        if len(sort) != self.rank or len(bunch) != self.rank:
            raise ValueError("wrong len for sort or bunch")
        bunch = [bool(b) for b in bunch]
        res = self.copy(deep=False)
        perms = []
        for ax in range(self.rank):
            leg = res.legs[ax]
            s = sort[ax]
            if isinstance(s, np.bool_):
                s = bool(s)
            if not isinstance(s, bool):
                # explicit permutation for this leg (reference parity);
                # permute() bunches the resulting leg as a side effect
                perm_flat = np.asarray(s, np.intp)
                perms.append(perm_flat)
                res = res.permute(perm_flat, ax)
                continue
            if s and leg.block_number > 1:
                perm_flat, _ = leg.sort(bunch=bunch[ax])
            else:
                perm_flat = np.arange(leg.ind_len)
            perms.append(perm_flat)
            needs_bunch = (bunch[ax] and leg.block_number > 1
                           and leg.bunch()[1].block_number != leg.block_number)
            if not np.array_equal(perm_flat, np.arange(leg.ind_len)) \
                    or needs_bunch:
                res = res.permute(perm_flat, ax)
        return perms, res

    def transpose(self, perm=None):
        return self.copy(deep=False).itranspose(perm)

    def iconj(self, complex_conj=True):
        """Conjugate: flip all leg qconj & charges, negate qtotal, conj blocks, and
        toggle ``*`` on labels (``'a'`` <-> ``'a*'``)."""
        self.legs = tuple(l.conj() for l in self.legs)
        self.qtotal = tuple(int(q) for q in self.chinfo.make_valid(
            -np.array(self.qtotal, QTYPE)))
        if complex_conj and jnp.issubdtype(self.dtype, jnp.complexfloating):
            self._data = [b.conj() for b in self._data]
        self._labels = tuple(_conj_label(l) for l in self._labels)
        return self

    def conj(self, complex_conj=True):
        return self.copy(deep=False).iconj(complex_conj)

    def complex_conj(self):
        res = self.copy(deep=False)
        if jnp.issubdtype(self.dtype, jnp.complexfloating):
            res._data = [b.conj() for b in res._data]
        return res

    @property
    def real(self):
        res = self.copy(deep=False)
        res._data = [jnp.real(b) for b in res._data]
        res.dtype = jnp.zeros((), self.dtype).real.dtype
        return res

    @property
    def imag(self):
        res = self.copy(deep=False)
        res._data = [jnp.imag(b) for b in res._data]
        res.dtype = jnp.zeros((), self.dtype).real.dtype
        return res

    # ------------------------------------------------------------------ charge gauge
    def gauge_total_charge(self, axis, newqtotal=None, new_qconj=None):
        """Shift qtotal into the charges of one leg (reference ``np_conserved.py:1198``)."""
        axis = self.get_leg_index(axis)
        leg = self.legs[axis]
        chinfo = self.chinfo
        if newqtotal is None:
            newqtotal = chinfo.make_valid()
        newqtotal = chinfo.make_valid(newqtotal)
        if new_qconj is None:
            new_qconj = leg.qconj
        dq = chinfo.make_valid(np.array(newqtotal, QTYPE) - np.array(self.qtotal, QTYPE))
        # new charges such that new_qconj * q_new = old qconj*q_old + dq on this leg
        q_new = chinfo.make_valid((leg.charges * leg.qconj + dq) * new_qconj)
        res = self.copy(deep=False)
        legs = list(res.legs)
        legs[axis] = LegCharge(chinfo, leg.slices, q_new, new_qconj)
        res.legs = tuple(legs)
        res.qtotal = tuple(int(q) for q in newqtotal)
        return res

    # ------------------------------------------------------------------ elementwise / arithmetic
    def _binary(self, other, op):
        if isinstance(other, Array):
            _check_same_structure(self, other)
            # merge block lists (union of stored blocks)
            rows = {tuple(r): i for i, r in enumerate(self._qdata)}
            rows_o = {tuple(r): i for i, r in enumerate(other._qdata)}
            all_rows = sorted(set(rows) | set(rows_o))
            data = []
            dtype = jnp.result_type(self.dtype, other.dtype)
            for r in all_rows:
                a = self._data[rows[r]] if r in rows else None
                b = other._data[rows_o[r]] if r in rows_o else None
                if a is None:
                    a = _xp(b).zeros(b.shape, dtype)
                if b is None:
                    b = _xp(a).zeros(a.shape, dtype)
                data.append(op(a.astype(dtype), b.astype(dtype)))
            res = Array(self.legs, dtype, self.qtotal, self._labels)
            res._set_blocks(np.array(all_rows, QTYPE).reshape(len(all_rows), self.rank),
                            data)
            return res
        elif np.isscalar(other) or isinstance(other, (jnp.ndarray, np.ndarray)) and \
                np.ndim(other) == 0:
            res = self.copy(deep=False)
            res._data = [op(b, other) for b in self._data]
            if res._data:
                res.dtype = res._data[0].dtype
            else:
                res.dtype = jnp.result_type(self.dtype, other)
            return res
        return NotImplemented

    def __add__(self, other):
        return self._binary(other, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, other):
        return self._binary(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._binary(other, lambda a, b: b - a)

    def __mul__(self, other):
        if isinstance(other, Array):
            raise TypeError("use tensordot / elementwise helpers for Array*Array")
        res = self.copy(deep=False)
        res._data = [b * other for b in self._data]
        res.dtype = jnp.result_type(self.dtype, other)
        return res

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self * (1.0 / other)

    def __neg__(self):
        return self * (-1)

    def iscale_prefactor(self, c):
        self._data = [b * c for b in self._data]
        self.dtype = jnp.result_type(self.dtype, c)
        return self

    def iadd_prefactor_other(self, alpha, other):
        """self += alpha * other (in-place-style; reference ``np_conserved.py`` axpy)."""
        res = self._binary(other * alpha, lambda a, b: a + b)
        self.legs, self.qtotal = res.legs, res.qtotal
        self._qdata, self._data, self.dtype = res._qdata, res._data, res.dtype
        return self

    def unary_blockwise(self, func):
        res = self.copy(deep=False)
        res._data = [func(b) for b in res._data]
        if res._data:
            res.dtype = res._data[0].dtype
        return res

    def iunary_blockwise(self, func):
        self._data = [func(b) for b in self._data]
        if self._data:
            self.dtype = self._data[0].dtype
        return self

    def binary_blockwise(self, func, other):
        return self._binary(other, func)

    # ------------------------------------------------------------------ scale / project
    def iscale_axis(self, s, axis=-1):
        """Scale leg ``axis`` by the (dense, full-leg-length) vector ``s``."""
        axis = self.get_leg_index(axis)
        if not _use_jnp(s, *self._data):
            s = np.asarray(s)
        leg = self.legs[axis]
        if s.shape != (leg.ind_len,):
            raise ValueError("scale vector length mismatch")
        shape = [1] * self.rank
        data = []
        for row, block in zip(self._qdata, self._data):
            qi = row[axis]
            seg = s[leg.get_slice(qi)]
            shp = list(shape)
            shp[axis] = block.shape[axis]
            data.append(block * seg.reshape(shp))
        res_dtype = jnp.result_type(self.dtype, s.dtype)
        self._data = data
        self.dtype = res_dtype
        return self

    def scale_axis(self, s, axis=-1):
        return self.copy(deep=False).iscale_axis(s, axis)

    def add_charge(self, add_legs, chinfo=None, qtotal=None):
        """Add further (independent) charges to every leg.

        ``add_legs``: one LegCharge per axis carrying the additional charges
        (same lengths/qconj).  Returns a new Array over the combined
        ChargeInfo; legs are neither sorted nor bunched.
        Reference: ``tenpy/linalg/np_conserved.py:1244`` (``add_charge``).
        """
        add_legs = list(add_legs)
        if len(add_legs) != self.rank:
            raise ValueError("wrong number of add_legs")
        legs = [LegCharge.from_add_charge([l, l2], chinfo)
                for l, l2 in zip(self.legs, add_legs)]
        dense = self.to_ndarray()
        new_chinfo = legs[0].chinfo
        if qtotal is None:
            qtotal_new = detect_qtotal(dense, legs)
        else:
            qtotal_new = np.concatenate([np.asarray(self.qtotal, QTYPE),
                                         np.asarray(qtotal, QTYPE).ravel()])
            qtotal_new = new_chinfo.make_valid(qtotal_new)
        return Array.from_ndarray(dense, legs, dtype=self.dtype,
                                  qtotal=qtotal_new,
                                  labels=list(self.get_leg_labels()),
                                  raise_wrong_sector=True)

    def drop_charge(self, charge=None, chinfo=None):
        """Remove one charge (or all, if ``charge is None``).

        Keeps the block structure for a single dropped charge.
        Reference: ``np_conserved.py:1296``."""
        if charge is None:
            legs = [LegCharge.from_drop_charge(l, None, chinfo)
                    for l in self.legs]
            return Array.from_ndarray(self.to_ndarray(), legs,
                                      dtype=self.dtype,
                                      labels=list(self.get_leg_labels()))
        if isinstance(charge, str):
            charge = self.chinfo.names.index(charge)
        legs = [LegCharge.from_drop_charge(l, charge, chinfo)
                for l in self.legs]
        res = Array(legs, self.dtype,
                    np.delete(np.asarray(self.qtotal, QTYPE), charge, 0),
                    list(self.get_leg_labels()))
        res._set_blocks(self._qdata.copy(), list(self._data))
        return res

    def change_charge(self, charge, new_qmod, new_name='', chinfo=None):
        """Change the qmod of one charge (same block structure).

        Reference: ``np_conserved.py:1324``."""
        legs = [LegCharge.from_change_charge(l, charge, new_qmod, new_name,
                                             chinfo)
                for l in self.legs]
        new_chinfo = legs[0].chinfo
        res = Array(legs, self.dtype,
                    new_chinfo.make_valid(np.asarray(self.qtotal, QTYPE)),
                    list(self.get_leg_labels()))
        res._set_blocks(self._qdata.copy(), list(self._data))
        return res

    def iproject(self, mask, axes):
        """Project legs onto boolean masks (reference ``np_conserved.py:1914``)."""
        if not isinstance(axes, (list, tuple)):
            axes = [axes]
            mask = [mask]
        axes = [self.get_leg_index(a) for a in axes]
        map_qinds = {}
        block_masks = {}
        legs = list(self.legs)
        for ax, m in zip(axes, mask):
            mq, bm, new_leg = self.legs[ax].project(np.asarray(m, bool))
            map_qinds[ax] = mq
            block_masks[ax] = bm
            legs[ax] = new_leg
        qdata = []
        data = []
        for row, block in zip(self._qdata, self._data):
            new_row = np.array(row, QTYPE)
            ok = True
            for ax in axes:
                nq = map_qinds[ax][row[ax]]
                if nq < 0:
                    ok = False
                    break
                new_row[ax] = nq
            if not ok:
                continue
            for ax in axes:
                bm = block_masks[ax][row[ax]]
                idx = np.nonzero(bm)[0]
                if _use_jnp(block):
                    block = jnp.take(block, jnp.asarray(idx), axis=ax)
                else:
                    block = np.take(block, idx, axis=ax)
            qdata.append(new_row)
            data.append(block)
        self.legs = tuple(legs)
        self._set_blocks(np.array(qdata, QTYPE).reshape(len(qdata), self.rank), data)
        return self

    # ------------------------------------------------------------------ norms etc.
    def norm(self, ord=None):
        return norm(self, ord)

    def __array__(self, dtype=None):
        arr = self.to_numpy()
        return arr.astype(dtype) if dtype is not None else arr

    # ------------------------------------------------------------------ combine / split
    def make_pipe(self, axes, qconj=1):
        axes = [self.get_leg_index(a) for a in axes]
        return LegPipe([self.legs[a] for a in axes], qconj=qconj)

    def combine_legs(self, combine_legs, new_axes=None, pipes=None, qconj=None):
        """Fuse groups of legs into :class:`LegPipe` s (reference ``np_conserved.py:1561``).

        ``combine_legs`` is a list of groups, each a list of leg labels/indices.  Legs in a
        group are transposed to be consecutive (in the given order); remaining legs keep
        their relative order.
        """
        if len(combine_legs) > 0 and not isinstance(combine_legs[0], (list, tuple)):
            combine_legs = [combine_legs]
        groups = [[self.get_leg_index(l) for l in g] for g in combine_legs]
        flat = [i for g in groups for i in g]
        if len(set(flat)) != len(flat):
            raise ValueError("leg appears in multiple groups")
        if qconj is None:
            qconj = [1] * len(groups)
        elif not isinstance(qconj, (list, tuple)):
            qconj = [qconj] * len(groups)
        # build transposition: non-combined legs keep order; each group inserted at the
        # position of its first leg (after accounting for removals)
        rest = [i for i in range(self.rank) if i not in flat]
        anchor = [min(g) for g in groups] if new_axes is None else None
        order = []
        g_sorted = sorted(range(len(groups)), key=lambda k: anchor[k]) if anchor else \
            list(range(len(groups)))
        merged = []
        ri = 0
        events = sorted([(anchor[k], ('g', k)) for k in range(len(groups))] +
                        [(r, ('r', r)) for r in rest]) if anchor else None
        if events is not None:
            for _, (kind, v) in events:
                if kind == 'g':
                    merged.append(('g', v))
                else:
                    merged.append(('r', v))
        else:
            # new_axes given: place groups at the requested positions
            n_out = len(rest) + len(groups)
            slots = [None] * n_out
            for k, na in enumerate(new_axes):
                slots[na] = ('g', k)
            it = iter(rest)
            for i in range(n_out):
                if slots[i] is None:
                    slots[i] = ('r', next(it))
            merged = slots
        perm = []
        out_groups = []  # (out position, group index) in transposed array
        pos = 0
        pipe_pos = []
        for kind, v in merged:
            if kind == 'g':
                pipe_pos.append((pos, v))
                perm.extend(groups[v])
                pos += len(groups[v])
            else:
                perm.append(v)
                pos += 1
        a = self.transpose(perm)
        # now combine consecutive legs
        if pipes is None:
            pipes = [None] * len(groups)
        built_pipes = []
        for (p0, gk) in pipe_pos:
            glen = len(groups[gk])
            pipe = pipes[gk]
            if pipe is None:
                pipe = LegPipe(a.legs[p0:p0 + glen], qconj=qconj[gk])
            built_pipes.append((p0, glen, pipe))
        return _combine_consecutive(a, built_pipes)

    def split_legs(self, axes=None, cutoff=None):
        """Undo :meth:`combine_legs` for the given (or all) LegPipe legs.

        Reference: ``tenpy/linalg/np_conserved.py:1707``.
        """
        if axes is None:
            axes = [i for i, l in enumerate(self.legs) if isinstance(l, LegPipe)]
        else:
            axes = [self.get_leg_index(a) for a in axes]
            for a in axes:
                if not isinstance(self.legs[a], LegPipe):
                    raise ValueError(f"leg {a} is not a LegPipe")
        if not axes:
            return self.copy(deep=False)
        return _split_legs_worker(self, sorted(axes))

    def add_leg(self, leg, i, axis=0, label=None):
        """Embed self at index ``i`` of a new leg inserted at position ``axis``.

        Inverse of :meth:`squeeze` for ``leg.ind_len == 1``; used to lift
        environment-like tensors onto an MPO virtual leg.
        Reference: ``tenpy/linalg/np_conserved.py`` ``Array.add_leg``.
        """
        flat = np.zeros(leg.ind_len)
        flat[i] = 1.
        u = Array.from_ndarray(flat, [leg],
                               qtotal=leg.to_qflat()[i] * leg.qconj,
                               labels=[label], warn_wrong_sector=False)
        res = outer(self, u)
        perm = list(range(self.rank))
        perm.insert(axis, self.rank)
        return res.itranspose(perm)

    def squeeze(self, axes=None):
        """Remove legs of length 1 (charge absorbed into qtotal)."""
        if axes is None:
            axes = [i for i, l in enumerate(self.legs) if l.ind_len == 1]
        else:
            if not isinstance(axes, (list, tuple)):
                axes = [axes]
            axes = [self.get_leg_index(a) for a in axes]
        for a in axes:
            if self.legs[a].ind_len != 1:
                raise ValueError("cannot squeeze leg of length > 1")
        if len(axes) == self.rank:
            raise ValueError("squeezing all legs -> use item()")
        keep = [i for i in range(self.rank) if i not in axes]
        chinfo = self.chinfo
        dq = np.zeros(chinfo.qnumber, QTYPE)
        for a in axes:
            l = self.legs[a]
            dq += l.charges[0] * l.qconj
        qtotal = chinfo.make_valid(np.array(self.qtotal, QTYPE) - dq)
        res = Array([self.legs[i] for i in keep], self.dtype, qtotal,
                    [self._labels[i] for i in keep])
        qdata = self._qdata[:, keep] if len(self._qdata) else \
            np.zeros((0, len(keep)), QTYPE)
        data = [b.reshape([d for k, d in enumerate(b.shape) if k not in axes])
                for b in self._data]
        res._set_blocks(qdata, data)
        return res

    def add_trivial_leg(self, axis=0, label=None, qconj=1):
        leg = LegCharge.from_trivial(1, self.chinfo, qconj)
        legs = list(self.legs)
        legs.insert(axis, leg)
        labels = list(self._labels)
        labels.insert(axis, label)
        res = Array(legs, self.dtype, self.qtotal, labels)
        if len(self._qdata):
            qdata = np.insert(self._qdata, axis, 0, axis=1)
        else:
            qdata = np.zeros((0, self.rank + 1), QTYPE)
        data = [b.reshape(b.shape[:axis] + (1,) + b.shape[axis:])
                for b in self._data]
        res._set_blocks(qdata, data)
        return res

    def item(self):
        if any(l.ind_len != 1 for l in self.legs):
            raise ValueError("not a scalar")
        if self._data:
            return self._data[0].reshape(())
        return np.zeros((), self.dtype)

    def as_completely_blocked(self):
        """Sort + bunch all legs so each charge sector appears exactly once.

        Returns ``(perms, blocked_array)`` with ``perms[a]`` the flat index
        permutation applied to leg ``a``.  Needed before per-block operations
        like :func:`eigvals` when a leg carries duplicate charge sectors.
        Reference: ``np_conserved.py`` as_completely_blocked."""
        perms = []
        need = False
        legs_new = []
        for leg in self.legs:
            if leg.is_sorted() and leg.is_bunched():
                perms.append(np.arange(leg.ind_len, dtype=np.intp))
                legs_new.append(leg)
            else:
                p, leg2 = leg.sort(bunch=True)
                perms.append(np.asarray(p, dtype=np.intp))
                legs_new.append(leg2)
                need = True
        if not need:
            return perms, self
        arr = np.asarray(self.to_ndarray())
        arr = arr[np.ix_(*perms)]
        res = Array.from_ndarray(arr, legs_new, dtype=self.dtype,
                                 qtotal=self.qtotal)
        res.iset_leg_labels(self.get_leg_labels())
        return perms, res

    # drop tiny blocks
    def ipurge_zeros(self, cutoff=1e-15, norm_order=None):
        keep_rows = []
        keep_data = []
        for row, block in zip(self._qdata, self._data):
            if float(abs(block).max()) > cutoff:
                keep_rows.append(row)
                keep_data.append(block)
        self._set_blocks(np.array(keep_rows, QTYPE).reshape(len(keep_rows), self.rank),
                         keep_data)
        return self


# ---------------------------------------------------------------------- pytree registration
def _array_flatten(a: Array):
    aux = (a.legs, a.qtotal, a._labels, a._qdata.tobytes(), a._qdata.shape,
           str(a.dtype))
    return list(a._data), aux


def _array_unflatten(aux, children):
    legs, qtotal, labels, qbytes, qshape, dtype = aux
    res = Array.__new__(Array)
    res.legs = legs
    res.qtotal = qtotal
    res._labels = labels
    qdata = np.frombuffer(qbytes, QTYPE).reshape(qshape).copy()
    qdata.setflags(write=False)
    res._qdata = qdata
    res._data = list(children)
    res.dtype = jnp.dtype(dtype)
    return res


jax.tree_util.register_pytree_node(Array, _array_flatten, _array_unflatten)


# ---------------------------------------------------------------------- helpers
def _row_qtotal(legs, row):
    chinfo = legs[0].chinfo
    q = np.zeros(chinfo.qnumber, QTYPE)
    for l, s in zip(legs, row):
        q += l.charges[int(s)] * l.qconj
    return chinfo.make_valid(q)


def _check_same_structure(a, b):
    if a.rank != b.rank:
        raise ValueError("rank mismatch")
    for la, lb in zip(a.legs, b.legs):
        la.test_equal(lb)  # same charges & qconj (or equivalent flipped description)
    if a.qtotal != b.qtotal:
        raise ValueError(f"qtotal mismatch {a.qtotal} vs {b.qtotal}")


def _conj_label(lab):
    if lab is None:
        return None
    if lab.startswith('(') and lab.endswith(')'):
        inner = lab[1:-1].split('.')
        return '(' + '.'.join(_conj_label(x) for x in inner) + ')'
    return lab[:-1] if lab.endswith('*') else lab + '*'


# ---------------------------------------------------------------------- free constructors
def zeros(legcharges, dtype=jnp.float64, qtotal=None, labels=None):
    return Array(legcharges, dtype, qtotal, labels)


def ones(legcharges, dtype=jnp.float64, qtotal=None, labels=None):
    return Array.from_func(np.ones, legcharges, dtype, qtotal, labels=labels)


def eye_like(a, axis=0, labels=None):
    """Identity with legs ``[leg, leg.conj()]`` matching ``a.legs[axis]``."""
    if isinstance(a, Array):
        leg = a.legs[a.get_leg_index(axis)]
    else:
        leg = a
    return diag(1., leg, labels=labels)


def diag(s, leg, dtype=None, labels=None):
    """Square diagonal Array with legs ``[leg, leg.conj()]``."""
    scalar = np.isscalar(s) or np.ndim(s) == 0
    if not scalar and not _use_jnp(s):
        s = np.asarray(s)
    if not scalar and s.shape != (leg.ind_len,):
        raise ValueError("diagonal length mismatch")
    if dtype is None:
        dtype = np.result_type(s) if not scalar else np.result_type(type(s))
        if dtype == np.int64 or dtype == np.int32:
            dtype = np.float64
    xp = _xp(s) if not scalar else np
    res = Array([leg, leg.conj()], dtype, None, labels)
    qdata = []
    data = []
    for qi in range(leg.block_number):
        n = int(leg.slices[qi + 1] - leg.slices[qi])
        if scalar:
            block = s * xp.eye(n, dtype=dtype)
        else:
            block = xp.diag(s[leg.get_slice(qi)].astype(dtype))
        qdata.append((qi, qi))
        data.append(block)
    res._set_blocks(np.array(qdata, QTYPE).reshape(len(qdata), 2), data)
    return res


def detect_qtotal(flat_array, legcharges, cutoff=None):
    """qtotal from the largest-|.|-element of a dense array.

    Reference: ``tenpy/linalg/np_conserved.py:3346``.
    """
    flat = np.asarray(flat_array)
    idx = np.unravel_index(np.argmax(np.abs(flat)), flat.shape)
    row = [l.get_qindex(int(i))[0] for l, i in zip(legcharges, idx)]
    return _row_qtotal(legcharges, row)


def detect_legcharge(flat_array, chinfo, legcharges, qtotal=None, qconj=+1, cutoff=None):
    """Given all legs but one (the ``None`` entry), infer that leg's charges from the
    nonzero entries of a dense array.  Reference: ``np_conserved.py:3382``."""
    flat = np.asarray(flat_array)
    if cutoff is None:
        cutoff = 1e-12 * max(float(np.max(np.abs(flat))), 1e-300)
    legs = list(legcharges)
    ax = legs.index(None)
    if qtotal is None:
        qtotal = chinfo.make_valid()
    qtotal = np.asarray(chinfo.make_valid(qtotal), QTYPE)
    qflat = np.zeros((flat.shape[ax], chinfo.qnumber), QTYPE)
    moved = np.moveaxis(flat, ax, 0)
    for i in range(flat.shape[ax]):
        sub = moved[i]
        nz = np.nonzero(np.abs(sub) > cutoff)
        if len(nz[0]) == 0:
            continue
        pos = [n[0] for n in nz]
        q = np.zeros(chinfo.qnumber, QTYPE)
        other = [l for k, l in enumerate(legs) if k != ax]
        for l, p in zip(other, pos):
            qi, _ = l.get_qindex(int(p))
            q += l.charges[qi] * l.qconj
        qflat[i] = chinfo.make_valid((qtotal - q) * qconj)
    return LegCharge.from_qflat(chinfo, qflat, qconj)


def detect_grid_outer_legcharge(grid, grid_legs, qtotal=None, qconj=1, bunch=False):
    """Infer the missing leg of a grid for :func:`grid_outer`.

    Reference: ``tenpy/linalg/np_conserved.py`` (same name)."""
    chinfo = None
    for entry in np.asarray(grid, dtype=object).ravel():
        if entry is not None:
            chinfo = entry.chinfo
            break
    if chinfo is None:
        raise ValueError("empty grid")
    if qtotal is None:
        qtotal = chinfo.make_valid()
    qtotal = np.asarray(chinfo.make_valid(qtotal), QTYPE)
    grid = np.asarray(grid, dtype=object)
    legs = list(grid_legs)
    ax = legs.index(None)
    qflat = np.zeros((grid.shape[ax], chinfo.qnumber), QTYPE)
    found = np.zeros(grid.shape[ax], bool)
    for idx in np.ndindex(*grid.shape):
        entry = grid[idx]
        if entry is None:
            continue
        q = qtotal.copy()
        for k, (l, i) in enumerate(zip(legs, idx)):
            if k == ax:
                continue
            qi, _ = l.get_qindex(int(i))
            q = q - l.charges[qi] * l.qconj
        q = q - np.asarray(entry.qtotal, QTYPE)
        i = idx[ax]
        qv = chinfo.make_valid(chinfo.make_valid(q) * qconj)
        if found[i] and not np.array_equal(qflat[i], qv):
            raise ValueError("inconsistent grid charges")
        qflat[i] = qv
        found[i] = True
    leg = LegCharge.from_qflat(chinfo, qflat, qconj)
    return [leg if k == ax else l for k, l in enumerate(legs)]


def to_iterable_arrays(array_list):
    if isinstance(array_list, Array):
        return [array_list]
    return list(array_list)


# ======================================================================== tensordot
class _Plan:
    """Static execution plan for one tensordot structure (host-built, cached).

    TPU analogue of ``_tensordot_match_charges`` + ``CblasGemmBatch``
    (reference ``tenpy/linalg/_npc_helper.pyx:1382,151``): tasks are grouped by GEMM shape
    so each group executes as ONE batched matmul on the MXU; accumulation of multiple
    charge-sector contributions into one output block uses a segment-sum.
    """

    __slots__ = ('out_rows', 'out_shapes', 'groups', 'n_out',
                 '_host_tasks')

    def __init__(self, out_rows, out_shapes, groups):
        self._host_tasks = None
        self.out_rows = out_rows          # (n_out, rank) np array
        self.out_shapes = out_shapes      # list of output block shapes
        self.groups = groups              # list of (mkn, a_idx[], b_idx[], out_idx[])
        self.n_out = len(out_shapes)


_TD_PLAN_CACHE = {}


def _struct_sig(a):
    return (a.legs, a.qtotal, a._qdata.tobytes(), a._qdata.shape)


def _tensordot_plan(a, b, n_axes):
    """Build (or fetch) the contraction plan: a's last n_axes legs with b's first n_axes."""
    key = (_struct_sig(a), _struct_sig(b), n_axes)
    plan = _TD_PLAN_CACHE.get(key)
    if plan is not None:
        return plan
    ra, rb = a.rank, b.rank
    ka = ra - n_axes
    # group a blocks by contracted-sector tuple
    a_by_c = defaultdict(list)
    for i, row in enumerate(a._qdata):
        a_by_c[tuple(row[ka:])].append(i)
    b_by_c = defaultdict(list)
    for j, row in enumerate(b._qdata):
        b_by_c[tuple(row[:n_axes])].append(j)
    out_map = {}
    out_rows = []
    out_shapes = []
    tasks = []  # (m, k, n, a_idx, b_idx, out_idx)
    a_legs_free = a.legs[:ka]
    b_legs_free = b.legs[n_axes:]
    for c_sec, a_list in a_by_c.items():
        b_list = b_by_c.get(c_sec)
        if b_list is None:
            continue
        k = 1
        for l, s in zip(a.legs[ka:], c_sec):
            k *= int(l.slices[s + 1] - l.slices[s])
        for i in a_list:
            arow = a._qdata[i]
            m = 1
            for l, s in zip(a_legs_free, arow[:ka]):
                m *= int(l.slices[s + 1] - l.slices[s])
            for j in b_list:
                brow = b._qdata[j]
                n = 1
                for l, s in zip(b_legs_free, brow[n_axes:]):
                    n *= int(l.slices[s + 1] - l.slices[s])
                out_row = tuple(arow[:ka]) + tuple(brow[n_axes:])
                oi = out_map.get(out_row)
                if oi is None:
                    oi = len(out_rows)
                    out_map[out_row] = oi
                    out_rows.append(out_row)
                    out_shapes.append(tuple(
                        int(l.slices[s + 1] - l.slices[s])
                        for l, s in zip(a_legs_free + b_legs_free, out_row)))
                tasks.append((m, k, n, i, j, oi))
    # bucket tasks by GEMM shape
    by_shape = defaultdict(list)
    for t in tasks:
        by_shape[t[:3]].append(t[3:])
    groups = []
    for mkn, lst in sorted(by_shape.items()):
        a_idx = np.array([x[0] for x in lst], np.int32)
        b_idx = np.array([x[1] for x in lst], np.int32)
        o_idx = np.array([x[2] for x in lst], np.int32)
        groups.append((mkn, a_idx, b_idx, o_idx))
    out_rows = np.array(out_rows, QTYPE).reshape(len(out_rows), ka + rb - n_axes)
    plan = _Plan(out_rows, out_shapes, groups)
    if len(_TD_PLAN_CACHE) > 4096:
        _TD_PLAN_CACHE.clear()
    _TD_PLAN_CACHE[key] = plan
    return plan


def tensordot(a, b, axes=2):
    """Contract ``a`` and ``b`` along ``axes`` (ints, indices, or leg labels).

    Reference: ``tenpy/linalg/np_conserved.py:3612`` / worker ``_npc_helper.pyx:1498``.
    Executes as shape-bucketed batched GEMMs (see :class:`_Plan`).
    """
    if isinstance(axes, (int, np.integer)):
        n_axes = int(axes)
        axes_a = list(range(a.rank - n_axes, a.rank))
        axes_b = list(range(n_axes))
    else:
        axes_a, axes_b = axes
        if not isinstance(axes_a, (list, tuple)):
            axes_a = [axes_a]
        if not isinstance(axes_b, (list, tuple)):
            axes_b = [axes_b]
        axes_a = [a.get_leg_index(x) for x in axes_a]
        axes_b = [b.get_leg_index(x) for x in axes_b]
        n_axes = len(axes_a)
    if len(axes_a) != len(axes_b):
        raise ValueError("axes length mismatch")
    # transpose: a's contracted legs last (in given order), b's first
    perm_a = [i for i in range(a.rank) if i not in axes_a] + list(axes_a)
    perm_b = list(axes_b) + [i for i in range(b.rank) if i not in axes_b]
    at = a.transpose(perm_a) if perm_a != list(range(a.rank)) else a
    bt = b.transpose(perm_b) if perm_b != list(range(b.rank)) else b
    for la, lb in zip(at.legs[a.rank - n_axes:], bt.legs[:n_axes]):
        la.test_contractible(lb)
    ka = a.rank - n_axes
    out_legs = at.legs[:ka] + bt.legs[n_axes:]
    out_labels = at._labels[:ka] + bt._labels[n_axes:]
    chinfo = a.chinfo
    qtotal = chinfo.make_valid(np.array(at.qtotal, QTYPE) + np.array(bt.qtotal, QTYPE))
    dtype = jnp.result_type(a.dtype, b.dtype)

    if len(out_legs) == 0:
        # full contraction -> scalar
        xp = _xp(*at._data, *bt._data)
        total = xp.zeros((), dtype)
        rows_b = {tuple(r): i for i, r in enumerate(bt._qdata)}
        for i, row in enumerate(at._qdata):
            j = rows_b.get(tuple(row))
            if j is None:
                continue
            total = total + (at._data[i].astype(dtype) *
                             bt._data[j].astype(dtype)).sum()
        return total

    res = Array(out_legs, dtype, qtotal, out_labels)
    if at.stored_blocks == 0 or bt.stored_blocks == 0:
        return res
    plan = _tensordot_plan(at, bt, n_axes)
    out_blocks = _execute_plan(plan, at._data, bt._data, dtype, n_axes, ka,
                               at.rank, bt.rank)
    res._set_blocks(plan.out_rows, out_blocks)
    return res



_native_gemm_runner = None
_native_gemm_tried = False


def _native_gemm():
    """Lazy handle to the C++ batched-GEMM executor (None if unavailable)."""
    global _native_gemm_runner, _native_gemm_tried
    if not _native_gemm_tried:
        _native_gemm_tried = True
        if os.environ.get('TENPY_TPU_NO_NATIVE', ''):
            _native_gemm_runner = None
        else:
            try:
                from ..native import get_batched_gemm
                _native_gemm_runner = get_batched_gemm()
            except Exception:  # noqa: BLE001 - pure-python fallback
                _native_gemm_runner = None
    return _native_gemm_runner


# When set (by tenpy_tpu.parallel.sharded_matvec.sharded), tensordot plans execute
# with their GEMM-bucket batch dimension sharded over this jax Mesh (shard_map+psum).
_SHARDED_MESH = None


def _execute_plan(plan, a_data, b_data, dtype, n_axes, ka, ra, rb):
    """Run the batched GEMM groups of a plan over concrete block data.

    On the jit path this lowers to shape-bucketed batched matmuls on the MXU; on the
    host path it runs the same batches through numpy BLAS (no XLA dispatch).
    """
    if _SHARDED_MESH is not None:
        from ..parallel.sharded_matvec import _execute_plan_sharded
        return _execute_plan_sharded(plan, a_data, b_data, dtype, _SHARDED_MESH)
    use_jax = _use_jnp(*a_data, *b_data)
    if not use_jax:
        # Host path: direct per-block BLAS GEMMs accumulated into the outputs.
        # Stacking into batches only pays off under XLA; on the host it would
        # copy every operand (np.stack) and sort every group (np.unique).
        tasks = plan._host_tasks
        if tasks is None:
            flat = []
            betas = []
            seen = set()
            for (m, k, n), a_idx, b_idx, o_idx in plan.groups:
                for i, j, oi in zip(a_idx, b_idx, o_idx):
                    oi = int(oi)
                    flat.append((int(i), int(j), oi, m, k, n))
                    betas.append(1. if oi in seen else 0.)
                    seen.add(oi)
            dims = np.array([(m, k, n) for _, _, _, m, k, n in flat],
                            dtype=np.int32).reshape(len(flat), 3)
            tasks = (flat, dims, np.array(betas))
            plan._host_tasks = tasks
        flat, dims, betas = tasks
        np_dtype = np.dtype(dtype if not hasattr(dtype, 'type') else
                            np.dtype(str(dtype)))
        kind = {'float64': 'd', 'complex128': 'z'}.get(np_dtype.name)
        run_native = _native_gemm() if kind is not None else None
        if run_native is not None and len(flat) > 16:
            a_blocks, b_blocks, c_blocks = [], [], []
            partial = [None] * plan.n_out
            for i, j, oi, m, k, n in flat:
                am = a_data[i]
                if am.dtype != np_dtype or not am.flags.c_contiguous:
                    am = np.ascontiguousarray(am, np_dtype)
                bm = b_data[j]
                if bm.dtype != np_dtype or not bm.flags.c_contiguous:
                    bm = np.ascontiguousarray(bm, np_dtype)
                a_blocks.append(am)
                b_blocks.append(bm)
                if partial[oi] is None:
                    partial[oi] = np.empty((m, n), np_dtype)
                c_blocks.append(partial[oi])
            run_native(kind, a_blocks, b_blocks, c_blocks, dims, betas)
            return [partial[oi].reshape(plan.out_shapes[oi])
                    for oi in range(plan.n_out)]
        partial = [None] * plan.n_out
        for i, j, oi, m, k, n in flat:
            am = a_data[i].reshape(m, k)
            bm = b_data[j].reshape(k, n)
            if am.dtype != dtype:
                am = am.astype(dtype)
            if bm.dtype != dtype:
                bm = bm.astype(dtype)
            if partial[oi] is None:
                partial[oi] = np.matmul(am, bm)
            else:
                partial[oi] += np.matmul(am, bm)
        return [partial[oi].reshape(plan.out_shapes[oi])
                for oi in range(plan.n_out)]
    xp = jnp
    partial = [None] * plan.n_out
    for (m, k, n), a_idx, b_idx, o_idx in plan.groups:
        if len(a_idx) == 1:
            am = a_data[int(a_idx[0])].reshape(m, k).astype(dtype)
            bm = b_data[int(b_idx[0])].reshape(k, n).astype(dtype)
            c = xp.matmul(am, bm)[None]
        else:
            am = xp.stack([a_data[int(i)].reshape(m, k)
                           for i in a_idx]).astype(dtype)
            bm = xp.stack([b_data[int(j)].reshape(k, n)
                           for j in b_idx]).astype(dtype)
            c = xp.matmul(am, bm)
        # sum contributions landing on the same output block
        uniq, inv = np.unique(o_idx, return_inverse=True)
        if len(uniq) < len(o_idx):
            # segment-sum reorders the batch to match the sorted `uniq`
            if use_jax:
                c = jax.ops.segment_sum(c, jnp.asarray(inv), num_segments=len(uniq))
            else:
                acc = np.zeros((len(uniq),) + c.shape[1:], dtype=c.dtype)
                np.add.at(acc, inv, c)
                c = acc
            pairs = enumerate(uniq)
        else:
            # no duplicates: the batch stays in task order -- pair with o_idx, NOT uniq
            pairs = enumerate(o_idx)
        for pos, oi in pairs:
            blk = c[pos]
            if partial[oi] is None:
                partial[oi] = blk
            else:
                partial[oi] = partial[oi] + blk
    out = []
    for oi in range(plan.n_out):
        blk = partial[oi]
        shape = plan.out_shapes[oi]
        out.append(blk.reshape(shape))
    return out


def inner(a, b, axes='labels', do_conj=False):
    """Full contraction of two same-rank arrays -> scalar.

    ``axes='range'`` pairs legs in order.  The default ``axes='labels'``
    pairs a's legs with b's legs of the *same* labels when ``do_conj=True``
    and with the *conjugate* labels (``'p'`` <-> ``'p*'``) when
    ``do_conj=False`` — i.e. it always expresses ``<a|b>``-style contractions
    regardless of transposition.  Reference: ``tenpy/linalg/np_conserved.py:3540``.
    """
    if axes == 'range':
        axes_a = list(range(a.rank))
        axes_b = list(range(b.rank))
    elif axes == 'labels':
        a_labels = a.get_leg_labels()
        axes_a = list(range(a.rank))
        if do_conj:
            axes_b = [b.get_leg_index(l) for l in a_labels]
        else:
            axes_b = [b.get_leg_index(_conj_label(l)) for l in a_labels]
    else:
        axes_a, axes_b = axes
        axes_a = [a.get_leg_index(x) for x in axes_a]
        axes_b = [b.get_leg_index(x) for x in axes_b]
    if len(axes_a) != a.rank or len(axes_b) != b.rank:
        raise ValueError("inner() needs a full contraction; use tensordot")
    if do_conj:
        a = a.conj()
    return tensordot(a, b, (axes_a, axes_b))


def outer(a, b):
    """Tensor product (no contraction). Reference: ``np_conserved.py:3494``."""
    legs = a.legs + b.legs
    labels = a._labels + b._labels
    if any(l is not None and l in a._labels for l in b._labels):
        labels = (None,) * len(legs)
    chinfo = a.chinfo
    qtotal = chinfo.make_valid(np.array(a.qtotal, QTYPE) + np.array(b.qtotal, QTYPE))
    dtype = jnp.result_type(a.dtype, b.dtype)
    res = Array(legs, dtype, qtotal, labels)
    qdata = []
    data = []
    for ra, ba in zip(a._qdata, a._data):
        for rb, bb in zip(b._qdata, b._data):
            qdata.append(np.concatenate([ra, rb]))
            data.append(_xp(ba, bb).tensordot(ba.astype(dtype), bb.astype(dtype),
                                              axes=0))
    res._set_blocks(np.array(qdata, QTYPE).reshape(len(qdata), len(legs)), data)
    return res


def trace(a, leg1=0, leg2=1):
    """Partial/full trace over a contractible leg pair.

    Reference: ``tenpy/linalg/np_conserved.py:3441``."""
    i1 = a.get_leg_index(leg1)
    i2 = a.get_leg_index(leg2)
    a.legs[i1].test_contractible(a.legs[i2])
    keep = [i for i in range(a.rank) if i not in (i1, i2)]
    if not keep:
        xp = _xp(*a._data)
        total = xp.zeros((), a.dtype)
        for row, block in zip(a._qdata, a._data):
            if row[i1] == row[i2]:
                total = total + xp.trace(block)
        return total
    res = Array([a.legs[i] for i in keep], a.dtype, a.qtotal,
                [a._labels[i] for i in keep])
    acc = {}
    for row, block in zip(a._qdata, a._data):
        if row[i1] != row[i2]:
            continue
        out_row = tuple(row[i] for i in keep)
        tr = _xp(block).trace(block, axis1=i1, axis2=i2)
        acc[out_row] = tr if out_row not in acc else acc[out_row] + tr
    rows = sorted(acc)
    res._set_blocks(np.array(rows, QTYPE).reshape(len(rows), len(keep)),
                    [acc[r] for r in rows])
    return res


# ======================================================================== combine / split
def _combine_consecutive(a, built_pipes):
    """Combine consecutive leg ranges of (already transposed) ``a`` into given pipes.

    ``built_pipes``: list of (start position, n legs, LegPipe), ascending, non-overlapping.
    """
    # output legs / labels
    new_legs = []
    new_labels = []
    col_map = []   # per output leg: ('k', old_index) or ('p', pipe_id, (old indices))
    pos = 0
    pid = 0
    pipe_at = {p0: (glen, pipe) for p0, glen, pipe in built_pipes}
    while pos < a.rank:
        if pos in pipe_at:
            glen, pipe = pipe_at[pos]
            new_legs.append(pipe)
            labs = a._labels[pos:pos + glen]
            if all(l is not None for l in labs):
                new_labels.append('(' + '.'.join(labs) + ')')
            else:
                new_labels.append(None)
            col_map.append(('p', pid, tuple(range(pos, pos + glen))))
            pid += 1
            pos += glen
        else:
            new_legs.append(a.legs[pos])
            new_labels.append(a._labels[pos])
            col_map.append(('k', pos))
            pos += 1
    res = Array(new_legs, a.dtype, a.qtotal, new_labels)
    if a.stored_blocks == 0:
        return res
    # group input blocks by output row; each input block writes a slab of the output block
    out_accum = {}
    for row, block in zip(a._qdata, a._data):
        out_row = []
        slabs = []   # per output leg: (offset, size)
        new_shape = []
        for entry in col_map:
            if entry[0] == 'k':
                s = int(row[entry[1]])
                out_row.append(s)
                leg = a.legs[entry[1]]
                sz = int(leg.slices[s + 1] - leg.slices[s])
                slabs.append((0, sz))
                new_shape.append(sz)
            else:
                _, _, olds = entry
                pipe = new_legs[len(out_row)]
                comb = [int(row[o]) for o in olds]
                start, stop, fqi = pipe.map_comb(comb)
                out_row.append(fqi)
                slabs.append((start, stop - start))
                new_shape.append(stop - start)
        out_row = tuple(out_row)
        reshaped = block.reshape(new_shape)
        out_accum.setdefault(out_row, []).append((slabs, reshaped))
    rows = sorted(out_accum)
    data = []
    for r in rows:
        shape = tuple(int(l.slices[s + 1] - l.slices[s]) for l, s in zip(new_legs, r))
        entries = out_accum[r]
        if len(entries) == 1 and all(sl[1] == shape[k] for k, sl in enumerate(entries[0][0])):
            data.append(entries[0][1].astype(a.dtype))
            continue
        xp = _xp(*[blk for _, blk in entries])
        out = xp.zeros(shape, a.dtype)
        for slabs, blk in entries:
            sl = tuple(slice(o, o + s) for o, s in slabs)
            out = _set_slice(out, sl, blk.astype(a.dtype))
        data.append(out)
    res._set_blocks(np.array(rows, QTYPE).reshape(len(rows), len(new_legs)), data)
    return res


def _split_legs_worker(a, axes):
    """Split the LegPipe legs at ``axes`` back into their constituents."""
    new_legs = []
    new_labels = []
    expand = {}  # old leg index -> (pipe, first new index, nlegs)
    for i, leg in enumerate(a.legs):
        if i in axes:
            pipe = leg
            expand[i] = (pipe, len(new_legs), pipe.nlegs)
            new_legs.extend(pipe.legs)
            lab = a._labels[i]
            if lab is not None and lab.startswith('(') and lab.endswith(')'):
                parts = _split_combined_label(lab)
                if len(parts) == pipe.nlegs:
                    new_labels.extend(parts)
                else:
                    new_labels.extend([None] * pipe.nlegs)
            else:
                new_labels.extend([None] * pipe.nlegs)
        else:
            new_legs.append(a.legs[i])
            new_labels.append(a._labels[i])
    res = Array(new_legs, a.dtype, a.qtotal, new_labels)
    if a.stored_blocks == 0:
        return res
    acc_rows = []
    acc_data = []
    for row, block in zip(a._qdata, a._data):
        # enumerate all combinations hidden inside each pipe-sector of this block
        per_leg_combos = []
        for i in range(a.rank):
            if i in expand:
                pipe, _, _ = expand[i]
                fqi = int(row[i])
                lo, hi = int(pipe.q_map_slices[fqi]), int(pipe.q_map_slices[fqi + 1])
                per_leg_combos.append([tuple(pipe.q_map[r]) for r in range(lo, hi)])
            else:
                per_leg_combos.append([None])
        for choice in itertools.product(*per_leg_combos):
            out_row = []
            sub_slices = []
            sub_shape = []
            for i in range(a.rank):
                if choice[i] is None:
                    s = int(row[i])
                    out_row.append(s)
                    leg = a.legs[i]
                    sub_slices.append(slice(None))
                else:
                    qm = choice[i]
                    start, stop = int(qm[0]), int(qm[1])
                    sub_slices.append(slice(start, stop))
                    pipe = expand[i][0]
                    combo = [int(x) for x in qm[3:]]
                    out_row.extend(combo)
                    for l, s in zip(pipe.legs, combo):
                        sub_shape.append(int(l.slices[s + 1] - l.slices[s]))
            sub = block[tuple(sub_slices)]
            # reshape pipe dims into constituent dims
            final_shape = []
            k = 0
            for i in range(a.rank):
                if choice[i] is None:
                    final_shape.append(sub.shape[k] if False else None)
            # build final shape properly:
            final_shape = []
            si = 0
            for i in range(a.rank):
                if choice[i] is None:
                    final_shape.append(sub.shape[si])
                    si += 1
                else:
                    pipe = expand[i][0]
                    combo = [int(x) for x in choice[i][3:]]
                    for l, s in zip(pipe.legs, combo):
                        final_shape.append(int(l.slices[s + 1] - l.slices[s]))
                    si += 1
            acc_rows.append(out_row)
            acc_data.append(sub.reshape(final_shape))
    res._set_blocks(np.array(acc_rows, QTYPE).reshape(len(acc_rows), len(new_legs)),
                    acc_data)
    return res


def _split_combined_label(lab):
    """Split ``'(a.(b.c).d)'`` -> ``['a', '(b.c)', 'd']``."""
    inner = lab[1:-1]
    parts = []
    depth = 0
    cur = ''
    for ch in inner:
        if ch == '.' and depth == 0:
            parts.append(cur)
            cur = ''
        else:
            if ch == '(':
                depth += 1
            elif ch == ')':
                depth -= 1
            cur += ch
    parts.append(cur)
    return parts


# ======================================================================== concatenate / grids
def concatenate(arrays, axis=0, copy=True):
    """Stack arrays along an existing leg (charges must allow it).

    Reference: ``tenpy/linalg/np_conserved.py:3027``."""
    arrays = list(arrays)
    a0 = arrays[0]
    axis = a0.get_leg_index(axis)
    chinfo = a0.chinfo
    for a in arrays[1:]:
        if a.rank != a0.rank or a.qtotal != a0.qtotal:
            raise ValueError("incompatible arrays")
        for i, (la, lb) in enumerate(zip(a0.legs, a.legs)):
            if i != axis:
                la.test_equal(lb)
    # build new leg: concatenation of sectors
    slices = [0]
    charges = []
    offsets = []  # per array: qindex offset in new leg
    qoff = 0
    for a in arrays:
        leg = a.legs[axis]
        offsets.append(qoff)
        for qi in range(leg.block_number):
            slices.append(slices[-1] + int(leg.slices[qi + 1] - leg.slices[qi]))
            charges.append(leg.charges[qi])
        qoff += leg.block_number
    new_leg = LegCharge(chinfo, slices, np.array(charges, QTYPE).reshape(len(charges), chinfo.qnumber),
                        a0.legs[axis].qconj)
    legs = list(a0.legs)
    legs[axis] = new_leg
    dtype = jnp.result_type(*[a.dtype for a in arrays])
    res = Array(legs, dtype, a0.qtotal, a0._labels)
    qdata = []
    data = []
    for a, off in zip(arrays, offsets):
        for row, block in zip(a._qdata, a._data):
            r = np.array(row, QTYPE)
            r[axis] += off
            qdata.append(r)
            data.append(block.astype(dtype))
    res._set_blocks(np.array(qdata, QTYPE).reshape(len(qdata), len(legs)), data)
    return res


def grid_concat(grid, axes, copy=True):
    """Concatenate a (nested) grid of arrays along multiple axes.

    Reference: ``tenpy/linalg/np_conserved.py:3099``."""
    grid = np.asarray(grid, dtype=object)
    if len(axes) != grid.ndim:
        raise ValueError("axes must match grid dimension")
    if grid.ndim == 1:
        entries = [g for g in grid]
        if any(g is None for g in entries):
            raise ValueError("grid_concat with None entries needs full grid")
        return concatenate(entries, axes[0], copy)
    sub = [grid_concat(grid[i], axes[1:], copy) for i in range(grid.shape[0])]
    return concatenate(sub, axes[0], copy)


def grid_outer(grid, grid_legs, qtotal=None, grid_labels=None):
    """Sum of outer products: ``res[i, j, ...] += grid[i][j]`` for a 2D grid of arrays.

    Used heavily by the MPO builder. Reference: ``np_conserved.py:3206``."""
    grid = np.asarray(grid, dtype=object)
    if len(grid_legs) != grid.ndim:
        raise ValueError("grid_legs must match grid dimension")
    if any(l is None for l in grid_legs):
        grid_legs = detect_grid_outer_legcharge(grid, grid_legs, qtotal)
    entry = None
    for e in grid.ravel():
        if e is not None:
            entry = e
            break
    if entry is None:
        raise ValueError("empty grid")
    chinfo = entry.chinfo
    if qtotal is None:
        # infer from first entry
        idx = next(i for i in np.ndindex(*grid.shape) if grid[i] is not None)
        q = np.array(grid[idx].qtotal, QTYPE)
        for l, i in zip(grid_legs, idx):
            qi, _ = l.get_qindex(int(i))
            q = q + l.charges[qi] * l.qconj
        qtotal = chinfo.make_valid(q)
    legs = list(grid_legs) + list(entry.legs)
    labels = None
    if grid_labels is not None:
        labels = list(grid_labels) + list(entry._labels)
    dtype = jnp.result_type(*[e.dtype for e in grid.ravel() if e is not None])
    res = Array(legs, dtype, qtotal, labels)
    ngrid = grid.ndim
    acc = {}
    for idx in np.ndindex(*grid.shape):
        e = grid[idx]
        if e is None:
            continue
        grid_row = []
        within = []
        for l, i in zip(grid_legs, idx):
            qi, r = l.get_qindex(int(i))
            grid_row.append(qi)
            within.append(r)
        for row, block in zip(e._qdata, e._data):
            out_row = tuple(grid_row) + tuple(row)
            if out_row not in acc:
                shape = _block_shape(res.legs, out_row)
                acc[out_row] = _xp(block).zeros(shape, dtype)
            sl = tuple([slice(w, w + 1) for w in within]) + \
                tuple([slice(None)] * e.rank)
            acc[out_row] = _add_slice(
                acc[out_row], sl,
                block.reshape((1,) * ngrid + block.shape).astype(dtype))
    rows = sorted(acc)
    res._set_blocks(np.array(rows, QTYPE).reshape(len(rows), len(legs)),
                    [acc[r] for r in rows])
    return res


# ======================================================================== norms
def norm(a, ord=None, convert_to_float=True):
    """Norm of an Array (default: Frobenius). Reference: ``np_conserved.py:3852``."""
    if isinstance(a, Array):
        if ord is None or ord == 'fro' or ord == 2:
            if _use_jnp(*a._data):  # device blocks / tracers: stay traceable
                s = jnp.zeros((), jnp.zeros((), a.dtype).real.dtype)
                for b in a._data:
                    s = s + jnp.sum(jnp.abs(b) ** 2)
                return jnp.sqrt(s)
            s = sum(float((abs(b) ** 2).sum()) for b in a._data)
            return float(np.sqrt(s))
        elif ord == np.inf:
            if not a._data:
                return 0.0
            return max(float(abs(b).max()) for b in a._data)
        elif ord == 1:
            return sum(float(abs(b).sum()) for b in a._data)
        else:
            raise ValueError(f"unsupported norm order {ord}")
    return float(np.linalg.norm(np.asarray(a), ord))


# ======================================================================== decompositions
def _split_qtotal(chinfo, qtotal, qtotal_LR):
    q_full = np.array(qtotal, QTYPE)
    qL, qR = qtotal_LR
    if qL is None and qR is None:
        qL = chinfo.make_valid()
        qR = chinfo.make_valid(q_full)
    elif qL is None:
        qR = chinfo.make_valid(qR)
        qL = chinfo.make_valid(q_full - qR)
    else:
        qL = chinfo.make_valid(qL)
        qR = chinfo.make_valid(q_full - qL)
    return np.asarray(qL, QTYPE), np.asarray(qR, QTYPE)


def svd(a, full_matrices=False, compute_uv=True, cutoff=None, qtotal_LR=[None, None],
        inner_labels=[None, None], inner_qconj=+1):
    """Blockwise SVD of a 2-leg Array: ``a = U @ diag(S) @ VH``.

    ``S`` is returned as a plain 1-D array (ordered along the new inner leg).
    Blocks are grouped into connected components of the (row-sector, col-sector)
    bipartite graph, so legs with duplicate charge sectors (e.g. after
    ``concatenate``) are handled correctly.
    Reference: ``tenpy/linalg/np_conserved.py:3676`` (+ ``svd_robust.py``).
    """
    if a.rank != 2:
        raise ValueError("svd needs a 2-leg array; combine_legs first")
    chinfo = a.chinfo
    qL, qR = _split_qtotal(chinfo, a.qtotal, qtotal_LR)
    lab_L, lab_R = inner_labels
    if a.stored_blocks == 0:
        raise ValueError("svd of array with no blocks")
    groups = _matrix_block_components(a)
    xp = _xp(*a._data)
    blocks_u = []      # (row_sector, inner_idx, block)
    blocks_vh = []     # (inner_idx, col_sector, block)
    blocks_s = []
    inner_charges = []
    inner_sizes = []
    for rows, cols, idxs in groups:
        # dense submatrix of the component
        row_sizes = [int(a.legs[0].slices[r + 1] - a.legs[0].slices[r]) for r in rows]
        col_sizes = [int(a.legs[1].slices[c + 1] - a.legs[1].slices[c]) for c in cols]
        row_off = np.concatenate([[0], np.cumsum(row_sizes)])
        col_off = np.concatenate([[0], np.cumsum(col_sizes)])
        m, n = int(row_off[-1]), int(col_off[-1])
        if len(idxs) == 1 and len(rows) == 1 and len(cols) == 1:
            sub = a._data[idxs[0]]
        else:
            sub = xp.zeros((m, n), a.dtype)
            rpos = {r: k for k, r in enumerate(rows)}
            cpos = {c: k for k, c in enumerate(cols)}
            for bi in idxs:
                r, c = int(a._qdata[bi][0]), int(a._qdata[bi][1])
                sl = (slice(int(row_off[rpos[r]]), int(row_off[rpos[r] + 1])),
                      slice(int(col_off[cpos[c]]), int(col_off[cpos[c] + 1])))
                sub = _set_slice(sub, sl, a._data[bi])
        u, s, vh = _robust_svd(sub, full_matrices)
        if cutoff is not None:
            keep = np.asarray(s) > cutoff
            if not keep.all():
                idx = np.nonzero(keep)[0]
                u = u.take(idx, axis=1)
                s = s.take(idx, axis=0) if hasattr(s, 'take') else s[idx]
                vh = vh.take(idx, axis=0)
                if u.shape[1] == 0:
                    continue
        k = u.shape[1]
        # inner charge from the first row sector
        q_row = a.legs[0].charges[rows[0]] * a.legs[0].qconj
        q_c = chinfo.make_valid((q_row - qL) * inner_qconj)
        inner_idx = len(inner_charges)
        inner_charges.append(q_c)
        inner_sizes.append(k)
        blocks_s.append(s)
        for kr, r in enumerate(rows):
            blocks_u.append((r, inner_idx,
                             u[int(row_off[kr]):int(row_off[kr + 1]), :]))
        for kc, c in enumerate(cols):
            blocks_vh.append((inner_idx, c,
                              vh[:, int(col_off[kc]):int(col_off[kc + 1])]))
    slices = np.concatenate([[0], np.cumsum(inner_sizes)])
    leg_R = LegCharge(chinfo, slices,
                      np.array(inner_charges, QTYPE).reshape(len(inner_charges),
                                                             chinfo.qnumber),
                      inner_qconj)   # inner leg on VH (leg 0 of VH)
    leg_L = leg_R.conj()             # inner leg on U (leg 1 of U)
    S = _xp(*blocks_s).concatenate(blocks_s) if blocks_s else np.zeros(0)
    if not compute_uv:
        return S
    U = Array([a.legs[0], leg_L], a.dtype, qL, [a._labels[0], lab_L])
    VH = Array([leg_R, a.legs[1]], a.dtype, qR, [lab_R, a._labels[1]])
    U._set_blocks(np.array([(r, i) for r, i, _ in blocks_u], QTYPE).reshape(
        len(blocks_u), 2), [b.astype(a.dtype) for _, _, b in blocks_u])
    VH._set_blocks(np.array([(i, c) for i, c, _ in blocks_vh], QTYPE).reshape(
        len(blocks_vh), 2), [b.astype(a.dtype) for _, _, b in blocks_vh])
    return U, S, VH


def _matrix_block_components(a):
    """Connected components of stored blocks of a 2-leg Array.

    Returns a list of ``(rows, cols, block_indices)`` with rows/cols sorted.
    For sorted/bunched legs every component is a single block; duplicate-charge
    sectors (unbunched legs) make larger components that must be decomposed jointly.
    """
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[rx] = ry

    for row in a._qdata:
        r = ('r', int(row[0]))
        c = ('c', int(row[1]))
        parent.setdefault(r, r)
        parent.setdefault(c, c)
        union(r, c)
    comps = {}
    for bi, row in enumerate(a._qdata):
        root = find(('r', int(row[0])))
        comps.setdefault(root, [set(), set(), []])
        comps[root][0].add(int(row[0]))
        comps[root][1].add(int(row[1]))
        comps[root][2].append(bi)
    return [(sorted(rows), sorted(cols), idxs)
            for rows, cols, idxs in comps.values()]


def _robust_svd(block, full_matrices=False):
    """SVD with gesvd fallback on failure (analogue of reference ``svd_robust.py``)."""
    if _use_jnp(block):
        u, s, vh = jnp.linalg.svd(block, full_matrices=full_matrices)
        if bool(jnp.any(jnp.isnan(s))):
            import scipy.linalg as _sla
            u2, s2, vh2 = _sla.svd(np.asarray(block), full_matrices=full_matrices,
                                   lapack_driver='gesvd')
            return jnp.asarray(u2), jnp.asarray(s2), jnp.asarray(vh2)
        return u, s, vh
    try:
        u, s, vh = np.linalg.svd(block, full_matrices=full_matrices)
        if np.any(np.isnan(s)):
            raise np.linalg.LinAlgError("NaN in singular values")
        return u, s, vh
    except np.linalg.LinAlgError:
        import scipy.linalg as _sla
        return _sla.svd(block, full_matrices=full_matrices, lapack_driver='gesvd')


def speigs(a, charge_sector, k, *args, **kwargs):
    """Sparse eigen-decomposition of a square 2-leg Array in one charge sector.

    Returns ``(W, vecs)`` with vecs npc Arrays (one leg).
    Reference: ``tenpy/linalg/np_conserved.py:4024``."""
    import scipy.sparse.linalg
    from .sparse import FlatLinearOperator
    if a.rank != 2:
        raise ValueError("speigs needs a square 2-leg Array")
    linop = FlatLinearOperator.from_NpcArray(a, charge_sector=charge_sector)
    k = min(k, linop.shape[0] - 2) if linop.shape[0] > 2 else 1
    if linop.shape[0] <= max(k + 1, 3):  # tiny sector: dense
        n = linop.shape[0]
        mat = np.stack([linop._matvec(np.eye(n)[:, j]) for j in range(n)], 1)
        W, V = np.linalg.eig(mat)
        order = np.argsort(-np.abs(W))[:k]
        W = W[order]
        vecs = [linop.flat_to_npc(V[:, j]) for j in order]
        return W, vecs
    W, V = scipy.sparse.linalg.eigs(linop, k=k, *args, **kwargs)
    vecs = [linop.flat_to_npc(V[:, j]) for j in range(V.shape[1])]
    return W, vecs


def pinv(a, cutoff=1e-15):
    """Moore-Penrose pseudo-inverse (blockwise). Reference: ``np_conserved.py:3821``."""
    U, S, VH = svd(a)
    Sinv = jnp.where(S > cutoff * jnp.max(S), 1.0 / jnp.where(S > 0, S, 1.0), 0.0)
    X = VH.conj().itranspose([1, 0])      # legs [legs1.conj, inner.conj]
    X = X.iscale_axis(Sinv, 1)
    return tensordot(X, U.conj().itranspose([1, 0]), axes=[[1], [0]])


def qr(a, mode='reduced', inner_labels=[None, None], cutoff=None, pos_diag_R=False,
       qtotal_Q=None, inner_qconj=+1):
    """Blockwise QR of a 2-leg Array: ``a = Q @ R``. Reference: ``np_conserved.py:4139``."""
    if a.rank != 2:
        raise ValueError("qr needs a 2-leg array")
    chinfo = a.chinfo
    if qtotal_Q is None:
        qtotal_Q = chinfo.make_valid()
    qtotal_Q = chinfo.make_valid(qtotal_Q)
    qtotal_R = chinfo.make_valid(np.array(a.qtotal, QTYPE) - qtotal_Q)
    lab_Q, lab_R = inner_labels
    rows, q_blocks, r_blocks, charges, sizes = [], [], [], [], []
    for row, block in zip(a._qdata, a._data):
        xp = _xp(block)
        q, r = xp.linalg.qr(block, mode='reduced' if mode != 'complete' else 'complete')
        if pos_diag_R:
            d = xp.diagonal(r)
            d_safe = xp.where(abs(d) > 1e-300, d, 1.0)
            phase = xp.where(abs(d) > 1e-300, d_safe / abs(d_safe), 1.0)
            q = q * phase[None, :]
            r = r * phase.conj()[:, None]
        if cutoff is not None:
            keep = np.asarray(abs(xp.diagonal(r)) > cutoff)
            if not keep.all():
                idx = np.nonzero(keep)[0]
                q = q.take(idx, axis=1)
                r = r.take(idx, axis=0)
            if q.shape[1] == 0:
                continue
        rows.append(row)
        q_blocks.append(q)
        r_blocks.append(r)
        q_row = a.legs[0].charges[row[0]] * a.legs[0].qconj
        charges.append(chinfo.make_valid((q_row - qtotal_Q) * inner_qconj))
        sizes.append(q.shape[1])
    slices = np.concatenate([[0], np.cumsum(sizes)])
    leg_inner_R = LegCharge(chinfo, slices,
                            np.array(charges, QTYPE).reshape(len(charges), chinfo.qnumber),
                            inner_qconj)
    leg_inner_Q = leg_inner_R.conj()
    Q = Array([a.legs[0], leg_inner_Q], a.dtype, qtotal_Q, [a._labels[0], lab_Q])
    R = Array([leg_inner_R, a.legs[1]], a.dtype, qtotal_R, [lab_R, a._labels[1]])
    Q._set_blocks(np.array([(int(r[0]), i) for i, r in enumerate(rows)], QTYPE).reshape(
        len(rows), 2), [b.astype(a.dtype) for b in q_blocks])
    R._set_blocks(np.array([(i, int(r[1])) for i, r in enumerate(rows)], QTYPE).reshape(
        len(rows), 2), [b.astype(a.dtype) for b in r_blocks])
    return Q, R


def lq(a, mode='reduced', inner_labels=[None, None], cutoff=None, pos_diag_L=False,
       qtotal_L=None, inner_qconj=-1):
    """Blockwise LQ: ``a = L @ Q`` with Q right-isometric. Reference: ``np_conserved.py:4273``."""
    qt, rt = qr(a.transpose([1, 0]), mode=mode,
                inner_labels=[inner_labels[1], inner_labels[0]], cutoff=cutoff,
                pos_diag_R=pos_diag_L,
                qtotal_Q=None if qtotal_L is None else
                a.chinfo.make_valid(np.array(a.qtotal, QTYPE) - np.array(qtotal_L, QTYPE)),
                inner_qconj=-inner_qconj)
    # a^T = Q' R'  =>  a = R'^T Q'^T
    L = rt.transpose([1, 0])
    Q = qt.transpose([1, 0])
    return L, Q


def polar(a, left=False):
    """Polar decomposition ``a = U P`` (or ``P U`` if left). Reference: ``np_conserved.py:3772``."""
    Us, S, VH = svd(a)
    W = tensordot(Us, VH, axes=[[1], [0]])
    if left:
        P = tensordot(Us.scale_axis(S, 1), Us.conj().itranspose([1, 0]), axes=[[1], [0]])
        return W, P
    P = tensordot(VH.conj().itranspose([1, 0]).iscale_axis(S, 1), VH, axes=[[1], [0]])
    return W, P


def eigh(a, UPLO='L', sort=None):
    """Blockwise hermitian eigendecomposition of a square 2-leg Array.

    Returns ``(W, V)`` with ``W`` a 1-D jnp array ordered along leg 0's flat index and
    ``V`` an Array with legs ``[a.legs[0], a.legs[0].conj()]``.
    Reference: ``tenpy/linalg/np_conserved.py:3899``.
    """
    return _eig_worker(True, a, sort, UPLO)


def eig(a, sort=None):
    """Blockwise general eigendecomposition. Reference: ``np_conserved.py:3986``."""
    return _eig_worker(False, a, sort)


def eigvalsh(a, UPLO='L', sort=None):
    return _eigvals_worker(True, a, sort, UPLO)


def eigvals(a, sort=None):
    return _eigvals_worker(False, a, sort)


def _check_square(a):
    if a.rank != 2:
        raise ValueError("need 2-leg array")
    a.legs[0].test_contractible(a.legs[1])
    if any(q != 0 for q in a.qtotal):
        raise ValueError("eigh/eig require qtotal=0")


def _eig_worker(hermitian, a, sort, UPLO='L'):
    _check_square(a)
    leg = a.legs[0]
    xp = _xp(*a._data)
    # general eig of a real matrix has complex eigenvalues/-vectors
    W = xp.zeros(leg.ind_len,
                 np.zeros((), a.dtype).real.dtype if hermitian
                 else np.result_type(a.dtype, np.complex64))
    vdtype = a.dtype if hermitian else np.result_type(a.dtype, np.complex64)
    V = diag(1., leg, dtype=vdtype)
    v_rows = {tuple(r): i for i, r in enumerate(V._qdata)}
    for row, block in zip(a._qdata, a._data):
        if row[0] != row[1]:
            raise ValueError("off-diagonal block in eigh?")
        if hermitian:
            w, v = xp.linalg.eigh(block)
        else:
            w, v = np.linalg.eig(np.asarray(block))
        if sort is not None:
            perm = _eig_sort_perm(w, sort)
            w = w[perm]
            v = v[:, perm]
        W = _set_slice(W, leg.get_slice(int(row[0])), w.astype(W.dtype))
        V._data[v_rows[(int(row[0]), int(row[0]))]] = v.astype(vdtype)
    V.dtype = jnp.dtype(vdtype)
    return W, V


def _eigvals_worker(hermitian, a, sort, UPLO='L'):
    _check_square(a)
    leg = a.legs[0]
    xp = _xp(*a._data)
    wdtype = np.zeros((), a.dtype).real.dtype if hermitian else \
        np.result_type(a.dtype, np.complex64)
    W = xp.zeros(leg.ind_len, wdtype)
    for row, block in zip(a._qdata, a._data):
        if hermitian:
            w = xp.linalg.eigvalsh(block)
        else:
            w = np.linalg.eigvals(np.asarray(block))
        if sort is not None:
            w = w[_eig_sort_perm(w, sort)]
        W = _set_slice(W, leg.get_slice(int(row[0])), w.astype(wdtype))
    return W


def _eig_sort_perm(w, sort):
    xp = _xp(w)
    if sort == 'm>':
        return xp.argsort(-abs(w))
    elif sort == 'm<':
        return xp.argsort(abs(w))
    elif sort == '>':
        return xp.argsort(-w.real)
    elif sort == '<':
        return xp.argsort(w.real)
    raise ValueError(f"unknown sort {sort!r}")


def expm(a):
    """Blockwise matrix exponential of a square Array. Reference: ``np_conserved.py:4104``."""
    _check_square(a)
    res = diag(1., a.legs[0], dtype=a.dtype)
    # keep the input's exact legs (a.legs[1] may be a LegPipe whose split
    # restores the original labels) and its labels
    res.legs = a.legs
    res._labels = a._labels
    rows = {tuple(r): i for i, r in enumerate(res._qdata)}
    for row, block in zip(a._qdata, a._data):
        if _use_jnp(block):
            e = jax.scipy.linalg.expm(block)
        else:
            import scipy.linalg as _sla
            e = _sla.expm(np.asarray(block))
        res._data[rows[(int(row[0]), int(row[1]))]] = e.astype(a.dtype)
    return res


def orthogonal_columns(a, new_label=None):
    """Columns spanning the orthogonal complement of the (isometric) columns of ``a``.

    Reference: ``tenpy/linalg/np_conserved.py:4291``."""
    if a.rank != 2:
        raise ValueError("need 2-leg array")
    chinfo = a.chinfo
    leg0 = a.legs[0]
    rows, blocks, charges, sizes = [], [], [], []
    present = {int(r[0]): i for i, r in enumerate(a._qdata)}
    for qi in range(leg0.block_number):
        m = int(leg0.slices[qi + 1] - leg0.slices[qi])
        if qi in present:
            blk = a._data[present[qi]]
            n = blk.shape[1]
            if n >= m:
                continue
            # complete the basis via QR of a full-rank extension
            q_full, _ = _xp(blk).linalg.qr(blk, mode='complete')
            comp = q_full[:, n:]
        else:
            comp = np.eye(m, dtype=a.dtype)
        rows.append(qi)
        blocks.append(comp)
        q_row = leg0.charges[qi] * leg0.qconj
        charges.append(chinfo.make_valid((q_row - np.array(a.qtotal, QTYPE)) * 1))
        sizes.append(comp.shape[1])
    slices = np.concatenate([[0], np.cumsum(sizes)]) if sizes else np.array([0])
    leg_new = LegCharge(chinfo, slices,
                        np.array(charges, QTYPE).reshape(len(charges), chinfo.qnumber), +1).conj()
    res = Array([leg0, leg_new], a.dtype, a.qtotal, [a._labels[0], new_label])
    res._set_blocks(np.array([(r, i) for i, r in enumerate(rows)], QTYPE).reshape(
        len(rows), 2), blocks)
    return res
