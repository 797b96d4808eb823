r"""Size-bucketed zero padding of charge legs (TPU compile-cache stability).

Everything under ``jax.jit`` is specialized on the exact block structure of its
inputs; on TPU a single compile costs tens of seconds.  During DMRG the charge
sector *sizes* of the virtual legs drift from sweep to sweep, which would force
a recompile per update.  Rounding every sector size up to a small set of bucket
sizes (zero-padding the blocks) collapses those structures onto a handful of
compile keys while leaving all contraction results exact:

* tensordot/matmul: zero rows/columns contribute nothing, the result is the
  zero-padded version of the true result;
* inner products and norms are unchanged;
* SVD/eigh gain exact-zero singular values, harmless under truncation.

This is the "static-shape, size-bucketed block layout" of the TPU design
(see BASELINE.json north star).  Host-side cost is one ``np.zeros`` + copy per
block, negligible against the device matmuls it unlocks.
"""

from __future__ import annotations

import numpy as np

from . import np_conserved as npc
from .charges import LegCharge, QTYPE

__all__ = ['bucket_size', 'pad_leg', 'pad_array', 'unpad_array', 'embed_leg_map', 'embed_array']


def bucket_size(n, multiple=64):
    """Round a sector size up: powers of two up to ``multiple``, then multiples
    of ``multiple`` (MXU-friendly without over-padding small sectors)."""
    if n <= 0:
        return n
    p = 8
    while p < multiple:
        if n <= p:
            return p
        p *= 2
    return ((n + multiple - 1) // multiple) * multiple


def pad_leg(leg, multiple=64):
    """LegCharge with every sector size rounded up by :func:`bucket_size`.

    Returns ``(padded_leg, orig_sizes)``; charges and qconj are unchanged."""
    sizes = np.diff(leg.slices)
    new_sizes = np.array([bucket_size(int(s), multiple) for s in sizes])
    slices = np.concatenate([[0], np.cumsum(new_sizes)])
    padded = LegCharge(leg.chinfo, slices, leg.charges, leg.qconj)
    return padded, np.asarray(sizes)


def pad_array(a, padded_legs):
    """Zero-pad an Array's blocks onto ``padded_legs``.

    Parameters
    ----------
    a : Array
    padded_legs : dict
        Maps leg *label* (or axis index) to the padded LegCharge (as returned
        by :func:`pad_leg` for the ORIGINAL leg in the same position).

    Blocks are padded on the host (numpy) -- do this before device transfer.
    """
    axes = {}
    for key, leg in padded_legs.items():
        ax = a.get_leg_index(key) if not isinstance(key, (int, np.integer)) \
            else int(key)
        axes[ax] = leg
    new_legs = [axes.get(i, a.legs[i]) for i in range(a.rank)]
    res = npc.Array(new_legs, a.dtype, a.qtotal, list(a.get_leg_labels()))
    new_data = []
    for row, block in zip(a._qdata, a._data):
        block = np.asarray(block)
        shape = tuple(
            int(new_legs[i].slices[row[i] + 1] - new_legs[i].slices[row[i]])
            for i in range(a.rank))
        if shape == block.shape:
            new_data.append(block)
            continue
        padded = np.zeros(shape, dtype=block.dtype)
        padded[tuple(slice(0, s) for s in block.shape)] = block
        new_data.append(padded)
    qdata = a._qdata.copy() if len(a._qdata) else \
        np.zeros((0, a.rank), QTYPE)
    res._set_blocks(qdata, new_data)
    return res


def unpad_array(a, orig_legs):
    """Inverse of :func:`pad_array`: slice blocks back to the original legs."""
    axes = {}
    for key, leg in orig_legs.items():
        ax = a.get_leg_index(key) if not isinstance(key, (int, np.integer)) \
            else int(key)
        axes[ax] = leg
    new_legs = [axes.get(i, a.legs[i]) for i in range(a.rank)]
    res = npc.Array(new_legs, a.dtype, a.qtotal, list(a.get_leg_labels()))
    new_data = []
    for row, block in zip(a._qdata, a._data):
        block = np.asarray(block)
        shape = tuple(
            int(new_legs[i].slices[row[i] + 1] - new_legs[i].slices[row[i]])
            for i in range(a.rank))
        if shape == block.shape:
            new_data.append(block)
        else:
            new_data.append(np.ascontiguousarray(
                block[tuple(slice(0, s) for s in shape)]))
    qdata = a._qdata.copy() if len(a._qdata) else \
        np.zeros((0, a.rank), QTYPE)
    res._set_blocks(qdata, new_data)
    return res


def embed_leg_map(leg, big_leg):
    """Sector-index map from ``leg`` into the charge-superset ``big_leg``.

    Returns int array ``m`` with ``big_leg.charges[m[s]] == leg.charges[s]``
    (and ``big_leg`` sector sizes >= leg's).  Raises if a sector is missing or
    too small."""
    pos = {tuple(np.asarray(big_leg.charges[b], QTYPE)): b
           for b in range(big_leg.block_number)}
    m = np.zeros(leg.block_number, np.intp)
    for s in range(leg.block_number):
        b = pos.get(tuple(np.asarray(leg.charges[s], QTYPE)))
        if b is None:
            raise ValueError("embed_leg_map: sector missing in big_leg")
        if (big_leg.slices[b + 1] - big_leg.slices[b]
                < leg.slices[s + 1] - leg.slices[s]):
            raise ValueError("embed_leg_map: target sector too small")
        m[s] = b
    return m


def embed_array(a, big_legs):
    """Zero-pad an Array's blocks onto charge-superset legs.

    Like :func:`pad_array`, but the target legs may contain *additional*
    charge sectors (capacity layouts grown beyond the current state); sector
    indices are re-mapped by charge.  ``big_legs``: dict label/axis -> LegCharge
    with the same qconj."""
    axes = {}
    for key, leg in big_legs.items():
        ax = a.get_leg_index(key) if not isinstance(key, (int, np.integer)) \
            else int(key)
        if leg.qconj != a.legs[ax].qconj:
            raise ValueError("embed_array: qconj mismatch")
        axes[ax] = (leg, embed_leg_map(a.legs[ax], leg))
    new_legs = [axes[i][0] if i in axes else a.legs[i] for i in range(a.rank)]
    res = npc.Array(new_legs, a.dtype, a.qtotal, list(a.get_leg_labels()))
    new_data = []
    qdata = a._qdata.copy() if len(a._qdata) else np.zeros((0, a.rank), QTYPE)
    for k, row in enumerate(qdata):
        for ax, (_, m) in axes.items():
            row[ax] = m[row[ax]]
    for row, block in zip(qdata, a._data):
        block = np.asarray(block)
        shape = tuple(
            int(new_legs[i].slices[row[i] + 1] - new_legs[i].slices[row[i]])
            for i in range(a.rank))
        if shape == block.shape:
            new_data.append(block)
            continue
        padded = np.zeros(shape, dtype=block.dtype)
        padded[tuple(slice(0, s) for s in block.shape)] = block
        new_data.append(padded)
    res._set_blocks(qdata, new_data)
    return res
