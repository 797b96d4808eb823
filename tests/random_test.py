"""Shared randomized fixtures for block-sparse differential tests.

Analogue of the reference's ``tests/random_test.py:1-117`` (seeded RNG, random charge
partitions, random legs/Arrays) — written fresh for the jnp-backed engine.
"""
import numpy as np
import jax.numpy as jnp

from tenpy_tpu.linalg import np_conserved as npc
from tenpy_tpu.linalg.charges import ChargeInfo, LegCharge

rng = np.random.RandomState(3141592)

chinfo_none = ChargeInfo()
chinfo_U1 = ChargeInfo([1], ['q'])
chinfo_Z2 = ChargeInfo([2], ['parity'])
chinfo_U1_Z3 = ChargeInfo([1, 3], ['q', 'z3'])


def rand_partitions(n, k=3):
    """Random partition of range(n) into <=k nonempty contiguous pieces."""
    if n <= 1 or k <= 1:
        return np.array([0, n])
    cuts = np.sort(rng.choice(range(1, n), size=min(k - 1, n - 1), replace=False))
    return np.concatenate([[0], cuts, [n]])


def gen_random_legcharge(chinfo, ind_len, qconj=None, n_sectors=4):
    slices = rand_partitions(ind_len, n_sectors)
    n = len(slices) - 1
    charges = rng.randint(-3, 4, size=(n, chinfo.qnumber))
    charges = chinfo.make_valid(charges)
    if qconj is None:
        qconj = rng.choice([-1, 1])
    leg = LegCharge(chinfo, slices, charges, qconj)
    _, leg = leg.sort()
    return leg


def random_Array(shape, chinfo, qtotal=None, sort=True, complex_=False):
    legs = [gen_random_legcharge(chinfo, s) for s in shape]

    def func(size):
        d = rng.normal(size=size)
        if complex_:
            d = d + 1j * rng.normal(size=size)
        return d

    dtype = jnp.complex128 if complex_ else jnp.float64
    a = npc.Array.from_func(func, legs, dtype=dtype, qtotal=qtotal)
    if a.stored_blocks == 0:
        # ensure at least one block: pick a valid qtotal from a random sector combo
        row = [rng.randint(l.block_number) for l in legs]
        from tenpy_tpu.linalg.np_conserved import _row_qtotal
        a = npc.Array.from_func(func, legs, dtype=dtype,
                                qtotal=_row_qtotal(legs, row))
    return a
