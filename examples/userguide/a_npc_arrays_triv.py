"""Userguide step A: block-sparse arrays with trivial charges.

Counterpart of the reference's ``examples/userguide/a_npc_arrays_triv.py``:
the npc Array API behaves like numpy when no symmetry is used — start here,
add charges in step B.
"""
import numpy as np

from tenpy_tpu.linalg import np_conserved as npc
from tenpy_tpu.linalg.charges import LegCharge

# an ordinary matrix, wrapped: trivial charges, every entry stored
M = np.arange(12.).reshape(3, 4)
A = npc.Array.from_ndarray_trivial(M, labels=['r', 'c'])
assert A.shape == (3, 4)
assert np.allclose(A.to_ndarray(), M)

# contraction mirrors numpy — but legs carry an orientation (qconj = +/-1)
# even with trivial charges: a contracted pair must point opposite ways.
# Build B's first leg as the conjugate of A's 'c' leg.
legs_B = [A.get_leg('c').conj(), LegCharge.from_trivial(2, A.chinfo)]
B = npc.Array.from_ndarray(np.ones((4, 2)), legs_B, labels=['c', 'o'])
C = npc.tensordot(A, B, axes=[['c'], ['c']])        # (3, 2), labels r, o
assert np.allclose(C.to_ndarray(), M @ np.ones((4, 2)))

# transpose / leg labels
At = A.transpose(['c', 'r'])
assert At.shape == (4, 3)

# combine two legs into one (a LegPipe), split them again
D = npc.Array.from_ndarray_trivial(np.arange(24.).reshape(2, 3, 4),
                                   labels=['x', 'y', 'z'])
Dc = D.combine_legs([['x', 'y']])
assert Dc.shape == (6, 4)
assert np.allclose(Dc.split_legs().to_ndarray(), D.to_ndarray())

# decompositions
U, S, VH = npc.svd(A)
assert np.allclose(np.sort(S), np.sort(np.linalg.svd(M, compute_uv=False)))

print("a_npc_arrays_triv: ok")
