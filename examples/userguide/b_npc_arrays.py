"""Userguide step B: charge-conserving block-sparse arrays.

Counterpart of the reference's ``examples/userguide/b_npc_arrays.py``: build
the spin-1/2 operators with an explicit U(1) (Sz) charge structure and watch
the block sparsity do its work.
"""
import numpy as np

from tenpy_tpu.linalg import np_conserved as npc
from tenpy_tpu.linalg.charges import ChargeInfo, LegCharge

# one U(1) charge called '2*Sz'; the physical leg has charges [+1, -1]
chinfo = ChargeInfo([1], ['2*Sz'])
p = LegCharge.from_qflat(chinfo, [[1], [-1]], qconj=+1)

# Sz is block-diagonal (charge 0); Sp raises the charge by +2
Sz = npc.Array.from_ndarray(np.diag([0.5, -0.5]), [p, p.conj()],
                            labels=['p', 'p*'])
Sp = npc.Array.from_ndarray([[0., 1.], [0., 0.]], [p, p.conj()],
                            labels=['p', 'p*'], qtotal=[2])
Sm = npc.Array.from_ndarray([[0., 0.], [1., 0.]], [p, p.conj()],
                            labels=['p', 'p*'], qtotal=[-2])

# only charge-allowed blocks are stored
assert Sz.stored_blocks == 2          # two diagonal blocks
assert Sp.stored_blocks == 1          # one off-diagonal block

# commutator [Sp, Sm] = 2 Sz, block arithmetic end to end
comm = npc.tensordot(Sp, Sm, axes=[['p*'], ['p']]) \
    - npc.tensordot(Sm, Sp, axes=[['p*'], ['p']])
assert np.allclose(comm.to_ndarray(), 2 * Sz.to_ndarray())

# two-site Heisenberg bond Hamiltonian via outer products
H2 = npc.outer(Sz.replace_labels(['p', 'p*'], ['p0', 'p0*']),
               Sz.replace_labels(['p', 'p*'], ['p1', 'p1*']))
H2 = H2 + 0.5 * (
    npc.outer(Sp.replace_labels(['p', 'p*'], ['p0', 'p0*']),
              Sm.replace_labels(['p', 'p*'], ['p1', 'p1*']))
    + npc.outer(Sm.replace_labels(['p', 'p*'], ['p0', 'p0*']),
                Sp.replace_labels(['p', 'p*'], ['p1', 'p1*'])))
H2 = H2.combine_legs([['p0', 'p1'], ['p0*', 'p1*']], qconj=[+1, -1])

# the singlet-triplet spectrum, from the charge-blocked eigensolver
W, V = npc.eigh(H2)
assert np.allclose(np.sort(W), [-0.75, 0.25, 0.25, 0.25])

# charges rule out forbidden contractions at construction time
try:
    npc.tensordot(Sp, Sp, axes=[['p*'], ['p*']])     # p* with p*: illegal
    raise AssertionError("should have raised")
except ValueError:
    pass

print("b_npc_arrays: ok")
