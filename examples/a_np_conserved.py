"""Low-level tour of the charge-conserving ``Array`` — no other classes.

Builds a Neel MPS and the AFM Heisenberg MPO directly from
:mod:`tenpy_tpu.linalg.np_conserved` Arrays, contracts environments for the
energy, extracts the two-site Hamiltonian, exponentiates it, applies it to
the MPS, and truncates with an SVD.  Demonstrates the same workflow as the
reference's ``examples/a_np_conserved.py`` on the TPU-native Array.
"""
import jax
jax.config.update('jax_platforms', 'cpu')   # examples run host-side
import numpy as np

import tenpy_tpu.linalg.np_conserved as npc
from tenpy_tpu.linalg.charges import ChargeInfo, LegCharge

Jxx, Jz = 1.0, 1.0
L = 10
dt = 0.1
cutoff = 1.0e-10

# --- 1) Neel MPS out of raw Arrays --------------------------------------
chinfo = ChargeInfo([1], ['2*Sz'])
p_leg = LegCharge.from_qflat(chinfo, [[1], [-1]])       # up, down
v_even = LegCharge.from_qflat(chinfo, [[0]])
v_odd = LegCharge.from_qflat(chinfo, [[1]])

B_even = npc.zeros([v_even, v_odd.conj(), p_leg], labels=['vL', 'vR', 'p'])
B_odd = npc.zeros([v_odd, v_even.conj(), p_leg], labels=['vL', 'vR', 'p'])
B_even[0, 0, 0] = 1.0       # |up>
B_odd[0, 0, 1] = 1.0        # |down>
Bs = [B_even, B_odd] * (L // 2) + [B_even] * (L % 2)
Ss = [np.ones(1)] * (L + 1)

# --- 2) Heisenberg MPO as a grid of operators ---------------------------
Sp = np.array([[0., 1.], [0., 0.]])
Sm = np.array([[0., 0.], [1., 0.]])
Sz = np.array([[0.5, 0.], [0., -0.5]])
Id = np.eye(2)

mpo_leg = LegCharge.from_qflat(chinfo, [[0], [2], [-2], [0], [0]])
Ws = []
for i in range(L):
    grid = [[Id, Sp, Sm, Sz, None],
            [None, None, None, None, 0.5 * Jxx * Sm],
            [None, None, None, None, 0.5 * Jxx * Sp],
            [None, None, None, None, Jz * Sz],
            [None, None, None, None, Id]]
    W = npc.grid_outer([[None if op is None else
                         npc.Array.from_ndarray(op, [p_leg, p_leg.conj()],
                                                labels=['p', 'p*'])
                         for op in row] for row in grid],
                       [mpo_leg, mpo_leg.conj()], grid_labels=['wL', 'wR'])
    W.iset_leg_labels(['wL', 'wR', 'p', 'p*'])
    Ws.append(W)

# --- 3+4) environments and energy ---------------------------------------
envL = npc.zeros([Bs[0].get_leg('vL'), mpo_leg.conj(),
                  Bs[0].get_leg('vL').conj()], labels=['vR*', 'wR', 'vR'])
envL[0, 0, 0] = 1.
envR = npc.zeros([Bs[-1].get_leg('vR'), mpo_leg,
                  Bs[-1].get_leg('vR').conj()], labels=['vL*', 'wL', 'vL'])
envR[0, 4, 0] = 1.

contr = envL
for i in range(L):
    contr = npc.tensordot(contr, Bs[i], axes=[['vR'], ['vL']])
    contr = npc.tensordot(contr, Ws[i], axes=[['wR', 'p'], ['wL', 'p*']])
    contr = npc.tensordot(contr, Bs[i].conj(),
                          axes=[['vR*', 'p'], ['vL*', 'p*']])
E = npc.inner(contr, envR, axes=[['vR*', 'wR', 'vR'], ['vL*', 'wL', 'vL']])
print(f"E (Neel state) = {E:.10f}   expect {(L - 1) * -0.25}")
assert abs(E - (L - 1) * -0.25) < 1e-12

# --- 5) two-site H from the MPO -----------------------------------------
W0 = Ws[0].replace_labels(['p', 'p*'], ['p0', 'p0*'])
W1 = Ws[1].replace_labels(['p', 'p*'], ['p1', 'p1*'])
W2 = npc.tensordot(W0, W1, axes=[['wR'], ['wL']])
H2 = W2.take_slice([0, 4], ['wL', 'wR'])

# --- 6) U = exp(-i dt H2) by blockwise diagonalization ------------------
H2mat = H2.combine_legs([['p0', 'p1'], ['p0*', 'p1*']], qconj=[+1, -1])
U = npc.expm((-1j * dt) * H2mat)
U = U.split_legs()
print("U legs:", U.get_leg_labels())

# --- 7) apply U to the bond (0,1), SVD-truncate -------------------------
theta = npc.tensordot(Bs[0].replace_label('p', 'p0'),
                      Bs[1].replace_label('p', 'p1'), axes=[['vR'], ['vL']])
theta = npc.tensordot(U, theta, axes=[['p0*', 'p1*'], ['p0', 'p1']])
theta = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
A, S, B = npc.svd(theta, cutoff=cutoff, inner_labels=['vR', 'vL'])
print(f"after exp(-i dt H2): {len(S)} Schmidt values, "
      f"S = {np.round(np.sort(S)[::-1], 6)}")
assert np.isfinite(S).all()
print("a_np_conserved example OK")
