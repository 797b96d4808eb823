"""Same physics as ``a_np_conserved.py``, using the MPS/MPO/Site classes.

Neel state energy under the AFM Heisenberg chain, a two-site gate from the
MPO, and one TEBD-style bond update via ``svd_theta`` — the class-based
counterpart of the raw-Array example (reference ``examples/b_mps.py``).
"""
import jax
jax.config.update('jax_platforms', 'cpu')   # examples run host-side
import numpy as np

import tenpy_tpu.linalg.np_conserved as npc
from tenpy_tpu.linalg.truncation import svd_theta
from tenpy_tpu.models.lattice import Chain
from tenpy_tpu.networks.mpo import MPOGraph, MPOEnvironment
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.site import SpinHalfSite
from tenpy_tpu.networks.terms import CouplingTerms

Jxx, Jz = 1.0, 1.0
L = 10
dt = 0.1

site = SpinHalfSite(conserve='Sz')
lat = Chain(L, site, bc_MPS='finite')
psi = MPS.from_product_state(lat.mps_sites(), ['up', 'down'] * (L // 2),
                             bc='finite')

# Heisenberg H as an MPO via the terms machinery
ct = CouplingTerms(L)
for i in range(L - 1):
    ct.add_coupling_term(0.5 * Jxx, i, i + 1, 'Sp', 'Sm')
    ct.add_coupling_term(0.5 * Jxx, i, i + 1, 'Sm', 'Sp')
    ct.add_coupling_term(Jz, i, i + 1, 'Sz', 'Sz')
H = MPOGraph.from_terms([ct], lat.mps_sites(), 'finite').build_MPO()

env = MPOEnvironment(psi, H, psi)
E = env.full_contraction(0)
print(f"E (Neel state) = {np.real(E):.10f}   expect {(L - 1) * -0.25}")
assert abs(E - (L - 1) * -0.25) < 1e-12

# two-site H on bond (0, 1) from the MPO, exponentiate, apply, truncate
W0 = H.get_W(0).replace_labels(['p', 'p*'], ['p0', 'p0*'])
W1 = H.get_W(1).replace_labels(['p', 'p*'], ['p1', 'p1*'])
W2 = npc.tensordot(W0, W1, axes=[['wR'], ['wL']])
H2 = W2.take_slice([H.get_IdL(0), H.get_IdR(1)], ['wL', 'wR'])
H2mat = H2.combine_legs([['p0', 'p1'], ['p0*', 'p1*']], qconj=[+1, -1])
U = npc.expm((-1j * dt) * H2mat).split_legs()

theta = psi.get_theta(0, 2)   # labels vL, p0, p1, vR (S-weighted)
theta = npc.tensordot(U, theta, axes=[['p0*', 'p1*'], ['p0', 'p1']])
theta = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
U_, S, V, err, renorm = svd_theta(theta, {'chi_max': 32, 'svd_min': 1e-10})
print(f"bond update: {len(S)} Schmidt values kept, trunc_err={err.eps:.2e}")
assert np.isfinite(S).all()
print("b_mps example OK")
