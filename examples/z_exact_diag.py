"""Exact diagonalization cross-check (reference ``examples/z_exact_diag.py``).

Full diagonalization of a small transverse-field Ising chain, comparing the
ED ground state against DMRG, converting between dense vectors and MPS, and
evolving with ``exp_H``.
"""
import jax
jax.config.update('jax_platforms', 'cpu')   # examples run host-side
import numpy as np

from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.algorithms.exact_diag import ExactDiag
from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.networks.mps import MPS

L = 10
m = TFIChain({'L': L, 'J': 1., 'g': 1.2, 'bc_MPS': 'finite',
              'conserve': 'parity'})

ed = ExactDiag(m)
ed.build_full_H_from_mpo()
ed.full_diagonalization()
E0_ed, psi_ed = ed.groundstate()
print(f"ED ground-state energy: {E0_ed:.10f}")

psi = MPS.from_product_state(m.lat.mps_sites(), ['up'] * L, bc='finite')
eng = dmrg.TwoSiteDMRGEngine(psi, m, {
    'trunc_params': {'chi_max': 32, 'svd_min': 1e-12}, 'max_sweeps': 10})
E0_dmrg, _ = eng.run()
print(f"DMRG ground-state energy: {E0_dmrg:.10f} "
      f"(delta {abs(E0_dmrg - E0_ed):.2e})")
assert abs(E0_dmrg - E0_ed) < 1e-10

# dense vector <-> MPS round trips
psi_dense = ed.mps_to_full(psi)   # npc Array over the combined pipe leg
ov = np.abs(np.vdot(np.asarray(psi_ed).ravel(),
                    np.asarray(psi_dense).ravel()))
print(f"|<ED gs|DMRG gs>| = {ov:.10f}")
assert abs(ov - 1.) < 1e-8

psi_back = ed.full_to_mps(psi_dense)
ov2 = abs(psi_back.overlap(psi))
assert abs(ov2 - 1.) < 1e-8

# real-time evolution with the dense propagator
ed.exp_H(0.1)
print("z_exact_diag example OK")
