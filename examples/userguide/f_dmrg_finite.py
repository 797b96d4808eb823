"""Userguide step F: finite DMRG, done right.

Counterpart of the reference's ``examples/userguide/f_dmrg_finite.py``:
ground state of the transverse-field Ising chain, checked against the exact
free-fermion solution, plus the convergence diagnostics you should always
look at (see doc/guide_dmrg_protocol.md).
"""
import numpy as np

from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms.dmrg import TwoSiteDMRGEngine

L, g = 20, 1.5
m = TFIChain({'L': L, 'J': 1., 'g': g, 'bc_MPS': 'finite', 'conserve': None})
psi = MPS.from_product_state(m.lat.mps_sites(), ['up'] * L, bc='finite')

eng = TwoSiteDMRGEngine(psi, m, {
    'mixer': True,
    'trunc_params': {'chi_max': 48, 'svd_min': 1e-10},
    'max_E_err': 1e-12,
    'max_sweeps': 20,
})
E, psi = eng.run()

# exact: open-boundary TFI via free fermions (BdG single-particle modes)
# H = -J sum sx sx - g sum sz maps to fermions; diagonalize the 2L x 2L BdG
J = 1.
A = np.zeros((L, L))
B = np.zeros((L, L))
for i in range(L):
    A[i, i] = 2 * g
for i in range(L - 1):
    A[i, i + 1] = A[i + 1, i] = -J
    B[i, i + 1] = -J
    B[i + 1, i] = +J
w = np.linalg.eigvalsh((A - B) @ (A + B))
eps = np.sqrt(np.maximum(w, 0.))
E_exact = -0.5 * np.sum(eps) + 0.  # ground state: all modes empty
# constant offset: H_fermion = sum eps (n - 1/2) -> E0 = -sum eps / 2
assert abs(E - E_exact) < 1e-8, (E, E_exact)

# --- the diagnostics that make the number trustworthy
stats = eng.sweep_stats
assert stats['E'][-1] <= stats['E'][0] + 1e-12          # variational descent
max_trunc = max(eng.trunc_err_list) if eng.trunc_err_list else 0.
print(f"f_dmrg_finite: ok  E = {E:.10f} (exact {E_exact:.10f}), "
      f"final chi = {max(psi.chi)}, last trunc_err ~ {max_trunc:.1e}")

# energy variance: a converged eigenstate has <H^2>-<H>^2 at the trunc scale
var = m.H_MPO.variance(psi)
assert var < 1e-6, var
