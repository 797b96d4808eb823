"""Userguide step G: infinite DMRG (iDMRG).

Counterpart of the reference's ``examples/userguide/g_dmrg_infinite.py``:
energy density and correlation length of the infinite TFI chain, checked
against the exact solution, plus the device-resident variant of the same run.
"""
import numpy as np
from scipy.integrate import quad

from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms.dmrg import TwoSiteDMRGEngine

g = 1.5
m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite', 'conserve': None})
psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')

eng = TwoSiteDMRGEngine(psi, m, {
    'mixer': True,
    'trunc_params': {'chi_max': 32, 'svd_min': 1e-10},
    'max_E_err': 1e-12, 'max_sweeps': 40,
})
E, psi = eng.run()   # energy PER SITE for infinite bc

e_exact = -quad(lambda k: np.sqrt(1 + g ** 2 - 2 * g * np.cos(k)) / (2 * np.pi),
                -np.pi, np.pi)[0]
assert abs(E - e_exact) < 1e-10, (E, e_exact)

# physics of the converged iMPS
xi = psi.correlation_length()
S = psi.entanglement_entropy()[0]
print(f"g_dmrg_infinite: E/site = {E:.12f} (exact {e_exact:.12f}), "
      f"xi = {xi:.4f}, S = {S:.6f}")

# gapped phase (g > 1): short correlation length, small entropy
assert xi < 2.5 and S < 0.5

# --- the same run on the device-resident engine (CPU backend here; on a
# TPU this is the production path, see doc/device_engines.md)
from tenpy_tpu.algorithms.packed_dmrg import DeviceSweepEngine
psi2 = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')
TwoSiteDMRGEngine(psi2, m, {'trunc_params': {'chi_max': 8, 'svd_min': 1e-10},
                            'max_sweeps': 4, 'mixer': True}).run()
dev = DeviceSweepEngine(psi2, m, {'chi_max': 32, 'svd_min': 1e-10,
                                  'lanczos_K': 10, 'n_sweeps': 12,
                                  'multiple': 8})
dev.run()
E_dev = m.H_MPO.expectation_value(psi2)
assert abs(E_dev - e_exact) < 1e-8, (E_dev, e_exact)
print(f"g_dmrg_infinite: device engine E/site = {E_dev:.12f} — ok")
