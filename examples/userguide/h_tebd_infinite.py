"""Userguide step H: infinite TEBD — imaginary and real time.

Counterpart of the reference's ``examples/userguide/h_tebd_infinite.py``:
imaginary-time TEBD finds the TFI ground state; a real-time quench then
spreads correlations inside the Lieb-Robinson cone.
"""
import numpy as np
from scipy.integrate import quad

from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms.tebd import TEBDEngine

g = 1.5
m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite', 'conserve': None})
psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')

# --- imaginary time: decreasing dt ladder
for dt in [0.1, 0.01, 0.001]:
    eng = TEBDEngine(psi, m, {'order': 2, 'dt': dt, 'N_steps': 50,
                              'trunc_params': {'chi_max': 24,
                                               'svd_min': 1e-10}})
    eng.run_GS()
E = float(np.mean(psi.expectation_value(m.H_bond)))
e_exact = -quad(lambda k: np.sqrt(1 + g ** 2 - 2 * g * np.cos(k)) / (2 * np.pi),
                -np.pi, np.pi)[0]
assert abs(E - e_exact) < 1e-5, (E, e_exact)   # Trotter-limited, not chi
print(f"h_tebd_infinite: imaginary time E/site = {E:.8f} "
      f"(exact {e_exact:.8f})")

# --- real-time quench: start from the polarized state, evolve under H(g)
psi_q = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')
eng = TEBDEngine(psi_q, m, {'order': 2, 'dt': 0.05, 'N_steps': 10,
                            'trunc_params': {'chi_max': 32,
                                             'svd_min': 1e-10}})
S_t = []
for step in range(4):
    eng.run()
    S_t.append(float(psi_q.entanglement_entropy()[0]))
# entanglement grows monotonically after a global quench
assert all(b > a - 1e-12 for a, b in zip(S_t, S_t[1:])), S_t
assert S_t[-1] > 0.01
print(f"h_tebd_infinite: quench entropy growth {['%.4f' % s for s in S_t]}")
