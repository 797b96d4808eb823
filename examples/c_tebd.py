"""Imaginary-time TEBD for the XXZ chain ground state (U(1) Sz conserved).

The tenpy_tpu analogue of the reference's ``examples/c_tebd.py``.
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.xxz_chain import XXZChain
from tenpy_tpu.algorithms import tebd


def example_TEBD_gs_xxz_finite(L=12, Delta=1.0):
    M = XXZChain({'L': L, 'Jxx': 1., 'Jz': Delta, 'hz': 0.,
                  'bc_MPS': 'finite'})
    psi = MPS.from_product_state(M.lat.mps_sites(),
                                 ['up', 'down'] * (L // 2), bc='finite')
    tebd_params = {
        'order': 2,
        'delta_tau_list': [0.1, 0.01, 0.001],
        'N_steps': 10,
        'max_error_E': 1e-8,
        'trunc_params': {'chi_max': 48, 'svd_min': 1e-10},
    }
    eng = tebd.TEBDEngine(psi, M, tebd_params)
    eng.run_GS()
    E = float(np.sum(np.real(np.asarray(
        psi.expectation_value(M.H_bond[1:], sites=range(L - 1))))))
    print(f"E = {E:.10f}")
    print(f"final bond dimensions: {psi.chi}")
    return E, psi, M


if __name__ == '__main__':
    example_TEBD_gs_xxz_finite()
