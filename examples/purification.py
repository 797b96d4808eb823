"""Finite-temperature simulation via purification (reference ``examples/purification.py``).

Imaginary-time-evolve the infinite-temperature purification of an XXZ chain
down to beta, then measure energy and entropy along the way — both with the
plain ``PurificationTEBD`` and with the MPO-based ``PurificationApplyMPO``.
"""
import jax
jax.config.update('jax_platforms', 'cpu')   # examples run host-side
import numpy as np

from tenpy_tpu.models.xxz_chain import XXZChain
from tenpy_tpu.networks.purification_mps import PurificationMPS
from tenpy_tpu.algorithms.purification import PurificationTEBD, PurificationApplyMPO

L = 8
BETA_MAX = 1.0
DBETA = 0.05

m = XXZChain({'L': L, 'Jxx': 1., 'Jz': 1., 'hz': 0., 'bc_MPS': 'finite'})


def run_tebd():
    psi = PurificationMPS.from_infiniteT(m.lat.mps_sites(), bc='finite')
    eng = PurificationTEBD(psi, m, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-10},
        'dt': DBETA, 'order': 2, 'N_steps': 2})
    eng.run_imaginary(BETA_MAX)   # thermal state at inverse temp beta
    E = np.mean(m.H_MPO.expectation_value(psi))
    S = psi.entanglement_entropy()[L // 2]
    print(f"TEBD:      beta={BETA_MAX:.2f}  E/site={E:.8f}  S(L/2)={S:.4f}")
    return E


def run_apply_mpo():
    psi = PurificationMPS.from_infiniteT(m.lat.mps_sites(), bc='finite')
    # our make_U(x) builds U ~ exp(-x H): x=+dbeta/2 cools the purification
    U = m.H_MPO.make_U(DBETA / 2., approximation='II')
    opts = {'trunc_params': {'chi_max': 64, 'svd_min': 1e-10},
            'compression_method': 'variational'}
    beta = 0.
    while beta < BETA_MAX - 1e-12:
        PurificationApplyMPO(psi, U, dict(opts)).run()
        psi.norm = 1.   # e^{-dbeta H} grows the norm; the thermal state is
        beta += DBETA   # normalized (measurements divide by <psi|psi>)
    E = np.mean(m.H_MPO.expectation_value(psi))
    print(f"ApplyMPO:  beta={beta:.2f}  E/site={E:.8f}")
    return E


E1 = run_tebd()
E2 = run_apply_mpo()
# TEBD (order-2 Trotter) and the W_II MPO (O(dt^2) per step) agree up to
# their respective discretization errors
assert abs(E1 - E2) < 2e-2, (E1, E2)
print("purification example OK")
