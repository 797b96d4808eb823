"""Real-time evolution after a local quench with two-site TDVP.

The tenpy_tpu analogue of the reference's ``examples/e_tdvp.py``.
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.spins import SpinChain
from tenpy_tpu.algorithms import tdvp


def example_TDVP_quench(L=10, dt=0.1, n_steps=5):
    M = SpinChain({'S': 0.5, 'L': L, 'Jx': 1., 'Jy': 1., 'Jz': 1.,
                   'bc_MPS': 'finite', 'conserve': 'Sz'})
    # domain-wall initial state
    psi = MPS.from_product_state(
        M.lat.mps_sites(), ['up'] * (L // 2) + ['down'] * (L - L // 2),
        bc='finite')
    eng = tdvp.TwoSiteTDVPEngine(psi, M, {
        'N_steps': 1, 'dt': dt,
        'trunc_params': {'chi_max': 32, 'svd_min': 1e-10}})
    mags = []
    for _ in range(n_steps):
        eng.run()
        mags.append(np.real(np.asarray(psi.expectation_value('Sz'))))
    print("final <Sz>:", np.round(mags[-1], 4))
    # total Sz conserved
    assert abs(float(np.sum(mags[-1]))) < 1e-6
    return mags


if __name__ == '__main__':
    example_TDVP_quench()
