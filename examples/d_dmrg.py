"""Ground state of the transverse-field Ising chain with two-site DMRG.

The tenpy_tpu analogue of the reference's ``examples/d_dmrg.py``.
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.algorithms import dmrg


def example_DMRG_tf_ising_finite(L=16, g=1.5):
    model_params = {'L': L, 'J': 1., 'g': g, 'bc_MPS': 'finite',
                    'conserve': 'parity'}
    M = TFIChain(model_params)
    psi = MPS.from_product_state(M.lat.mps_sites(), ['up'] * L, bc='finite')
    dmrg_params = {
        'mixer': True,
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-10},
        'max_E_err': 1e-10,
    }
    info = dmrg.run(psi, M, dmrg_params)
    E = info['E']
    print(f"E = {E:.13f}")
    print(f"final bond dimensions: {psi.chi}")
    mag_z = np.mean(np.real(np.asarray(psi.expectation_value('Sigmaz'))))
    print(f"<sigma_z> = {mag_z:.5f}")
    return E, psi, M


def example_DMRG_tf_ising_infinite(g=1.5):
    model_params = {'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                    'conserve': 'parity'}
    M = TFIChain(model_params)
    psi = MPS.from_product_state(M.lat.mps_sites(), ['up'] * 2, bc='infinite')
    dmrg_params = {
        'mixer': True,
        'trunc_params': {'chi_max': 32, 'svd_min': 1e-10},
        'max_E_err': 1e-10,
    }
    info = dmrg.run(psi, M, dmrg_params)
    E = info['E']
    print(f"E/site = {E:.13f}")
    # exact (free-fermion) ground-state energy density
    from scipy.integrate import quad
    E_exact = -quad(lambda k: np.sqrt(1 + g ** 2 + 2 * g * np.cos(k)),
                    0, np.pi)[0] / np.pi
    print(f"exact  = {E_exact:.13f}  (diff {abs(E - E_exact):.2e})")
    assert abs(E - E_exact) < 1e-7
    return E, psi, M


if __name__ == '__main__':
    example_DMRG_tf_ising_finite()
    print('-' * 60)
    example_DMRG_tf_ising_infinite()
