"""DeviceTEBDEngine vs the host TEBD engine (CPU jit differential).

The device bond update must reproduce the host `update_bond`
(reference ``tenpy/algorithms/tebd.py:416``) step for step: same Trotter
decomposition, same truncation, inverse-free B_L.  Real-time evolution
exercises the complex split-channel storage end to end.
"""
import numpy as np
import pytest

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.spins import SpinChain
from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.algorithms.tebd import TEBDEngine
from tenpy_tpu.algorithms.packed_tebd import DeviceTEBDEngine


def _prep(bc='finite', L=8, chi=24):
    m = SpinChain({'S': 1., 'L': L, 'Jx': 1., 'Jy': 1., 'Jz': 0.7,
                   'bc_MPS': bc, 'conserve': 'Sz'})
    psi = MPS.from_product_state(m.lat.mps_sites(),
                                 (['1.0', '-1.0'] * L)[:L], bc=bc)
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-12},
        'max_sweeps': 3 if bc == 'finite' else 10, 'mixer': True})
    eng.run()
    return m, psi


@pytest.mark.parametrize('bc', ['finite', 'infinite'])
def test_device_tebd_real_time_vs_host(bc):
    m, psi = _prep(bc=bc, L=8 if bc == 'finite' else 2)
    psi_host = psi.copy()
    opts = {'N_steps': 3, 'dt': 0.05, 'order': 2,
            'trunc_params': {'chi_max': 32, 'svd_min': 1e-10}}
    host = TEBDEngine(psi_host, m, dict(opts))
    host.run()

    dev = DeviceTEBDEngine(psi, m, {'N_steps': 3, 'dt': 0.05, 'order': 2,
                                    'chi_max': 32, 'svd_min': 1e-10,
                                    'multiple': 8, 'type_evo': 'real'})
    err = dev.run()
    assert abs(dev.evolved_time - host.evolved_time) < 1e-14
    assert abs(err.eps - host.trunc_err.eps) < 1e-8

    # same physical state: compare one-site expectation values + overlap
    sz_h = psi_host.expectation_value('Sz')
    sz_d = psi.expectation_value('Sz')
    assert np.allclose(sz_h, sz_d, atol=1e-8)
    if bc == 'finite':
        ov = psi.overlap(psi_host)
        assert abs(abs(ov) - 1.) < 1e-7
    psi.test_sanity()


def test_device_tebd_imag_time_gs():
    """Imaginary-time device TEBD lowers the energy like the host engine."""
    L = 8
    m = TFIChain({'L': L, 'J': 1., 'g': 1.2, 'bc_MPS': 'finite',
                  'conserve': 'parity'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up'] * L, bc='finite')
    psi_host = psi.copy()
    for dt in (0.1, 0.01):
        host = TEBDEngine(psi_host, m, {
            'N_steps': 20, 'dt': dt, 'order': 2, 'type_evo': 'imag',
            'trunc_params': {'chi_max': 16, 'svd_min': 1e-12},
            'preserve_norm': False})
        host.calc_U(2, dt, type_evo='imag')
        host.evolve(20, dt)
        psi_host.canonical_form()
        dev = DeviceTEBDEngine(psi, m, {
            'N_steps': 20, 'dt': dt, 'order': 2, 'type_evo': 'imag',
            'chi_max': 16, 'svd_min': 1e-12, 'multiple': 8})
        dev.run()
        psi.canonical_form()
    E_host = np.sum(psi_host.expectation_value(m.H_bond[1:], range(L - 1)))
    E_dev = np.sum(psi.expectation_value(m.H_bond[1:], range(L - 1)))
    # both engines use the same inverse-free update; states should agree
    assert abs(E_dev - E_host) < 1e-6
    exact = dmrg.run(psi.copy(), m, {'trunc_params': {'chi_max': 32},
                                     'max_sweeps': 10})['E']
    assert E_dev < exact + 0.05   # close to the ground state
