"""VUMPS ground-state search vs analytic TFI energy density."""
import numpy as np
import pytest
from scipy.integrate import quad

from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.uniform_mps import UniformMPS
from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.algorithms.vumps import SingleSiteVUMPSEngine, TwoSiteVUMPSEngine


def e0_tfi(g, J=1.):
    return -J * quad(lambda k: np.sqrt(1 + (g / J) ** 2 + 2 * (g / J) * np.cos(k))
                     / (2 * np.pi), -np.pi, np.pi)[0]


def test_uniform_mps_roundtrip():
    g = 1.5
    m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                  'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 12, 'svd_min': 1e-10},
                      'max_sweeps': 10, 'mixer': True})
    u = UniformMPS.from_MPS(psi)
    errs = u.test_validity()
    assert np.max(errs) < 1e-7  # canonical MPS -> valid uMPS
    assert np.linalg.norm(u.norm_test()) < 1e-8
    sz_mps = psi.expectation_value('Sigmaz')
    sz_u = u.expectation_value('Sigmaz')
    assert np.allclose(sz_mps, sz_u, atol=1e-10)
    psi2 = u.to_MPS(check_overlap=False)
    assert np.allclose(psi2.expectation_value('Sigmaz'), sz_mps, atol=1e-8)


def test_single_site_vumps():
    g = 1.5
    m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                  'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 12, 'svd_min': 1e-10},
                      'max_sweeps': 8, 'mixer': True})
    eng = SingleSiteVUMPSEngine(psi, m, {
        'max_sweeps': 30, 'max_E_err': 1e-12, 'max_split_err': 1e-9,
        'check_overlap': False})
    E, psi_out = eng.run()
    assert abs(E - e0_tfi(g)) < 1e-10
    assert np.linalg.norm(psi_out.norm_test()) < 1e-8


def test_two_site_vumps():
    """2-site VUMPS grows chi dynamically from a product state."""
    g = 1.2
    m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                  'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')
    eng = TwoSiteVUMPSEngine(psi, m, {
        'max_sweeps': 40, 'max_E_err': 1e-12, 'max_split_err': 1e-8,
        'check_overlap': False,
        'trunc_params': {'chi_max': 24, 'svd_min': 1e-10}})
    E, psi_out = eng.run()
    assert abs(E - e0_tfi(g)) < 1e-9
    assert max(psi_out.chi) > 4  # grew from chi=1


def test_single_site_vumps_L1():
    """L=1 unit cell (fully translation invariant), reference test row 1."""
    g = 1.5
    m = TFIChain({'L': 1, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                  'conserve': None})
    psi = MPS.from_desired_bond_dimension(m.lat.mps_sites(), 16,
                                          bc='infinite', seed=5)
    eng = SingleSiteVUMPSEngine(psi, m, {
        'max_sweeps': 60, 'max_E_err': 1e-12, 'max_split_err': 1e-8,
        'check_overlap': False})
    E, psi_out = eng.run()
    assert abs(E - e0_tfi(g)) < 1e-9
    # energy cross-checks through independent routes (reference test_vumps.py)
    E_bond = np.mean(psi_out.expectation_value(m.H_bond))
    E_mpo = m.H_MPO.expectation_value(psi_out)
    norm_err = np.max(psi_out.norm_test())
    assert abs(E - E_bond) < max(1e-10, 10 * norm_err)
    assert abs(E - E_mpo) < max(1e-10, 10 * norm_err)


@pytest.mark.parametrize('L, mixer', [(2, 'SubspaceExpansion'),
                                      (3, 'SubspaceExpansion'),
                                      (3, 'DensityMatrixMixer')])
def test_two_site_vumps_mixer(L, mixer, g=1.2):
    """2-site VUMPS with mixers + chi_list ramp (reference test_vumps.py rows 4-5)."""
    m = TFIChain({'L': L, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                  'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up'] * L, bc='infinite')
    eng = TwoSiteVUMPSEngine(psi, m, {
        'max_sweeps': 50, 'min_sweeps': 10, 'max_E_err': 1e-12,
        'max_split_err': 1e-8, 'check_overlap': False,
        'mixer': mixer,
        'mixer_params': {'amplitude': 1e-5, 'disable_after': 5},
        'chi_list': {0: 10, 5: 24},
        'trunc_params': {'svd_min': 1e-10}})
    E, psi_out = eng.run()
    assert abs(E - e0_tfi(g)) < 1e-8
    E_bond = np.mean(psi_out.expectation_value(m.H_bond))
    norm_err = np.max(psi_out.norm_test())
    assert abs(E - E_bond) < max(1e-8, 10 * norm_err)


def test_vumps_mixer_guards():
    """Unsupported mixer combinations raise clearly."""
    g = 1.2
    m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                  'conserve': None})
    psi = MPS.from_desired_bond_dimension(m.lat.mps_sites(), 8,
                                          bc='infinite', seed=2)
    eng = SingleSiteVUMPSEngine(psi, m, {'mixer': True, 'max_sweeps': 2,
                                         'check_overlap': False})
    with pytest.raises(NotImplementedError):
        eng.run()
    psi2 = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'],
                                  bc='infinite')
    eng2 = TwoSiteVUMPSEngine(psi2, m, {
        'mixer': 'DensityMatrixMixer', 'max_sweeps': 2,
        'check_overlap': False, 'trunc_params': {'chi_max': 8}})
    with pytest.raises(NotImplementedError):
        eng2.run()
