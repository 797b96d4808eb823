"""MPOTransferMatrix fixed points + robust infinite canonicalization."""
import numpy as np
import pytest
from scipy.integrate import quad

from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.models.xxz_chain import XXZChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.mpo import MPOTransferMatrix, MPOEnvironment
from tenpy_tpu.algorithms import dmrg


def e0_tfi_infinite(g, J=1.):
    return -J * quad(lambda k: np.sqrt(1 + (g / J) ** 2 + 2 * (g / J) * np.cos(k))
                     / (2 * np.pi), -np.pi, np.pi)[0]


@pytest.fixture(scope='module')
def tfi_gs():
    g = 1.5
    m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite', 'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 24, 'svd_min': 1e-10},
                      'max_sweeps': 30, 'mixer': True})
    return m, psi, e0_tfi_infinite(g)


def test_find_init_LP_RP_energy(tfi_gs):
    m, psi, e_exact = tfi_gs
    data, Es, E0 = MPOTransferMatrix.find_init_LP_RP(m.H_MPO, psi, calc_E=True)
    for e in Es:
        assert abs(float(np.real(e)) - e_exact) < 1e-8
    assert set(data) == {'init_LP', 'init_RP', 'age_LP', 'age_RP'}
    # environments must be usable by MPOEnvironment: full contraction is finite
    env = MPOEnvironment(psi, m.H_MPO, psi,
                         init_LP=data['init_LP'], init_RP=data['init_RP'])
    LP = env.get_LP(0, store=False)
    assert LP is not None


def test_find_init_LP_RP_u1():
    m = XXZChain({'L': 2, 'Jxx': 1., 'Jz': 1., 'hz': 0., 'bc_MPS': 'infinite'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'], bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 48, 'svd_min': 1e-10},
                      'max_sweeps': 40, 'mixer': True})
    e_heis = 0.25 - np.log(2)
    data, Es, _ = MPOTransferMatrix.find_init_LP_RP(m.H_MPO, psi, calc_E=True)
    for e in Es:
        assert abs(float(np.real(e)) - e_heis) < 2e-4  # chi=48 truncation limit


def test_canonical_form_infinite_robust():
    """Canonicalization must preserve observables even for states carrying
    Schmidt values at the numerical noise floor (regression: zeroing pinv)."""
    g = 1.5
    m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite', 'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 32, 'svd_min': 1e-12},
                      'max_sweeps': 30, 'mixer': True, 'norm_tol': np.inf})
    sz_before = psi.expectation_value('Sigmaz')
    psi.canonical_form()
    sz_after = psi.expectation_value('Sigmaz')
    assert np.allclose(sz_before, sz_after, atol=1e-6)
    assert np.linalg.norm(psi.norm_test()) < 1e-6
    # a clean TM fixed point must now exist
    _, Es, _ = MPOTransferMatrix.find_init_LP_RP(m.H_MPO, psi, calc_E=True)
    for e in Es:
        assert abs(float(np.real(e)) - e0_tfi_infinite(g)) < 1e-7


def test_svd_cutoff_truncates():
    """npc.svd(cutoff=...) drops singular values below cutoff (regression)."""
    from tenpy_tpu.linalg import np_conserved as npc
    from tenpy_tpu.linalg.charges import LegCharge, ChargeInfo
    rng = np.random.default_rng(42)
    chinfo = ChargeInfo([1])
    leg = LegCharge.from_qflat(chinfo, [0] * 4 + [1] * 4, 1)
    a = rng.normal(size=(8, 8))
    A = npc.Array.from_ndarray(a, [leg, leg.conj()], warn_wrong_sector=False)
    U, S, VH = npc.svd(A)
    cut = float(np.sort(np.asarray(S))[2]) * 1.0001
    U2, S2, VH2 = npc.svd(A, cutoff=cut)
    assert len(np.asarray(S2)) == len(np.asarray(S)) - 3
    assert np.all(np.asarray(S2) > cut)
