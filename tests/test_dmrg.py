"""DMRG tests: analytic TFI energy, ED cross-checks, charge conservation, excitations.

Mirrors the reference test strategy (``tests/test_dmrg.py``).
"""
import numpy as np
import pytest

from tenpy_tpu.networks.site import SpinHalfSite
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.mpo import MPOGraph
from tenpy_tpu.networks.terms import OnsiteTerms, CouplingTerms
from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.algorithms.dmrg import TwoSiteDMRGEngine, SingleSiteDMRGEngine
from tenpy_tpu.algorithms.exact_diag import ExactDiag


def e0_tfi_finite(L, J, g):
    """Exact TFI open-chain ground energy from free fermions."""
    A = np.zeros((L, L))
    B = np.zeros((L, L))
    for i in range(L):
        A[i, i] = -2. * g
    for i in range(L - 1):
        A[i, i + 1] = A[i + 1, i] = -J
        B[i, i + 1] = -J
        B[i + 1, i] = J
    return -0.5 * np.sum(np.sqrt(np.abs(np.linalg.eigvalsh((A - B) @ (A + B)))))


class FakeModel:
    """Minimal model wrapper: lattice stub + H_MPO."""

    def __init__(self, sites, H):
        L = len(sites)

        class _Lat:
            bc_MPS = H.bc if H.bc != 'segment' else 'finite'
            dim = 1
            Ls = [L]
            unit_cell = [sites[0]]

            def mps_sites(self):
                return sites

        self.lat = _Lat()
        self.H_MPO = H


def tfi_model(L, J=1., g=1.5, bc='finite'):
    site = SpinHalfSite('parity')
    sites = [site] * L
    ot = OnsiteTerms(L)
    ct = CouplingTerms(L)
    for i in range(L):
        ot.add_onsite_term(-g, i, 'Sigmaz')
    n_bonds = L - 1 if bc == 'finite' else L
    for i in range(n_bonds):
        ct.add_coupling_term(-J, i, i + 1, 'Sigmax', 'Sigmax')
    H = MPOGraph.from_terms([ot, ct], sites, bc).build_MPO()
    return sites, H


def heisenberg_model(L, J=1., bc='finite'):
    site = SpinHalfSite('Sz')
    sites = [site] * L
    ct = CouplingTerms(L)
    n_bonds = L - 1 if bc == 'finite' else L
    for i in range(n_bonds):
        ct.add_coupling_term(J, i, i + 1, 'Sz', 'Sz')
        ct.add_coupling_term(J / 2., i, i + 1, 'Sp', 'Sm')
        ct.add_coupling_term(J / 2., i, i + 1, 'Sm', 'Sp')
    H = MPOGraph.from_terms([ct], sites, bc).build_MPO()
    return sites, H


@pytest.mark.parametrize('combine', [False, True])
def test_dmrg_tfi_analytic(combine):
    L = 16
    sites, H = tfi_model(L)
    psi = MPS.from_product_state(sites, ['up'] * L)
    info = dmrg.run(psi, FakeModel(sites, H), {
        'trunc_params': {'chi_max': 32, 'svd_min': 1e-13},
        'max_E_err': 1e-12, 'max_sweeps': 30, 'combine': combine, 'mixer': False})
    assert abs(info['E'] - e0_tfi_finite(L, 1., 1.5)) < 1e-10


def test_dmrg_vs_ed():
    L = 8
    sites, H = heisenberg_model(L)
    ed = ExactDiag.from_H_mpo(H, charge_sector=[0])
    ed.full_diagonalization()
    E_exact, _ = ed.groundstate()
    psi = MPS.from_product_state(sites, ['up', 'down'] * (L // 2))
    info = dmrg.run(psi, FakeModel(sites, H), {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-14},
        'max_E_err': 1e-12, 'max_sweeps': 30, 'mixer': False})
    assert abs(info['E'] - E_exact) < 1e-10
    # Sz conservation: total charge preserved
    assert np.allclose(psi.expectation_value('Sz').sum(), 0., atol=1e-8)


def test_dmrg_mixer():
    """Two-site DMRG with DensityMatrixMixer converges for Heisenberg."""
    L = 10
    sites, H = heisenberg_model(L)
    ed = ExactDiag.from_H_mpo(H, charge_sector=[0])
    ed.full_diagonalization()
    E_exact, _ = ed.groundstate()
    psi = MPS.from_product_state(sites, ['up', 'down'] * (L // 2))
    info = dmrg.run(psi, FakeModel(sites, H), {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-14},
        'max_E_err': 1e-12, 'max_sweeps': 40, 'mixer': True,
        'mixer_params': {'amplitude': 1e-6, 'decay': 1.5, 'disable_after': 5}})
    assert abs(info['E'] - E_exact) < 1e-8


def test_single_site_dmrg():
    """1-site DMRG at fixed chi (starting from a random chi-grown state)."""
    L = 10
    sites, H = heisenberg_model(L)
    ed = ExactDiag.from_H_mpo(H, charge_sector=[0])
    ed.full_diagonalization()
    E_exact, _ = ed.groundstate()
    psi = MPS.from_desired_bond_dimension(sites, 32, seed=7,
                                          p_state=['up', 'down'] * (L // 2))
    info = dmrg.run(psi, FakeModel(sites, H), {
        'active_sites': 1, 'mixer': False,
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-14},
        'max_E_err': 1e-12, 'max_sweeps': 50})
    assert abs(info['E'] - E_exact) < 1e-6


def test_single_site_dmrg_mixer_growth():
    """1-site DMRG growing chi from a product state via subspace expansion."""
    L = 10
    sites, H = heisenberg_model(L)
    ed = ExactDiag.from_H_mpo(H, charge_sector=[0])
    ed.full_diagonalization()
    E_exact, _ = ed.groundstate()
    psi = MPS.from_product_state(sites, ['up', 'down'] * (L // 2))
    info = dmrg.run(psi, FakeModel(sites, H), {
        'active_sites': 1,
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-14},
        'max_E_err': 1e-12, 'max_sweeps': 20,
        'mixer_params': {'amplitude': 1e-5, 'decay': 1.2, 'disable_after': 10}})
    assert abs(info['E'] - E_exact) < 1e-6


def test_dmrg_excited_states():
    """Orthogonal-projection excited states match ED."""
    L = 8
    sites, H = heisenberg_model(L)
    ed = ExactDiag.from_H_mpo(H, charge_sector=[0])
    ed.full_diagonalization()
    E_levels = np.sort(ed.E)[:2]
    model = FakeModel(sites, H)
    options = {'trunc_params': {'chi_max': 64, 'svd_min': 1e-14},
               'max_E_err': 1e-12, 'max_sweeps': 40, 'mixer': False}
    psi0 = MPS.from_product_state(sites, ['up', 'down'] * (L // 2))
    eng0 = TwoSiteDMRGEngine(psi0, model, options)
    E0, _ = eng0.run()
    psi1 = MPS.from_product_state(sites, ['down', 'up'] * (L // 2))
    eng1 = TwoSiteDMRGEngine(psi1, model, dict(options), orthogonal_to=[psi0])
    E1, _ = eng1.run()
    assert abs(E0 - E_levels[0]) < 1e-8
    assert abs(E1 - E_levels[1]) < 1e-6
    assert abs(psi0.overlap(psi1)) < 1e-5


def test_idmrg_tfi():
    """Infinite DMRG on the TFI chain reproduces the thermodynamic energy density."""
    # e0(g) = -integral; for g=1.5: e = -1/(2 pi) int_0^pi 2*sqrt(1+g^2-2g cos k) dk
    import scipy.integrate
    g = 1.5
    e_exact = -scipy.integrate.quad(
        lambda k: np.sqrt(1. + g ** 2 - 2. * g * np.cos(k)) / np.pi, 0, np.pi)[0]
    sites, H = tfi_model(2, 1., g, bc='infinite')
    psi = MPS.from_product_state(sites, ['up', 'up'], bc='infinite')
    info = dmrg.run(psi, FakeModel(sites, H), {
        'trunc_params': {'chi_max': 32, 'svd_min': 1e-14},
        'max_E_err': 1e-12, 'max_sweeps': 60, 'N_sweeps_check': 5,
        'mixer': False, 'update_env': 2})
    assert abs(info['E'] - e_exact) < 1e-8, (info['E'], e_exact)
