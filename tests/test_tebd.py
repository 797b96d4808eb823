"""TEBD tests: imaginary-time GS vs ED, real-time evolution vs exact exp(-iHt)."""
import numpy as np
import pytest

from tenpy_tpu.networks.site import SpinHalfSite
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.mpo import MPOGraph
from tenpy_tpu.networks.terms import OnsiteTerms, CouplingTerms
from tenpy_tpu.algorithms.tebd import TEBDEngine, QRBasedTEBDEngine, RandomUnitaryEvolution
from tenpy_tpu.algorithms.exact_diag import ExactDiag
from tenpy_tpu.linalg import np_conserved as npc


class BondModel:
    """Minimal NearestNeighbor-style model: H_bond[i] acts on (i-1, i)."""

    def __init__(self, sites, H_bond, H_MPO=None):
        self.H_bond = H_bond
        self.H_MPO = H_MPO
        L = len(sites)

        class _Lat:
            bc_MPS = 'finite'
            dim = 1
            Ls = [L]
            unit_cell = [sites[0]]

            def mps_sites(self):
                return sites

        self.lat = _Lat()


def xxz_bond_model(L, Jz=1., bc='finite'):
    """XXZ chain with Sz conservation: H_bond list + MPO (for ED cross-check)."""
    site = SpinHalfSite('Sz')
    sites = [site] * L
    ct = CouplingTerms(L)
    n_b = L - 1 if bc == 'finite' else L
    for i in range(n_b):
        ct.add_coupling_term(0.5, i, i + 1, 'Sp', 'Sm')
        ct.add_coupling_term(0.5, i, i + 1, 'Sm', 'Sp')
        ct.add_coupling_term(Jz, i, i + 1, 'Sz', 'Sz')
    H_bond = ct.to_nn_bond_Arrays(sites)
    H = MPOGraph.from_terms([ct], sites, bc).build_MPO()
    m = BondModel(sites, H_bond, H)
    m.lat.bc_MPS = bc
    return sites, m


def tfi_bond_model(L, J=1., g=1.5, bc='finite'):
    site = SpinHalfSite('parity')
    sites = [site] * L
    ot = OnsiteTerms(L)
    ct = CouplingTerms(L)
    for i in range(L):
        ot.add_onsite_term(-g, i, 'Sigmaz')
    n_b = L - 1 if bc == 'finite' else L
    for i in range(n_b):
        ct.add_coupling_term(-J, i, i + 1, 'Sigmax', 'Sigmax')
    H_bond = ct.to_nn_bond_Arrays(sites)
    H_bond = ot.add_to_nn_bond_Arrays(H_bond, sites, bc == 'finite')
    H = MPOGraph.from_terms([ot, ct], sites, bc).build_MPO()
    m = BondModel(sites, H_bond, H)
    m.lat.bc_MPS = bc
    return sites, m


def test_tebd_imaginary_gs():
    """Imaginary-time TEBD finds the TFI ground state (vs ED)."""
    L = 8
    sites, model = tfi_bond_model(L)
    ed = ExactDiag.from_H_mpo(model.H_MPO)
    ed.full_diagonalization()
    E_exact, _ = ed.groundstate()
    psi = MPS.from_product_state(sites, ['up'] * L)
    eng = TEBDEngine(psi, model, {
        'trunc_params': {'chi_max': 32, 'svd_min': 1e-13},
        'delta_tau_list': [0.1, 0.01, 0.001, 1e-4], 'N_steps': 20,
        'max_error_E': 1e-10})
    eng.run_GS()
    from tenpy_tpu.networks.mpo import MPOEnvironment
    E = np.real(MPOEnvironment(psi, model.H_MPO, psi).full_contraction(0))
    # remaining error is the O(dtau^2) Trotter error of the last ramp stage
    assert abs(E - E_exact) < 1e-5


@pytest.mark.parametrize('order', [1, 2, 4])
def test_tebd_real_time(order):
    """Real-time TEBD matches exact exp(-iHt) on a small XXZ chain."""
    L = 6
    t_final = 0.4
    sites, model = xxz_bond_model(L)
    ed = ExactDiag.from_H_mpo(model.H_MPO)
    ed.full_diagonalization()
    psi = MPS.from_product_state(sites, ['up', 'down'] * (L // 2))
    psi0_vec = ed.mps_to_full(psi)
    dt = 0.05
    eng = TEBDEngine(psi, model, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-14},
        'order': order, 'dt': dt, 'N_steps': int(round(t_final / dt)),
        'preserve_norm': True})
    eng.run()
    # exact evolution
    U = ed.exp_H(t_final)
    psi_t_exact = np.asarray(U.to_ndarray()) @ psi0_vec
    psi_t = ed.mps_to_full(psi)
    ov = np.abs(np.vdot(psi_t_exact, psi_t))
    tol = {1: 1e-2, 2: 1e-4, 4: 1e-6}[order]
    assert abs(1. - ov) < tol, (order, ov)


def test_itebd_gs():
    """Infinite imaginary-time TEBD: TFI thermodynamic energy density."""
    import scipy.integrate
    g = 1.5
    e_exact = -scipy.integrate.quad(
        lambda k: np.sqrt(1. + g ** 2 - 2. * g * np.cos(k)) / np.pi, 0, np.pi)[0]
    sites, model = tfi_bond_model(2, 1., g, bc='infinite')
    psi = MPS.from_product_state(sites, ['up', 'up'], bc='infinite')
    eng = TEBDEngine(psi, model, {
        'trunc_params': {'chi_max': 24, 'svd_min': 1e-14},
        'delta_tau_list': [0.1, 0.01, 0.001, 1e-4], 'N_steps': 30,
        'max_error_E': 1e-10})
    eng.run_GS()
    E = np.mean(eng.bond_energies())
    assert abs(E - e_exact) < 1e-5, (E, e_exact)


def test_qr_based_tebd():
    L = 6
    sites, model = xxz_bond_model(L)
    ed = ExactDiag.from_H_mpo(model.H_MPO)
    ed.full_diagonalization()
    psi = MPS.from_product_state(sites, ['up', 'down'] * (L // 2))
    psi0_vec = ed.mps_to_full(psi)
    t_final, dt = 0.2, 0.05
    eng = QRBasedTEBDEngine(psi, model, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-14},
        'order': 2, 'dt': dt, 'N_steps': int(round(t_final / dt))})
    eng.run()
    U = ed.exp_H(t_final)
    psi_t_exact = np.asarray(U.to_ndarray()) @ psi0_vec
    ov = np.abs(np.vdot(psi_t_exact, ed.mps_to_full(psi)))
    assert abs(1. - ov) < 1e-4


def test_random_unitary_evolution():
    L = 6
    site = SpinHalfSite('Sz')
    psi = MPS.from_product_state([site] * L, ['up', 'down'] * (L // 2))
    eng = RandomUnitaryEvolution(psi, {'N_steps': 3,
                                       'trunc_params': {'chi_max': 8,
                                                        'svd_min': 1e-14}})
    eng.run()
    assert max(psi.chi) > 1
    assert abs(psi.overlap(psi) - 1.) < 1e-10
    # total Sz still conserved (charge-conserving unitaries)
    assert abs(psi.expectation_value('Sz').sum()) < 1e-10
