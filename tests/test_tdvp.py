"""TDVP tests vs exact evolution (mirrors reference test_tdvp.py strategy)."""
import numpy as np
import pytest

from tenpy_tpu.networks.site import SpinHalfSite
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.mpo import MPOGraph
from tenpy_tpu.networks.terms import CouplingTerms, OnsiteTerms
from tenpy_tpu.algorithms.tdvp import SingleSiteTDVPEngine, TwoSiteTDVPEngine
from tenpy_tpu.algorithms.exact_diag import ExactDiag


class FakeModel:
    def __init__(self, sites, H):
        self.H_MPO = H
        L = len(sites)

        class _Lat:
            bc_MPS = 'finite'
            dim = 1
            Ls = [L]
            unit_cell = [sites[0]]

            def mps_sites(self):
                return sites

        self.lat = _Lat()


def heisenberg(L):
    site = SpinHalfSite('Sz')
    sites = [site] * L
    ct = CouplingTerms(L)
    for i in range(L - 1):
        ct.add_coupling_term(0.5, i, i + 1, 'Sp', 'Sm')
        ct.add_coupling_term(0.5, i, i + 1, 'Sm', 'Sp')
        ct.add_coupling_term(1., i, i + 1, 'Sz', 'Sz')
    H = MPOGraph.from_terms([ct], sites, 'finite').build_MPO()
    return sites, H


def test_two_site_tdvp():
    L = 6
    t_final, dt = 0.4, 0.05
    sites, H = heisenberg(L)
    model = FakeModel(sites, H)
    ed = ExactDiag.from_H_mpo(H)
    ed.full_diagonalization()
    psi = MPS.from_product_state(sites, ['up', 'down'] * (L // 2))
    psi0_vec = ed.mps_to_full(psi)
    eng = TwoSiteTDVPEngine(psi, model, {
        'dt': dt, 'N_steps': int(round(t_final / dt)),
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-14}})
    eng.run()
    U = ed.exp_H(t_final)
    exact = np.asarray(U.to_ndarray()) @ psi0_vec
    got = ed.mps_to_full(psi)
    ov = abs(np.vdot(exact, got))
    assert abs(1. - ov) < 1e-6, ov
    # energy conserved
    from tenpy_tpu.networks.mpo import MPOEnvironment
    E_t = np.real(MPOEnvironment(psi, H, psi).full_contraction(0))
    E_0 = np.real(np.vdot(psi0_vec, np.asarray(ed.full_H.to_ndarray()) @ psi0_vec))
    assert abs(E_t - E_0) < 1e-8


def test_single_site_tdvp():
    """1-site TDVP (chi fixed): grow chi first, then evolve; compare to exact."""
    L = 6
    t_final, dt = 0.3, 0.05
    sites, H = heisenberg(L)
    model = FakeModel(sites, H)
    ed = ExactDiag.from_H_mpo(H)
    ed.full_diagonalization()
    psi = MPS.from_product_state(sites, ['up', 'down'] * (L // 2))
    # grow chi to max with a short 2-site TDVP segment (keeps the state exact)
    eng2 = TwoSiteTDVPEngine(psi, model, {
        'dt': dt, 'N_steps': 2,
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-14}})
    eng2.run()
    psi_ref_vec = ed.mps_to_full(psi)
    eng1 = SingleSiteTDVPEngine(psi, model, {
        'dt': dt, 'N_steps': int(round(t_final / dt))})
    eng1.run()
    U = ed.exp_H(t_final)
    exact = np.asarray(U.to_ndarray()) @ psi_ref_vec
    got = ed.mps_to_full(psi)
    ov = abs(np.vdot(exact, got)) / (np.linalg.norm(exact) * np.linalg.norm(got))
    assert abs(1. - ov) < 1e-6, ov
