"""Plane-wave excitations vs the exact TFI single-particle dispersion."""
import numpy as np

from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.algorithms.vumps import SingleSiteVUMPSEngine
from tenpy_tpu.algorithms.plane_wave_excitation import (
    PlaneWaveExcitationEngine, construct_orthogonal)
from tenpy_tpu.linalg import np_conserved as npc


def test_construct_orthogonal():
    site_dim_test = TFIChain({'L': 2, 'g': 1.5, 'bc_MPS': 'infinite',
                              'conserve': None})
    psi = MPS.from_product_state(site_dim_test.lat.mps_sites(), ['up', 'up'],
                                 bc='infinite')
    dmrg.run(psi, site_dim_test, {'trunc_params': {'chi_max': 8,
                                                   'svd_min': 1e-10},
                                  'max_sweeps': 8, 'mixer': True})
    AL = psi.get_B(0, 'A')
    VL = construct_orthogonal(AL)
    # VL^dag AL = 0 and VL^dag VL = 1
    ov = npc.tensordot(VL.conj(), AL, axes=[['vL*', 'p*'], ['vL', 'p']])
    assert float(npc.norm(ov)) < 1e-10
    idty = npc.tensordot(VL.conj(), VL, axes=[['vL*', 'p*'], ['vL', 'p']])
    assert float(npc.norm(idty - npc.eye_like(idty, 0))) < 1e-10


def test_tfi_dispersion():
    """Excitation energies match eps(k) = 2 sqrt(1 + g^2 - 2 g cos k), folded
    into the 2-site Brillouin zone."""
    g = 1.5
    m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                  'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 12, 'svd_min': 1e-10},
                      'max_sweeps': 10, 'mixer': True})
    eng_v = SingleSiteVUMPSEngine(psi, m, {
        'max_sweeps': 30, 'max_E_err': 1e-13, 'max_split_err': 1e-9,
        'check_overlap': False})
    E0, _ = eng_v.run()
    pwe = PlaneWaveExcitationEngine(eng_v.psi, m,
                                    {'lanczos_params': {'N_max': 40}})

    def eps_exact(k):
        return 2 * np.sqrt(1 + g ** 2 - 2 * g * np.cos(k))

    for k in [0., np.pi / 2]:
        Es, psis, N = pwe.run(k)
        # 2-site unit cell folds k and k+pi
        expect = min(eps_exact(k), eps_exact(k + np.pi))
        assert abs(float(np.real(Es[0])) - expect) < 1e-8, (k, Es[0], expect)
        assert psis[0].L == 2


def test_multi_site_plane_wave_excitations():
    """Multi-site engine: size=1 must equal the single-site engine, and the
    size=2 ansatz contains it, all matching the exact TFI dispersion."""
    from tenpy_tpu.algorithms.plane_wave_excitation import \
        MultiSitePlaneWaveExcitationEngine
    g = 1.5
    m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                  'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'],
                                 bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 16, 'svd_min': 1e-12},
                      'max_sweeps': 40, 'mixer': True})
    psi.canonical_form()

    def eps_exact(k):
        return 2 * np.sqrt(1 + g ** 2 - 2 * g * np.cos(k))

    for k in [0., np.pi / 2]:
        e1 = PlaneWaveExcitationEngine(psi, m,
                                       {'lanczos_params': {'N_max': 40}})
        E_1site = float(np.real(e1.run(k)[0][0]))
        for size in (1, 2):
            ms = MultiSitePlaneWaveExcitationEngine(
                psi, m, {'excitation_size': size,
                         'lanczos_params': {'N_max': 40}})
            Es, psis, N = ms.run(k)
            E = float(np.real(Es[0]))
            assert abs(E - E_1site) < 1e-7, (k, size, E, E_1site)
            expect = min(eps_exact(k), eps_exact(k + np.pi))
            assert abs(E - expect) < 1e-7
            assert psis[0].n_sites == size


def test_charged_magnon_haldane_gap():
    """Charge-sector excitations: the S=1 Heisenberg chain's single-magnon
    branch at k=pi (the Haldane gap, 0.41048 from white1993) in the
    qtotal_change=[2] (Sz=+1) sector, with Sz conservation on."""
    from tenpy_tpu.models.spins import SpinChain
    m = SpinChain({'S': 1, 'L': 2, 'Jx': 1., 'Jy': 1., 'Jz': 1.,
                   'bc_MPS': 'infinite', 'conserve': 'Sz'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['1.0', '-1.0'],
                                 bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 24, 'svd_min': 1e-10},
                      'max_sweeps': 14, 'mixer': True})
    eng_v = SingleSiteVUMPSEngine(psi, m, {
        'max_sweeps': 40, 'max_E_err': 1e-12, 'max_split_err': 1e-7,
        'check_overlap': False})
    eng_v.run()
    pwe = PlaneWaveExcitationEngine(eng_v.psi, m,
                                    {'lanczos_params': {'N_max': 60}})
    Es, psis, _ = pwe.run(np.pi, qtotal_change=[2])   # one magnon, Sz=+1
    gap = float(np.real(Es[0]))
    assert abs(gap - 0.41048) < 5e-3, gap
