"""Mixed real/momentum-space cylinder models vs their real-space equivalents.

The x-k basis is related to the real-space cylinder by an exact Fourier
transform around the circumference, so full ED spectra must agree exactly, and
(in non-degenerate sectors) DMRG expectation values measured through the
``real_to_mixed_*`` TermList helpers must match real-space correlators.
"""
import numpy as np
import pytest

from tenpy_tpu.models.mixed_xk import (MixedXKLattice, SpinlessMixedXKSquare,
                                       HubbardMixedXKSquare)
from tenpy_tpu.models.fermions_spinless import FermionModel
from tenpy_tpu.models.hubbard import FermiHubbardModel
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms.exact_diag import ExactDiag
from tenpy_tpu.algorithms import dmrg


def test_spinless_xk_spectrum_vs_real_space():
    t, V = 1.0, 0.5
    Lx, Ly = 2, 3
    mxk = SpinlessMixedXKSquare({'Lx': Lx, 'Ly': Ly, 't': t, 'V': V,
                                 'bc_MPS': 'finite', 'conserve_k': True})
    lat = mxk.lat
    assert isinstance(lat, MixedXKLattice)
    assert lat.get_u(2, 0) == 2 and lat.get_k(2) == 2 and lat.get_l(2) == 0
    ed1 = ExactDiag(mxk)
    ed1.build_full_H_from_mpo()
    ed1.full_diagonalization()
    real = FermionModel({'lattice': 'Square', 'Lx': Lx, 'Ly': Ly,
                         'bc_y': 'cylinder', 'bc_MPS': 'finite',
                         'J': t, 'V': V, 'mu': 0., 'conserve': 'N'})
    ed2 = ExactDiag(real)
    ed2.build_full_H_from_mpo()
    ed2.full_diagonalization()
    assert np.max(np.abs(np.sort(ed1.E) - np.sort(ed2.E))) < 1e-12


def test_hubbard_xk_spectrum_vs_real_space():
    t, U = 1.0, 2.5
    mxk = HubbardMixedXKSquare({'Lx': 1, 'Ly': 2, 't': t, 'U': U,
                                'bc_MPS': 'finite', 'conserve_k': True})
    ed1 = ExactDiag(mxk)
    ed1.build_full_H_from_mpo()
    ed1.full_diagonalization()
    real = FermiHubbardModel({'lattice': 'Square', 'Lx': 1, 'Ly': 2,
                              'bc_y': 'cylinder', 'bc_MPS': 'finite',
                              't': t, 'U': U})
    ed2 = ExactDiag(real)
    ed2.build_full_H_from_mpo()
    ed2.full_diagonalization()
    assert np.max(np.abs(np.sort(ed1.E) - np.sort(ed2.E))) < 1e-12


@pytest.fixture(scope='module')
def spinless_gs():
    """Unique (N=3, ky=0) ground state of the 3x3 spinless cylinder, found in
    both the x-k and the real-space basis."""
    t, V = 1.0, 0.8
    Lx, Ly = 3, 3
    mxk = SpinlessMixedXKSquare({'Lx': Lx, 'Ly': Ly, 't': t, 'V': V,
                                 'bc_MPS': 'finite', 'conserve_k': True})
    state = ['empty'] * 9
    for x, k in [(0, 0), (1, 0), (2, 0)]:
        state[int(mxk.lat.lat2mps_idx([x, k]))] = 'full'
    psi = MPS.from_product_state(mxk.lat.mps_sites(), state, bc='finite')
    info = dmrg.run(psi, mxk, {'trunc_params': {'chi_max': 128,
                                                'svd_min': 1e-12},
                               'max_sweeps': 30, 'mixer': True})
    real = FermionModel({'lattice': 'Square', 'Lx': Lx, 'Ly': Ly,
                         'bc_y': 'cylinder', 'bc_MPS': 'finite',
                         'J': t, 'V': V, 'mu': 0., 'conserve': 'N'})
    state_rs = ['full'] * 3 + ['empty'] * 6
    psi_rs = MPS.from_product_state(real.lat.mps_sites(), state_rs,
                                    bc='finite')
    info_rs = dmrg.run(psi_rs, real, {'trunc_params': {'chi_max': 128,
                                                       'svd_min': 1e-12},
                                      'max_sweeps': 30, 'mixer': True})
    return mxk, psi, info['E'], real, psi_rs, info_rs['E']


def test_xk_dmrg_needs_mixer_charge_injection(spinless_gs):
    """With ky conservation, 2-site updates alone cannot move particles
    between momenta — convergence relies on the DensityMatrixMixer injecting
    MPO-connected charge sectors (matrix-valued bond S)."""
    mxk, psi, E, real, psi_rs, E_rs = spinless_gs
    assert abs(E - E_rs) < 1e-10
    assert abs(E - (-5.515124996414)) < 1e-9  # ED value
    assert max(psi.chi) > 1  # the mixer actually grew the bond dimension
    import tenpy_tpu.linalg.np_conserved as npc
    assert not any(isinstance(s, npc.Array) for s in psi._S)
    assert np.max(psi.norm_test()) < 1e-7


def test_real_to_mixed_measurements(spinless_gs):
    mxk, psi, E, real, psi_rs, E_rs = spinless_gs
    # onsite density
    tl = mxk.real_to_mixed_onsite(np.ones((1, 1)), (1, 2))
    n_mixed, _ = psi.expectation_value_terms_sum(tl)
    n_rs = psi_rs.expectation_value('N')[int(real.lat.lat2mps_idx([1, 2, 0]))]
    assert abs(n_mixed - n_rs) < 1e-8
    # two-site density-density correlation
    tl2 = mxk.real_to_mixed_two_site(np.ones((1, 1)), (0, 0),
                                     np.ones((1, 1)), (1, 1))
    c_mixed, _ = psi.expectation_value_terms_sum(tl2)
    i0 = int(real.lat.lat2mps_idx([0, 0, 0]))
    i1 = int(real.lat.lat2mps_idx([1, 1, 0]))
    c_rs = psi_rs.correlation_function('N', 'N', [i0], [i1])[0, 0]
    assert abs(c_mixed - c_rs) < 1e-8
    # arbitrary C/Cd string
    tlc = mxk.real_to_mixed_correlations_any(['Cd', 'C'], [(1., [0, 0])],
                                             [(0, 0), (1, 1)])
    g_mixed, _ = psi.expectation_value_terms_sum(tlc)
    g_rs = psi_rs.correlation_function('Cd', 'C', [i0], [i1])[0, 0]
    assert abs(g_mixed - g_rs) < 1e-8


@pytest.mark.slow
def test_xk_infinite_idmrg_vs_real_space():
    """ky-conserving iDMRG == real-space iDMRG (the round-1 blocker).

    The failure mode was the post-mixer environment restart from trivial
    boundaries: a sharp edge next to the converged state drains ky sectors
    irreversibly (two-site updates cannot repopulate them), collapsing the
    state to a product state.  Environments are now regrown through several
    unit cells at the restart."""
    from tenpy_tpu.models.fermions_spinless import FermionModel
    from tenpy_tpu.models.mixed_xk import SpinlessMixedXKSquare

    common = {'Lx': 1, 'Ly': 2, 'bc_MPS': 'infinite', 'J': 1., 'V': 1.,
              'mu': 0.}
    dmrg_params = {'trunc_params': {'chi_max': 64, 'svd_min': 1e-12},
                   'max_sweeps': 40, 'mixer': True, 'N_sweeps_check': 4,
                   'max_E_err': 1e-12,
                   # momentum-space states need the transfer-matrix env
                   # re-seed after mixer deactivation (see mixer_deactivate)
                   'mixer_env_reseed': 'tm'}
    m_rs = FermionModel(dict(common, lattice='Square', bc_y='cylinder',
                             conserve='N'))
    L = m_rs.lat.N_sites
    psi_rs = MPS.from_product_state(m_rs.lat.mps_sites(),
                                    (['full', 'empty'] * L)[:L], bc='infinite')
    E_rs, _ = dmrg.TwoSiteDMRGEngine(psi_rs, m_rs, dict(dmrg_params)).run()

    m_xk = SpinlessMixedXKSquare(dict(common))
    psi_xk = MPS.from_product_state(m_xk.lat.mps_sites(),
                                    (['full', 'empty'] * L)[:L], bc='infinite')
    E_xk, _ = dmrg.TwoSiteDMRGEngine(psi_xk, m_xk, dict(dmrg_params)).run()
    assert abs(E_xk - E_rs) < 1e-8 * max(1., abs(E_rs)), (E_xk, E_rs)
