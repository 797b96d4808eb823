"""Segment boundary conditions: extraction, DMRG in infinite environments,
and OrthogonalExcitations on infinite ground states.

The segment embeds a finite window into the fixed-point environments of an
infinite MPS (reference mps.py extract_segment, dmrg in segment bc,
ground_state_search.py OrthogonalExcitations).  For the transverse-field
Ising chain the single-particle gap is exactly ``2|g - J|``, so segment
excitation energies must come out slightly above it (finite-window momentum).
"""
import numpy as np
import pytest

from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.mpo import MPOTransferMatrix, MPOEnvironment
from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.algorithms.dmrg import TwoSiteDMRGEngine


@pytest.fixture(scope='module')
def tfi_infinite_gs():
    g = 1.5
    m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                  'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'],
                                 bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 24, 'svd_min': 1e-12},
                      'max_sweeps': 40, 'mixer': True})
    return m, psi


def test_extract_segment(tfi_infinite_gs):
    m, psi = tfi_infinite_gs
    m_seg = m.extract_segment(enlarge=3)
    assert m_seg.lat.bc_MPS == 'segment'
    assert m_seg.H_MPO.bc == 'segment'
    assert m_seg.lat.segment_first_last == (0, 5)
    assert len(m_seg.lat.mps_sites()) == 6
    psi_seg = psi.extract_segment(0, 5)
    assert psi_seg.bc == 'segment' and psi_seg.finite
    # physical content unchanged
    assert np.allclose(psi_seg.expectation_value('Sigmaz'),
                       psi.expectation_value('Sigmaz')[0], atol=1e-10)


def test_segment_dmrg_keeps_ground_state(tfi_infinite_gs):
    """DMRG on the ground-state segment in its own environments is a fixed
    point: observables must not drift."""
    m, psi = tfi_infinite_gs
    env_data, Es, _ = MPOTransferMatrix.find_init_LP_RP(m.H_MPO, psi,
                                                        calc_E=True)
    m_seg = m.extract_segment(enlarge=3)
    f, l = m_seg.lat.segment_first_last
    psi_seg = psi.extract_segment(f, l)
    sz0 = psi_seg.expectation_value('Sigmaz')
    eng = TwoSiteDMRGEngine(psi_seg, m_seg,
                            {'trunc_params': {'chi_max': 24,
                                              'svd_min': 1e-12},
                             'max_sweeps': 4, 'mixer': False},
                            resume_data={'init_env_data': dict(env_data)})
    E, psi_seg = eng.run()
    assert np.max(np.abs(psi_seg.expectation_value('Sigmaz') - sz0)) < 1e-8


def test_orthogonal_excitations_infinite(tfi_infinite_gs):
    """Segment excitation energy ~ the exact TFI gap 2|g-J| (from above)."""
    from tenpy_tpu.simulations.ground_state_search import OrthogonalExcitations
    m, psi = tfi_infinite_gs
    g = 1.5
    sim = OrthogonalExcitations(
        {'N_excitations': 1,
         'model_class': 'TFIChain',
         'model_params': {'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                          'conserve': None},
         'segment_enlarge': 4,
         'apply_local_op': {'i': 4, 'op': 'Sigmax'},
         'algorithm_params': {'trunc_params': {'chi_max': 48,
                                               'svd_min': 1e-10},
                              'max_sweeps': 20, 'mixer': False},
         'save_psi': False},
        ground_state_data=psi)
    res = sim.run()
    gap = 2 * abs(g - 1.)
    E_exc = res['excitation_energies'][0]
    assert gap - 1e-6 < E_exc < gap + 0.1  # box-momentum shift is small
    assert abs(res['ground_state_energy_density'] -
               (-1.6719262215362676)) < 1e-8


def test_segment_excitation_charged_sector():
    """Excitation in a different charge sector (Delta Sz = +1): the projector
    against the ground state must recognize the orthogonality by charge
    (regression: qtotal-mismatch crash), and the energy approaches the
    spin-1 Haldane gap 0.4105 from above."""
    from tenpy_tpu.models.spins import SpinChain
    m = SpinChain({'S': 1, 'L': 2, 'Jx': 1., 'Jy': 1., 'Jz': 1.,
                   'bc_MPS': 'infinite', 'conserve': 'Sz'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'],
                                 bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 64, 'svd_min': 1e-12},
                      'max_sweeps': 60, 'mixer': True})
    env_data, Es, _ = MPOTransferMatrix.find_init_LP_RP(m.H_MPO, psi,
                                                        calc_E=True)
    assert abs(float(np.real(Es[0])) - (-1.401484039)) < 1e-5
    m_seg = m.extract_segment(enlarge=6)
    f, l = m_seg.lat.segment_first_last
    gs_seg = psi.extract_segment(f, l)
    env0 = MPOEnvironment(gs_seg, m_seg.H_MPO, gs_seg, **dict(env_data))
    E0 = float(np.real(env0.full_contraction(1)))
    guess = gs_seg.copy()
    guess.apply_local_op(6, 'Sp', unitary=False, renormalize=True)
    eng = TwoSiteDMRGEngine(guess, m_seg,
                            {'trunc_params': {'chi_max': 32,
                                              'svd_min': 1e-10},
                             'max_sweeps': 15, 'mixer': False},
                            orthogonal_to=[gs_seg],
                            resume_data={'init_env_data': dict(env_data)})
    E, psi_exc = eng.run()
    gap = E - E0
    assert 0.40 < gap < 0.55  # Haldane gap + finite-window confinement
    dq = psi_exc.get_total_charge() - gs_seg.get_total_charge()
    assert dq[0] == 2  # Sz charge counts 2*Sz


def test_segment_canonical_form_boundaries(tfi_infinite_gs):
    """Segment canonical_form keeps the embedding: boundary rotations are
    tracked in segment_boundaries and applied to the environments."""
    from tenpy_tpu.networks.mpo import MPOEnvironment, MPOTransferMatrix

    m, psi = tfi_infinite_gs
    m_seg = m.extract_segment(enlarge=3)
    first, last = m_seg.lat.segment_first_last
    psi_seg = psi.extract_segment(first, last)
    env_data, Es, _ = MPOTransferMatrix.find_init_LP_RP(m.H_MPO, psi,
                                                        calc_E=True)
    env = MPOEnvironment(psi_seg, m_seg.H_MPO, psi_seg, **env_data)
    E_before = float(np.real(env.full_contraction(1)))

    # slightly perturb a bulk tensor (non-canonical now), then re-canonicalize
    B = psi_seg.get_B(2, 'B')
    B = B + B * 1e-8
    psi_seg.set_B(2, B, form='B')
    U_L, V_R = psi_seg.canonical_form_finite(envs_to_update=[env])
    assert U_L is not None and V_R is not None
    assert psi_seg.segment_boundaries[0] is U_L
    assert float(np.max(psi_seg.norm_test())) < 1e-10
    # the environment was gauge-rotated: the energy must be unchanged
    E_after = float(np.real(env.full_contraction(1)))
    assert abs(E_after - E_before) < 1e-6 * max(1., abs(E_before))
