"""OrthogonalExcitations / PlaneWaveExcitations simulation drivers."""
import numpy as np

from tenpy_tpu.simulations.ground_state_search import (OrthogonalExcitations,
                                                       PlaneWaveExcitations)
from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.algorithms.exact_diag import ExactDiag
from tenpy_tpu.algorithms.vumps import SingleSiteVUMPSEngine


def test_orthogonal_excitations():
    L, g = 8, 1.5
    m = TFIChain({'L': L, 'J': 1., 'g': g, 'bc_MPS': 'finite', 'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up'] * L, bc='finite')
    info = dmrg.run(psi, m, {'trunc_params': {'chi_max': 32, 'svd_min': 1e-12},
                             'max_sweeps': 15})
    ed = ExactDiag.from_H_mpo(m.H_MPO)
    ed.build_full_H_from_mpo()
    w = np.linalg.eigvalsh(np.asarray(ed.full_H.to_ndarray()))
    sim = OrthogonalExcitations(
        {'model_class': 'TFIChain',
         'model_params': {'L': L, 'J': 1., 'g': g, 'bc_MPS': 'finite',
                          'conserve': None},
         'algorithm_class': 'TwoSiteDMRGEngine',
         'algorithm_params': {'trunc_params': {'chi_max': 32,
                                               'svd_min': 1e-12},
                              'max_sweeps': 20, 'min_sweeps': 6},
         'N_excitations': 2, 'save_psi': False, 'output_filename': None,
         'ground_state_energy': info['E']},
        ground_state_data=psi)
    with sim:
        res = sim.run()
    gaps = res['excitation_energies']
    assert abs(gaps[0] - (w[1] - w[0])) < 1e-6
    assert abs(gaps[1] - (w[2] - w[0])) < 1e-6


def test_excitation_initial_state_builder():
    """ExcitationInitialState dispatch: use_highest_excitation switches the
    perturbation seed, and a custom randomize_params config is honored."""
    from tenpy_tpu.simulations.ground_state_search import ExcitationInitialState
    L, g = 6, 1.5
    m = TFIChain({'L': L, 'J': 1., 'g': g, 'bc_MPS': 'finite', 'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up'] * L, bc='finite')
    info = dmrg.run(psi, m, {'trunc_params': {'chi_max': 16, 'svd_min': 1e-12},
                             'max_sweeps': 10})
    sim = OrthogonalExcitations(
        {'model_class': 'TFIChain',
         'model_params': {'L': L, 'J': 1., 'g': g, 'bc_MPS': 'finite',
                          'conserve': None},
         'algorithm_class': 'TwoSiteDMRGEngine',
         'algorithm_params': {'trunc_params': {'chi_max': 16,
                                               'svd_min': 1e-12},
                              'max_sweeps': 15, 'min_sweeps': 4},
         'N_excitations': 1, 'save_psi': False, 'output_filename': None,
         'initial_state_params': {'randomize_params': {'N_steps': 3},
                                  'use_highest_excitation': False},
         'ground_state_energy': info['E']},
        ground_state_data=psi)
    with sim:
        res = sim.run()
    ed = ExactDiag.from_H_mpo(m.H_MPO)
    ed.build_full_H_from_mpo()
    w = np.linalg.eigvalsh(np.asarray(ed.full_H.to_ndarray()))
    assert abs(res['excitation_energies'][0] - (w[1] - w[0])) < 1e-6
    # direct builder use: perturbed copy differs from but stays close to seed
    sim.options['initial_state_params'] = {}
    builder = ExcitationInitialState(
        sim, {'use_highest_excitation': False,
              'randomize_params': {'N_steps': 1}})
    psi_guess = builder.run()
    ov = abs(psi_guess.overlap(sim.ground_state))
    assert 0.5 < ov < 1.0 - 1e-12


def test_plane_wave_excitations_driver():
    g = 1.5
    m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                  'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 12, 'svd_min': 1e-10},
                      'max_sweeps': 10, 'mixer': True})
    eng = SingleSiteVUMPSEngine(psi, m, {'max_sweeps': 30, 'max_E_err': 1e-13,
                                         'max_split_err': 1e-9,
                                         'check_overlap': False})
    E0, psi_gs = eng.run()
    sim = PlaneWaveExcitations(
        {'model_class': 'TFIChain',
         'model_params': {'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                          'conserve': None},
         'algorithm_params': {'lanczos_params': {'N_max': 40}},
         'momenta': [0., np.pi / 2], 'save_psi': False,
         'output_filename': None},
        ground_state_data=eng.psi)  # pass the converged UniformMPS
    with sim:
        res = sim.run()
    def eps(k):
        return 2 * np.sqrt(1 + g ** 2 - 2 * g * np.cos(k))
    for p, Es in zip(res['momenta'], res['excitation_energies']):
        expect = min(eps(p), eps(p + np.pi))
        assert abs(Es[0] - expect) < 1e-7, (p, Es, expect)
