"""TopologicalExcitations: domain-wall states between two symmetry-broken GS.

Physics check: the ferromagnetic TFI chain (g < J) has two Z2-broken ground
states; gluing |...up up...> to |...down down...> across a segment hosts a
single kink whose relaxed energy approaches the exact single-kink gap
``2(J - g)`` (kink dispersion ``eps(k) = 2 sqrt(J^2 + g^2 - 2 J g cos k)``,
minimum at k=0).  Reference: ``tenpy/simulations/ground_state_search.py:647``.
"""
import numpy as np
import pytest

from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.simulations.ground_state_search import TopologicalExcitations


@pytest.mark.slow
def test_topological_excitations_tfi_kink():
    J, g = 1., 0.4
    model_params = {'L': 2, 'J': J, 'g': g, 'bc_MPS': 'infinite',
                    'conserve': None}
    m = TFIChain(dict(model_params))
    gs = []
    s2 = 1. / np.sqrt(2.)
    for vec in ([s2, s2], [s2, -s2]):     # +-X polarized
        psi = MPS.from_product_state(m.lat.mps_sites(), [np.asarray(vec)] * 2,
                                     bc='infinite')
        # no mixer: it mixes the two broken sectors back into the cat state
        eng = dmrg.TwoSiteDMRGEngine(psi, m, {
            'trunc_params': {'chi_max': 24, 'svd_min': 1e-12},
            'max_sweeps': 30})
        E, _ = eng.run()
        gs.append(psi)
    # the two broken ground states must be degenerate and distinct
    assert abs(float(np.real(gs[0].expectation_value('Sigmax')[0]))
               + float(np.real(gs[1].expectation_value('Sigmax')[0]))) < 1e-6
    assert float(np.real(gs[0].expectation_value('Sigmax')[0])) > 0.5

    sim_params = {
        'model_class': 'TFIChain',
        'model_params': model_params,
        'segment_enlarge': 6,
        'N_excitations': 1,
        'save_psi': False,
        'algorithm_params': {
            'trunc_params': {'chi_max': 32, 'svd_min': 1e-10},
            'max_sweeps': 20, 'N_sweeps_check': 2},
    }
    sim = TopologicalExcitations(sim_params, gs_data_alpha=gs[0],
                                 gs_data_beta=gs[1])
    results = sim.run()
    E_kink = results['excitation_energies'][0]
    # exact single-kink gap
    E_exact = 2. * (J - g)
    assert abs(E_kink - E_exact) < 0.05 * E_exact
