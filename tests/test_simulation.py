"""Simulation-layer tests: full config-driven runs, checkpoint/resume, CLI, seq runs.

Mirrors reference tests/test_simulation.py.
"""
import os
import numpy as np
import pytest

from tenpy_tpu.simulations.simulation import (run_simulation, resume_from_checkpoint,
                                              run_seq_simulations, GroundStateSearch,
                                              RealTimeEvolution)
from tenpy_tpu.tools import io as tio


GS_PARAMS = {
    'model_class': 'XXZChain',
    'model_params': {'L': 8, 'Jxx': 1., 'Jz': 1., 'bc_MPS': 'finite'},
    'initial_state_params': {'method': 'lat_product_state',
                             'product_state': [['up'], ['down']]},
    'algorithm_class': 'TwoSiteDMRGEngine',
    'algorithm_params': {'trunc_params': {'chi_max': 32, 'svd_min': 1e-12},
                         'max_E_err': 1e-10, 'mixer': False},
}


def test_ground_state_search(tmp_path):
    params = dict(GS_PARAMS)
    params['output_filename'] = str(tmp_path / 'gs.pkl')
    results = run_simulation(simulation_class='GroundStateSearch', **params)
    assert results['finished_run']
    # Heisenberg L=8 ground state energy
    from tenpy_tpu.algorithms.exact_diag import ExactDiag
    from tenpy_tpu.models.xxz_chain import XXZChain
    m = XXZChain(dict(GS_PARAMS['model_params']))
    ed = ExactDiag(m, charge_sector=[0])
    ed.full_diagonalization()
    E_exact, _ = ed.groundstate()
    assert abs(results['energy'] - E_exact) < 1e-8
    # saved file loads and contains psi + measurements
    data = tio.load(params['output_filename'])
    assert 'psi' in data
    assert 'max_chi' in data['measurements']


def test_real_time_evolution():
    params = {
        'model_class': 'XXZChain',
        'model_params': {'L': 6, 'Jxx': 1., 'Jz': 0.5, 'bc_MPS': 'finite'},
        'initial_state_params': {'method': 'lat_product_state',
                                 'product_state': [['up'], ['down']]},
        'algorithm_class': 'TEBDEngine',
        'algorithm_params': {'dt': 0.05, 'N_steps': 2, 'order': 2,
                             'trunc_params': {'chi_max': 32, 'svd_min': 1e-12}},
        'final_time': 0.3,
        'connect_measurements': [
            ('tenpy_tpu.simulations.measurement', 'm_onsite_expectation_value',
             {'opname': 'Sz'})],
    }
    results = run_simulation(simulation_class='RealTimeEvolution', **params)
    meas = results['measurements']
    assert len(meas['evolved_time']) >= 3
    assert abs(meas['evolved_time'][-1] - 0.3) < 1e-10
    sz = np.asarray(meas['<Sz>'])
    # total Sz conserved over time
    assert np.allclose(sz.sum(axis=1), 0., atol=1e-10)


def test_checkpoint_resume(tmp_path):
    fn = str(tmp_path / 'ckpt.pkl')
    params = dict(GS_PARAMS)
    params['output_filename'] = fn
    params['algorithm_params'] = dict(params['algorithm_params'], max_sweeps=2,
                                      min_sweeps=2, max_E_err=1e-16)
    res1 = run_simulation(simulation_class='GroundStateSearch', **params)
    assert os.path.exists(fn)
    # resume with more sweeps allowed
    res2 = resume_from_checkpoint(
        filename=fn,
        update_sim_params={'algorithm_params.max_sweeps': 20,
                           'algorithm_params.max_E_err': 1e-10})
    assert res2['finished_run']


def test_seq_simulations(tmp_path):
    params = dict(GS_PARAMS)
    params['algorithm_params'] = dict(params['algorithm_params'], max_sweeps=10)
    results = run_seq_simulations(
        {'recursive_keys': ['model_params.Jz'], 'value_lists': [[0.5, 1.0]]},
        simulation_class='GroundStateSearch', **params)
    assert len(results) == 2


def test_cli(tmp_path):
    import yaml
    import tenpy_tpu
    fn_yaml = tmp_path / 'params.yml'
    fn_out = str(tmp_path / 'cli_out.pkl')
    params = dict(GS_PARAMS)
    params['simulation_class'] = 'GroundStateSearch'
    params['output_filename'] = fn_out
    with open(fn_yaml, 'w') as f:
        yaml.safe_dump(params, f)
    ret = tenpy_tpu.console_main([str(fn_yaml), '-o',
                                  'algorithm_params.trunc_params.chi_max=16'])
    assert ret == 0
    data = tio.load(fn_out)
    assert data['finished_run']
    assert data['simulation_parameters']['algorithm_params']['trunc_params'][
        'chi_max'] == 16
