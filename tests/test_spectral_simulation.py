"""TimeDependentCorrelation / SpectralSimulation vs exact ED dynamics."""
import numpy as np
import pytest

from tenpy_tpu.simulations import run_simulation
from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.algorithms.exact_diag import ExactDiag


@pytest.fixture(scope='module')
def tfi_gs_data():
    L, g = 6, 1.2
    m = TFIChain({'L': L, 'J': 1., 'g': g, 'bc_MPS': 'finite',
                  'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up'] * L, bc='finite')
    info = dmrg.run(psi, m, {'trunc_params': {'chi_max': 32,
                                              'svd_min': 1e-12},
                             'max_sweeps': 20})
    return m, psi, info['E']


def exact_correlation(m, psi, E0, op0_name, opt_name, i0, times):
    """C_j(t) = e^{iE0 t} <psi| op_j e^{-iHt} op_{i0} |psi> via ED."""
    ed = ExactDiag.from_H_mpo(m.H_MPO)
    ed.build_full_H_from_mpo()
    H = np.asarray(ed.full_H.to_ndarray())
    w, v = np.linalg.eigh(H)
    psi_vec = ed.mps_to_full(psi)
    L = psi.L
    import functools

    def full_op(op, i):
        mat = np.asarray(psi.sites[i].get_op(op).to_ndarray())
        ops = [np.eye(2)] * L
        ops[i] = mat
        return functools.reduce(np.kron, ops)

    phi0 = full_op(op0_name, i0) @ psi_vec
    res = []
    for t in times:
        U = v @ np.diag(np.exp(-1j * w * t)) @ v.conj().T
        phi_t = U @ phi0
        row = [np.exp(1j * E0 * t) * np.vdot(psi_vec, full_op(opt_name, j)
                                             @ phi_t) for j in range(L)]
        res.append(row)
    return np.array(res)


def test_time_dependent_correlation(tfi_gs_data):
    m, psi, E0 = tfi_gs_data
    L = psi.L
    dt, n_steps, final_time = 0.05, 2, 0.5
    results = run_simulation(
        simulation_class='TimeDependentCorrelation',
        model_class='TFIChain',
        model_params={'L': L, 'J': 1., 'g': 1.2, 'bc_MPS': 'finite',
                      'conserve': None},
        algorithm_class='TEBDEngine',
        algorithm_params={'dt': dt, 'N_steps': n_steps, 'order': 4,
                          'trunc_params': {'chi_max': 64, 'svd_min': 1e-12}},
        final_time=final_time,
        ground_state_data={'psi': psi.copy(), 'energy': E0},
        operator_t='Sigmaz',
        operator_t0={'opname': 'Sigmaz', 'mps_idx': L // 2},
        save_psi=False,
        output_filename=None,
    )
    key = 'correlation_function_t_Sigmaz_Sigmaz'
    C = np.asarray(results['measurements'][key])
    times = np.asarray(results['measurements']['evolved_time'])
    C_exact = exact_correlation(m, psi, E0, 'Sigmaz', 'Sigmaz', L // 2, times)
    assert C.shape == C_exact.shape
    assert np.max(np.abs(C - C_exact)) < 1e-5, np.max(np.abs(C - C_exact))


def test_spectral_simulation(tfi_gs_data):
    m, psi, E0 = tfi_gs_data
    L = psi.L
    results = run_simulation(
        simulation_class='SpectralSimulation',
        model_class='TFIChain',
        model_params={'L': L, 'J': 1., 'g': 1.2, 'bc_MPS': 'finite',
                      'conserve': None},
        algorithm_class='TEBDEngine',
        algorithm_params={'dt': 0.05, 'N_steps': 2, 'order': 2,
                          'trunc_params': {'chi_max': 64, 'svd_min': 1e-12}},
        final_time=0.4,
        ground_state_data={'psi': psi.copy(), 'energy': E0},
        operator_t='Sigmax',
        operator_t0={'opname': 'Sigmax', 'mps_idx': L // 2},
        save_psi=False,
        output_filename=None,
    )
    pp = results.get('post_processing', {})
    assert 'spectral_function_Sigmax_Sigmax' in pp, list(pp.keys())
    S = pp['spectral_function_Sigmax_Sigmax']
    assert set(S) >= {'spectral_function', 'k', 'w'}
    arr = np.asarray(S['spectral_function'])
    assert np.sum(np.abs(arr)) > 0
    assert arr.shape[1] == L  # one momentum per site


def test_braket_evolution(tfi_gs_data):
    """Evolving bra AND ket reproduces the single-sided correlation for a
    ground state (where both agree)."""
    m, psi, E0 = tfi_gs_data
    L = psi.L
    common = dict(
        model_class='TFIChain',
        model_params={'L': L, 'J': 1., 'g': 1.2, 'bc_MPS': 'finite',
                      'conserve': None},
        algorithm_class='TEBDEngine',
        algorithm_params={'dt': 0.05, 'N_steps': 2, 'order': 4,
                          'trunc_params': {'chi_max': 64, 'svd_min': 1e-12}},
        final_time=0.3,
        operator_t='Sigmaz',
        operator_t0={'opname': 'Sigmaz', 'mps_idx': L // 2},
        save_psi=False, output_filename=None)
    res1 = run_simulation(simulation_class='TimeDependentCorrelation',
                          ground_state_data={'psi': psi.copy(), 'energy': E0},
                          **common)
    res2 = run_simulation(
        simulation_class='TimeDependentCorrelationEvolveBraKet',
        ground_state_data={'psi': psi.copy(), 'energy': E0}, **common)
    key = 'correlation_function_t_Sigmaz_Sigmaz'
    C1 = np.asarray(res1['measurements'][key])
    C2 = np.asarray(res2['measurements'][key])
    assert C1.shape == C2.shape
    assert np.max(np.abs(C1 - C2)) < 1e-6
