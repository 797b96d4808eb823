"""ExpMPO (W_I / W_II) evolution tests vs exact evolution."""
import numpy as np
import pytest

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms.mpo_evolution import ExpMPOEvolution
from tenpy_tpu.algorithms.exact_diag import ExactDiag
from tenpy_tpu.models.xxz_chain import XXZChain


@pytest.mark.parametrize('approximation, order, tol', [
    ('I', 1, 5e-2), ('II', 1, 5e-3), ('II', 2, 1e-4)])
def test_expmpo_evolution(approximation, order, tol):
    L = 6
    t_final, dt = 0.3, 0.05
    m = XXZChain({'L': L, 'Jxx': 1., 'Jz': 0.8})
    ed = ExactDiag(m)
    ed.full_diagonalization()
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'] * (L // 2))
    psi0_vec = ed.mps_to_full(psi)
    eng = ExpMPOEvolution(psi, m, {
        'dt': dt, 'N_steps': int(round(t_final / dt)),
        'approximation': approximation, 'order': order,
        'compression_method': 'zip_up',
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-13}})
    eng.run()
    U = ed.exp_H(t_final)
    exact = np.asarray(U.to_ndarray()) @ psi0_vec
    got = ed.mps_to_full(psi)
    ov = abs(np.vdot(exact, got)) / (np.linalg.norm(exact) * np.linalg.norm(got))
    assert abs(1. - ov) < tol, (approximation, order, ov)
