"""MPS compression engines: variational (SVD and QR-based) MPO application."""
import numpy as np

def test_qr_based_variational_apply_mpo():
    """QR-based truncation must agree with the SVD-based engine."""
    from tenpy_tpu.models.tf_ising import TFIChain
    from tenpy_tpu.networks.mps import MPS
    from tenpy_tpu.algorithms import dmrg
    from tenpy_tpu.algorithms.mps_common import (VariationalApplyMPO,
                                                 QRBasedVariationalApplyMPO)
    m = TFIChain({'L': 8, 'J': 1., 'g': 1.2, 'bc_MPS': 'finite',
                  'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up'] * 8)
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 16, 'svd_min': 1e-12},
                      'max_sweeps': 15})
    U_MPO = m.H_MPO.make_U_II(-0.05)
    a, b = psi.copy(), psi.copy()
    opts = {'trunc_params': {'chi_max': 24, 'svd_min': 1e-12}, 'N_sweeps': 2}
    VariationalApplyMPO(a, U_MPO, dict(opts)).run()
    QRBasedVariationalApplyMPO(b, U_MPO, dict(opts)).run()
    ov = abs(complex(a.overlap(b))) / abs(
        np.sqrt(complex(a.overlap(a)) * complex(b.overlap(b))))
    assert abs(ov - 1.) < 1e-10
    ea = m.H_MPO.expectation_value(a)
    eb = m.H_MPO.expectation_value(b)
    assert abs(ea - eb) < 1e-10
