"""Correlation length of the gapped XXZ chain from the iMPS transfer matrix.

iDMRG on the Neel-gapped XXZ chain (Jz > 1); the correlation length from the
second transfer-matrix eigenvalue converges quickly with chi and is compared
against the decay of <Sz_0 Sz_r> connected correlations.  Reference analogue:
``examples/advanced/xxz_corr_length.py``.
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.xxz_chain import XXZChain
from tenpy_tpu.algorithms import dmrg


def run(Jz=4.0, chi=32):
    m = XXZChain({'L': 2, 'Jxx': 1., 'Jz': Jz, 'hz': 0.,
                  'bc_MPS': 'infinite'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'],
                                 bc='infinite')
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-12},
        'mixer': True, 'max_E_err': 1e-12, 'max_sweeps': 40})
    E, _ = eng.run()
    xi = float(psi.correlation_length())
    print(f"Jz={Jz}: E/site={E:.10f} xi={xi:.4f} (in sites)")

    # cross-check: fit exp decay of connected <Sz Sz> correlations
    r = np.arange(2, 16)
    C = psi.correlation_function('Sz', 'Sz', sites1=[0], sites2=r)[0]
    Sz = psi.expectation_value('Sz')
    conn = np.abs(C - Sz[0] * Sz[r % 2])
    # staggered correlations: fit |C(r)| ~ exp(-r/xi)
    slope = np.polyfit(r, np.log(conn), 1)[0]
    xi_fit = -1. / slope
    print(f"xi from correlation fit: {xi_fit:.4f}")
    return xi, xi_fit


if __name__ == '__main__':
    xi, xi_fit = run()
    assert abs(xi - xi_fit) / xi < 0.2, (xi, xi_fit)
