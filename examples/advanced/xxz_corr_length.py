"""Correlation length of the gapped XXZ chain from the iMPS transfer matrix.

iDMRG on the Neel-gapped XXZ chain (Jz > 1), following the protocol of the
reference analogue ``examples/advanced/xxz_corr_length.py``: sweep Jz toward
the critical point and watch the transfer-matrix correlation length grow.

A small *staggered* pinning field selects one of the two degenerate Neel
states: without it, iDMRG can converge to the symmetric cat state, which is a
non-injective MPS with a doubly-degenerate transfer-matrix eigenvalue 1
(``correlation_length`` then warns and returns inf — long-range order has no
finite correlation length).  With the pinned (injective) state, the decay of
the connected <Sz Sz> correlations is governed by one of the leading
transfer-matrix modes, which we cross-check by fitting.
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.xxz_chain import XXZChain
from tenpy_tpu.algorithms import dmrg


def run(Jzs=(4.0, 2.5, 1.8), chi=48, h_pin=1e-2):
    psi = None
    xis = []
    for Jz in Jzs:
        m = XXZChain({'L': 2, 'Jxx': 1., 'Jz': Jz,
                      'hz': np.array([h_pin, -h_pin]),   # staggered pinning
                      'bc_MPS': 'infinite'})
        if psi is None:
            psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'],
                                         bc='infinite')
        eng = dmrg.TwoSiteDMRGEngine(psi, m, {
            'trunc_params': {'chi_max': chi, 'svd_min': 1e-12},
            'mixer': True, 'max_E_err': 1e-12, 'max_sweeps': 40})
        E, _ = eng.run()
        xi = float(psi.correlation_length())
        Sz = psi.expectation_value('Sz')
        print(f"Jz={Jz}: E/site={E:.10f} xi={xi:.4f} (sites)  <Sz>={Sz}")
        xis.append((Jz, xi, Sz))
    return psi, xis


def crosscheck_fit(psi, n_modes=8):
    """Fit the decay of connected <Sz_0 Sz_r>; must match a TM mode."""
    r = np.arange(2, 12)
    C = psi.correlation_function('Sz', 'Sz', sites1=[0], sites2=r)[0]
    Sz = psi.expectation_value('Sz')
    conn = np.abs(C - Sz[0] * Sz[r % 2])
    slope = np.polyfit(r, np.log(conn), 1)[0]
    xi_fit = -1. / slope
    xi_modes = np.atleast_1d(psi.correlation_length(target=n_modes))
    finite = xi_modes[np.isfinite(xi_modes)]
    dev = np.min(np.abs(finite - xi_fit) / np.maximum(finite, 1e-300))
    print(f"xi from correlation fit: {xi_fit:.4f}; TM modes: "
          f"{np.round(xi_modes, 3)}; best match dev={dev:.3f}")
    return xi_fit, dev


if __name__ == '__main__':
    psi, xis = run()
    # deep in the Neel phase the pinned state is magnetized ...
    assert abs(xis[0][2][0]) > 0.4, xis[0]
    # ... with a short, finite correlation length that grows toward Jz -> 1
    xi_vals = [x for _, x, _ in xis]
    assert all(np.isfinite(xi_vals)), xi_vals
    assert xi_vals[0] < xi_vals[1] < xi_vals[2], xi_vals
    # consistency: real-space correlation decay is governed by a TM mode
    xi_fit, dev = crosscheck_fit(psi)
    assert dev < 0.25, (xi_fit, dev)
