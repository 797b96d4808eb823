"""Order parameter across the transverse-field Ising transition (iDMRG).

Sweep the field g through the critical point g=1: the ferromagnetic order
parameter vanishes for g > 1 while the entanglement entropy peaks at
criticality.  The order parameter is taken from the long-distance correlator
m = sqrt(<Sx_0 Sx_r>) — robust even when iDMRG converges to the symmetric
cat state where <Sx> itself averages to zero (the reference example
measures the SxSx correlator for the same reason,
``examples/advanced/tfi_phase_transition.py``).
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.algorithms import dmrg


def run(gs=(0.5, 0.8, 1.0, 1.2, 1.5), chi=24):
    # conserve=None so <Sx> != 0 is representable (symmetry breaking)
    m = TFIChain({'L': 2, 'J': 1., 'g': gs[0], 'bc_MPS': 'infinite',
                  'conserve': None})
    # x-polarized initial state (H = -J sx sx - g sz orders along x); passed
    # as explicit local vectors since SpinHalfSite only labels the z basis
    xpol = np.array([1., 1.]) / np.sqrt(2.)
    psi = MPS.from_product_state(m.lat.mps_sites(), [xpol, xpol],
                                 bc='infinite')
    results = []
    for g in gs:
        m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                      'conserve': None})
        eng = dmrg.TwoSiteDMRGEngine(psi, m, {
            'trunc_params': {'chi_max': chi, 'svd_min': 1e-10},
            'mixer': True, 'max_E_err': 1e-10, 'max_sweeps': 30})
        E, _ = eng.run()
        # order parameter from long-range order: <Sx_0 Sx_r> -> m^2 for r >> xi
        C = psi.correlation_function('Sx', 'Sx', sites1=[0], sites2=[12])[0, 0]
        mx = float(np.sqrt(np.abs(C)))
        S = float(np.mean(psi.entanglement_entropy()))
        results.append((g, E, mx, S))
        print(f"g={g:4.2f}: E={E:.8f}  |<Sx>|={mx:.4f}  S={S:.4f}")
    return results


if __name__ == '__main__':
    res = run()
    mx = {g: m for g, _, m, _ in res}
    assert mx[0.5] > 0.4          # deep ferromagnet: ordered
    assert mx[1.5] < 0.1          # deep paramagnet: disordered
