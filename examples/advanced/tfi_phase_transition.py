"""Order parameter across the transverse-field Ising transition (iDMRG).

Sweep the field g through the critical point g=1: the ferromagnetic order
parameter |<Sx>| vanishes for g > 1 while the entanglement entropy peaks at
criticality.  Uses sequential engine re-use so each g starts from the previous
ground state (adiabatic parameter ramp).  Reference analogue:
``examples/advanced/tfi_phase_transition.py``.
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.algorithms import dmrg


def run(gs=(0.5, 0.8, 1.0, 1.2, 1.5), chi=24):
    # conserve=None so <Sx> != 0 is representable (symmetry breaking)
    m = TFIChain({'L': 2, 'J': 1., 'g': gs[0], 'bc_MPS': 'infinite',
                  'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['right', 'right'],
                                 bc='infinite')
    results = []
    for g in gs:
        m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                      'conserve': None})
        eng = dmrg.TwoSiteDMRGEngine(psi, m, {
            'trunc_params': {'chi_max': chi, 'svd_min': 1e-10},
            'mixer': True, 'max_E_err': 1e-10, 'max_sweeps': 30})
        E, _ = eng.run()
        mx = float(np.mean(np.abs(psi.expectation_value('Sx'))))
        S = float(np.mean(psi.entanglement_entropy()))
        results.append((g, E, mx, S))
        print(f"g={g:4.2f}: E={E:.8f}  |<Sx>|={mx:.4f}  S={S:.4f}")
    return results


if __name__ == '__main__':
    res = run()
    mx = {g: m for g, _, m, _ in res}
    assert mx[0.5] > 0.4          # deep ferromagnet: ordered
    assert mx[1.5] < 0.1          # deep paramagnet: disordered
