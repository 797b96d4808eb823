"""Chiral pi-flux square-lattice Chern insulator via the Hofstadter model.

Spinless fermions on a square cylinder with half a flux quantum per plaquette
(Hofstadter at phi = 1/2) plus a band-filling of 1/4 realize a Chern band.
The complex hopping phases exercise the complex MPO/DMRG path; the demo
converges a small infinite cylinder and prints charge-resolved entanglement.
Reference analogue: ``examples/chern_insulators/chiral_pi_flux.py``.
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.hofstadter import HofstadterFermions
from tenpy_tpu.algorithms import dmrg


def run(Ly=4, chi=24):
    m = HofstadterFermions({'Lx': 2, 'Ly': Ly, 'bc_MPS': 'infinite',
                            'bc_y': 'cylinder', 'conserve': 'N',
                            'phi': (1, 2), 'filling': (1, 4),
                            'gauge': 'landau_x'})
    L = m.lat.N_sites
    fill = (['full'] + ['empty'] * 3) * (L // 4 + 1)
    psi = MPS.from_product_state(m.lat.mps_sites(), fill[:L], bc='infinite')
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-10},
        'mixer': True, 'max_E_err': 1e-8, 'max_sweeps': 20})
    E, _ = eng.run()
    n = float(np.mean(psi.expectation_value('N')))
    print(f"pi-flux cylinder Ly={Ly}: E/site={E:.8f} <n>={n:.6f} "
          f"chi={max(psi.chi)}")
    assert abs(n - 0.25) < 1e-6
    S = psi.entanglement_entropy()
    print(f"entanglement entropy per bond: {np.round(S, 4)}")
    return E


if __name__ == '__main__':
    run()
