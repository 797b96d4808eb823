"""Fermionic Haldane model on an infinite honeycomb cylinder (iDMRG).

The half-filled Haldane model is a Chern insulator: the iDMRG ground state on
a cylinder shows (a) a gapped, chi-convergent energy and (b) a two-fold
low-lying entanglement-spectrum structure chiral per momentum sector.  This
small demo converges the state and prints the entanglement spectrum resolved
by particle-number charge.  Complex hoppings (t2 e^{i phi}) exercise the full
complex code path.  Reference analogue: ``examples/chern_insulators/haldane.py``.
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.haldane import FermionicHaldaneModel
from tenpy_tpu.algorithms import dmrg


def run(Ly=3, chi=32):
    m = FermionicHaldaneModel({'Lx': 1, 'Ly': Ly, 'bc_MPS': 'infinite',
                               'bc_y': 'cylinder', 'conserve': 'N',
                               't1': -1., 'V': 0., 'mu': 0.})
    L = m.lat.N_sites
    fill = (['full', 'empty'] * L)[:L]          # half filling
    psi = MPS.from_product_state(m.lat.mps_sites(), fill, bc='infinite')
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-10},
        'mixer': True, 'max_E_err': 1e-9, 'max_sweeps': 24})
    E, _ = eng.run()
    print(f"Haldane cylinder Ly={Ly}: E/site = {E:.8f} chi={max(psi.chi)}")
    # entanglement spectrum on the middle bond, resolved by N charge
    spec = psi.entanglement_spectrum(by_charge=True)[0]
    print("entanglement spectrum (charge, lowest levels):")
    for q, lev in spec:
        print(f"  N={q}: {np.sort(lev)[:4]}")
    n = np.mean(psi.expectation_value('N'))
    print(f"filling <N> = {n:.6f}")
    assert abs(n - 0.5) < 1e-6
    return E


if __name__ == '__main__':
    run()
