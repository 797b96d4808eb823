"""Central charge of the critical transverse-field Ising chain from iDMRG.

At the critical point g=J the TFI chain is a c=1/2 CFT: the half-chain
entanglement entropy of an iMPS approximant scales as S = (c/6) log(xi) +
const with the correlation length xi induced by finite chi (calabrese-cardy
finite-entanglement scaling).  Reference analogue:
``examples/advanced/central_charge_ising.py``.
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.tools.fit import linear_fit


def run(chis=(8, 16, 24)):
    m = TFIChain({'L': 2, 'J': 1., 'g': 1., 'bc_MPS': 'infinite',
                  'conserve': 'parity'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'],
                                 bc='infinite')
    S_list, xi_list = [], []
    eng = None
    for chi in chis:
        opts = {'trunc_params': {'chi_max': chi, 'svd_min': 1e-12},
                'mixer': True, 'max_sweeps': 30, 'max_E_err': 1e-10}
        if eng is None:
            eng = dmrg.TwoSiteDMRGEngine(psi, m, opts)
        else:
            eng = dmrg.TwoSiteDMRGEngine(psi, m, opts,
                                         resume_data=eng.get_resume_data())
        eng.run()
        S = float(np.mean(psi.entanglement_entropy()))
        xi = float(psi.correlation_length())
        S_list.append(S)
        xi_list.append(xi)
        print(f"chi={chi:3d}: S={S:.6f} xi={xi:8.3f}")
    slope, const, _ = linear_fit(np.log(xi_list), np.array(S_list))
    c = 6. * slope
    print(f"fitted central charge c = {c:.3f} (CFT: 0.5)")
    return c


if __name__ == '__main__':
    c = run()
    assert abs(c - 0.5) < 0.15, c
