"""Defining a custom model: anisotropic spin-1/2 XY ladder with a field.

Shows the two standard routes (reference ``examples/model_custom.py``):

1. subclassing :class:`~tenpy_tpu.models.model.CouplingMPOModel` with
   ``init_sites`` / ``init_terms`` (works for any lattice, builds the MPO), and
2. verifying it against exact diagonalization on a small system.
"""
import jax
jax.config.update('jax_platforms', 'cpu')   # examples run host-side
import numpy as np

from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.algorithms.exact_diag import ExactDiag
from tenpy_tpu.models.model import CouplingMPOModel
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.site import SpinHalfSite


class AnisotropicXYLadder(CouplingMPOModel):
    r"""H = sum_rungs Jr (Sx Sx + Sy Sy) + sum_legs Jl Sz Sz - hz sum Sz.

    With only Sz-parity conserved (Sx/Sy break U(1)), we conserve 'parity'.
    """

    default_lattice = 'Ladder'
    force_default_lattice = True

    def init_sites(self, model_params):
        conserve = model_params.get('conserve', 'parity')
        return SpinHalfSite(conserve=conserve)

    def init_terms(self, model_params):
        Jr = model_params.get('Jr', 1.)
        Jl = model_params.get('Jl', 0.5)
        hz = model_params.get('hz', 0.2)
        # rung coupling: between the two legs (u=0,1) at dx=0
        self.add_coupling(0.5 * Jr, 0, 'Sp', 1, 'Sm', 0, plus_hc=True)
        # leg coupling: along the ladder on both legs
        for u in (0, 1):
            self.add_coupling(Jl, u, 'Sz', u, 'Sz', 1)
            self.add_onsite(-hz, u, 'Sz')


def main():
    params = {'L': 4, 'Jr': 1., 'Jl': 0.5, 'hz': 0.2, 'bc_MPS': 'finite'}
    m = AnisotropicXYLadder(params)
    assert m.lat.N_sites == 8

    # ED ground truth (8 spins = 256 states)
    ed = ExactDiag(m)
    ed.build_full_H_from_mpo()
    ed.full_diagonalization()
    E_ed = float(np.min(ed.E))
    print(f"ED ground-state energy: {E_ed:.10f}")

    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'] * 4,
                                 bc='finite')
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-12},
        'max_sweeps': 12, 'mixer': True})
    E_dmrg, _ = eng.run()
    print(f"DMRG ground-state energy: {E_dmrg:.10f}  "
          f"(delta {abs(E_dmrg - E_ed):.2e})")
    assert abs(E_dmrg - E_ed) < 1e-8
    print("model_custom example OK")


if __name__ == '__main__':
    main()
