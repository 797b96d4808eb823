"""Userguide step D: defining a 1-D model with the coupling DSL.

Counterpart of the reference's ``examples/userguide/d_model_1D.py``: a
custom dimerized spin chain, built three ways, all agreeing.
"""
import numpy as np

from tenpy_tpu.models.model import CouplingMPOModel, NearestNeighborModel
from tenpy_tpu.networks.site import SpinHalfSite
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms.exact_diag import ExactDiag


class DimerizedHeisenberg(CouplingMPOModel, NearestNeighborModel):
    """H = sum_i J(i) S_i . S_{i+1},  J alternating J1/J2."""

    def init_sites(self, model_params):
        return SpinHalfSite(conserve=model_params.get('conserve', 'Sz'))

    def init_terms(self, model_params):
        J1 = model_params.get('J1', 1.)
        J2 = model_params.get('J2', 0.5)
        L = self.lat.N_sites
        # strength per bond: an ARRAY broadcast over the coupling shape
        J = np.array([(J1 if i % 2 == 0 else J2)
                      for i in range(L - 1)])
        self.add_coupling(J / 2., 0, 'Sp', 0, 'Sm', 1, plus_hc=True)
        self.add_coupling(J, 0, 'Sz', 0, 'Sz', 1)


m = DimerizedHeisenberg({'L': 8, 'J1': 1., 'J2': 0.5, 'bc_MPS': 'finite'})

# route 1: the auto-built MPO; route 2: the bond terms (NearestNeighborModel)
psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'] * 4,
                             bc='finite')
E_mpo = m.H_MPO.expectation_value(psi)
# finite bc: H_bond[0] is None (no bond left of site 0); H_bond[i] acts on
# sites (i-1, i)
E_bond = float(np.sum(psi.expectation_value(m.H_bond[1:],
                                            sites=range(m.lat.N_sites - 1))))
assert abs(E_mpo - E_bond) < 1e-12

# route 3: exact diagonalization of the full H from the MPO
ed = ExactDiag(m)
ed.build_full_H_from_mpo()
ed.full_diagonalization()
E0 = float(min(ed.E))

# DMRG lands on the ED ground state
from tenpy_tpu.algorithms import dmrg
info = dmrg.run(psi, m, {'trunc_params': {'chi_max': 32, 'svd_min': 1e-12},
                         'max_sweeps': 10})
assert abs(info['E'] - E0) < 1e-10

print(f"d_model_1D: ok (E0 = {E0:.10f})")
