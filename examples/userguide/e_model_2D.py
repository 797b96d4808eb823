"""Userguide step E: a 2-D model on a cylinder.

Counterpart of the reference's ``examples/userguide/e_model_2D.py``:
anisotropic Heisenberg on a square-lattice cylinder, demonstrating lattice
couplings with direction-dependent strengths and the mps <-> lattice maps.
"""
import numpy as np

from tenpy_tpu.models.model import CouplingMPOModel
from tenpy_tpu.models.lattice import Square
from tenpy_tpu.networks.site import SpinHalfSite
from tenpy_tpu.networks.mps import MPS


class AnisotropicHeisenberg(CouplingMPOModel):
    """Jx along the cylinder axis, Jy around the circumference."""

    def init_lattice(self, model_params):
        Lx = model_params.get('Lx', 2)
        Ly = model_params.get('Ly', 3)
        site = self.init_sites(model_params)
        return Square(Lx, Ly, site, bc=['open', 'periodic'],
                      bc_MPS=model_params.get('bc_MPS', 'finite'))

    def init_sites(self, model_params):
        return SpinHalfSite(conserve='Sz')

    def init_terms(self, model_params):
        Jx = model_params.get('Jx', 1.)
        Jy = model_params.get('Jy', 0.5)
        for J, dx in [(Jx, (1, 0)), (Jy, (0, 1))]:
            self.add_coupling(J / 2., 0, 'Sp', 0, 'Sm', dx, plus_hc=True)
            self.add_coupling(J, 0, 'Sz', 0, 'Sz', dx)


m = AnisotropicHeisenberg({'Lx': 2, 'Ly': 3})
lat = m.lat
N = lat.N_sites
assert N == 6

# bond counting: open x direction -> (Lx-1)*Ly x-bonds; periodic y -> Lx*Ly
n_x = (2 - 1) * 3
n_y = 2 * 3
# count Sz-Sz terms in the coupling data
ct = m.all_coupling_terms()
n_zz = sum(1 for t in ct.to_TermList().terms
           if all(op == 'Sz' for op, _ in t))
assert n_zz == n_x + n_y

# stripe state on the lattice (Ly=3 is odd, so a checkerboard would not
# tile — from_lat_product_state checks commensurability): alternate along x
stripes = [[['up']], [['down']]]          # shape (2, 1, 1) tiles (2, 3, 1)
psi = MPS.from_lat_product_state(lat, stripes)

# measurements come back in MPS order; mps2lat_values restores (x, y)
Sz = psi.expectation_value('Sz')
Sz_lat = lat.mps2lat_values(Sz)[..., 0]   # drop the unit-cell axis
assert Sz_lat.shape == (2, 3)
assert abs(abs(Sz_lat).sum() - N * 0.5) < 1e-12

# ground-state energy sanity: DMRG beats the Neel energy
from tenpy_tpu.algorithms import dmrg
E_neel = m.H_MPO.expectation_value(psi)
info = dmrg.run(psi, m, {'trunc_params': {'chi_max': 64, 'svd_min': 1e-10},
                         'max_sweeps': 8})
assert info['E'] < E_neel

print(f"e_model_2D: ok (E = {info['E']:.8f} < E_neel = {E_neel:.8f})")
