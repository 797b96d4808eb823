"""Userguide step C: MPS and MPO basics.

Counterpart of the reference's ``examples/userguide/c_mps_mpo.py``: build
states and operators by hand, measure, and apply an MPO.
"""
import numpy as np

from tenpy_tpu.networks.site import SpinHalfSite
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.mpo import MPOGraph
from tenpy_tpu.networks.terms import CouplingTerms, OnsiteTerms

L = 6
site = SpinHalfSite(conserve='Sz')
sites = [site] * L

# --- states
neel = MPS.from_product_state(sites, ['up', 'down'] * (L // 2), bc='finite')
assert np.allclose(neel.expectation_value('Sz'),
                   [0.5, -0.5] * (L // 2))
assert abs(neel.entanglement_entropy()[L // 2 - 1]) < 1e-12   # product state

# a two-site singlet embedded in an up-polarized chain
singlet = MPS.from_singlets(site, L, pairs=[(2, 3)], up='up', bc='finite')
S_ent = singlet.entanglement_entropy()
assert abs(S_ent[2] - np.log(2)) < 1e-12      # maximally entangled bond

# overlaps: <neel|singlet> has weight 1/sqrt(2) from the (down,up) component
# only when the rest matches -- here the rest of neel is NOT all up
assert abs(neel.overlap(singlet)) < 1e-12

# --- an MPO from declarative terms: the XXZ Hamiltonian
Delta = 1.7
ct = CouplingTerms(L)
ot = OnsiteTerms(L)
for i in range(L - 1):
    ct.add_coupling_term(0.5, i, i + 1, 'Sp', 'Sm')
    ct.add_coupling_term(0.5, i, i + 1, 'Sm', 'Sp')
    ct.add_coupling_term(Delta, i, i + 1, 'Sz', 'Sz')
H = MPOGraph.from_terms([ct, ot], sites, 'finite').build_MPO()
assert H.L == L

# energy of the Neel state: only the Sz Sz terms contribute
E_neel = H.expectation_value(neel)
assert abs(E_neel - Delta * (L - 1) * (-0.25)) < 1e-12

# apply the MPO (grows chi, then SVD-compresses); the result is normalized,
# so <neel|psi> = <neel|H|neel> / ||H neel||, with
# ||H neel||^2 = <H^2> = variance + E^2
psi = neel.copy()
H.apply(psi, {'compression_method': 'SVD',
              'trunc_params': {'chi_max': 16, 'svd_min': 1e-12}})
nrm_H_neel = np.sqrt(H.variance(neel) + E_neel ** 2)
assert abs(neel.overlap(psi) * nrm_H_neel - E_neel) < 1e-10

print("c_mps_mpo: ok")
