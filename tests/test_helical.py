"""HelicalLattice: MPO parity with the regular tilted lattice + iDMRG."""
import numpy as np

from tenpy_tpu.models.lattice import Square, HelicalLattice
from tenpy_tpu.models.tf_ising import TFIModel
from tenpy_tpu.networks.site import SpinHalfSite
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms import dmrg


def _lattices():
    site = SpinHalfSite(None)
    reg = Square(Lx=3, Ly=3, site=site, bc=['periodic', -1],
                 bc_MPS='infinite')
    return reg, HelicalLattice(reg, 3)


def test_helical_mpo_parity():
    """Helical MPO energy density == regular-lattice MPO on the same
    (3-periodic) random state -- exact identity."""
    reg, hel = _lattices()
    g = 2.0
    m_h = TFIModel({'lattice': hel, 'J': 1., 'g': g, 'conserve': None,
                    'bc_MPS': 'infinite'})
    m_r = TFIModel({'lattice': reg, 'J': 1., 'g': g, 'conserve': None,
                    'bc_MPS': 'infinite'})
    psi3 = MPS.from_desired_bond_dimension(hel.mps_sites(), 4, bc='infinite')
    psi3.canonical_form()
    psi9 = psi3.copy()
    psi9.enlarge_mps_unit_cell(3)
    E_h = m_h.H_MPO.expectation_value(psi3)
    E_r = m_r.H_MPO.expectation_value(psi9)
    assert abs(E_h - E_r) < 1e-8


def test_helical_idmrg():
    """iDMRG on the 3-site helical cell converges near the straight-cylinder
    energy density (different geometry: only loose agreement expected)."""
    reg, hel = _lattices()
    g = 2.0
    m = TFIModel({'lattice': hel, 'J': 1., 'g': g, 'conserve': None,
                  'bc_MPS': 'infinite'})
    psi = MPS.from_product_state(hel.mps_sites(), ['up'] * 3, bc='infinite')
    info = dmrg.run(psi, m, {'trunc_params': {'chi_max': 48,
                                              'svd_min': 1e-10},
                             'max_sweeps': 30, 'mixer': True})
    assert abs(info['E'] - (-2.512)) < 5e-3
