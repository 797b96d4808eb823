"""Model-layer tests: lattice geometry + generic model harness vs ED / bond forms.

Mirrors the reference's tests/test_model.py + test_lattice.py strategy.
"""
import numpy as np
import pytest

from tenpy_tpu.models.lattice import (Chain, Square, Honeycomb, Triangular, Kagome,
                                      Ladder, get_order)
from tenpy_tpu.models.tf_ising import TFIChain, TFIModel
from tenpy_tpu.models.xxz_chain import XXZChain
from tenpy_tpu.models.spins import SpinChain
from tenpy_tpu.models.spins_nnn import SpinChainNNN2
from tenpy_tpu.models.fermions_spinless import FermionChain
from tenpy_tpu.models.hubbard import FermiHubbardChain, BoseHubbardChain
from tenpy_tpu.models.tj_model import tJChain
from tenpy_tpu.models.clock import ClockChain
from tenpy_tpu.models.pxp import PXPChain
from tenpy_tpu.networks.site import SpinHalfSite
from tenpy_tpu.networks.mpo import MPOEnvironment
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms.exact_diag import ExactDiag
from tenpy_tpu.linalg import np_conserved as npc


def test_lattice_basics():
    site = SpinHalfSite('Sz')
    lat = Square(3, 4, site, bc=['open', 'periodic'])
    assert lat.N_sites == 12
    for i in range(lat.N_sites):
        assert lat.lat2mps_idx(lat.mps2lat_idx(i)) == i
    lat.test_sanity()
    # periodic wrap along y
    assert lat.lat2mps_idx([1, 4, 0]) == lat.lat2mps_idx([1, 0, 0])
    # snake order covers all sites
    lat2 = Square(3, 4, site, order='snake')
    lat2.test_sanity()


def test_lattice_couplings():
    site = SpinHalfSite('Sz')
    lat = Chain(5, site, bc='open')
    i, j, lat_idx, shape = lat.possible_couplings(0, 0, [1])
    assert len(i) == 4
    assert np.all(j == i + 1)
    lat_p = Chain(5, site, bc='periodic', bc_MPS='infinite')
    i, j, _, _ = lat_p.possible_couplings(0, 0, [1])
    assert len(i) == 5


def test_honeycomb_neighbors():
    site = SpinHalfSite('Sz')
    lat = Honeycomb(2, 2, site, bc=['periodic', 'periodic'], bc_MPS='infinite')
    # each site has 3 NN bonds; 2x2x2 sites -> 12 NN bonds total (3 per unit cell x 4)
    count = 0
    for u1, u2, dx in lat.pairs['nearest_neighbors']:
        i, j, _, _ = lat.possible_couplings(u1, u2, np.append(dx, []))
        count += len(i)
    assert count == 12


MODELS_VS_ED = [
    (TFIChain, {'L': 6, 'J': 1., 'g': 1.3}),
    (XXZChain, {'L': 6, 'Jxx': 1., 'Jz': 0.7, 'hz': 0.1}),
    (SpinChain, {'L': 6, 'S': 0.5, 'Jx': 1., 'Jy': 1., 'Jz': 0.3, 'hz': 0.2}),
    (SpinChain, {'L': 4, 'S': 1., 'Jx': 1., 'Jy': 1., 'Jz': 1.}),
    (SpinChainNNN2, {'L': 6, 'Jx': 1., 'Jy': 1., 'Jz': 0.5,
                     'Jxp': 0.4, 'Jyp': 0.4, 'Jzp': 0.2}),
    (FermionChain, {'L': 6, 'J': 1., 'V': 0.5, 'mu': 0.3}),
    (FermiHubbardChain, {'L': 4, 't': 1., 'U': 4., 'mu': 1.}),
    (BoseHubbardChain, {'L': 4, 't': 1., 'U': 2., 'n_max': 2}),
    (tJChain, {'L': 4, 't': 1., 'J': 0.4}),
    (ClockChain, {'L': 4, 'q': 3, 'J': 1., 'g': 0.7}),
    (PXPChain, {'L': 6, 'Omega': 1.}),
]


@pytest.mark.parametrize('cls, params', MODELS_VS_ED,
                         ids=[f"{c.__name__}-{i}" for i, (c, p) in
                              enumerate(MODELS_VS_ED)])
def test_model_hermitian_and_bond_consistency(cls, params):
    """Every model's MPO must be hermitian; NN models: H_MPO == H_bond (dense)."""
    m = cls(dict(params))
    H = m.H_MPO
    Hd = np.asarray(H.to_matrix().to_ndarray())
    assert np.allclose(Hd, Hd.conj().T, atol=1e-12), "H not hermitian"
    if hasattr(m, 'H_bond'):
        # reconstruct dense H from bond terms and compare
        sites = m.lat.mps_sites()
        L = len(sites)
        dims = [s.dim for s in sites]
        D = int(np.prod(dims))
        Hb = np.zeros((D, D), dtype=complex)
        for i in range(1, L):
            h = m.H_bond[i]
            if h is None:
                continue
            hd = np.asarray(h.to_ndarray())  # p0 p0* p1 p1*
            d0, d1 = dims[i - 1], dims[i]
            hmat = hd.transpose(0, 2, 1, 3).reshape(d0 * d1, d0 * d1)
            left = int(np.prod(dims[:i - 1])) if i > 1 else 1
            right = int(np.prod(dims[i + 1:])) if i + 1 < L else 1
            Hb += np.kron(np.kron(np.eye(left), hmat), np.eye(right))
        assert np.allclose(np.sort(np.linalg.eigvalsh(Hd)),
                           np.sort(np.linalg.eigvalsh(Hb)), atol=1e-10), \
            "H_MPO and H_bond disagree"


def test_tfi_model_2d():
    """TFI on a small 2D square lattice vs dense ED."""
    m = TFIModel({'lattice': 'Square', 'Lx': 2, 'Ly': 3, 'J': 1., 'g': 1.2,
                  'bc_y': 'ladder'})
    H = m.H_MPO
    Hd = np.asarray(H.to_matrix().to_ndarray())
    assert np.allclose(Hd, Hd.conj().T, atol=1e-12)
    # energy of the all-up state: only the field term contributes
    # (<sigmax sigmax> = 0 in the up-product state)
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up'] * 6)
    E = np.real(MPOEnvironment(psi, H, psi).full_contraction(0))
    assert abs(E - (-1.2 * 6)) < 1e-10


def test_model_dmrg_e2e():
    """DMRG on a real model class (XXZChain) vs ED."""
    from tenpy_tpu.algorithms import dmrg
    m = XXZChain({'L': 8, 'Jxx': 1., 'Jz': 1.})
    ed = ExactDiag(m, charge_sector=[0])
    ed.full_diagonalization()
    E_exact, _ = ed.groundstate()
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'] * 4)
    info = dmrg.run(psi, m, {'trunc_params': {'chi_max': 64, 'svd_min': 1e-14},
                             'max_E_err': 1e-12, 'mixer': False})
    assert abs(info['E'] - E_exact) < 1e-10


def test_fermi_hubbard_model2():
    """FermiHubbardModel2 (two FermionSite species on a MultiSpeciesLattice)
    has the same spectrum as FermiHubbardModel (reference hubbard.py:217)."""
    import numpy as np
    from tenpy_tpu.models.hubbard import FermiHubbardModel, FermiHubbardModel2
    from tenpy_tpu.algorithms.exact_diag import get_numpy_Hamiltonian
    p = {'L': 3, 't': 1., 'U': 4., 'mu': 0.5, 'V': 0.3, 'bc_MPS': 'finite'}
    w1 = np.linalg.eigvalsh(get_numpy_Hamiltonian(FermiHubbardModel(dict(p))))
    w2 = np.linalg.eigvalsh(get_numpy_Hamiltonian(FermiHubbardModel2(dict(p))))
    np.testing.assert_allclose(np.sort(w1), np.sort(w2), atol=1e-10)
