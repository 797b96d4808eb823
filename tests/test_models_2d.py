"""Physics validation for the 2D / topological model zoo.

Known-value and ED cross-checks for the models that round-1 left untested
(AKLT, ToricCode, Hofstadter, Haldane, Kagome/Triangular lattices) —
mirroring the reference's per-model test strategy (``tests/test_model.py``).
"""
import numpy as np
import pytest

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.algorithms.exact_diag import ExactDiag


def _gs_vs_ed(m, init, tol=1e-8, chi=64, sector=False):
    psi = MPS.from_product_state(m.lat.mps_sites(), init, bc='finite')
    kwargs = {'charge_sector': psi.get_total_charge(only_physical_legs=True)} \
        if sector else {}
    E, _ = dmrg.run(psi, m, {'trunc_params': {'chi_max': chi,
                                              'svd_min': 1e-12},
                             'max_sweeps': 30, 'mixer': True,
                             'N_sweeps_check': 2})['E'], psi
    ed = ExactDiag(m, **kwargs)
    ed.build_full_H_from_mpo()
    ed.full_diagonalization()
    E_ed = float(np.min(np.asarray(ed.E)))
    assert abs(E - E_ed) < tol * max(1., abs(E_ed)), (E, E_ed)
    return E


def test_aklt_exact_energy():
    """AKLT chain: E/site -> -2/3 J (valence-bond solid, chi=2 exact)."""
    from tenpy_tpu.models.aklt import AKLTChain
    m = AKLTChain({'L': 2, 'bc_MPS': 'infinite', 'conserve': 'Sz'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['1.0', '-1.0'],
                                 bc='infinite')
    E, _ = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': 16, 'svd_min': 1e-12},
        'max_sweeps': 30, 'mixer': True}).run()
    assert abs(E - (-2. / 3.)) < 1e-10
    # the AKLT state: exactly 2 non-noise Schmidt values per bond
    S = np.asarray(psi.get_SL(0))
    assert int(np.sum(S > 1e-6)) == 2


def test_toric_code_ground_state():
    """Toric code on a small finite patch: DMRG == ED, and the open-bc
    ground state satisfies every bulk stabilizer (E = -(N_stars + N_plaq))."""
    from tenpy_tpu.models.toric_code import ToricCode
    m = ToricCode({'Lx': 2, 'Ly': 2, 'bc_MPS': 'finite', 'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(),
                                 ['up'] * m.lat.N_sites, bc='finite')
    E, psi = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-12},
        'max_sweeps': 40, 'mixer': True}).run()
    ed = ExactDiag(m)
    ed.build_full_H_from_mpo()
    ed.full_diagonalization()
    E_ed = float(np.min(np.asarray(ed.E)))
    assert abs(E - E_ed) < 1e-8 * max(1., abs(E_ed))


def test_hofstadter_fermions_vs_ed():
    """Hofstadter fermions (pi flux) on a small cylinder vs ED."""
    from tenpy_tpu.models.hofstadter import HofstadterFermions
    m = HofstadterFermions({'Lx': 3, 'Ly': 2, 'phi': (1, 2),
                            'bc_MPS': 'finite', 'bc_y': 'cylinder',
                            'conserve': 'N'})
    L = m.lat.N_sites
    init = (['full', 'empty'] * L)[:L]
    _gs_vs_ed(m, init, tol=1e-8, sector=True)


def test_haldane_fermions_vs_ed():
    """Fermionic Haldane model on a small honeycomb patch vs ED."""
    from tenpy_tpu.models.haldane import FermionicHaldaneModel
    m = FermionicHaldaneModel({'Lx': 2, 'Ly': 2, 'bc_MPS': 'finite',
                               'conserve': 'N'})
    L = m.lat.N_sites
    init = (['full', 'empty'] * L)[:L]
    _gs_vs_ed(m, init, tol=1e-7, sector=True)


@pytest.mark.parametrize('lattice', ['Triangular', 'Kagome'])
def test_frustrated_lattices_vs_ed(lattice):
    """Spin-1/2 Heisenberg on frustrated lattices (small patch) vs ED."""
    from tenpy_tpu.models.spins import SpinModel
    shape = {'Triangular': (2, 3), 'Kagome': (1, 2)}[lattice]
    m = SpinModel({'lattice': lattice, 'Lx': shape[0], 'Ly': shape[1],
                   'Jx': 1., 'Jy': 1., 'Jz': 1., 'bc_MPS': 'finite',
                   'bc_y': 'cylinder', 'conserve': 'Sz', 'S': 0.5})
    L = m.lat.N_sites
    init = (['up', 'down'] * L)[:L]
    _gs_vs_ed(m, init, tol=1e-7, chi=128, sector=True)
