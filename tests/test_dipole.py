"""Dipole conservation: DipolarChargeInfo, position-shifted sites, and DMRG.

Mirrors reference ``tests/test_dmrg.py:302`` (finite case): the ground-state
energy with ``conserve='dipole'`` must match the ``conserve='Sz'``/``'N'`` run.
"""
import numpy as np
import pytest

from tenpy_tpu.linalg.charges import ChargeInfo, DipolarChargeInfo
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.site import SpinSite, BosonSite
from tenpy_tpu.models.spins import DipolarSpinChain
from tenpy_tpu.models.hubbard import DipolarBoseHubbardChain
from tenpy_tpu.algorithms import dmrg


def test_dipolar_chargeinfo():
    ci = DipolarChargeInfo([1, 1], ['2*Sz', 'dipole'], charge_idcs=[0],
                           dipole_idcs=[1])
    assert not ci.trivial_shift
    assert ci != ChargeInfo([1, 1], ['2*Sz', 'dipole'])
    assert ChargeInfo([1, 1]).trivial_shift
    q = np.array([[2, 0], [-2, 0], [0, 3]])
    shifted = ci.shift_charges_horizontal(q, 5)
    assert np.array_equal(shifted, [[2, 10], [-2, -10], [0, 3]])
    shifted2 = ci.shift_charges(q, np.array([5, 0]))
    assert np.array_equal(shifted, shifted2)
    # Z_N dipole must be a subgroup of a Z_N charge
    with pytest.raises(ValueError):
        DipolarChargeInfo([3, 2], charge_idcs=[0], dipole_idcs=[1])
    DipolarChargeInfo([4, 2], charge_idcs=[0], dipole_idcs=[1])  # ok


def test_dipolar_sites_shifted():
    site = SpinSite(S=1, conserve='dipole')
    assert site.leg.chinfo.qnumber == 2
    m = DipolarSpinChain({'L': 6, 'S': 1, 'conserve': 'dipole'})
    sites = m.lat.mps_sites()
    for i, s in enumerate(sites):
        qflat = s.leg.to_qflat()
        # dipole charge = position * Sz charge on every sector
        assert np.array_equal(qflat[:, 1], i * qflat[:, 0])
    # the MPO carries nonzero dipole charges on its virtual legs
    W = m.H_MPO.get_W(2)
    assert np.any(W.get_leg('wL').to_qflat()[:, 1] != 0)


@pytest.mark.parametrize('L, S', [(8, 1)])
def test_dmrg_dipole_conservation_spin(L, S):
    """Finite H3 chain: dipole-conserving DMRG == Sz-conserving DMRG.

    Reference: ``tests/test_dmrg.py:302`` (finite branch)."""
    params = {'trunc_params': {'chi_max': 50, 'svd_min': 1e-12},
              'max_sweeps': 20, 'mixer': True, 'N_sweeps_check': 2}
    init = ['up', 'down'] * (L // 2)
    m_dip = DipolarSpinChain({'L': L, 'S': S, 'J3': 1., 'J4': 0.,
                              'conserve': 'dipole'})
    psi_dip = MPS.from_product_state(m_dip.lat.mps_sites(), init, bc='finite')
    E_dip = dmrg.run(psi_dip, m_dip, dict(params))['E']

    m_sz = DipolarSpinChain({'L': L, 'S': S, 'J3': 1., 'J4': 0.,
                             'conserve': 'Sz'})
    psi_sz = MPS.from_product_state(m_sz.lat.mps_sites(), init, bc='finite')
    E_sz = dmrg.run(psi_sz, m_sz, dict(params))['E']
    assert abs(E_dip - E_sz) < 1e-10 * max(1., abs(E_sz))
    # the dipolar runs really used the finer charge structure
    assert psi_dip.get_B(L // 2, None).chinfo.qnumber == 2


def test_dmrg_dipole_conservation_boson():
    """Finite dipolar Bose-Hubbard chain vs exact diagonalization in the same
    (N, dipole) charge sector.  (An unconstrained N-conserving run can lower
    the dipole moment, so comparing to it would compare different sectors.)"""
    from tenpy_tpu.algorithms.exact_diag import ExactDiag
    L = 6
    params = {'trunc_params': {'chi_max': 40, 'svd_min': 1e-12},
              'max_sweeps': 20, 'mixer': True, 'N_sweeps_check': 2}
    init = ['1', '2', '0'] * (L // 3)   # NOT an H3 eigenstate (B^2|1> = 0
    #                                       would freeze an all-'1' state)
    kw = {'L': L, 'Nmax': 2, 't': 1., 'U': 2., 'mu': 0.5}
    m_dip = DipolarBoseHubbardChain(dict(kw, conserve='dipole'))
    psi_dip = MPS.from_product_state(m_dip.lat.mps_sites(), init, bc='finite')
    sector = psi_dip.get_total_charge(only_physical_legs=True)
    E_dip = dmrg.run(psi_dip, m_dip, dict(params))['E']
    ed = ExactDiag(m_dip, charge_sector=sector)
    ed.build_full_H_from_mpo()
    ed.full_diagonalization()
    E_ed = float(np.min(np.asarray(ed.E)))
    assert abs(E_dip - E_ed) < 1e-10 * max(1., abs(E_ed))


def test_dipole_infinite_raises():
    with pytest.raises(NotImplementedError):
        DipolarSpinChain({'L': 4, 'S': 1, 'conserve': 'dipole',
                          'bc_MPS': 'infinite'})
