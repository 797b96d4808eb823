"""MPS physical-property tests: correlation length, unit-cell surgery,
charge fluctuations, mutual information, overlaps.

Extends tests/test_mps.py toward the reference's property coverage
(reference ``tests/test_mps.py``: test_correlation_length :718,
test_charge_fluctuations :266, test_roll_mps_unit_cell :482,
test_enlarge_mps_unit_cell :472, test_group :527) using exactly solvable
states (AKLT valence-bond solid, singlet coverings) instead of DMRG output.
"""
import numpy as np
import pytest

from tenpy_tpu.networks.site import SpinHalfSite, SpinSite
from tenpy_tpu.networks.mps import MPS

spin_half = SpinHalfSite('Sz')


def aklt_mps(L=2):
    """The exact chi=2 AKLT valence-bond-solid state (infinite, no charges).

    A^{+1} = sqrt(2/3) sigma^+, A^{0} = -sqrt(1/3) sigma^z,
    A^{-1} = -sqrt(2/3) sigma^-; correlation length 1/ln(3),
    <Sz_0 Sz_r> = (4/3)(-1/3)^|r|.
    """
    site = SpinSite(S=1, conserve=None)
    s_plus = np.array([[0., 1.], [0., 0.]])
    s_z = np.array([[1., 0.], [0., -1.]])
    B = np.zeros((3, 2, 2))            # p index: m = -1, 0, +1 (site basis)
    B[0] = -np.sqrt(2. / 3.) * s_plus.T
    B[1] = -np.sqrt(1. / 3.) * s_z
    B[2] = np.sqrt(2. / 3.) * s_plus
    SV = np.ones(2) / np.sqrt(2.)
    psi = MPS.from_Bflat([site] * L, [B] * L, SVs=[SV] * (L + 1),
                         bc='infinite', permute=False)
    psi.canonical_form()
    return psi


def test_aklt_correlation_length():
    psi = aklt_mps()
    xi = psi.correlation_length()
    assert abs(xi - 1. / np.log(3.)) < 1e-8
    # and the actual SzSz correlator decays as (4/3)(-1/3)^r
    C = psi.correlation_function('Sz', 'Sz', sites1=[0], sites2=range(1, 7))[0]
    r = np.arange(1, 7)
    assert np.max(np.abs(np.asarray(C) - (4. / 3.) * (-1. / 3.) ** r)) < 1e-10


def test_aklt_entanglement():
    """VBS bond entanglement: two Schmidt values 1/sqrt(2) -> S = ln 2."""
    psi = aklt_mps()
    S_ent = psi.entanglement_entropy()
    assert np.max(np.abs(np.asarray(S_ent) - np.log(2.))) < 1e-10
    spec = psi.entanglement_spectrum()   # epsilon_i = -log(S_i^2)
    assert np.max(np.abs(np.sort(np.asarray(spec[0])) - np.log(2.))) < 1e-10


def test_enlarge_and_roll_unit_cell():
    psi = aklt_mps(L=2)
    E0 = psi.expectation_value('Sz')
    psi2 = psi.copy()
    psi2.enlarge_mps_unit_cell(3)
    assert psi2.L == 3 * psi.L
    assert np.allclose(np.asarray(psi2.expectation_value('Sz')),
                       np.tile(np.asarray(E0), 3), atol=1e-12)
    C = psi.correlation_function('Sz', 'Sz', sites1=[0], sites2=[3])[0, 0]
    C2 = psi2.correlation_function('Sz', 'Sz', sites1=[0], sites2=[3])[0, 0]
    assert abs(float(C) - float(C2)) < 1e-12
    # roll by one site: expectation pattern shifts cyclically
    psi3 = psi2.copy()
    psi3.roll_mps_unit_cell(1)
    sz2 = np.asarray(psi2.expectation_value('Sz'))
    sz3 = np.asarray(psi3.expectation_value('Sz'))
    assert np.allclose(sz3, np.roll(sz2, 1), atol=1e-12)


def test_charge_fluctuations_product_and_singlets():
    # product state: sharp charge, zero variance on every bond
    psi = MPS.from_product_state([spin_half] * 4, ['up', 'down'] * 2,
                                 bc='finite')
    for b in [1, 2, 3]:
        assert abs(psi.charge_variance(b)) < 1e-12
    # cut through one singlet: charge (2 Sz) is +-1 with prob 1/2 each
    psi_s = MPS.from_singlets(spin_half, 4, [(0, 2), (1, 3)], up='up',
                              down='down', bc='finite')
    av = np.asarray(psi_s.average_charge(2)).ravel()   # cut (0,2) and (1,3)?
    var = np.asarray(psi_s.charge_variance(2)).ravel()
    assert np.allclose(av, 0., atol=1e-12)
    assert abs(float(var.sum()) - 2.) < 1e-12   # two independent cut singlets


def test_mutinf_two_site_singlets():
    psi = MPS.from_singlets(spin_half, 4, [(0, 1), (2, 3)], up='up',
                            down='down', bc='finite')
    coords, mutinf = psi.mutinf_two_site()
    mutinf = np.asarray(mutinf)
    got = {tuple(c): float(m) for c, m in zip(coords, mutinf)}
    assert abs(got[(0, 1)] - 2. * np.log(2.)) < 1e-10
    assert abs(got[(2, 3)] - 2. * np.log(2.)) < 1e-10
    assert abs(got[(1, 2)]) < 1e-10
    assert abs(got[(0, 3)]) < 1e-10


def test_overlap_product_states():
    up_down = MPS.from_product_state([spin_half] * 4, ['up', 'down'] * 2,
                                     bc='finite')
    down_up = MPS.from_product_state([spin_half] * 4, ['down', 'up'] * 2,
                                     bc='finite')
    assert abs(up_down.overlap(up_down) - 1.) < 1e-12
    assert abs(up_down.overlap(down_up)) < 1e-12


def test_multi_sites_vs_correlation_function():
    """expectation_value_multi_sites == correlation_function on the same pair."""
    psi = MPS.from_singlets(spin_half, 4, [(0, 3), (1, 2)], up='up',
                            down='down', bc='finite')
    a = complex(np.asarray(psi.expectation_value_multi_sites(
        ['Sz', 'Id', 'Id', 'Sz'], 0)))
    assert abs(a.imag) < 1e-14
    a = a.real
    b = float(np.real(np.asarray(psi.correlation_function(
        'Sz', 'Sz', sites1=[0], sites2=[3])[0, 0])))
    assert abs(a - b) < 1e-12
    assert abs(a - (-0.25)) < 1e-12   # singlet: <Sz_i Sz_j> = -1/4
