"""Finite-temperature purification tests vs exact thermal expectation values."""
import numpy as np
import pytest

from tenpy_tpu.networks.purification_mps import PurificationMPS
from tenpy_tpu.networks.site import SpinHalfSite
from tenpy_tpu.algorithms.purification import PurificationTEBD, PurificationTEBD2
from tenpy_tpu.algorithms.exact_diag import ExactDiag

import sys
import os
sys.path.insert(0, os.path.dirname(__file__))
from test_tebd import xxz_bond_model, tfi_bond_model  # noqa: E402


def exact_thermal_E(Hd, beta):
    w, v = np.linalg.eigh(Hd)
    Z = np.sum(np.exp(-beta * (w - w[0])))
    return float(np.sum(w * np.exp(-beta * (w - w[0]))) / Z)


def test_infiniteT():
    L = 4
    site = SpinHalfSite('Sz')
    psi = PurificationMPS.from_infiniteT([site] * L)
    psi.test_sanity()
    assert np.allclose(psi.expectation_value('Sz'), 0., atol=1e-14)
    assert abs(psi.overlap(psi) - 1.) < 1e-12
    assert np.allclose(psi.norm_test(), 0., atol=1e-13)


@pytest.mark.parametrize('beta', [0.5, 2.0])
def test_purification_tebd_thermal(beta):
    """exp(-beta H/2)|infT> reproduces thermal energies of the XXZ chain."""
    L = 4
    sites, model = xxz_bond_model(L)
    ed = ExactDiag.from_H_mpo(model.H_MPO)
    ed.build_full_H_from_mpo()
    Hd = np.asarray(ed.full_H.to_ndarray())
    psi = PurificationMPS.from_infiniteT(sites)
    eng = PurificationTEBD(psi, model, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-13},
        'dt': 0.025, 'order': 2})
    eng.run_imaginary(beta)
    E = np.sum(eng.bond_energies()) / psi.overlap(psi).real
    E_exact = exact_thermal_E(Hd, beta)
    assert abs(E - E_exact) < 1e-3, (E, E_exact)


def test_purification_tebd2():
    L = 4
    beta = 1.0
    sites, model = xxz_bond_model(L)
    ed = ExactDiag.from_H_mpo(model.H_MPO)
    ed.build_full_H_from_mpo()
    Hd = np.asarray(ed.full_H.to_ndarray())
    psi = PurificationMPS.from_infiniteT(sites)
    eng = PurificationTEBD2(psi, model, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-13},
        'dt': 0.025, 'order': 2})
    eng.run_imaginary(beta)
    E = np.sum(eng.bond_energies()) / psi.overlap(psi).real
    assert abs(E - exact_thermal_E(Hd, beta)) < 1e-3


def test_disentangler_renyi():
    """Renyi disentangler reduces (or keeps) the entanglement during evolution."""
    L = 4
    beta = 1.0
    sites, model = tfi_bond_model(L, g=1.2)
    psi_plain = PurificationMPS.from_infiniteT(sites)
    eng_plain = PurificationTEBD(psi_plain, model, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-13}, 'dt': 0.05})
    eng_plain.run_imaginary(beta)
    S_plain = np.max(psi_plain.entanglement_entropy())
    psi_dis = PurificationMPS.from_infiniteT(sites)
    eng_dis = PurificationTEBD(psi_dis, model, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-13}, 'dt': 0.05,
        'disentangle': 'renyi'})
    eng_dis.run_imaginary(beta)
    S_dis = np.max(psi_dis.entanglement_entropy())
    # energies agree regardless of the disentangler (it's a gauge on the ancilla)
    E_plain = np.sum(eng_plain.bond_energies()) / psi_plain.overlap(psi_plain).real
    E_dis = np.sum(eng_dis.bond_energies()) / psi_dis.overlap(psi_dis).real
    assert abs(E_plain - E_dis) < 1e-6
    assert S_dis <= S_plain + 0.05


def test_disentangler_graddesc():
    """GradientDescent disentangler keeps energies exact (pure ancilla gauge)."""
    from tenpy_tpu.models.tf_ising import TFIChain
    from tenpy_tpu.models.model import NearestNeighborModel
    m = TFIChain({'L': 4, 'J': 1., 'g': 1.2, 'bc_MPS': 'finite',
                  'conserve': None})
    mnn = NearestNeighborModel.from_MPOModel(m)
    psi = PurificationMPS.from_infiniteT(m.lat.mps_sites())
    eng = PurificationTEBD(psi, mnn, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-13}, 'dt': 0.05,
        'disentangle': 'graddesc'})
    eng.run_imaginary(0.5)
    E = np.sum(eng.bond_energies()) / psi.overlap(psi).real
    psi2 = PurificationMPS.from_infiniteT(m.lat.mps_sites())
    eng2 = PurificationTEBD(psi2, mnn, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-13}, 'dt': 0.05})
    eng2.run_imaginary(0.5)
    E2 = np.sum(eng2.bond_energies()) / psi2.overlap(psi2).real
    assert abs(E - E2) < 1e-6


def test_from_infiniteT_canonical():
    """Canonical infinite-T ensemble: equal weight over fixed-Sz basis states."""
    import itertools
    L = 4
    site = SpinHalfSite('Sz')
    psi = PurificationMPS.from_infiniteT_canonical([site] * L, [0])
    psi.test_sanity()
    states = [s for s in itertools.product([0.5, -0.5], repeat=L)
              if sum(s) == 0]
    assert np.allclose(psi.expectation_value('Sz'), 0., atol=1e-12)
    for (i, j) in [(0, 1), (0, 3), (1, 2)]:
        exact = np.mean([s[i] * s[j] for s in states])
        corr = float(psi.correlation_function(
            'Sz', 'Sz', sites1=[i], sites2=[j]).ravel()[0].real)
        assert abs(corr - exact) < 1e-10
    # nonzero sector
    psi2 = PurificationMPS.from_infiniteT_canonical([site] * L, [2])
    states2 = [s for s in itertools.product([0.5, -0.5], repeat=L)
               if sum(s) == 1.0]
    for i in range(L):
        exact = np.mean([s[i] for s in states2])
        assert abs(psi2.expectation_value('Sz')[i] - exact) < 1e-10


def test_from_infiniteT_canonical_conserve_ancilla():
    """Separate ancilla-charge conservation: the doubled-charge canonical
    ensemble must reproduce the single-charge one observable for observable.
    Reference scheme: tenpy/networks/purification_mps.py:310."""
    L = 4
    site = SpinHalfSite('Sz')
    psi1 = PurificationMPS.from_infiniteT_canonical([site] * L, [0])
    psi2 = PurificationMPS.from_infiniteT_canonical(
        [site] * L, [0], conserve_ancilla_charge=True)
    psi2.test_sanity()
    chinfo2 = psi2.sites[0].leg.chinfo
    assert chinfo2.qnumber == 2
    assert list(chinfo2.names)[1].endswith('ancilla')
    assert np.allclose(psi2.expectation_value('Sz'),
                       psi1.expectation_value('Sz'), atol=1e-12)
    for (i, j) in [(0, 1), (0, 3)]:
        c1 = complex(psi1.correlation_function(
            'Sz', 'Sz', sites1=[i], sites2=[j]).ravel()[0])
        c2 = complex(psi2.correlation_function(
            'Sz', 'Sz', sites1=[i], sites2=[j]).ravel()[0])
        assert abs(c1 - c2) < 1e-10
    # entanglement spectra agree too (the relabeling is a pure gauge)
    assert np.allclose(psi2.entanglement_entropy(),
                       psi1.entanglement_entropy(), atol=1e-10)


def test_purification_tebd_canonical_ancilla():
    """Finite-T TEBD in the canonical ensemble with *conserved ancilla
    charges*: energy at beta matches the exact fixed-Sz thermal value.
    Reference machinery:
    convert_model_purification_canonical_conserve_ancilla_charge
    (tenpy/networks/purification_mps.py:695)."""
    import functools
    from tenpy_tpu.networks.purification_mps import \
        convert_model_purification_canonical_conserve_ancilla_charge
    from tenpy_tpu.models.xxz_chain import XXZChain
    from tenpy_tpu.models.model import NearestNeighborModel
    L, beta = 4, 1.0
    m = XXZChain({'L': L, 'Jxx': 1., 'Jz': 1.3, 'hz': 0., 'bc_MPS': 'finite'})
    mnn = NearestNeighborModel.from_MPOModel(m)
    mnn_cac = convert_model_purification_canonical_conserve_ancilla_charge(mnn)
    site = m.lat.mps_sites()[0]
    sp = np.asarray(site.Sp.to_ndarray())
    sm = np.asarray(site.Sm.to_ndarray())
    szm = np.asarray(site.Sz.to_ndarray())

    def two(i, a, b):
        ops = [np.eye(2)] * L
        ops[i] = a
        ops[i + 1] = b
        return functools.reduce(np.kron, ops)

    Hk = sum(0.5 * (two(i, sp, sm) + two(i, sm, sp)) + 1.3 * two(i, szm, szm)
             for i in range(L - 1))
    Szt = sum(functools.reduce(np.kron,
                               [szm if j == i else np.eye(2) for j in range(L)])
              for i in range(L))
    sector = np.isclose(np.diag(Szt), 0.)
    ws = np.linalg.eigvalsh(Hk[np.ix_(sector, sector)])
    Z = np.sum(np.exp(-beta * (ws - ws[0])))
    E_exact = float(np.sum(ws * np.exp(-beta * (ws - ws[0]))) / Z)
    psi = PurificationMPS.from_infiniteT_canonical(
        m.lat.mps_sites(), [0], conserve_ancilla_charge=True)
    eng = PurificationTEBD(psi, mnn_cac, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-13},
        'dt': 0.025, 'order': 2})
    eng.run_imaginary(beta)
    E = np.sum(eng.bond_energies()) / psi.overlap(psi).real
    assert abs(E - E_exact) < 1e-4
    # the evolution stayed in the doubled-charge framework
    psi.test_sanity()
    assert psi.sites[0].leg.chinfo.qnumber == 2


def test_entanglement_entropy_segment_and_mutinf():
    """Segment entropies of the infinite-T purification: each site is a
    maximally entangled p-q pair, so S_p(segment) = |segment| log 2,
    S_pq(segment) = 0, and all two-site mutual information vanishes."""
    L = 4
    site = SpinHalfSite('Sz')
    psi = PurificationMPS.from_infiniteT([site] * L)
    S_p = psi.entanglement_entropy_segment([0, 1], n=1, legs='p')
    assert np.allclose(S_p, 2 * np.log(2), atol=1e-10)
    S_q = psi.entanglement_entropy_segment([0, 1], n=1, legs='q')
    assert np.allclose(S_q, 2 * np.log(2), atol=1e-10)
    S_pq = psi.entanglement_entropy_segment([0, 1], n=1, legs='pq')
    assert np.allclose(S_pq, 0., atol=1e-10)
    # non-contiguous segment exercises the q-aware rho walk
    S_nc = psi.entanglement_entropy_segment([0, 2], n=1, legs='p')
    assert np.allclose(S_nc, 2 * np.log(2), atol=1e-10)
    coords, mutinf = psi.mutinf_two_site(legs='p')
    assert np.allclose(mutinf, 0., atol=1e-10)
    assert len(coords) == L * (L - 1) // 2


def test_update_imag_second_order():
    """Canonical-form-preserving imaginary updates are 2nd order in dt
    (the generic inverse-free update degrades to 1st order for non-unitary
    gates)."""
    import functools
    from tenpy_tpu.models.xxz_chain import XXZChain
    from tenpy_tpu.models.model import NearestNeighborModel
    L, beta = 4, 1.0
    m = XXZChain({'L': L, 'Jxx': 1., 'Jz': 1.3, 'hz': 0., 'bc_MPS': 'finite'})
    mnn = NearestNeighborModel.from_MPOModel(m)
    site = m.lat.mps_sites()[0]
    sp = np.asarray(site.Sp.to_ndarray())
    sm = np.asarray(site.Sm.to_ndarray())
    szm = np.asarray(site.Sz.to_ndarray())

    def two(i, a, b):
        ops = [np.eye(2)] * L
        ops[i] = a
        ops[i + 1] = b
        return functools.reduce(np.kron, ops)

    Hk = sum(0.5 * (two(i, sp, sm) + two(i, sm, sp)) + 1.3 * two(i, szm, szm)
             for i in range(L - 1))
    Szt = sum(functools.reduce(np.kron,
                               [szm if j == i else np.eye(2) for j in range(L)])
              for i in range(L))
    sector = np.isclose(np.diag(Szt), 0.)
    ws = np.linalg.eigvalsh(Hk[np.ix_(sector, sector)])
    Z = np.sum(np.exp(-beta * (ws - ws[0])))
    E_exact = float(np.sum(ws * np.exp(-beta * (ws - ws[0]))) / Z)
    errs = []
    for dt in (0.05, 0.025):
        psi = PurificationMPS.from_infiniteT_canonical(m.lat.mps_sites(), [0])
        eng = PurificationTEBD(psi, mnn, {
            'trunc_params': {'chi_max': 64, 'svd_min': 1e-13},
            'dt': dt, 'order': 2})
        eng.run_imaginary(beta)
        E = np.sum(eng.bond_energies()) / psi.overlap(psi).real
        errs.append(abs(E - E_exact))
    assert errs[0] < 1e-4
    assert 3.0 < errs[0] / errs[1] < 5.0  # 2nd order: ratio ~4
