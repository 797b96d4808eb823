"""explicit_plus_hc MPOs + DMRGThreadPlusHC + gauge_total_charge +
PurificationMPS.from_density_matrix."""
import functools

import numpy as np
import scipy.linalg

from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.mpo import MPOEnvironment
from tenpy_tpu.networks.site import SpinHalfSite
from tenpy_tpu.networks.purification_mps import PurificationMPS
from tenpy_tpu.algorithms.mps_common import TwoSiteH
from tenpy_tpu.algorithms.dmrg_parallel import (DMRGThreadPlusHC,
                                                TwoSiteHThreadPlusHC)
from tenpy_tpu.linalg import np_conserved as npc


def e0_tfi_finite(L, g, J=1.):
    A = np.zeros((L, L)); B = np.zeros((L, L))
    for i in range(L):
        A[i, i] = g
        if i + 1 < L:
            A[i, i + 1] = A[i + 1, i] = -J / 2.
            B[i, i + 1] = -J / 2.
            B[i + 1, i] = J / 2.
    w = scipy.linalg.eigvalsh((A - B) @ (A + B))
    return -np.sum(np.sqrt(np.abs(w)))


def test_explicit_plus_hc_effH():
    L, g = 8, 1.3
    m_hc = TFIChain({'L': L, 'g': g, 'bc_MPS': 'finite', 'conserve': None,
                     'explicit_plus_hc': True})
    m = TFIChain({'L': L, 'g': g, 'bc_MPS': 'finite', 'conserve': None})
    assert m_hc.H_MPO.explicit_plus_hc
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up'] * L, bc='finite')
    H_hc = TwoSiteHThreadPlusHC(MPOEnvironment(psi, m_hc.H_MPO, psi), 2)
    H = TwoSiteH(MPOEnvironment(psi, m.H_MPO, psi), 2, combine=True)
    d = np.asarray(H_hc.to_matrix().to_ndarray()) \
        - np.asarray(H.to_matrix().to_ndarray())
    assert np.max(np.abs(d)) < 1e-12


def test_dmrg_thread_plus_hc():
    L, g = 10, 1.3
    m_hc = TFIChain({'L': L, 'g': g, 'bc_MPS': 'finite', 'conserve': None,
                     'explicit_plus_hc': True})
    psi = MPS.from_product_state(m_hc.lat.mps_sites(), ['up'] * L, bc='finite')
    eng = DMRGThreadPlusHC(psi, m_hc, {
        'trunc_params': {'chi_max': 32, 'svd_min': 1e-10}, 'max_sweeps': 10})
    E, _ = eng.run()
    assert abs(E - e0_tfi_finite(L, g)) < 1e-9


def test_gauge_total_charge():
    site = SpinHalfSite('Sz')
    psi = MPS.from_product_state([site] * 4, ['up', 'up', 'down', 'up'],
                                 bc='finite')
    sz0 = psi.expectation_value('Sz')
    psi.gauge_total_charge([4])
    psi.test_sanity()
    assert np.all(psi.get_total_charge() == [4])
    assert np.allclose(psi.expectation_value('Sz'), sz0)


def test_purification_from_density_matrix():
    L = 3
    site = SpinHalfSite(None)
    rng = np.random.default_rng(7)
    dim = 2 ** L
    Hm = rng.normal(size=(dim, dim)); Hm = (Hm + Hm.T) / 2
    rho_d = scipy.linalg.expm(-0.5 * Hm)
    rho_d /= np.trace(rho_d)
    legs = [site.leg] * L + [site.leg.conj()] * L
    rho = npc.Array.from_ndarray(
        rho_d.reshape([2] * (2 * L)), legs,
        labels=[f'p{i}' for i in range(L)] + [f'p{i}*' for i in range(L)],
        warn_wrong_sector=False)
    psi = PurificationMPS.from_density_matrix([site] * L, rho)
    psi.test_sanity()
    sz = np.asarray(site.Sz.to_ndarray())
    for i in range(L):
        ops = [np.eye(2)] * L
        ops[i] = sz
        exact = np.trace(rho_d @ functools.reduce(np.kron, ops))
        assert abs(psi.expectation_value('Sz')[i] - exact) < 1e-10
