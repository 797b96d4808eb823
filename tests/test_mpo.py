"""Tests for terms / MPOGraph / MPO / MPOEnvironment (mirrors reference test_mpo.py)."""
import numpy as np
import pytest

from tenpy_tpu.networks.site import SpinHalfSite, FermionSite
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.mpo import MPO, MPOGraph, MPOEnvironment
from tenpy_tpu.networks.terms import (OnsiteTerms, CouplingTerms, MultiCouplingTerms,
                                      TermList, ExponentiallyDecayingTerms)
from tenpy_tpu.linalg import np_conserved as npc


def _tfi_mpo(L, J=1., g=1.2):
    site = SpinHalfSite('parity')
    sites = [site] * L
    ot = OnsiteTerms(L)
    ct = CouplingTerms(L)
    for i in range(L):
        ot.add_onsite_term(-g, i, 'Sigmaz')
    for i in range(L - 1):
        ct.add_coupling_term(-J, i, i + 1, 'Sigmax', 'Sigmax')
    return sites, MPOGraph.from_terms([ot, ct], sites, 'finite').build_MPO()


def _dense_tfi(L, J=1., g=1.2):
    sx = np.array([[0, 1], [1, 0]])
    sz = np.array([[1, 0], [0, -1]])

    def kron_list(ops):
        r = ops[0]
        for o in ops[1:]:
            r = np.kron(r, o)
        return r

    H = np.zeros((2 ** L, 2 ** L))
    for i in range(L):
        ops = [np.eye(2)] * L
        ops[i] = sz
        H += -g * kron_list(ops)
    for i in range(L - 1):
        ops = [np.eye(2)] * L
        ops[i] = sx
        ops[i + 1] = sx
        H += -J * kron_list(ops)
    return H


def test_mpo_tfi_spectrum():
    L = 5
    sites, H = _tfi_mpo(L)
    assert max(H.chi) == 3
    w1 = np.sort(np.linalg.eigvalsh(np.asarray(H.to_matrix().to_ndarray())))
    w2 = np.sort(np.linalg.eigvalsh(_dense_tfi(L)))
    assert np.abs(w1 - w2).max() < 1e-10
    assert H.is_hermitian()


def test_mpo_environment_energy():
    L = 6
    sites, H = _tfi_mpo(L)
    psi = MPS.from_product_state(sites, ['up'] * L)
    env = MPOEnvironment(psi, H, psi)
    assert abs(env.full_contraction(0) - (-1.2 * L)) < 1e-10
    psi_r = MPS.from_desired_bond_dimension(sites, 4, seed=4)
    env_r = MPOEnvironment(psi_r, H, psi_r)
    Es = [env_r.full_contraction(i0) for i0 in range(L)]
    assert np.ptp(np.real(Es)) < 1e-10


def test_mpo_apply():
    L = 5
    sites, H = _tfi_mpo(L)
    psi = MPS.from_desired_bond_dimension(sites, 4, seed=4)
    psi2 = MPS.from_desired_bond_dimension(sites, 4, seed=9)
    Eref = MPOEnvironment(psi2, H, psi).full_contraction(0)
    psi_n = psi.copy()
    H.apply_naively(psi_n)
    assert abs(psi2.overlap(psi_n) - Eref) < 1e-8
    psi_z = psi.copy()
    H.apply_zipup(psi_z, {'trunc_params': {'chi_max': 64, 'svd_min': 1e-14}})
    assert abs(psi2.overlap(psi_z) - Eref) < 1e-8


def test_mpo_variance():
    L = 5
    sites, H = _tfi_mpo(L)
    psi = MPS.from_product_state(sites, ['up'] * L)
    Hd = _dense_tfi(L)
    v0 = np.zeros(2 ** L)
    v0[0] = 1.
    var_ref = v0 @ Hd @ Hd @ v0 - (v0 @ Hd @ v0) ** 2
    assert abs(H.variance(psi) - var_ref) < 1e-8


def test_mpo_add():
    L = 4
    sites, H = _tfi_mpo(L)
    H2 = H + H
    psi = MPS.from_desired_bond_dimension(sites, 4, seed=1)
    env = MPOEnvironment(psi, H, psi)
    env2 = MPOEnvironment(psi, H2, psi)
    assert abs(env2.full_contraction(0) - 2 * env.full_contraction(0)) < 1e-10


def test_multi_coupling_mpo():
    """Three-site term via MultiCouplingTerms compared to dense."""
    L = 4
    g = 0.7
    site = SpinHalfSite('parity')
    sites = [site] * L
    ct = MultiCouplingTerms(L)
    ct.add_multi_coupling_term(g, [0, 1, 2], ['Sigmax', 'Sigmaz', 'Sigmax'], 'Id')
    H = MPOGraph.from_terms([ct], sites, 'finite').build_MPO()
    sx = np.array([[0, 1], [1, 0]])
    sz = np.array([[1, 0], [0, -1]])
    Href = g * np.kron(np.kron(np.kron(sx, sz), sx), np.eye(2))
    w1 = np.sort(np.linalg.eigvalsh(np.asarray(H.to_matrix().to_ndarray())))
    w2 = np.sort(np.linalg.eigvalsh(Href))
    assert np.abs(w1 - w2).max() < 1e-10


def test_fermion_hopping_mpo():
    """JW-string handling: c^dag_i c_j hopping vs dense JW construction."""
    L = 4
    t = 1.3
    site = FermionSite('N')
    sites = [site] * L
    ct = CouplingTerms(L)
    for i in range(L - 1):
        # -t (c^dag_i c_{i+1} + h.c.)
        args = ct.coupling_term_handle_JW(-t, [('Cd', i), ('C', i + 1)], sites)
        ct.add_coupling_term(*args)
        args = ct.coupling_term_handle_JW(-t, [('C', i), ('Cd', i + 1)], sites)
        ct.add_coupling_term(*args)
    H = MPOGraph.from_terms([ct], sites, 'finite').build_MPO()
    # dense via JW: c_i = (prod_{k<i} Z_k) sigma^-_i
    sp = np.array([[0., 1.], [0., 0.]])  # |0><1|
    Z = np.array([[1., 0.], [0., -1.]])

    def c_op(i):
        ops = [Z] * i + [sp] + [np.eye(2)] * (L - i - 1)
        r = ops[0]
        for o in ops[1:]:
            r = np.kron(r, o)
        return r

    Href = np.zeros((2 ** L, 2 ** L))
    for i in range(L - 1):
        ci = c_op(i)
        cj = c_op(i + 1)
        Href += -t * (ci.T @ cj + cj.T @ ci)
    w1 = np.sort(np.linalg.eigvalsh(np.asarray(H.to_matrix().to_ndarray())))
    w2 = np.sort(np.linalg.eigvalsh(Href))
    assert np.abs(w1 - w2).max() < 1e-10


def test_exp_decaying_terms():
    L = 6
    lam = 0.5
    site = SpinHalfSite('Sz')
    sites = [site] * L
    et = ExponentiallyDecayingTerms(L)
    et.add_exponentially_decaying_coupling(1., lam, 'Sz', 'Sz')
    H = MPOGraph.from_terms([et], sites, 'finite').build_MPO()
    sz = np.diag([0.5, -0.5])

    def kron_at(i, j):
        ops = [np.eye(2)] * L
        ops[i] = sz
        ops[j] = sz
        r = ops[0]
        for o in ops[1:]:
            r = np.kron(r, o)
        return r

    Href = np.zeros((2 ** L, 2 ** L))
    for i in range(L):
        for j in range(i + 1, L):
            Href += lam ** (j - i) * kron_at(i, j)
    w1 = np.sort(np.linalg.eigvalsh(np.asarray(H.to_matrix().to_ndarray())))
    w2 = np.sort(np.linalg.eigvalsh(Href))
    assert np.abs(w1 - w2).max() < 1e-10


def test_term_list_roundtrip():
    site = SpinHalfSite('Sz')
    sites = [site] * 4
    tl = TermList([[('Sz', 0)], [('Sp', 0), ('Sm', 2)], [('Sz', 1), ('Sz', 2)]],
                  [0.5, 1.5, 2.0])
    ot, ct = tl.to_OnsiteTerms_CouplingTerms(sites)
    tl2 = ot.to_TermList() + ct.to_TermList()
    assert len(tl2.terms) == 3


def test_mpo_wavepacket():
    L = 5
    site = SpinHalfSite('Sz')
    coeff = np.exp(-0.5 * (np.arange(L) - 2.) ** 2)
    H = MPO.from_wavepacket([site] * L, coeff, 'Sp')
    psi0 = MPS.from_product_state([site] * L, ['down'] * L)
    psi1 = H.apply_naively(psi0.copy())
    # resulting state: sum_i coeff[i] |..up_i..>, norm^2 = sum coeff^2
    assert abs(psi1.norm ** 2 - np.sum(coeff ** 2)) < 1e-10
