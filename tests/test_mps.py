"""Tests for the MPS core (mirrors reference tests/test_mps.py strategy)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tenpy_tpu.networks.site import SpinHalfSite, FermionSite
from tenpy_tpu.networks.mps import MPS, MPSEnvironment, TransferMatrix, build_initial_state
from tenpy_tpu.linalg import np_conserved as npc

spin_half = SpinHalfSite('Sz')


def test_mps_product_state():
    L = 6
    psi = MPS.from_product_state([spin_half] * L, ['up', 'down'] * (L // 2), bc='finite')
    psi.test_sanity()
    assert np.allclose(psi.expectation_value('Sz'), [0.5, -0.5] * 3)
    assert abs(psi.overlap(psi) - 1.) < 1e-12
    assert np.allclose(psi.entanglement_entropy(), 0., atol=1e-12)
    assert np.allclose(psi.norm_test(), 0., atol=1e-13)


def test_mps_singlets():
    psi = MPS.from_singlets(spin_half, 4, [(0, 1), (2, 3)])
    assert np.allclose(psi.expectation_value('Sz'), 0., atol=1e-10)
    corr = psi.correlation_function('Sz', 'Sz')
    assert abs(corr[0, 1] + 0.25) < 1e-10
    assert abs(corr[0, 2]) < 1e-10
    S = psi.entanglement_entropy()
    assert abs(S[0] - np.log(2)) < 1e-8
    assert abs(S[1]) < 1e-8


def test_mps_canonical_random():
    psi = MPS.from_desired_bond_dimension([spin_half] * 6, 4, bc='finite', seed=1)
    assert psi.norm_test().max() < 1e-10
    assert abs(psi.overlap(psi) - 1.) < 1e-10
    # theta consistency: <theta|theta> = 1 on every bond
    for i in range(5):
        th = psi.get_theta(i, 2)
        n = npc.norm(th)
        assert abs(n - 1.) < 1e-10


def test_mps_canonical_infinite():
    psi = MPS.from_product_state([spin_half] * 2, ['up', 'down'], bc='infinite')
    rng = np.random.default_rng(5)
    psi._random_unitary_sweeps(2, {'chi_max': 6, 'svd_min': 1e-14}, rng)
    psi.canonical_form_infinite()
    assert psi.norm_test().max() < 1e-6
    TM = TransferMatrix(psi, psi)
    eta, _ = TM.eigenvectors()
    assert abs(abs(eta[0]) - 1.) < 1e-8


def test_mps_environment():
    L = 6
    psi1 = MPS.from_desired_bond_dimension([spin_half] * L, 4, bc='finite', seed=2)
    psi2 = MPS.from_desired_bond_dimension([spin_half] * L, 4, bc='finite', seed=3)
    env = MPSEnvironment(psi1, psi2)
    ov = env.full_contraction(0)
    # cross-check against dense contraction
    th1 = psi1.get_theta(0, L)
    th2 = psi2.get_theta(0, L)
    ov_dense = complex(npc.tensordot(
        th1.conj(), th2,
        axes=[['vL*', 'vR*'] + [f'p{i}*' for i in range(L)],
              ['vL', 'vR'] + [f'p{i}' for i in range(L)]]))
    assert abs(ov - ov_dense) < 1e-10
    # full_contraction at interior bonds agrees
    for i0 in range(1, L):
        assert abs(env.full_contraction(i0) - ov_dense) < 1e-10


def test_mps_add():
    L = 4
    psi1 = MPS.from_product_state([spin_half] * L, ['up', 'down', 'up', 'down'])
    psi2 = MPS.from_product_state([spin_half] * L, ['down', 'up', 'down', 'up'])
    psi = psi1.add(psi2, 1. / np.sqrt(2), 1. / np.sqrt(2))
    assert abs(psi.overlap(psi1) - 1. / np.sqrt(2)) < 1e-10
    assert abs(psi.overlap(psi2) - 1. / np.sqrt(2)) < 1e-10
    assert abs(npc.norm(psi.get_theta(0, 1)) - 1.) < 1e-10


def test_mps_apply_local_op():
    L = 4
    psi = MPS.from_product_state([spin_half] * L, ['down'] * L)
    psi.apply_local_op(1, 'Sp')  # raises spin at site 1
    # not normalized B anymore but expectation values should see spin up at 1
    psi.canonical_form_finite()
    sz = psi.expectation_value('Sz')
    assert np.allclose(sz, [-0.5, 0.5, -0.5, -0.5])


def test_expectation_value_term_fermions():
    site = FermionSite('N')
    L = 4
    psi = MPS.from_product_state([site] * 4, ['full', 'empty', 'full', 'empty'])
    n = psi.expectation_value('N')
    assert np.allclose(n, [1, 0, 1, 0])
    # <c^dag_1 c_0> on this product state is 0; <n_0 n_2> = 1
    assert abs(psi.expectation_value_term([('N', 0), ('N', 2)]) - 1.) < 1e-12
    assert abs(psi.expectation_value_term([('Cd', 1), ('C', 0)])) < 1e-12


def test_sample_measurements():
    psi = MPS.from_singlets(spin_half, 2, [(0, 1)])
    rng = np.random.default_rng(0)
    counts = {}
    for _ in range(50):
        sigmas, weight = psi.sample_measurements(rng=rng)
        key = tuple(sigmas)
        counts[key] = counts.get(key, 0) + 1
        assert abs(weight - 0.5) < 1e-8
    # only the two antiparallel configurations appear
    assert set(counts) <= {(0, 1), (1, 0)}


def test_build_initial_state():
    st = build_initial_state(8, ['up', 'down'], [0.5, 0.5], mode='random', seed=0)
    assert len(st) == 8
    assert st.count('up') == 4


def test_swap_sites():
    L = 4
    psi = MPS.from_product_state([spin_half] * L, ['up', 'down', 'up', 'down'])
    psi.swap_sites(1)
    sz = psi.expectation_value('Sz')
    assert np.allclose(sz, [0.5, 0.5, -0.5, -0.5])


def test_rho_segment_and_charge_variance():
    from tenpy_tpu.networks.site import SpinHalfSite
    site = SpinHalfSite('Sz')
    psi = MPS.from_singlets(site, 4, [(0, 1), (2, 3)], bc='finite')
    rho = psi.get_rho_segment([1, 2])  # contiguous
    rd = np.asarray(rho.transpose(['p0', 'p1', 'p0*', 'p1*'])
                    .to_ndarray()).reshape(4, 4)
    assert np.allclose(rd, np.eye(4) / 4)
    rho2 = psi.get_rho_segment([0, 2])  # non-contiguous
    rd2 = np.asarray(rho2.transpose(['p0', 'p1', 'p0*', 'p1*'])
                     .to_ndarray()).reshape(4, 4)
    assert np.allclose(rd2, np.eye(4) / 4)
    assert np.allclose(psi.charge_variance(1), [1.0])
    assert np.allclose(psi.charge_variance(2), [0.0])


def test_spatial_inversion():
    from tenpy_tpu.networks.site import SpinHalfSite
    site = SpinHalfSite('Sz')
    psi = MPS.from_product_state([site] * 4, ['up', 'up', 'down', 'up'],
                                 bc='finite')
    sz0 = psi.expectation_value('Sz')
    psi.spatial_inversion()
    assert np.allclose(psi.expectation_value('Sz'), sz0[::-1])
    psi.test_sanity()
