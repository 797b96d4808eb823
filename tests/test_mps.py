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


def test_compute_K():
    """Entanglement-spectrum momenta on a TFI Ly=3 cylinder: K must be
    multiples of 2 pi / 3 and |W| must reproduce the Schmidt values squared."""
    from tenpy_tpu.models.tf_ising import TFIModel
    from tenpy_tpu.algorithms import dmrg
    model = TFIModel({'lattice': 'Square', 'Lx': 1, 'Ly': 3,
                      'bc_y': 'cylinder', 'bc_MPS': 'infinite',
                      'J': 1., 'g': 3., 'conserve': None})
    psi = MPS.from_product_state(model.lat.mps_sites(), ['up'] * 3,
                                 bc='infinite')
    dmrg.run(psi, model, {'trunc_params': {'chi_max': 16, 'svd_min': 1e-8},
                          'max_sweeps': 30, 'mixer': True})
    U, W, q, ov, err = psi.compute_K(model.lat)
    assert abs(abs(ov) - 1.) < 1e-6
    S2 = np.sort(np.asarray(psi.get_SL(0))**2)[::-1]
    absW = np.sort(np.abs(W))[::-1]
    assert np.max(np.abs(absW - S2)) < 1e-6
    # momenta quantized in units of 2 pi / Ly (check the dominant ones)
    big = np.abs(W) > 1e-4
    k3 = np.angle(W[big]) * 3 / (2 * np.pi)  # should be integers
    assert np.max(np.abs(k3 - np.round(k3))) < 1e-3
    # a translation-invariant product state: trivial spectrum
    psi2 = MPS.from_product_state(model.lat.mps_sites(), ['up'] * 3,
                                  bc='infinite')
    _, W2, _, ov2, _ = psi2.compute_K(model.lat)
    assert abs(abs(ov2) - 1.) < 1e-10
    assert np.allclose(W2, [1.])


def test_swap_sites_fermionic_sign():
    """Fermionic swap carries the (-1)^(n_i n_j) sign: a superposition with a
    doubly-occupied pair flips its relative sign under the swap."""
    from tenpy_tpu.networks.site import FermionSite
    fs = FermionSite(conserve='N')
    psi_1100 = MPS.from_product_state([fs] * 4,
                                      ['full', 'full', 'empty', 'empty'])
    psi_0110 = MPS.from_product_state([fs] * 4,
                                      ['empty', 'full', 'full', 'empty'])
    psi_1010 = MPS.from_product_state([fs] * 4,
                                      ['full', 'empty', 'full', 'empty'])
    # superposition  (|1100> + |0110>)/sqrt(2)
    psi = psi_1100.add(psi_0110, 1. / np.sqrt(2), 1. / np.sqrt(2))
    psi.canonical_form()
    psi.swap_sites(1, swap_op='auto')
    # swap(1,2): |1100> -> +|1010> (one particle moves),
    #            |0110> -> -|0110> (both sites occupied: sign -1)
    assert abs(complex(psi.overlap(psi_1010)) - 1. / np.sqrt(2)) < 1e-10
    assert abs(complex(psi.overlap(psi_0110)) + 1. / np.sqrt(2)) < 1e-10
    # double swap restores the state exactly (sign squared = 1)
    psi.swap_sites(1, swap_op='auto')
    assert abs(complex(psi.overlap(psi_1100)) - 1. / np.sqrt(2)) < 1e-10
    assert abs(complex(psi.overlap(psi_0110)) - 1. / np.sqrt(2)) < 1e-10


def test_project_onto_charge_sector():
    """MPS.project_onto_charge_sector (reference mps.py:958)."""
    from tenpy_tpu.networks.site import SpinHalfSite
    sites = [SpinHalfSite(conserve='Sz')] * 4
    s2 = 1. / np.sqrt(2.)
    psi = MPS.project_onto_charge_sector(sites, [np.array([s2, s2])] * 4, [0])
    psi.test_sanity()
    assert np.array_equal(psi.get_total_charge(only_physical_legs=True), [0])
    # uniform superposition over the 6 Sz=0 configurations: <Sz_i> = 0
    assert np.allclose(np.real(np.asarray(psi.expectation_value('Sz'))), 0.,
                       atol=1e-12)
    # <Sz_0 Sz_1> on the symmetric projected state: exact value
    # sum over C(4,2)=6 states, Sz0*Sz1 = +1/4 for (uu..),(dd..) patterns:
    # configurations with same first two spins: uudd, dduu -> +1/4 (x2);
    # others (4) -> -1/4  => (2 - 4)/4/6 = -1/12
    c = float(np.real(psi.correlation_function('Sz', 'Sz', [0], [1])[0, 0]))
    assert abs(c - (-1. / 12.)) < 1e-12


def test_term_correlation_function_right_left():
    """term_correlation_function_right/left vs plain correlation_function."""
    from tenpy_tpu.models.spins import SpinChain
    from tenpy_tpu.algorithms import dmrg
    m = SpinChain({'S': 0.5, 'L': 8, 'Jz': 1., 'Jx': 1., 'Jy': 1.,
                   'bc_MPS': 'finite', 'conserve': 'Sz'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'] * 4,
                                 bc='finite')
    dmrg.TwoSiteDMRGEngine(psi, m, {'trunc_params': {'chi_max': 32,
                                                     'svd_min': 1e-12},
                                    'max_sweeps': 10}).run()
    c1 = psi.term_correlation_function_right([('Sz', 0)], [('Sz', 0)],
                                             i_L=1, j_R=[3, 5])
    c2 = np.asarray(psi.correlation_function('Sz', 'Sz', sites1=[1],
                                             sites2=[3, 5])).ravel()
    assert np.allclose(np.real(c1), np.real(c2), atol=1e-12)
    c3 = psi.term_correlation_function_left([('Sz', 0)], [('Sz', 0)],
                                            i_L=[1, 3], j_R=5)
    c4 = np.asarray(psi.correlation_function('Sz', 'Sz', sites1=[1, 3],
                                             sites2=[5])).ravel()
    assert np.allclose(np.real(c3), np.real(c4), atol=1e-12)
    # two-site terms (S+ S-)(S- S+) with JW-free spins
    c5 = psi.term_correlation_function_right([('Sp', 0), ('Sm', 1)],
                                             [('Sm', 0), ('Sp', 1)],
                                             i_L=0, j_R=[4])
    direct = psi.expectation_value_term([('Sp', 0), ('Sm', 1),
                                         ('Sm', 4), ('Sp', 5)])
    assert abs(c5[0] - direct) < 1e-12


def test_enlarge_chi():
    """MPS.enlarge_chi keeps the state + B form, adds exact-zero S values."""
    from tenpy_tpu.models.spins import SpinChain
    from tenpy_tpu.algorithms import dmrg
    m = SpinChain({'S': 0.5, 'L': 6, 'Jz': 1., 'Jx': 1., 'Jy': 1.,
                   'bc_MPS': 'finite', 'conserve': 'Sz'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'] * 3,
                                 bc='finite')
    dmrg.TwoSiteDMRGEngine(psi, m, {'trunc_params': {'chi_max': 8,
                                                     'svd_min': 1e-10},
                                    'max_sweeps': 8}).run()
    Sz0 = np.real(np.asarray(psi.expectation_value('Sz'))).copy()
    extra = [None] * 7
    extra[3] = 2
    psi.enlarge_chi(extra)
    psi.test_sanity()
    assert float(np.max(psi.norm_test())) < 1e-12
    assert np.allclose(np.real(np.asarray(psi.expectation_value('Sz'))), Sz0,
                       atol=1e-12)
    assert int(np.sum(np.asarray(psi.get_SL(3)) == 0.)) == 2


def test_subspace_expansion():
    """subspace_expansion grows chi but leaves the state invariant.

    Reference analogue: tenpy/networks/mps.py:5160 (used by 1-site TDVP)."""
    from tenpy_tpu.models.spins import SpinChain
    from tenpy_tpu.algorithms import dmrg
    m = SpinChain({'S': 0.5, 'L': 6, 'Jz': 1., 'Jx': 1., 'Jy': 1.,
                   'bc_MPS': 'finite', 'conserve': 'Sz'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'] * 3,
                                 bc='finite')
    dmrg.TwoSiteDMRGEngine(psi, m, {'trunc_params': {'chi_max': 4,
                                                     'svd_min': 1e-10},
                                    'max_sweeps': 8}).run()
    ref = psi.copy()
    Sz0 = np.real(np.asarray(psi.expectation_value('Sz'))).copy()
    chi0 = list(psi.chi)
    # random expansion
    psi.subspace_expansion(trunc_par={'chi_max': 7, 'svd_min': 1e-14})
    assert float(np.max(psi.norm_test())) < 1e-10
    assert any(c2 > c1 for c1, c2 in zip(chi0, psi.chi))
    assert all(c2 <= 7 for c2 in psi.chi)
    assert abs(abs(psi.overlap(ref)) - 1.) < 1e-10
    assert np.allclose(np.real(np.asarray(psi.expectation_value('Sz'))), Sz0,
                       atol=1e-10)
    # expansion into another state's important directions
    psi2 = ref.copy()
    other = MPS.from_product_state(m.lat.mps_sites(), ['down', 'up'] * 3,
                                   bc='finite')
    err = psi2.subspace_expansion([other],
                                  trunc_par={'chi_max': 8, 'svd_min': 1e-14})
    assert float(np.max(psi2.norm_test())) < 1e-10
    assert abs(abs(psi2.overlap(ref)) - 1.) < 1e-10
    assert err.eps >= 0.


def test_enlarge_chi_infinite_wrap_bond():
    """enlarge_chi on infinite bc, including the unit-cell wrap bond b=0."""
    psi = MPS.from_product_state([spin_half] * 2, ['up', 'down'],
                                 bc='infinite')
    from tenpy_tpu.models.spins import SpinChain
    from tenpy_tpu.algorithms import dmrg
    m = SpinChain({'S': 0.5, 'L': 2, 'Jz': 1., 'Jx': 1., 'Jy': 1.,
                   'bc_MPS': 'infinite', 'conserve': 'Sz'})
    dmrg.TwoSiteDMRGEngine(psi, m, {'trunc_params': {'chi_max': 8,
                                                     'svd_min': 1e-10},
                                    'max_sweeps': 10}).run()
    Sz0 = np.real(np.asarray(psi.expectation_value('Sz'))).copy()
    psi.enlarge_chi([2, 2])           # both bonds, incl. wrap bond b=0
    psi.test_sanity()
    assert float(np.max(np.asarray(psi.norm_test()))) < 1e-10
    assert np.allclose(np.real(np.asarray(psi.expectation_value('Sz'))), Sz0,
                       atol=1e-10)
    assert int(np.sum(np.asarray(psi.get_SL(0)) == 0.)) == 2
    assert int(np.sum(np.asarray(psi.get_SL(1)) == 0.)) == 2


def test_transfer_matrix_degenerate_cat():
    """Regression: a non-injective (cat) iMPS has a doubly-degenerate TM
    eigenvalue 1; single-vector Arnoldi misses the second copy, so
    ``eigenvectors`` runs a deflated second pass to recover it and
    ``correlation_length`` must warn + return inf instead of silently
    reporting the sub-dominant mode as a finite correlation length."""
    import warnings
    from tenpy_tpu.networks.site import SpinHalfSite

    site = SpinHalfSite(conserve=None)
    # infinite GHZ (cat) MPS: chi=2, B^up = diag(1,0), B^down = diag(0,1)
    B = np.zeros((2, 2, 2))  # vL p vR
    B[0, 0, 0] = 1.
    B[1, 1, 1] = 1.
    S = np.ones(2) / np.sqrt(2)
    psi = MPS.from_Bflat([site], [B], SVs=[S, S], bc='infinite')
    TM = TransferMatrix(psi, psi, transpose=False, charge_sector=0)
    etas, vecs = TM.eigenvectors(num_ev=2)
    assert abs(abs(etas[0]) - 1.) < 1e-10
    assert abs(abs(etas[1]) - 1.) < 1e-10
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        xi = psi.correlation_length()
    assert xi == np.inf
    assert any('non-injective' in str(w.message) for w in caught)
