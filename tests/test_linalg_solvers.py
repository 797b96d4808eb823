"""Tests for truncation, Krylov solvers, and linear-operator wrappers.

Mirrors the reference test strategy: verify against dense numpy/scipy results.
"""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg

from tenpy_tpu.linalg import np_conserved as npc
from tenpy_tpu.linalg.charges import ChargeInfo, LegCharge
from tenpy_tpu.linalg.truncation import truncate, svd_theta, TruncationError
from tenpy_tpu.linalg.krylov_based import (LanczosGroundState, LanczosEvolution, Arnoldi,
                                           GMRES, gram_schmidt)
from tenpy_tpu.linalg.sparse import (FlatLinearOperator, FlatHermitianOperator,
                                     OrthogonalNpcLinearOperator, ShiftNpcLinearOperator,
                                     SumNpcLinearOperator)
from random_test import gen_random_legcharge, random_Array, chinfo_U1, rng


def test_truncate_basic():
    S = np.exp(-np.arange(20.))
    S = S / np.linalg.norm(S)
    mask, norm_new, err = truncate(S, {'chi_max': 10, 'svd_min': None, 'trunc_cut': None})
    assert mask.sum() == 10
    assert np.all(mask[:10])  # keeps the largest
    expected_eps = np.sum(S[10:] ** 2)
    assert abs(err.eps - expected_eps) < 1e-14
    # svd_min cut
    mask, _, _ = truncate(S, {'chi_max': None, 'svd_min': S[5] * 1.0001,
                              'trunc_cut': None})
    assert mask.sum() == 5 or mask.sum() == 6


def test_truncate_degeneracy():
    S = np.array([0.7, 0.5, 0.5 - 1e-14, 0.1])
    S = S / np.linalg.norm(S)
    mask, _, _ = truncate(S, {'chi_max': 2, 'degeneracy_tol': 1e-10,
                              'svd_min': None, 'trunc_cut': None})
    # can't cut inside the degenerate pair: keep 1 or 3, chi_max pushes to... keep <=2 but
    # the degenerate pair may not be split -> keeps only 1
    assert mask.sum() in (1, 3)


def test_svd_theta():
    leg0 = gen_random_legcharge(chinfo_U1, 16, qconj=1)
    leg1 = gen_random_legcharge(chinfo_U1, 16, qconj=-1)
    a = random_Array((16, 16), chinfo_U1)
    # use well-defined legs from random_Array itself
    U, S, VH, err, renorm = svd_theta(a, {'chi_max': 8, 'svd_min': 1e-14,
                                          'trunc_cut': None})
    assert len(np.asarray(S)) <= 8
    assert abs(np.linalg.norm(np.asarray(S)) - 1.) < 1e-12
    # reconstruction error matches err.eps
    recon = npc.tensordot(U.scale_axis(jnp.asarray(S) * renorm, 1), VH, axes=[[1], [0]])
    diff = npc.norm(recon._binary(a, lambda x, y: x - y)) ** 2
    assert abs(diff / npc.norm(a) ** 2 - err.eps) < 1e-10


def _random_hermitian_op(n_dim=24):
    """Random hermitian matrix as npc Array + its dense form."""
    leg = gen_random_legcharge(chinfo_U1, n_dim, qconj=1)
    H = npc.Array.from_func(lambda s: rng.normal(size=s), [leg, leg.conj()])
    Hd = H.transpose([1, 0]).complex_conj()
    Hd.legs = H.legs  # same structure; just symmetrize block data
    H = H._binary(Hd, lambda a, b: 0.5 * (a + b))
    return H, np.asarray(H.to_ndarray()), leg


class _MatOp:
    def __init__(self, mat):
        self.mat = mat

    def matvec(self, v):
        return npc.tensordot(self.mat, v, axes=[[1], [0]])

    def adjoint(self):
        return _MatOp(self.mat.conj().itranspose([1, 0]))


def test_lanczos_ground_state():
    H, Hd, leg = _random_hermitian_op()
    # restrict to charge sector of a random starting vector
    v0 = npc.Array.from_func(lambda s: rng.normal(size=s), [leg],
                             qtotal=leg.get_charge(0))
    op = _MatOp(H)
    E, psi, N = LanczosGroundState(op, v0, {'N_max': 40, 'P_tol': 1e-14,
                                            'reortho': True}).run()
    # exact: lowest eigenvalue within the charge sector = the block of sector 0
    sl = leg.get_slice(0)
    block = Hd[sl, sl]
    E_exact = np.linalg.eigvalsh(block)[0]
    assert abs(E - E_exact) < 1e-10
    # psi is an eigenvector
    Hpsi = op.matvec(psi)
    assert npc.norm(Hpsi - E * psi) < 1e-6


def test_lanczos_evolution():
    H, Hd, leg = _random_hermitian_op(16)
    v0 = npc.Array.from_func(lambda s: rng.normal(size=s), [leg],
                             qtotal=leg.get_charge(0)).astype(jnp.complex128)
    op = _MatOp(H.astype(jnp.complex128))
    dt = 0.1
    psi_t, N = LanczosEvolution(op, v0, {'N_max': 30, 'P_tol': 1e-16}).run(-1j * dt,
                                                                           normalize=False)
    # exact
    sl = leg.get_slice(0)
    block = Hd[sl, sl]
    v0_d = np.asarray(v0.to_ndarray())[sl.start:sl.stop]
    expected = scipy.linalg.expm(-1j * dt * block) @ v0_d
    got = np.asarray(psi_t.to_ndarray())[sl.start:sl.stop]
    assert np.linalg.norm(got - expected) < 1e-8


def test_arnoldi_dominant():
    H, Hd, leg = _random_hermitian_op(16)
    v0 = npc.Array.from_func(lambda s: rng.normal(size=s), [leg],
                             qtotal=leg.get_charge(0))
    op = _MatOp(H)
    E, psi, N = Arnoldi(op, v0, {'N_max': 16, 'which': 'LM', 'P_tol': 1e-14}).run()
    sl = leg.get_slice(0)
    block = Hd[sl, sl]
    evals = np.linalg.eigvals(block)
    E_exact = evals[np.argmax(np.abs(evals))]
    assert abs(complex(E) - complex(E_exact)) < 1e-8


def test_gmres():
    H, Hd, leg = _random_hermitian_op(16)
    # make well-conditioned: H + 10*1
    op = ShiftNpcLinearOperator(_MatOp(H), 10.)
    b = npc.Array.from_func(lambda s: rng.normal(size=s), [leg],
                            qtotal=leg.get_charge(0))
    x0 = b * 0.
    x, res = GMRES(op, x0, b, {'res': 1e-10, 'restart': 20}).run()
    assert npc.norm(op.matvec(x) - b) / npc.norm(b) < 1e-8


def test_flat_linear_operator():
    H, Hd, leg = _random_hermitian_op(20)
    flat_op = FlatHermitianOperator.from_NpcArray(H, charge_sector=tuple(leg.get_charge(0)))
    E, vecs = flat_op.eigenvectors(num_ev=1, which='SA')
    sl = leg.get_slice(0)
    E_exact = np.linalg.eigvalsh(Hd[sl, sl])[0]
    assert abs(float(np.real(E[0])) - E_exact) < 1e-10


def test_orthogonal_operator():
    H, Hd, leg = _random_hermitian_op(16)
    # use the largest charge sector (need at least 2 states for an excited level)
    qi = int(np.argmax(leg.sector_sizes()))
    v0 = npc.Array.from_func(lambda s: rng.normal(size=s), [leg],
                             qtotal=leg.get_charge(qi))
    op = _MatOp(H)
    E0, psi0, _ = LanczosGroundState(op, v0, {'N_max': 40, 'reortho': True}).run()
    op2 = OrthogonalNpcLinearOperator(op, [psi0])
    v1 = npc.Array.from_func(lambda s: rng.normal(size=s), [leg],
                             qtotal=leg.get_charge(qi))
    E1, psi1, _ = LanczosGroundState(op2, v1, {'N_max': 40, 'reortho': True}).run()
    sl = leg.get_slice(qi)
    w = np.linalg.eigvalsh(Hd[sl.start:sl.stop, sl.start:sl.stop])
    assert abs(E1 - w[1]) < 1e-8
    assert abs(complex(npc.inner(psi0.conj(), psi1, axes='range'))) < 1e-6


def test_gram_schmidt():
    leg = gen_random_legcharge(chinfo_U1, 12, qconj=1)
    vecs = [npc.Array.from_func(lambda s: rng.normal(size=s), [leg],
                                qtotal=leg.get_charge(0)) for _ in range(3)]
    ortho = gram_schmidt(vecs)
    for i, u in enumerate(ortho):
        for j, v in enumerate(ortho):
            ov = complex(npc.inner(u.conj(), v, axes='range'))
            assert abs(ov - (1. if i == j else 0.)) < 1e-12


def test_speigs():
    """Sector-restricted sparse eigensolve of the Heisenberg bond Hamiltonian."""
    from tenpy_tpu.networks.site import SpinHalfSite
    site = SpinHalfSite('Sz')
    h = npc.outer(site.Sz, site.Sz) + 0.5 * (npc.outer(site.Sp, site.Sm)
                                             + npc.outer(site.Sm, site.Sp))
    h.iset_leg_labels(['p0', 'p0*', 'p1', 'p1*'])
    h2 = h.combine_legs([['p0', 'p1'], ['p0*', 'p1*']], qconj=[+1, -1])
    W, vecs = npc.speigs(h2, [0], 2, which='SR')
    assert abs(min(np.real(W)) - (-0.75)) < 1e-12
    assert vecs[0].rank == 1


def test_svd_robust_module():
    from tenpy_tpu.linalg.svd_robust import svd as rsvd
    a = np.random.default_rng(0).normal(size=(6, 4))
    u, s, vt = rsvd(a, full_matrices=False)
    assert np.allclose(u @ np.diag(s) @ vt, a)
