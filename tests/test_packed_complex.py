"""Complex (split re/im channel) support of the packed device layer.

TPU backends have no complex128, so :class:`~tenpy_tpu.linalg.packed.PackedArray`
stores complex tensors as two f64 channels with manual complex arithmetic
(3-mult GEMMs, channelized Jacobi rotations).  These CPU differential tests
pin the channel algebra against the host np_conserved path, which uses native
complex128 (reference engine is complex throughout,
``tenpy/linalg/np_conserved.py:3612``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tenpy_tpu.linalg import np_conserved as npc, packed as pk, \
    packed_split as ps
from tenpy_tpu.linalg.charges import ChargeInfo, LegCharge

from random_test import gen_random_legcharge


def _rand_complex_array(chinfo, legs, qtotal=None):
    return npc.Array.from_func(
        lambda s: (np.random.standard_normal(s)
                   + 1j * np.random.standard_normal(s)),
        legs, dtype=np.complex128, qtotal=qtotal)


def test_pack_unpack_complex_roundtrip():
    rng = np.random.default_rng(5)
    chinfo = ChargeInfo([1], ['q'])
    legs = [gen_random_legcharge(chinfo, 12) for _ in range(3)]
    a = _rand_complex_array(chinfo, legs)
    p = pk.pack(a, multiple=8)
    assert p.iscomplex and p.dtype == jnp.complex128
    assert all(d.dtype == jnp.float64 for d in p.data + p.data_im)
    b = pk.unpack(p, orig_legs=a.legs)
    assert np.allclose(a.to_ndarray(), b.to_ndarray())


def test_packed_tensordot_complex_vs_npc():
    np.random.seed(7)
    chinfo = ChargeInfo([1], ['q'])
    l1 = gen_random_legcharge(chinfo, 10)
    l2 = gen_random_legcharge(chinfo, 8)
    l3 = gen_random_legcharge(chinfo, 9)
    a = _rand_complex_array(chinfo, [l1, l2])
    b = _rand_complex_array(chinfo, [l2.conj(), l3])
    a.iset_leg_labels(['x', 'y'])
    b.iset_leg_labels(['y*', 'z'])
    want = npc.tensordot(a, b, axes=[['y'], ['y*']])
    ap = pk.pack(a, multiple=8)
    bp = pk.pack(b, multiple=8)
    got = pk.unpack(pk.tensordot(ap, bp, axes=(['y'], ['y*'])),
                    orig_legs=want.legs)
    assert np.allclose(got.to_ndarray(), want.to_ndarray(), atol=1e-12)

    # mixed real x complex
    c = npc.Array.from_func(np.random.standard_normal, [l2.conj(), l3])
    c.iset_leg_labels(['y*', 'z'])
    want2 = npc.tensordot(a, c, axes=[['y'], ['y*']])
    cp = pk.pack(c, multiple=8)
    got2 = pk.unpack(pk.tensordot(ap, cp, axes=(['y'], ['y*'])),
                     orig_legs=want2.legs)
    assert got2.dtype == np.complex128
    assert np.allclose(got2.to_ndarray(), want2.to_ndarray(), atol=1e-12)


def test_packed_complex_conj_inner_norm():
    np.random.seed(11)
    chinfo = ChargeInfo([1], ['q'])
    legs = [gen_random_legcharge(chinfo, 8) for _ in range(2)]
    a = _rand_complex_array(chinfo, legs)
    b = _rand_complex_array(chinfo, legs)
    ap = pk.pack(a, multiple=8)
    bp = pk.pack(b, multiple=8)
    want = complex(npc.inner(a.conj(), b, axes='range'))
    got = complex(np.asarray(pk.inner(ap.conj(), bp)))
    assert abs(want - got) < 1e-12
    re, im = pk.inner_parts(ap.conj(), bp)
    assert abs(complex(float(re), float(im)) - want) < 1e-12
    assert abs(float(pk.inner_re(ap, bp)) - want.real) < 1e-12
    assert abs(float(np.asarray(pk.norm(ap))) - float(npc.norm(a))) < 1e-12
    # scalar algebra incl. complex scalars
    s = 0.3 - 0.7j
    want3 = (a * s - b).to_ndarray()
    got3 = pk.unpack(ap * s - bp, orig_legs=a.legs).to_ndarray()
    assert np.allclose(got3, want3, atol=1e-12)


@pytest.mark.parametrize('backend', ['svd', 'jacobi', 'jacobi32'])
def test_jacobi_complex_channels(backend):
    rng = np.random.default_rng(3)
    B, R, C = 3, 24, 16
    M = rng.standard_normal((B, R, C)) + 1j * rng.standard_normal((B, R, C))
    # make one batch entry rank-deficient (padded-sector regime)
    M[1, :, 10:] = 0.
    M[1, 17:, :] = 0.
    (Ur, Ui), S, (Vr, Vi) = ps._decomp(jnp.asarray(M.real), backend,
                                       M_im=jnp.asarray(M.imag))
    U = np.asarray(Ur) + 1j * np.asarray(Ui)
    V = np.asarray(Vr) + 1j * np.asarray(Vi)
    S = np.asarray(S)
    s_ref = np.linalg.svd(M, compute_uv=False)
    tol = 1e-9 if backend != 'svd' else 1e-12
    assert np.allclose(np.sort(S, axis=-1)[:, ::-1], s_ref[:, :S.shape[1]],
                       atol=tol)
    # reconstruction + isometry
    rec = np.einsum('bik,bk,bjk->bij', U, S, V.conj())
    assert np.allclose(rec, M, atol=1e-8 if backend == 'jacobi32' else tol)
    UhU = np.einsum('bki,bkj->bij', U.conj(), U)
    for b in range(B):
        d = np.diagonal(UhU[b]).real
        assert np.abs(d * (1 - d)).max() < 1e-9
        assert np.abs(UhU[b] - np.diag(np.diagonal(UhU[b]))).max() < 1e-9


def test_split_truncate_complex():
    """Complex theta: split must reproduce the host svd_theta decomposition."""
    from tenpy_tpu.networks.mps import MPS
    from tenpy_tpu.models.spins import SpinChain
    from tenpy_tpu.algorithms import dmrg
    from tenpy_tpu.linalg.truncation import svd_theta
    from tenpy_tpu.tools.params import Config
    m = SpinChain({'S': 1, 'L': 8, 'Jx': 1., 'Jy': 1., 'Jz': 1.,
                   'bc_MPS': 'finite', 'conserve': 'Sz'})
    psi = MPS.from_product_state(m.lat.mps_sites(),
                                 (['1.0', '-1.0'] * 8)[:8], bc='finite')
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': 24, 'svd_min': 1e-12},
        'max_sweeps': 3, 'mixer': True})
    eng.run()
    i0 = 3
    theta = psi.get_theta(i0, 2).itranspose(['vL', 'p0', 'p1', 'vR'])
    # rotate into a genuinely complex gauge (physics unchanged)
    theta = theta * np.exp(0.3j)
    theta = theta + 0.1j * theta
    qtot_A = psi.get_B(i0, None).qtotal

    th2 = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
    U, S, VH, err, renorm = svd_theta(
        th2, Config({'chi_max': 20, 'svd_min': 1e-10}, 'tp'),
        qtotal_LR=[qtot_A, None])

    theta_p = pk.pack(theta, multiple=16, pad_labels=('vL', 'vR'))
    assert theta_p.iscomplex
    bond = ps.bond_layout(theta_p.legs, theta_p.qtotal, qtot_A, multiple=16)
    plan = ps.split_plan(theta_p, bond, qtot_A, group_multiple=16)
    A, Sf, B, err_p, renorm_p, n_kept = ps.split_truncate(
        theta_p, plan, chi_max=20, svd_min=1e-10, backend='jacobi')
    Sf = np.asarray(Sf)
    assert int(n_kept) == len(S)
    assert np.allclose(np.sort(np.asarray(S))[::-1], np.sort(Sf[Sf > 0])[::-1],
                       atol=1e-9)
    # A isometric (complex)
    AA = pk.unpack(pk.tensordot(A.conj(), A, axes=(['vL*', 'p*'],
                                                   ['vL', 'p'])))
    for blk in AA._data:
        blk = np.asarray(blk)
        d = np.diagonal(blk).real
        assert np.abs(d * (1. - d)).max() < 1e-10
        assert np.abs(blk - np.diag(np.diagonal(blk))).max() < 1e-10
    # reconstruction matches the host-truncated theta
    rec = pk.tensordot(ps.scale_bond(A, jnp.asarray(Sf),
                                     ps.scale_bond_plan(A, 'vR')),
                       B, axes=(['vR'], ['vL']))
    rec = pk.PackedArray(rec.legs, rec.qtotal, ('vL', 'p0', 'p1', 'vR'),
                         rec.shapes, rec.qdatas, rec.data, rec.dtype,
                         rec.data_im)
    rec_h = pk.unpack(rec, orig_legs=[theta.get_leg(l)
                                      for l in ('vL', 'p0', 'p1', 'vR')])
    th_trunc = npc.tensordot(U.split_legs().scale_axis(np.asarray(S), 'vR'),
                             VH.split_legs(), axes=[['vR'], ['vL']])
    th_trunc.itranspose(['vL', 'p0', 'p1', 'vR'])
    diff = npc.norm(rec_h * float(np.asarray(renorm_p)) - th_trunc * renorm)
    assert float(diff) < 1e-9


def test_packed_lanczos_complex_vs_host():
    """Complex H (hopping phases): packed device Lanczos == host Lanczos."""
    np.random.seed(17)
    from tenpy_tpu.networks.mps import MPS
    from tenpy_tpu.networks.mpo import MPOEnvironment
    from tenpy_tpu.models.hofstadter import HofstadterFermions
    from tenpy_tpu.algorithms import dmrg
    from tenpy_tpu.algorithms.mps_common import (
        _lanczos_K_2site_packed_impl, _matvec_2site_packed)
    m = HofstadterFermions({'Lx': 2, 'Ly': 4, 'phi': (1, 4), 'bc_y': 'cylinder',
                            'bc_MPS': 'finite', 'conserve': 'N'})
    assert jnp.issubdtype(m.H_MPO.dtype, jnp.complexfloating)
    L = m.lat.N_sites
    psi = MPS.from_product_state(m.lat.mps_sites(),
                                 (['full', 'empty'] * L)[:L], bc='finite')
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': 16, 'svd_min': 1e-12},
        'max_sweeps': 2, 'mixer': True})
    E_host, _ = eng.run()
    i0 = L // 2
    env = MPOEnvironment(psi, m.H_MPO, psi)
    LP = env.get_LP(i0).transpose(['vR*', 'wR', 'vR'])
    RP = env.get_RP(i0 + 1).transpose(['wL', 'vL', 'vL*'])
    W0 = m.H_MPO.get_W(i0).transpose(['wL', 'wR', 'p', 'p*'])
    W1 = m.H_MPO.get_W(i0 + 1).transpose(['wL', 'wR', 'p', 'p*'])
    theta = psi.get_theta(i0, 2).itranspose(['vL', 'p0', 'p1', 'vR'])
    VIRT = ('vL', 'vR', 'vL*', 'vR*')
    LPp = pk.pack(LP, multiple=8, pad_labels=VIRT)
    RPp = pk.pack(RP, multiple=8, pad_labels=VIRT)
    W0p = pk.pack(W0, pad=False).replace_labels(['p', 'p*'], ['p0', 'p0*'])
    W1p = pk.pack(W1, pad=False).replace_labels(['p', 'p*'], ['p1', 'p1*'])
    thp = pk.pack(theta, multiple=8, pad_labels=VIRT)

    # matvec differential: packed complex vs host npc
    from tenpy_tpu.algorithms.mps_common import TwoSiteH
    heff = TwoSiteH(env, i0, combine=False)
    want = heff.matvec(theta.copy())
    want.itranspose(['vL', 'p0', 'p1', 'vR'])
    got = pk.unpack(_matvec_2site_packed(LPp, RPp, W0p, W1p, thp),
                    orig_legs=want.legs)
    assert np.allclose(got.to_ndarray(), want.to_ndarray(), atol=1e-11)

    # fused Lanczos ground state matches the host Lanczos energy
    E0, th_gs, n, resid = jax.jit(
        _lanczos_K_2site_packed_impl,
        static_argnums=(5, 6, 7, 8))(LPp, RPp, W0p, W1p, thp, 20, 1e-15, 2,
                                     False)
    from tenpy_tpu.linalg.krylov_based import LanczosGroundState
    E_ref, _, _ = LanczosGroundState(heff, theta, {'N_min': 20, 'N_max': 20,
                                                   'reortho': True}).run()
    assert abs(float(E0) - E_ref) < 1e-8
