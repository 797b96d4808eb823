"""Differential tests: every block-sparse op vs its dense jnp/numpy equivalent.

Mirrors the strategy of the reference's ``tests/test_np_conserved.py`` (969 LoC):
randomized inputs, compare ``op(Array).to_ndarray()`` against ``dense_op(to_ndarray())``.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tenpy_tpu.linalg import np_conserved as npc
from tenpy_tpu.linalg.charges import ChargeInfo, LegCharge, LegPipe
from random_test import (rng, random_Array, gen_random_legcharge,
                         chinfo_none, chinfo_U1, chinfo_Z2, chinfo_U1_Z3)

CHINFOS = [chinfo_none, chinfo_U1, chinfo_Z2, chinfo_U1_Z3]


def npt(a, b, **kw):
    kw.setdefault('atol', 1e-12)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), **kw)


@pytest.mark.parametrize('chinfo', CHINFOS)
def test_from_to_ndarray(chinfo):
    a = random_Array((6, 5, 4), chinfo)
    a.test_sanity()
    dense = a.to_ndarray()
    b = npc.Array.from_ndarray(dense, a.legs, qtotal=a.qtotal)
    b.test_sanity()
    npt(b.to_ndarray(), dense)
    # detect qtotal
    c = npc.Array.from_ndarray(dense, a.legs)
    assert c.qtotal == a.qtotal


@pytest.mark.parametrize('chinfo', CHINFOS)
def test_transpose_conj(chinfo):
    a = random_Array((5, 4, 6), chinfo, complex_=True)
    dense = a.to_ndarray()
    at = a.transpose([2, 0, 1])
    at.test_sanity()
    npt(at.to_ndarray(), jnp.transpose(dense, (2, 0, 1)))
    ac = a.conj()
    ac.test_sanity()
    npt(ac.to_ndarray(), jnp.conj(dense))
    # labels
    a.iset_leg_labels(['a', 'b', 'c'])
    assert a.conj().get_leg_labels() == ('a*', 'b*', 'c*')
    assert a.transpose(['b', 'c', 'a']).get_leg_labels() == ('b', 'c', 'a')


@pytest.mark.parametrize('chinfo', CHINFOS)
def test_arithmetic(chinfo):
    a = random_Array((5, 6), chinfo)
    b = npc.Array.from_func(lambda s: rng.normal(size=s), a.legs, dtype=jnp.float64,
                            qtotal=a.qtotal)
    da, db = a.to_ndarray(), b.to_ndarray()
    npt((a + b).to_ndarray(), da + db)
    npt((a - b).to_ndarray(), da - db)
    npt((2.5 * a).to_ndarray(), 2.5 * da)
    npt((a / 2).to_ndarray(), da / 2)
    npt((-a).to_ndarray(), -da)
    npt(a.unary_blockwise(jnp.abs).to_ndarray(), jnp.abs(da))
    assert abs(a.norm() - float(jnp.linalg.norm(da.ravel()))) < 1e-12


@pytest.mark.parametrize('chinfo', CHINFOS)
def test_tensordot(chinfo):
    for shape_a, shape_b, n in [((5, 4, 6), (6, 3), 1), ((5, 4), (4, 5), 2),
                                ((4, 5, 3), (3, 4, 6), 1)]:
        a = random_Array(shape_a, chinfo)
        # b's first n legs must be conj of a's last n
        legs_b = [a.legs[len(shape_a) - n + i].conj() for i in range(n)] + \
                 [gen_random_legcharge(chinfo, s) for s in shape_b[n:]]
        b = npc.Array.from_func(lambda s: rng.normal(size=s), legs_b, dtype=jnp.float64)
        if b.stored_blocks == 0:
            continue
        c = npc.tensordot(a, b, axes=n)
        d = jnp.tensordot(a.to_ndarray(), b.to_ndarray(), axes=n)
        if isinstance(c, npc.Array):
            c.test_sanity()
            npt(c.to_ndarray(), d, rtol=1e-10)
        else:
            npt(c, d, rtol=1e-10)


def test_tensordot_labels():
    a = random_Array((5, 4, 6), chinfo_U1)
    a.iset_leg_labels(['x', 'y', 'z'])
    b = npc.Array.from_func(lambda s: rng.normal(size=s),
                            [a.legs[2].conj(), a.legs[1].conj()], dtype=jnp.float64)
    b.iset_leg_labels(['z*', 'y*'])
    c = npc.tensordot(a, b, axes=[['z', 'y'], ['z*', 'y*']])
    c.test_sanity()
    assert c.get_leg_labels() == ('x',)
    d = jnp.tensordot(a.to_ndarray(), b.to_ndarray(), axes=[[2, 1], [0, 1]])
    npt(c.to_ndarray(), d, rtol=1e-10)


def test_tensordot_full_contraction():
    a = random_Array((5, 4), chinfo_U1)
    b = npc.Array.from_func(lambda s: rng.normal(size=s),
                            [a.legs[0].conj(), a.legs[1].conj()], dtype=jnp.float64,
                            qtotal=chinfo_U1.make_valid(-np.array(a.qtotal)))
    c = npc.tensordot(a, b, axes=[[0, 1], [0, 1]])
    d = jnp.tensordot(a.to_ndarray(), b.to_ndarray(), axes=[[0, 1], [0, 1]])
    npt(c, d, rtol=1e-10)
    # inner
    e = npc.inner(a, b, axes='range')
    npt(e, d, rtol=1e-10)


@pytest.mark.parametrize('chinfo', CHINFOS)
def test_outer_trace(chinfo):
    a = random_Array((3, 4), chinfo)
    b = random_Array((2, 3), chinfo)
    c = npc.outer(a, b)
    c.test_sanity()
    npt(c.to_ndarray(), jnp.tensordot(a.to_ndarray(), b.to_ndarray(), axes=0))
    # trace: build array with contractible pair
    leg = gen_random_legcharge(chinfo, 5)
    legs = [leg, gen_random_legcharge(chinfo, 4), leg.conj()]
    d = npc.Array.from_func(lambda s: rng.normal(size=s), legs, dtype=jnp.float64)
    if d.stored_blocks:
        t = npc.trace(d, 0, 2)
        t.test_sanity()
        npt(t.to_ndarray(), jnp.trace(d.to_ndarray(), axis1=0, axis2=2), rtol=1e-10)


@pytest.mark.parametrize('chinfo', CHINFOS)
def test_combine_split(chinfo):
    a = random_Array((5, 4, 6, 3), chinfo)
    a.iset_leg_labels(['a', 'b', 'c', 'd'])
    dense = np.asarray(a.to_ndarray())
    c = a.combine_legs([['b', 'c']])
    c.test_sanity()
    assert c.get_leg_labels() == ('a', '(b.c)', 'd')
    pipe = c.legs[1]
    # dense check via the pipe's flat map
    dc = np.asarray(c.to_ndarray())
    for _ in range(30):
        i, j, k, l = [rng.randint(s) for s in a.shape]
        f = pipe.map_incoming_flat([j, k])
        assert abs(dc[i, f, l] - dense[i, j, k, l]) < 1e-12
    # split back
    s = c.split_legs()
    s.test_sanity()
    assert s.get_leg_labels() == ('a', 'b', 'c', 'd')
    npt(s.to_ndarray(), dense)


def test_combine_two_groups():
    a = random_Array((4, 3, 5, 2), chinfo_U1)
    a.iset_leg_labels(['a', 'b', 'c', 'd'])
    c = a.combine_legs([['a', 'b'], ['c', 'd']], qconj=[+1, -1])
    c.test_sanity()
    assert c.rank == 2
    s = c.split_legs()
    npt(s.to_ndarray(), a.to_ndarray())
    # matrix contraction equals tensor contraction
    b = npc.Array.from_func(lambda sh: rng.normal(size=sh),
                            [a.legs[2].conj(), a.legs[3].conj()], dtype=jnp.float64)
    if b.stored_blocks:
        bc = b.combine_legs([[0, 1]], qconj=[+1])
        r1 = npc.tensordot(c, bc, axes=[[1], [0]])
        r2 = npc.tensordot(a, b, axes=[[2, 3], [0, 1]]).combine_legs([[0, 1]], qconj=[+1])
        npt(r1.to_ndarray(), r2.to_ndarray(), rtol=1e-10)


@pytest.mark.parametrize('chinfo', CHINFOS)
def test_svd(chinfo):
    a = random_Array((8, 9), chinfo)
    U, S, VH = npc.svd(a, inner_labels=['vR', 'vL'])
    U.test_sanity()
    VH.test_sanity()
    # reconstruction
    US = U.scale_axis(S, 1)
    rec = npc.tensordot(US, VH, axes=[[1], [0]])
    npt(rec.to_ndarray(), a.to_ndarray(), rtol=1e-10)
    # isometry
    UU = npc.tensordot(U.conj(), U, axes=[[0], [0]])
    npt(UU.to_ndarray(), jnp.eye(UU.shape[0]), rtol=1e-10)
    VV = npc.tensordot(VH, VH.conj(), axes=[[1], [1]])
    npt(VV.to_ndarray(), jnp.eye(VV.shape[0]), rtol=1e-10)
    # singular values match dense
    s_dense = jnp.linalg.svd(a.to_ndarray(), compute_uv=False)
    npt(jnp.sort(S)[::-1], s_dense[:len(S)], rtol=1e-10)


@pytest.mark.parametrize('chinfo', CHINFOS)
def test_qr(chinfo):
    a = random_Array((9, 6), chinfo)
    Q, R = npc.qr(a, inner_labels=['vR', 'vL'])
    Q.test_sanity()
    R.test_sanity()
    rec = npc.tensordot(Q, R, axes=[[1], [0]])
    npt(rec.to_ndarray(), a.to_ndarray(), rtol=1e-10)
    QQ = npc.tensordot(Q.conj(), Q, axes=[[0], [0]])
    npt(QQ.to_ndarray(), jnp.eye(QQ.shape[0]), rtol=1e-10)
    # lq
    L, Q2 = npc.lq(a)
    rec2 = npc.tensordot(L, Q2, axes=[[1], [0]])
    npt(rec2.to_ndarray(), a.to_ndarray(), rtol=1e-10)
    QQ2 = npc.tensordot(Q2, Q2.conj(), axes=[[1], [1]])
    npt(QQ2.to_ndarray(), jnp.eye(QQ2.shape[0]), rtol=1e-10)


@pytest.mark.parametrize('chinfo', CHINFOS)
def test_eigh_expm(chinfo):
    leg = gen_random_legcharge(chinfo, 7)
    a = npc.Array.from_func(lambda s: rng.normal(size=s), [leg, leg.conj()],
                            dtype=jnp.float64)
    a = a + a.conj().itranspose([1, 0])  # hermitian (h.c. restores the leg structure)
    W, V = npc.eigh(a)
    V.test_sanity()
    # A V = V diag(W)
    AV = npc.tensordot(a, V, axes=[[1], [0]])
    VW = V.scale_axis(W, 1)
    npt(AV.to_ndarray(), VW.to_ndarray(), rtol=1e-9, atol=1e-9)
    # eigvalsh consistent
    W2 = npc.eigvalsh(a)
    npt(jnp.sort(W), jnp.sort(W2), rtol=1e-10)
    # expm
    e = npc.expm(a * 0.1)
    import scipy.linalg
    npt(e.to_ndarray(), scipy.linalg.expm(np.asarray(a.to_ndarray()) * 0.1),
        rtol=1e-8, atol=1e-10)


def test_diag_scale_axis():
    leg = gen_random_legcharge(chinfo_U1, 6)
    s = rng.normal(size=6)
    d = npc.diag(jnp.asarray(s), leg)
    d.test_sanity()
    npt(d.to_ndarray(), np.diag(s))
    eye = npc.diag(1., leg)
    npt(eye.to_ndarray(), np.eye(6))
    a = random_Array((6, 5), chinfo_U1)
    a2 = npc.Array.from_func(lambda sh: rng.normal(size=sh), [leg, a.legs[1]],
                             dtype=jnp.float64)
    if a2.stored_blocks:
        scaled = a2.scale_axis(jnp.asarray(s), 0)
        npt(scaled.to_ndarray(), np.asarray(a2.to_ndarray()) * s[:, None])


def test_iproject():
    a = random_Array((8, 6), chinfo_U1)
    mask = rng.random(8) > 0.4
    if not mask.any():
        mask[0] = True
    b = a.copy()
    b.iproject(mask, 0)
    b.test_sanity()
    npt(b.to_ndarray(), np.asarray(a.to_ndarray())[mask])


def test_concatenate_grid():
    a = random_Array((4, 5), chinfo_U1)
    b = npc.Array.from_func(lambda s: rng.normal(size=s),
                            [gen_random_legcharge(chinfo_U1, 3, qconj=a.legs[0].qconj),
                             a.legs[1]], dtype=jnp.float64, qtotal=a.qtotal)
    if b.stored_blocks == 0:
        return
    c = npc.concatenate([a, b], axis=0)
    c.test_sanity()
    npt(c.to_ndarray(), np.concatenate([a.to_ndarray(), b.to_ndarray()], axis=0))


def test_grid_outer():
    # MPO-style grid: 2x2 grid of onsite operators
    leg_p = gen_random_legcharge(chinfo_U1, 3, qconj=+1)
    ops = {}
    for name, qt in [('A', None), ('B', None)]:
        ops[name] = npc.Array.from_func(lambda s: rng.normal(size=s),
                                        [leg_p, leg_p.conj()], dtype=jnp.float64)
    grid = [[ops['A'], ops['B']], [None, ops['A']]]
    leg_L = LegCharge.from_qflat(chinfo_U1, [[0], [0]], qconj=+1)
    res = npc.grid_outer(grid, [leg_L, leg_L.conj()])
    res.test_sanity()
    dense = np.zeros((2, 2, 3, 3))
    for i in range(2):
        for j in range(2):
            if grid[i][j] is not None:
                dense[i, j] = np.asarray(grid[i][j].to_ndarray())
    npt(res.to_ndarray(), dense)


def test_squeeze_add_trivial():
    a = random_Array((5, 4), chinfo_U1)
    b = a.add_trivial_leg(1, label='tr')
    b.test_sanity()
    assert b.shape == (5, 1, 4)
    c = b.squeeze(1)
    c.test_sanity()
    npt(c.to_ndarray(), a.to_ndarray())
    assert c.qtotal == a.qtotal


def test_gauge_total_charge():
    a = random_Array((5, 4), chinfo_U1, qtotal=[1])
    b = a.gauge_total_charge(0, newqtotal=[0])
    b.test_sanity()
    assert b.qtotal == (0,)
    npt(b.to_ndarray(), a.to_ndarray())


def test_orthogonal_columns():
    a = random_Array((8, 3), chinfo_U1)
    Q, R = npc.qr(a)
    oc = npc.orthogonal_columns(Q)
    if oc.shape[1] > 0:
        ov = npc.tensordot(Q.conj(), oc, axes=[[0], [0]])
        assert ov.norm() < 1e-10
        oo = npc.tensordot(oc.conj(), oc, axes=[[0], [0]])
        npt(oo.to_ndarray(), np.eye(oc.shape[1]), rtol=1e-10)
    assert Q.shape[1] + oc.shape[1] == 8


def test_pytree_jit():
    """Array round-trips through jax.jit with static structure."""
    import jax
    a = random_Array((6, 6), chinfo_U1)
    b = npc.Array.from_func(lambda s: rng.normal(size=s),
                            [a.legs[1].conj(), gen_random_legcharge(chinfo_U1, 5)],
                            dtype=jnp.float64)
    if b.stored_blocks == 0:
        return
    calls = []

    @jax.jit
    def f(x, y):
        calls.append(1)
        return npc.tensordot(x, y, axes=1)

    c1 = f(a, b)
    c2 = f(a * 2.0, b)   # same structure -> no retrace
    assert len(calls) == 1
    npt((c1 * 2.0).to_ndarray(), c2.to_ndarray(), rtol=1e-10)


@pytest.mark.parametrize('chinfo', CHINFOS)
def test_itemaccess(chinfo):
    """Element get/set and take_slice vs dense (reference test:202)."""
    a = random_Array((6, 5, 4), chinfo)
    dense = a.to_ndarray()
    rs = np.random.default_rng(5)
    for _ in range(10):
        i, j, k = (int(rs.integers(0, n)) for n in a.shape)
        npt(a[i, j, k], dense[i, j, k])
    # setitem on a stored (charge-allowed) element
    nz = np.argwhere(np.abs(dense) > 1e-10)
    if len(nz):
        i, j, k = map(int, nz[0])
        a[i, j, k] = 3.25
        dense[i, j, k] = 3.25
        npt(a.to_ndarray(), dense)
        a.test_sanity()
    # setting a charge-forbidden element to zero is a no-op; nonzero raises
    zero_pos = np.argwhere(np.abs(dense) < 1e-14)
    if len(zero_pos) and chinfo.qnumber > 0:
        for pos in map(tuple, zero_pos):
            blk = a.get_block([a.legs[ax].get_qindex(pos[ax])[0]
                               for ax in range(3)])
            if blk is None:
                a[pos] = 0.           # allowed
                try:
                    a[pos] = 1.
                except ValueError:
                    pass
                else:
                    # allowed only if the block satisfies the charge rule
                    npt(a[pos], 1.)
                break


@pytest.mark.parametrize('chinfo', CHINFOS)
def test_take_slice(chinfo):
    a = random_Array((6, 5, 4), chinfo)
    a.iset_leg_labels(['x', 'y', 'z'])
    dense = a.to_ndarray()
    s = a.take_slice(2, 'y')
    s.test_sanity()
    assert s.get_leg_labels() == ('x', 'z')
    npt(s.to_ndarray(), dense[:, 2, :])
    s2 = a.take_slice([1, 3], ['x', 'z'])
    s2.test_sanity()
    npt(s2.to_ndarray(), dense[1, :, 3])
    # qtotal bookkeeping: charges of the fixed indices removed
    assert tuple(s2.qtotal) == tuple(a.chinfo.make_valid(
        np.asarray(a.qtotal) - np.asarray(a.legs[0].get_charge(
            a.legs[0].get_qindex(1)[0]))
        - np.asarray(a.legs[2].get_charge(a.legs[2].get_qindex(3)[0]))))


@pytest.mark.parametrize('chinfo', CHINFOS)
def test_getitem_slices(chinfo):
    a = random_Array((6, 5, 4), chinfo)
    dense = a.to_ndarray()
    npt(a[2].to_ndarray(), dense[2])
    npt(a[:, 1, :].to_ndarray(), dense[:, 1, :])
    npt(a[..., 3].to_ndarray(), dense[..., 3])
    npt(a[1:4].to_ndarray(), dense[1:4])
    mask = np.zeros(5, bool)
    mask[[0, 2, 4]] = True
    npt(a[:, mask, :].to_ndarray(), dense[:, mask, :])
    npt(a[0, :, 2:].to_ndarray(), dense[0, :, 2:])
