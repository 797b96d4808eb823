"""Tests for charge metadata (mirrors reference tests/test_charges.py coverage)."""
import numpy as np
import pytest

from tenpy_tpu.linalg.charges import ChargeInfo, LegCharge, LegPipe
from random_test import rng, gen_random_legcharge, chinfo_U1, chinfo_Z2, chinfo_U1_Z3


def test_chargeinfo():
    ci = ChargeInfo([1, 2], ['U1', 'Z2'])
    assert ci.qnumber == 2
    q = ci.make_valid([[5, 3], [-2, -1]])
    assert q.tolist() == [[5, 1], [-2, 1]]
    assert ci.check_valid([[3, 1]])
    assert not ci.check_valid([[3, 2]])
    assert ci == ChargeInfo([1, 2])
    assert hash(ci) == hash(ChargeInfo([1, 2], ['U1', 'Z2']))
    tr = ChargeInfo.trivial()
    assert tr.qnumber == 0
    assert tr.make_valid(np.zeros((3, 0))).shape == (3, 0)


def test_legcharge_basic():
    ci = chinfo_U1
    leg = LegCharge.from_qflat(ci, [[0], [0], [1], [1], [1], [-1]])
    assert leg.block_number == 3
    assert leg.slices.tolist() == [0, 2, 5, 6]
    assert leg.charges.tolist() == [[0], [1], [-1]]
    assert leg.ind_len == 6
    qi, rem = leg.get_qindex(3)
    assert (qi, rem) == (1, 1)
    assert np.array_equal(leg.to_qflat(), [[0], [0], [1], [1], [1], [-1]])
    # sort
    perm, sleg = leg.sort()
    assert sleg.is_sorted()
    assert np.array_equal(sleg.to_qflat(), np.asarray(leg.to_qflat())[perm])
    # conj / contractible
    leg.test_contractible(leg.conj())
    with pytest.raises(ValueError):
        leg.test_contractible(leg)
    # flip
    flipped = leg.flip_charges_qconj()
    assert flipped.qconj == -leg.qconj
    assert flipped.charges.tolist() == [[0], [-1], [1]]


def test_legcharge_bunch_project():
    ci = chinfo_U1
    leg = LegCharge.from_qind(ci, [0, 2, 4, 7], [[1], [1], [0]])
    assert not leg.is_bunched()
    idx, bleg = leg.bunch()
    assert bleg.block_number == 2
    assert bleg.slices.tolist() == [0, 4, 7]
    mask = np.array([True, False, True, True, False, False, True])
    map_qind, block_masks, pleg = leg.project(mask)
    assert pleg.ind_len == 4
    assert map_qind.tolist() == [0, 1, 2]
    mask2 = np.array([False, False, True, True, False, False, True])
    map_qind2, _, pleg2 = leg.project(mask2)
    assert map_qind2.tolist() == [-1, 0, 1]
    assert pleg2.ind_len == 3


@pytest.mark.parametrize('chinfo', [chinfo_U1, chinfo_Z2, chinfo_U1_Z3])
def test_legpipe(chinfo):
    legs = [gen_random_legcharge(chinfo, n) for n in [5, 7, 3]]
    pipe = LegPipe(legs)
    assert pipe.ind_len == 5 * 7 * 3
    assert pipe.is_sorted() and pipe.is_bunched()
    # total charge of fused index == sum of constituents, for random flat indices
    for _ in range(20):
        incoming = [rng.randint(l.ind_len) for l in legs]
        fused_flat = pipe.map_incoming_flat(incoming)
        q_sum = np.zeros(chinfo.qnumber, np.int64)
        for l, i in zip(legs, incoming):
            qi, _ = l.get_qindex(i)
            q_sum += l.charges[qi] * l.qconj
        fqi, _ = pipe.get_qindex(fused_flat)
        q_pipe = pipe.charges[fqi] * pipe.qconj
        assert np.array_equal(chinfo.make_valid(q_sum), chinfo.make_valid(q_pipe))
    # map is a bijection
    seen = set()
    for i in range(legs[0].ind_len):
        for j in range(legs[1].ind_len):
            for k in range(legs[2].ind_len):
                f = pipe.map_incoming_flat([i, j, k])
                assert 0 <= f < pipe.ind_len
                seen.add(f)
    assert len(seen) == pipe.ind_len


def test_legpipe_conj():
    legs = [gen_random_legcharge(chinfo_U1, n) for n in [4, 6]]
    pipe = LegPipe(legs, qconj=-1)
    cpipe = pipe.conj()
    pipe.test_contractible(cpipe)
    assert all(l1.qconj == -l2.qconj for l1, l2 in zip(pipe.legs, cpipe.legs))


def test_add_drop_change_charge():
    """Array.add_charge / drop_charge / change_charge (ref np_conserved.py:1244)."""
    import numpy as np
    from tenpy_tpu.linalg import np_conserved as npc
    from tenpy_tpu.linalg.charges import ChargeInfo, LegCharge

    ci = ChargeInfo([1], ['Sz'])
    leg = LegCharge.from_qflat(ci, [[1], [-1]])
    Sz = npc.Array.from_ndarray(np.diag([0.5, -0.5]), [leg, leg.conj()],
                                labels=['p', 'p*'])
    # add a parity Z2 charge
    ci2 = ChargeInfo([2], ['par'])
    add = LegCharge.from_qflat(ci2, [[1], [0]])
    Sz2 = Sz.add_charge([add, add.conj()])
    assert Sz2.chinfo.qnumber == 2
    assert Sz2.chinfo.names == ('Sz', 'par')
    assert np.allclose(Sz2.to_ndarray(), Sz.to_ndarray())
    # drop the added charge again
    Sz3 = Sz2.drop_charge('par')
    assert Sz3.chinfo.qnumber == 1
    assert np.allclose(Sz3.to_ndarray(), Sz.to_ndarray())
    # drop all
    Sz4 = Sz2.drop_charge()
    assert Sz4.chinfo.qnumber == 0
    assert np.allclose(Sz4.to_ndarray(), Sz.to_ndarray())
    # change U(1) -> Z_2
    Sz5 = Sz.change_charge('Sz', 2, 'Sz_parity')
    assert Sz5.chinfo.mod == (2,)
    assert np.allclose(Sz5.to_ndarray(), Sz.to_ndarray())
    for a in (Sz2, Sz3, Sz4, Sz5):
        a.test_sanity()
