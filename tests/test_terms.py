"""Tests for tenpy_tpu.networks.terms.

Coverage modeled on the reference's ``tests/test_terms.py`` (692 LoC): the
TermList algebra, onsite/coupling/multi-coupling bookkeeping, JW-string
handling for fermions, exponentially decaying couplings, and — the strong
check — that terms pushed through MPOGraph -> MPO reproduce exact
diagonalization / dense expectations on small systems.
"""
import numpy as np
import pytest

from tenpy_tpu.networks import terms as terms_mod
from tenpy_tpu.networks.site import SpinHalfSite, FermionSite
from tenpy_tpu.networks.mpo import MPOGraph
from tenpy_tpu.networks.mps import MPS


spin = SpinHalfSite(conserve='Sz')
ferm = FermionSite(conserve='N')


def test_TermList_basics():
    tl = terms_mod.TermList([[('Sz', 0)], [('Sz', 0), ('Sz', 1)]], [0.5, 2.])
    assert len(tl.terms) == 2
    s = str(tl)
    assert 'Sz' in s
    tl2 = tl + tl
    assert len(tl2.terms) == 4
    tl3 = tl * 3.
    assert np.allclose(tl3.strength, [1.5, 6.])
    # shift
    sh = tl.shift(2)
    assert sh.terms[0] == [('Sz', 2)]
    assert tl.max_range() >= 1


def test_TermList_order_combine():
    # unordered term with two ops on the same site combines operators
    tl = terms_mod.TermList([[('Sz', 1), ('Sz', 0)], [('Sp', 0), ('Sm', 0)]],
                            [1., 1.])
    tl.order_combine([spin] * 2)
    for term in tl.terms:
        idx = [i for _, i in term]
        assert idx == sorted(idx)
    # the Sp Sm on site 0 must have fused into a single op entry
    assert len(tl.terms[1]) == 1


def test_onsite_terms():
    ot = terms_mod.OnsiteTerms(4)
    ot.add_onsite_term(0.25, 0, 'Sz')
    ot.add_onsite_term(0.75, 0, 'Sz')   # same (i, op): strengths add
    ot.add_onsite_term(-1., 3, 'Sz')
    assert ot.onsite_terms[0] == {'Sz': 1.0}
    arrs = ot.to_Arrays([spin] * 4)
    assert arrs[1] is None and arrs[2] is None
    np.testing.assert_allclose(arrs[0].to_ndarray(),
                               spin.get_op('Sz').to_ndarray())
    # remove_zeros drops canceled terms
    ot.add_onsite_term(1., 3, 'Sz')
    ot.remove_zeros()
    assert 3 not in [i for i, d in enumerate(ot.onsite_terms) if d]
    tl = ot.to_TermList()
    assert all(len(t) == 1 for t in tl.terms)


def test_onsite_to_nn_bond():
    """Onsite terms distributed onto neighboring bond Hamiltonians."""
    ot = terms_mod.OnsiteTerms(3)
    for i in range(3):
        ot.add_onsite_term(1., i, 'Sz')
    H_bond = [None] * 3
    ot.add_to_nn_bond_Arrays(H_bond, [spin] * 3, finite=True)
    # finite chain: bond (0,1) and (1,2); the total must equal sum_i Sz_i
    Sz = spin.get_op('Sz').to_ndarray()
    Id = np.eye(2)

    def kron3(a, b, c):
        return np.kron(np.kron(a, b), c)

    expect = kron3(Sz, Id, Id) + kron3(Id, Sz, Id) + kron3(Id, Id, Sz)
    h01 = H_bond[1].to_ndarray().transpose(0, 2, 1, 3).reshape(4, 4)
    h12 = H_bond[2].to_ndarray().transpose(0, 2, 1, 3).reshape(4, 4)
    total = np.kron(h01, Id) + np.kron(Id, h12)
    np.testing.assert_allclose(total, expect, atol=1e-14)


def test_coupling_terms():
    ct = terms_mod.CouplingTerms(4)
    ct.add_coupling_term(1., 0, 2, 'Sz', 'Sz')
    ct.add_coupling_term(2., 0, 2, 'Sz', 'Sz')   # duplicate: adds
    ct.add_coupling_term(0.5, 1, 3, 'Sp', 'Sm')
    assert ct.max_range() == 2
    d = ct.coupling_terms
    assert d[0]['Sz', 'Id'][2]['Sz'] == 3.
    ct.remove_zeros()
    tl = ct.to_TermList()
    assert len(tl.terms) == 2
    with pytest.raises(ValueError):
        ct.add_coupling_term(1., 2, 2, 'Sz', 'Sz')   # i < j required


def test_coupling_terms_to_nn_bond():
    ct = terms_mod.CouplingTerms(3)
    ct.add_coupling_term(1., 0, 1, 'Sz', 'Sz')
    ct.add_coupling_term(0.5, 1, 2, 'Sp', 'Sm')
    ct.add_coupling_term(0.5, 1, 2, 'Sm', 'Sp')
    H_bond = ct.to_nn_bond_Arrays([spin] * 3)
    Sz = spin.get_op('Sz').to_ndarray()
    Sp = spin.get_op('Sp').to_ndarray()
    Sm = spin.get_op('Sm').to_ndarray()
    h01 = H_bond[1].to_ndarray().transpose(0, 2, 1, 3).reshape(4, 4)
    np.testing.assert_allclose(h01, np.kron(Sz, Sz), atol=1e-14)
    h12 = H_bond[2].to_ndarray().transpose(0, 2, 1, 3).reshape(4, 4)
    np.testing.assert_allclose(
        h12, 0.5 * (np.kron(Sp, Sm) + np.kron(Sm, Sp)), atol=1e-14)


def test_coupling_term_handle_JW():
    """JW string insertion for fermionic two-site terms."""
    ct = terms_mod.CouplingTerms(4)
    strength, i, j, op_i, op_j, op_string = ct.coupling_term_handle_JW(
        1., [('Cd', 0), ('C', 2)], [ferm] * 4)
    assert op_string == 'JW'
    assert 'JW' in op_i          # JW absorbed into the left operator
    ct.add_coupling_term(strength, i, j, op_i, op_j, op_string)
    (got_op_i, got_str), = ct.coupling_terms[0].keys()
    assert got_str == 'JW'


def test_multi_coupling_terms():
    mct = terms_mod.MultiCouplingTerms(4)
    mct.add_multi_coupling_term(1., [0, 1, 2], ['Sz', 'Sz', 'Sz'], 'Id')
    mct.add_multi_coupling_term(0.5, [0, 3], ['Sp', 'Sm'], 'Id')
    assert mct.max_range() == 3
    tl = mct.to_TermList()
    assert sorted(len(t) for t in tl.terms) == [2, 3]
    # build an MPO and check against dense construction
    g = MPOGraph.from_terms([mct], [spin] * 4, 'finite')
    H = g.build_MPO()
    psi = MPS.from_product_state([spin] * 4, ['up', 'down', 'up', 'down'],
                                 bc='finite')
    # <psi| Sz0 Sz1 Sz2 |psi> = (1/2)(-1/2)(1/2); Sp/Sm term annihilates
    E = H.expectation_value(psi)
    assert abs(E - (0.5 * -0.5 * 0.5)) < 1e-12


def test_exp_decaying_terms():
    edt = terms_mod.ExponentiallyDecayingTerms(6)
    lam = 0.5
    edt.add_exponentially_decaying_coupling(2., lam, 'Sz', 'Sz')
    H = MPOGraph.from_terms([edt], [spin] * 6, 'finite').build_MPO()
    # compare expectation value on a product state against the explicit sum
    updown = ['up', 'down'] * 3
    psi = MPS.from_product_state([spin] * 6, updown, bc='finite')
    sz = np.array([0.5 if s == 'up' else -0.5 for s in updown])
    expect = sum(2. * lam ** (j - i) * sz[i] * sz[j]
                 for i in range(6) for j in range(i + 1, 6))
    E = H.expectation_value(psi)
    assert abs(E - expect) < 1e-12


def test_exp_decaying_terms_infinite():
    edt = terms_mod.ExponentiallyDecayingTerms(2)
    lam = 0.25
    edt.add_exponentially_decaying_coupling(1., lam, 'Sz', 'Sz')
    H = MPOGraph.from_terms([edt], [spin] * 2, 'infinite').build_MPO()
    psi = MPS.from_product_state([spin] * 2, ['up', 'up'], bc='infinite')
    # ferromagnetic product state: E/site = sum_{d>=1} lam^d / 4
    expect = 0.25 * lam / (1 - lam)
    E = H.expectation_value(psi)
    assert abs(E - expect) < 1e-10


def test_iadd():
    a = terms_mod.CouplingTerms(3)
    a.add_coupling_term(1., 0, 1, 'Sz', 'Sz')
    b = terms_mod.CouplingTerms(3)
    b.add_coupling_term(2., 0, 1, 'Sz', 'Sz')
    b.add_coupling_term(1., 1, 2, 'Sp', 'Sm')
    a += b
    assert a.coupling_terms[0]['Sz', 'Id'][1]['Sz'] == 3.
    ao = terms_mod.OnsiteTerms(3)
    ao.add_onsite_term(1., 0, 'Sz')
    bo = terms_mod.OnsiteTerms(3)
    bo.add_onsite_term(-1., 0, 'Sz')
    ao += bo
    ao.remove_zeros()
    assert not any(ao.onsite_terms)


def test_order_combine_term():
    term = [('Sz', 2), ('Sz', 0), ('Sp', 1)]
    new_term, sign = terms_mod.order_combine_term(term, [spin] * 3)
    assert [i for _, i in new_term] == [0, 1, 2]
    assert sign == 1.
    # fermions: swapping two C operators flips the sign
    fterm = [('C', 1), ('C', 0)]
    new_f, fsign = terms_mod.order_combine_term(fterm, [ferm] * 2)
    assert [i for _, i in new_f] == [0, 1]
    assert fsign == -1.
