"""Tests for Site and the concrete site zoo (mirrors reference tests/test_site.py)."""
import numpy as np
import pytest

from tenpy_tpu.networks.site import (Site, SpinHalfSite, SpinSite, FermionSite,
                                     SpinHalfFermionSite, SpinHalfHoleSite, BosonSite,
                                     ClockSite, GroupedSite, spin_half_species, kron)


@pytest.mark.parametrize('site_fn', [
    lambda: SpinHalfSite('Sz'), lambda: SpinHalfSite('parity'),
    lambda: SpinHalfSite(None), lambda: SpinSite(1, 'Sz'),
    lambda: SpinSite(1.5, 'parity'), lambda: FermionSite('N'),
    lambda: FermionSite('parity'), lambda: SpinHalfFermionSite(),
    lambda: SpinHalfFermionSite('parity', 'parity'), lambda: SpinHalfHoleSite(),
    lambda: BosonSite(3, 'N'), lambda: BosonSite(2, 'parity'),
    lambda: ClockSite(3, 'Z'), lambda: ClockSite(4, None),
])
def test_site_sanity(site_fn):
    site = site_fn()
    site.test_sanity()
    # Id is identity
    Id = np.asarray(site.Id.to_ndarray())
    assert np.allclose(Id, np.eye(site.dim))
    # hc_ops consistent
    for op, hc in site.hc_ops.items():
        a = np.asarray(site.get_op(op).to_ndarray())
        b = np.asarray(site.get_op(hc).to_ndarray())
        assert np.allclose(a.conj().T, b), (op, hc)


@pytest.mark.parametrize('S', [0.5, 1., 1.5, 2.])
def test_spin_commutators(S):
    site = SpinSite(S, None)
    Sx, Sy, Sz = [np.asarray(site.get_op(n).to_ndarray()) for n in ['Sx', 'Sy', 'Sz']]
    assert np.allclose(Sx @ Sy - Sy @ Sx, 1j * Sz)
    assert np.allclose(Sy @ Sz - Sz @ Sy, 1j * Sx)
    assert np.allclose(Sz @ Sx - Sx @ Sz, 1j * Sy)
    casimir = Sx @ Sx + Sy @ Sy + Sz @ Sz
    assert np.allclose(casimir, S * (S + 1) * np.eye(site.dim))


def test_fermion_anticommutation():
    f = SpinHalfFermionSite('N', 'Sz')
    Cu, Cdu, Cd, Cdd, JW = [np.asarray(f.get_op(n).to_ndarray())
                            for n in ['Cu', 'Cdu', 'Cd', 'Cdd', 'JW']]
    eye = np.eye(4)
    assert np.allclose(Cu @ Cdu + Cdu @ Cu, eye)
    assert np.allclose(Cd @ Cdd + Cdd @ Cd, eye)
    assert np.allclose(Cu @ Cd + Cd @ Cu, 0)
    assert np.allclose(Cu @ Cdd + Cdd @ Cu, 0)
    assert np.allclose(JW @ JW, eye)
    # Sz = (Nu - Nd)/2
    Nu = np.asarray(f.Nu.to_ndarray())
    Nd = np.asarray(f.Nd.to_ndarray())
    Sz = np.asarray(f.Sz.to_ndarray())
    assert np.allclose(Sz, 0.5 * (Nu - Nd))


def test_boson_algebra():
    b = BosonSite(4, None)
    B = np.asarray(b.B.to_ndarray())
    Bd = np.asarray(b.Bd.to_ndarray())
    N = np.asarray(b.N.to_ndarray())
    assert np.allclose(Bd @ B, N)
    comm = B @ Bd - Bd @ B
    # [B, Bd] = 1 except truncation at Nmax
    assert np.allclose(np.diagonal(comm)[:-1], 1.)


def test_clock_algebra():
    q = 4
    c = ClockSite(q, 'Z')
    X = np.asarray(c.X.to_ndarray())
    Z = np.asarray(c.Z.to_ndarray())
    w = np.exp(2j * np.pi / q)
    assert np.allclose(X @ Z, w * Z @ X) or np.allclose(Z @ X, w * X @ Z)
    assert np.allclose(np.linalg.matrix_power(X, q), np.eye(q))


def test_jw_bookkeeping():
    f = FermionSite('N')
    assert f.op_needs_JW('C')
    assert f.op_needs_JW('Cd')
    assert not f.op_needs_JW('N')
    assert not f.op_needs_JW('C Cd')
    assert f.op_needs_JW('C N')
    assert f.get_hc_op_name('C') == 'Cd'
    assert f.get_hc_op_name('C Cd') == 'C Cd'


def test_grouped_site_fermions():
    gf = GroupedSite([FermionSite('N'), FermionSite('N')])
    C0 = np.asarray(gf.get_op('C0').to_ndarray())
    C1 = np.asarray(gf.get_op('C1').to_ndarray())
    assert np.allclose(C0 @ C1 + C1 @ C0, 0)
    N0 = np.asarray(gf.get_op('N0').to_ndarray())
    N1 = np.asarray(gf.get_op('N1').to_ndarray())
    assert np.allclose(N0 @ N1, N1 @ N0)


def test_spin_half_species():
    sites, names = spin_half_species(FermionSite, 'N', 'Sz')
    assert names == ['up', 'down']
    assert sites[0].leg.chinfo.names == ('N', '2*Sz')
    assert sites[0].leg.chinfo == sites[1].leg.chinfo


def test_kron():
    s = SpinHalfSite('Sz')
    SzSz = kron(s.Sz, s.Sz)
    dense = np.asarray(SzSz.to_ndarray())
    # grouped basis ordered by the pipe; just check spectrum
    w = np.sort(np.linalg.eigvalsh(dense))
    assert np.allclose(w, [-0.25, -0.25, 0.25, 0.25])
