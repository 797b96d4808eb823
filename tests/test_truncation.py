"""Tests for truncation policies: svd_theta, eigh_rho, QR-based decomposition.

Mirrors reference coverage of ``tenpy/linalg/truncation.py`` (truncate :146,
svd_theta :258, eigh_rho :316, decompose_theta_qr_based :533).
"""
import numpy as np
import pytest

from tenpy_tpu.linalg import np_conserved as npc
from tenpy_tpu.linalg.truncation import (
    truncate, svd_theta, eigh_rho, decompose_theta_qr_based)

from random_test import gen_random_legcharge, chinfo_U1, rng


def _det_leg(chinfo, ind_len, qconj, rs):
    """Deterministic random-ish LegCharge from a local RandomState."""
    from tenpy_tpu.linalg.charges import LegCharge
    n_sec = 3
    cuts = np.sort(rs.choice(range(1, ind_len), size=n_sec - 1, replace=False))
    slices = np.concatenate([[0], cuts, [ind_len]])
    charges = chinfo.make_valid(rs.randint(-2, 3, size=(n_sec, chinfo.qnumber)))
    leg = LegCharge(chinfo, slices, charges, qconj)
    return leg.sort()[1]


def _random_theta(chi_l=12, chi_r=14, d=2, seed=5):
    """theta with legs (vL, p0, p1, vR) on a U(1) spin chain (self-seeded)."""
    from tenpy_tpu.networks.site import SpinHalfSite
    site = SpinHalfSite('Sz')
    rs = np.random.RandomState(seed)
    vL = _det_leg(chinfo_U1, chi_l, +1, rs)
    vR = _det_leg(chinfo_U1, chi_r, -1, rs)
    theta = npc.Array.from_func(lambda size: rs.normal(size=size),
                                [vL, site.leg, site.leg, vR])
    theta.iset_leg_labels(['vL', 'p0', 'p1', 'vR'])
    theta = theta / npc.norm(theta)
    return theta


def test_truncate_policies():
    S = np.sort(np.abs(np.random.RandomState(0).normal(size=20)))[::-1]
    S = S / np.linalg.norm(S)
    mask, norm_new, err = truncate(S, {'chi_max': 8, 'svd_min': 1e-14})
    assert np.sum(mask) <= 8
    kept = S[mask]
    assert np.isclose(norm_new, np.linalg.norm(kept))
    assert np.isclose(err.eps, np.sum(S[~mask] ** 2))


def test_eigh_rho_convention():
    """rho ~= V diag(W) V^H after the cut; negative noise does not bias it."""
    theta = _random_theta()
    rho = npc.tensordot(theta, theta.conj(), axes=[['p1', 'vR'], ['p1*', 'vR*']])
    rho = rho.combine_legs([['vL', 'p0'], ['vL*', 'p0*']], qconj=[+1, -1])
    W, V, err, renorm = eigh_rho(rho, {'chi_max': 100, 'svd_min': 1e-14},
                                 sort='m>')
    assert np.isclose(renorm, 1., atol=1e-10)  # tr rho = |theta|^2 = 1
    assert np.all(np.asarray(W) >= 0)
    # reconstruction: V W V^H ~= rho up to the truncated weight
    VW = V.scale_axis(np.asarray(W), 1)
    rho_rec = npc.tensordot(VW, V.conj().itranspose([1, 0]), axes=[[1], [0]])
    rec_err = float(npc.norm(rho_rec - rho))
    assert rec_err < 1e-8


def _low_rank_theta(rank=8, decay=1., **kw):
    """theta (combined legs) with an exponentially decaying rank-``rank``
    spectrum (S_i ~ e^{-decay*i}) + the original split-leg theta."""
    theta = _random_theta(**kw)
    theta_c = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
    U, S, VH, _, _ = svd_theta(theta_c, {'chi_max': rank})
    S = np.sort(np.asarray(S))[::-1] * np.exp(-decay * np.arange(len(S)))
    low = npc.tensordot(U.scale_axis(S, 'vR'), VH, axes=[['vR'], ['vL']])
    return theta, low / npc.norm(low)


@pytest.mark.parametrize('move_right', [True, False])
@pytest.mark.parametrize('expand', [None, 0.9])
def test_decompose_theta_qr_based(move_right, expand):
    """QR-based decomposition reproduces a low-rank theta to high accuracy.

    With expansion the CBE scheme keeps only ``old_chi*(1+expand)`` directions,
    so exact recovery needs an (effectively) low-rank theta — the realistic
    DMRG/TEBD situation."""
    theta, theta_c = _low_rank_theta(rank=8)
    vL, vR = theta.get_leg('vL'), theta.get_leg('vR')
    old_bond_leg = vL.conj() if not move_right else vR.conj()
    qz = theta.chinfo.make_valid()
    T_L, S, T_R, form, err, renorm = decompose_theta_qr_based(
        qz, theta.qtotal, old_bond_leg, theta_c, move_right=move_right,
        expand=expand, min_block_increase=4, use_eig_based_svd=False,
        trunc_params={'chi_max': 100, 'svd_min': 1e-14},
        compute_err=True, return_both_T=True)
    assert form == ['A', 'B']
    assert err.eps < 1e-10
    # reconstruct
    rec = npc.tensordot(T_L.scale_axis(np.asarray(S), 'vR'), T_R,
                        axes=[['vR'], ['vL']])
    rec = rec * renorm
    diff = float(npc.norm(rec - theta_c.replace_labels(
        ['(vL.p0)', '(p1.vR)'], ['(vL.p)', '(p.vR)'])))
    assert diff < 1e-8
    # isometry checks: T_L is 'A' form, T_R is 'B' form
    TLd = npc.tensordot(T_L.conj(), T_L, axes=[['(vL*.p*)'], ['(vL.p)']])
    assert float(npc.norm(TLd - npc.eye_like(TLd, labels=TLd.get_leg_labels()))) < 1e-10
    TRd = npc.tensordot(T_R, T_R.conj(), axes=[['(p.vR)'], ['(p*.vR*)']])
    assert float(npc.norm(TRd - npc.eye_like(TRd, labels=TRd.get_leg_labels()))) < 1e-10


def test_decompose_qr_truncates():
    """With a tight chi_max the QR-based path truncates like svd_theta."""
    theta, theta_c = _low_rank_theta(rank=8, decay=1., chi_l=16, chi_r=16,
                                     seed=11)
    U, S_ref, VH, err_ref, _ = svd_theta(theta_c, {'chi_max': 6})
    qz = theta.chinfo.make_valid()
    T_L, S, T_R, form, err, renorm = decompose_theta_qr_based(
        qz, theta.qtotal, theta.get_leg('vR').conj(), theta_c, move_right=True,
        expand=0.9, min_block_increase=4, use_eig_based_svd=False,
        trunc_params={'chi_max': 6}, compute_err=True, return_both_T=True)
    assert len(np.asarray(S)) <= 6
    # the kept spectrum should agree with the exact SVD spectrum
    s_ref = np.sort(np.asarray(S_ref))[::-1]
    s_got = np.sort(np.asarray(S))[::-1]
    n = min(len(s_ref), len(s_got))
    assert np.allclose(s_ref[:n], s_got[:n], atol=1e-8)
    # and the reported truncation error should be comparable
    assert err.eps < max(10 * err_ref.eps, 1e-12)
