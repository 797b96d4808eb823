"""PackedArray: bucket-packed device layout vs the per-block host engine.

Differential tests (same strategy as tests/test_np_conserved.py): every packed
op must agree with the npc host result to 1e-12, including under jax.jit, on
charge structures up to Hubbard-like U(1)xU(1) with hundreds of blocks.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tenpy_tpu.linalg.np_conserved as npc
from tenpy_tpu.linalg import packed
from tenpy_tpu.linalg.charges import ChargeInfo, LegCharge

from random_test import gen_random_legcharge, rng


def _random_on_legs(legs, qtotal=None, complex_=False):
    def func(size):
        d = rng.normal(size=size)
        if complex_:
            d = d + 1j * rng.normal(size=size)
        return d
    dtype = jnp.complex128 if complex_ else jnp.float64
    a = npc.Array.from_func(func, legs, dtype=dtype, qtotal=qtotal)
    if a.stored_blocks == 0 and qtotal is None:
        # ensure at least one block: qtotal from a random valid sector combo
        from tenpy_tpu.linalg.np_conserved import _row_qtotal
        row = [rng.randint(l.block_number) for l in legs]
        a = npc.Array.from_func(func, legs, dtype=dtype,
                                qtotal=_row_qtotal(legs, row))
    return a


CHINFOS = [ChargeInfo([], []), ChargeInfo([1], ['N']),
           ChargeInfo([1, 1], ['N', 'Sz'])]


@pytest.mark.parametrize('qn', [0, 1, 2])
@pytest.mark.parametrize('multiple', [1, 8])
def test_packed_roundtrip(qn, multiple):
    chinfo = CHINFOS[qn]
    legs = [gen_random_legcharge(chinfo, s) for s in [12, 9, 14]]
    a = _random_on_legs(legs)
    p = packed.pack(a, multiple=multiple)
    b = packed.unpack(p, orig_legs=a.legs)
    assert npc.norm(a - b) < 1e-14 * max(1., float(npc.norm(a)))
    assert p.n_groups <= max(p.n_blocks, 1)


@pytest.mark.parametrize('qn', [0, 1, 2])
def test_packed_tensordot_vs_npc(qn):
    chinfo = CHINFOS[qn]
    l1 = gen_random_legcharge(chinfo, 13)
    l2 = gen_random_legcharge(chinfo, 8)
    l3 = gen_random_legcharge(chinfo, 11)
    a = _random_on_legs([l1, l2, l3])
    b = _random_on_legs([l3.conj(), l2.conj(), gen_random_legcharge(chinfo, 9)])
    ref = npc.tensordot(a, b, axes=[[2, 1], [0, 1]])
    pa = packed.pack(a, multiple=8)
    pb = packed.pack(b, multiple=8)
    got = packed.unpack(packed.tensordot(pa, pb, axes=([2, 1], [0, 1])),
                        orig_legs=ref.legs)
    assert npc.norm(ref - got) < 1e-12 * max(1., float(npc.norm(ref)))


def test_packed_tensordot_labels_and_jit():
    chinfo = ChargeInfo([1], ['Sz'])
    lv = gen_random_legcharge(chinfo, 16, qconj=1)
    lp = gen_random_legcharge(chinfo, 3, qconj=1)
    a = _random_on_legs([lv, lp, lv.conj()], complex_=True)
    a.iset_leg_labels(['vL', 'p', 'vR'])
    b = _random_on_legs([lv, lp, lv.conj()], complex_=True)
    b.iset_leg_labels(['vL', 'p', 'vR'])
    ref = npc.tensordot(a, b.conj(), axes=[['p', 'vR'], ['p*', 'vR*']])
    pa, pb = packed.pack(a, multiple=8), packed.pack(b, multiple=8)

    @jax.jit
    def f(x, y):
        return packed.tensordot(x, y.conj(), axes=(['p', 'vR'], ['p*', 'vR*']))

    res = f(pa, pb)
    got = packed.unpack(res, orig_legs=[ref.get_leg(l)
                                        for l in res.get_leg_labels()])
    assert npc.norm(ref - got.transpose(ref.get_leg_labels())) \
        < 1e-12 * max(1., float(npc.norm(ref)))


def test_packed_transpose_conj_arith():
    chinfo = ChargeInfo([1, 1], ['N', 'Sz'])
    legs = [gen_random_legcharge(chinfo, s) for s in [10, 7, 9]]
    a = _random_on_legs(legs, complex_=True)
    a.iset_leg_labels(['x', 'y', 'z'])
    p = packed.pack(a, multiple=8)
    at = a.transpose(['z', 'x', 'y'])
    t = packed.unpack(p.transpose(['z', 'x', 'y']), orig_legs=at.legs)
    assert npc.norm(t - at) < 1e-13
    c = packed.unpack(p.conj(), orig_legs=a.conj().legs)
    assert npc.norm(c - a.conj()) < 1e-13
    s = packed.unpack(p * 2. - p, orig_legs=a.legs)
    assert npc.norm(s - a) < 1e-13
    assert abs(float(packed.norm(p)) - float(npc.norm(a))) < 1e-12
    v = complex(packed.inner(p.conj(), p))
    assert abs(v - float(npc.norm(a)) ** 2) < 1e-10


def _hubbard_effH(chi=64, seed=0):
    """Two-site effective-H pieces for a U(1)xU(1) Hubbard chain at given chi."""
    from tenpy_tpu.models.hubbard import FermiHubbardChain
    from tenpy_tpu.networks.mps import MPS
    from tenpy_tpu.networks.mpo import MPOEnvironment

    from tenpy_tpu.algorithms import dmrg
    m = FermiHubbardChain({'L': 2, 't': 1., 'U': 4., 'bc_MPS': 'infinite'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'],
                                 bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': chi, 'svd_min': 1e-10},
                      'max_sweeps': 4, 'mixer': True})
    env = MPOEnvironment(psi, m.H_MPO, psi, start_env_sites=2)
    LP = env.get_LP(0)
    RP = env.get_RP(1)
    W0 = m.H_MPO.get_W(0).replace_labels(['p', 'p*'], ['p0', 'p0*'])
    W1 = m.H_MPO.get_W(1).replace_labels(['p', 'p*'], ['p1', 'p1*'])
    theta = psi.get_theta(0, 2)
    return LP, RP, W0, W1, theta


def test_packed_matvec_hubbard_u1u1():
    """The north-star regime in miniature: U(1)^2 Hubbard effective-H matvec
    with many charge blocks, packed into far fewer shape-bucket groups."""
    from tenpy_tpu.algorithms.mps_common import _matvec_2site_plain_impl
    LP, RP, W0, W1, theta = _hubbard_effH(chi=64)
    ref = _matvec_2site_plain_impl(LP, RP, W0, W1, theta)

    VIRT = ('vL', 'vR', 'vL*', 'vR*')
    pLP = packed.pack(LP, multiple=8, pad_labels=VIRT)
    pRP = packed.pack(RP, multiple=8, pad_labels=VIRT)
    pW0, pW1 = packed.pack(W0, multiple=1), packed.pack(W1, multiple=1)
    pth = packed.pack(theta, multiple=8, pad_labels=VIRT)
    assert pth.n_blocks > 50         # genuinely block-heavy
    assert pth.n_groups < pth.n_blocks // 2

    @jax.jit
    def matvec(LPp, RPp, W0p, W1p, th):
        x = packed.tensordot(LPp, th, axes=(['vR'], ['vL']))
        x = packed.tensordot(x, W0p, axes=(['wR', 'p0'], ['wL', 'p0*']))
        x = packed.tensordot(x, W1p, axes=(['wR', 'p1'], ['wL', 'p1*']))
        x = packed.tensordot(x, RPp, axes=(['wR', 'vR'], ['wL', 'vL']))
        x = x.replace_labels(['vR*', 'vL*'], ['vL', 'vR'])
        return x.transpose(['vL', 'p0', 'p1', 'vR'])

    got = packed.unpack(matvec(pLP, pRP, pW0, pW1, pth), orig_legs=ref.legs)
    err = npc.norm(got - ref) / max(float(npc.norm(ref)), 1e-300)
    assert err < 1e-12


def test_packed_device_lanczos_vs_host():
    """The fused packed Lanczos kernel finds the same local ground state as
    the host LanczosGroundState, to 1e-10, on the U(1)^2 Hubbard problem."""
    from tenpy_tpu.algorithms.mps_common import (lanczos_K_2site_packed,
                                                 _matvec_2site_plain_impl)
    from tenpy_tpu.linalg.krylov_based import LanczosGroundState
    from tenpy_tpu.linalg.sparse import NpcLinearOperator

    LP, RP, W0, W1, theta = _hubbard_effH(chi=48)

    class EffH(NpcLinearOperator):
        def matvec(self, v):
            return _matvec_2site_plain_impl(LP, RP, W0, W1, v)

    E_ref, th_ref, _ = LanczosGroundState(
        EffH(), theta, {'N_max': 24, 'N_min': 24, 'reortho': True}).run()

    VIRT = ('vL', 'vR', 'vL*', 'vR*')
    pLP = packed.pack(LP, multiple=8, pad_labels=VIRT)
    pRP = packed.pack(RP, multiple=8, pad_labels=VIRT)
    pW0, pW1 = packed.pack(W0, pad=False), packed.pack(W1, pad=False)
    pth = packed.pack(theta, multiple=8, pad_labels=VIRT)
    E0, th, _, _ = lanczos_K_2site_packed(pLP, pRP, pW0, pW1, pth, 24)
    th = packed.unpack(jax.device_get(th), orig_legs=theta.legs)
    assert abs(float(E0) - E_ref) < 1e-10 * max(1., abs(E_ref))
    ov = abs(complex(npc.inner(th.conj(), th_ref, axes='range')))
    assert abs(ov - 1.) < 1e-8


def test_diag_device_lanczos_integration(monkeypatch):
    """DMRGEngine._diag_device_lanczos (packed path) agrees with the host
    Lanczos result inside a real engine, on CPU jit."""
    from tenpy_tpu.models.hubbard import FermiHubbardChain
    from tenpy_tpu.networks.mps import MPS
    from tenpy_tpu.algorithms import dmrg as dmrg_mod
    from tenpy_tpu.algorithms.dmrg import TwoSiteDMRGEngine

    m = FermiHubbardChain({'L': 2, 't': 1., 'U': 4., 'bc_MPS': 'infinite'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'],
                                 bc='infinite')
    eng = TwoSiteDMRGEngine(psi, m, {'trunc_params': {'chi_max': 32,
                                                      'svd_min': 1e-10},
                                     'max_sweeps': 3, 'mixer': True,
                                     'combine': False,
                                     'lanczos_params': {'N_min': 30,
                                                        'N_max': 30,
                                                        'device_K': 30,
                                                        'reortho': True}})
    eng.run()
    # one more update, comparing both diag paths on the same eff_H
    for (i0, move_right, upd) in eng.get_sweep_schedule():
        eng.i0, eng.move_right, eng.update_LP_RP = i0, move_right, upd
        break
    eng._cache_optimize()
    theta = eng.prepare_update_local()
    E_host, th_host, _, _ = eng.diag(theta)
    E_dev, th_dev, _, _ = eng._diag_device_lanczos(theta)
    assert abs(E_dev - E_host) < 1e-8 * max(1., abs(E_host))
    ov = abs(complex(npc.inner(th_dev.conj(), th_host, axes='range')))
    assert abs(ov - 1.) < 1e-6
