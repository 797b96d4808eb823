"""Differential tests for the fused Pallas bucket-GEMM kernel.

Runs the kernel in Pallas *interpreter* mode (tests are pinned to CPU by
conftest) against two oracles: a pure-numpy segment-sum reference and the
production XLA gather->GEMM->segment-sum chain of ``packed.tensordot``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tenpy_tpu.linalg import np_conserved as npc
from tenpy_tpu.linalg import packed as pk
from tenpy_tpu.linalg import pallas_gemm as pg
from tenpy_tpu.linalg.charges import ChargeInfo, LegCharge


@pytest.fixture
def pallas_interpret():
    pk.set_pallas_gemm(True, interpret=True)
    yield
    pk.set_pallas_gemm(False, interpret=False)


def test_kernel_vs_numpy():
    rng = np.random.default_rng(7)
    for (Na, Nb, m, k, n, U) in [(3, 4, 8, 8, 8, 2), (6, 5, 16, 32, 24, 4),
                                 (2, 2, 64, 8, 128, 1)]:
        a = rng.standard_normal((Na, m, k)).astype(np.float32)
        b = rng.standard_normal((Nb, k, n)).astype(np.float32)
        B = 3 * U
        seg = np.sort(rng.integers(0, U, B)).astype(np.int32)
        seg[:U] = np.arange(U)          # every segment hit at least once
        seg = np.sort(seg)
        ia = rng.integers(0, Na, B).astype(np.int32)
        ib = rng.integers(0, Nb, B).astype(np.int32)
        out = pg.grouped_gemm_segsum(a, b, seg, ia, ib, U, interpret=True)
        ref = pg.reference_segsum(a, b, seg, ia, ib, U)
        scale = np.abs(ref).max() + 1.
        assert np.abs(np.asarray(out, np.float64) - ref).max() / scale < 1e-5


def _random_charged(legs, qtotal, seed, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    return npc.Array.from_func(lambda size: rng.standard_normal(size), legs,
                               dtype=dtype, qtotal=qtotal)


def test_packed_tensordot_pallas_vs_xla(pallas_interpret):
    """Full packed tensordot: fused-kernel result == XLA-chain result."""
    chinfo = ChargeInfo([1], ['N'])
    rng = np.random.default_rng(3)
    leg_big = LegCharge.from_qflat(
        chinfo, sum(([q] * 12 for q in [-1, 0, 1, 2]), []))
    leg_mid = LegCharge.from_qflat(
        chinfo, sum(([q] * 10 for q in [-1, 0, 1]), []))
    a = _random_charged([leg_big, leg_mid.conj()], [0], 5)
    b = _random_charged([leg_mid, leg_big.conj()], [0], 6)
    pa, pb = pk.pack(a), pk.pack(b)

    with pk.matmul_mode('f32'):
        pk.set_pallas_gemm(False)
        ref = pk.unpack(pk.tensordot(pa, pb, axes=1))
        pk.set_pallas_gemm(True, interpret=True)
        got = pk.tensordot(pa, pb, axes=1)
        out = pk.unpack(got)
    nrm = npc.norm(ref) + 1.
    assert npc.norm(ref - out) / nrm < 1e-5
    # at least one group must actually have taken the fused path
    plan = pk._packed_plan(pa.transpose((0, 1)), pb.transpose((0, 1)), 1)
    assert any(min(mkn) >= 8 and pg.group_fits_vmem(*mkn)
               for (_, _, _, mkn, *_rest) in plan.groups)


def test_packed_tensordot_pallas_exact_f32(pallas_interpret):
    """Native-f32 packed arrays ride the kernel too (no matmul_mode)."""
    chinfo = ChargeInfo([1], ['N'])
    leg = LegCharge.from_qflat(chinfo, [0] * 16 + [1] * 16)
    a = _random_charged([leg, leg.conj()], [0], 1, dtype=jnp.float32)
    b = _random_charged([leg, leg.conj()], [0], 2, dtype=jnp.float32)
    pa, pb = pk.pack(a), pk.pack(b)
    pk.set_pallas_gemm(False)
    ref = pk.unpack(pk.tensordot(pa, pb, axes=1))
    pk.set_pallas_gemm(True, interpret=True)
    out = pk.unpack(pk.tensordot(pa, pb, axes=1))
    assert npc.norm(ref - out) / (npc.norm(ref) + 1.) < 1e-5


def test_pallas_under_jit(pallas_interpret):
    """The fused path composes with jax.jit over packed pytrees."""
    chinfo = ChargeInfo([1], ['N'])
    leg = LegCharge.from_qflat(chinfo, [0] * 8 + [1] * 8 + [2] * 8)
    a = _random_charged([leg, leg.conj()], [0], 11)
    b = _random_charged([leg, leg.conj()], [0], 12)
    pa, pb = pk.pack(a), pk.pack(b)

    @jax.jit
    def f(x, y):
        with pk.matmul_mode('f32'):
            return pk.tensordot(x, y, axes=1)

    out = pk.unpack(f(pa, pb))
    pk.set_pallas_gemm(False)
    ref = pk.unpack(pk.tensordot(pa, pb, axes=1))
    assert npc.norm(ref - out) / (npc.norm(ref) + 1.) < 1e-4
