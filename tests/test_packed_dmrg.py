"""Device-resident split/truncate + DeviceSweepEngine vs the host engine.

Differential tests (CPU jit, float64): the packed split must reproduce
``svd_theta`` to machine precision, and device-resident sweeps must converge
to the host DMRG energy at the 1e-10 level.  Mirrors the reference test
strategy of validating optimized paths against the plain one
(``tenpy/tests/test_dmrg.py``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tenpy_tpu.linalg import np_conserved as npc, packed as pk, \
    packed_split as ps
from tenpy_tpu.linalg.truncation import svd_theta
from tenpy_tpu.linalg.padding import embed_array, embed_leg_map, pad_leg
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.spins import SpinChain
from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.algorithms.packed_dmrg import DeviceSweepEngine
from tenpy_tpu.tools.params import Config


def _ramped_state(L=8, chi=24, sweeps=3, bc='finite', S=1):
    m = SpinChain({'S': S, 'L': L, 'Jx': 1., 'Jy': 1., 'Jz': 1.,
                   'bc_MPS': bc, 'conserve': 'Sz'})
    init = (['1.0', '-1.0'] * L)[:L]
    psi = MPS.from_product_state(m.lat.mps_sites(), init, bc=bc)
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-12},
        'max_sweeps': sweeps, 'mixer': True})
    E, _ = eng.run()
    return m, psi, E


@pytest.mark.parametrize('backend', ['svd', 'jacobi', 'jacobi32', 'qr_eigh',
                                     'qr_eigh32'])
def test_split_truncate_vs_svd_theta(backend):
    m, psi, _ = _ramped_state()
    i0 = 3
    theta = psi.get_theta(i0, 2).itranspose(['vL', 'p0', 'p1', 'vR'])
    th2 = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
    qtot_A = psi.get_B(i0, None).qtotal
    U, S, VH, err, renorm = svd_theta(
        th2, Config({'chi_max': 20, 'svd_min': 1e-10}, 'tp'),
        qtotal_LR=[qtot_A, None])

    theta_p = pk.pack(theta, multiple=16, pad_labels=('vL', 'vR'))
    vb = psi.get_B(i0, None).get_leg('vR')
    hint = {tuple(np.asarray(vb.charges[b])): int(vb.slices[b + 1] - vb.slices[b])
            for b in range(vb.block_number)}
    bond = ps.bond_layout(theta_p.legs, theta_p.qtotal, qtot_A,
                          cap_hint=hint, multiple=16)
    plan = ps.split_plan(theta_p, bond, qtot_A, group_multiple=16)

    A, Sf, B, err_p, renorm_p, n_kept = ps.split_truncate(
        theta_p, plan, chi_max=20, svd_min=1e-10, backend=backend)
    Sf = np.asarray(Sf)
    tol = {'qr_eigh32': 1e-5, 'jacobi': 1e-9, 'jacobi32': 1e-9}.get(backend,
                                                                    1e-10)
    assert int(n_kept) == len(S)
    s_dev = np.sort(Sf[Sf > 0])[::-1]
    assert np.allclose(np.sort(np.asarray(S))[::-1], s_dev, atol=tol)
    assert abs(float(err_p) - err.eps) < max(tol * 10, 1e-12)
    # exact isometry of A regardless of backend (zero columns allowed)
    AA = pk.unpack(pk.tensordot(A.conj(), A, axes=(['vL*', 'p*'], ['vL', 'p'])))
    for blk in AA._data:
        blk = np.asarray(blk)
        d = np.diagonal(blk)
        assert np.abs(d * (1. - d)).max() < 1e-12      # diag in {0, 1}
        assert np.abs(blk - np.diag(d)).max() < 1e-12  # orthogonal columns
    # reconstruction A.S.B == host-truncated theta
    rec = pk.tensordot(ps.scale_bond(A, jnp.asarray(Sf),
                                     ps.scale_bond_plan(A, 'vR')),
                       B, axes=(['vR'], ['vL']))
    rec = pk.PackedArray(rec.legs, rec.qtotal, ('vL', 'p0', 'p1', 'vR'),
                         rec.shapes, rec.qdatas, rec.data, rec.dtype)
    rec_h = pk.unpack(rec, orig_legs=[theta.get_leg(l)
                                      for l in ('vL', 'p0', 'p1', 'vR')])
    th_trunc = npc.tensordot(U.split_legs().scale_axis(np.asarray(S), 'vR'),
                             VH.split_legs(), axes=[['vR'], ['vL']])
    th_trunc.itranspose(['vL', 'p0', 'p1', 'vR'])
    diff = npc.norm(rec_h * float(np.asarray(renorm_p)) - th_trunc * renorm)
    assert float(diff) < tol


def test_split_truncate_jit():
    """split_truncate must be traceable (one jitted call, static plan)."""
    m, psi, _ = _ramped_state()
    theta = psi.get_theta(3, 2).itranspose(['vL', 'p0', 'p1', 'vR'])
    qtot_A = psi.get_B(3, None).qtotal
    theta_p = pk.pack(theta, multiple=16, pad_labels=('vL', 'vR'))
    bond = ps.bond_layout(theta_p.legs, theta_p.qtotal, qtot_A, multiple=16)
    plan = ps.split_plan(theta_p, bond, qtot_A, group_multiple=16)

    @jax.jit
    def f(tp):
        A, S, B, err, renorm, n = ps.split_truncate(tp, plan, 20, 1e-10,
                                                    backend='svd')
        return S, err

    S_jit, err_jit = f(theta_p)
    A, S_e, B, err_e, _, _ = ps.split_truncate(theta_p, plan, 20, 1e-10,
                                               backend='svd')
    assert np.allclose(np.asarray(S_jit), np.asarray(S_e), atol=1e-13)
    assert abs(float(err_jit) - float(err_e)) < 1e-14


def test_embed_array():
    m, psi, _ = _ramped_state()
    B = psi.get_B(3, 'B')
    leg = B.get_leg('vL')
    big, _ = pad_leg(leg, 16)
    Bp = embed_array(B, {'vL': big})
    assert Bp.get_leg('vL').ind_len == big.ind_len
    # values preserved
    assert abs(float(npc.norm(Bp)) - float(npc.norm(B))) < 1e-13
    with pytest.raises(ValueError):
        embed_leg_map(big, leg)   # target smaller -> error


def test_device_sweep_finite():
    # chi >= 3^4: both engines are exact, so energies must agree to 1e-10.
    # (In the truncating regime the fixed capacity layout can settle on a
    # slightly different kept basis, with E differences at the truncation
    # error floor — covered by the infinite test's looser tolerance.)
    m, psi, _ = _ramped_state(L=8, chi=96, sweeps=3)
    psi_ref = psi.copy()
    eng = dmrg.TwoSiteDMRGEngine(psi_ref, m, {
        'trunc_params': {'chi_max': 96, 'svd_min': 1e-12}, 'max_sweeps': 25})
    E_ref, _ = eng.run()

    dev = DeviceSweepEngine(psi, m, {'chi_max': 96, 'svd_min': 1e-12,
                                     'lanczos_K': 10, 'n_sweeps': 6,
                                     'multiple': 16})
    E_dev, psi = dev.run()
    assert abs(E_dev - E_ref) < 1e-10
    psi.test_sanity()
    from tenpy_tpu.networks.mpo import MPOEnvironment
    E_state = float(np.real(MPOEnvironment(psi, m.H_MPO, psi)
                            .full_contraction(4)))
    assert abs(E_state - E_ref) < 1e-10


def test_device_sweep_mixed_precision():
    """f32-GEMM Lanczos sweeps + one f64 polish sweep must land on the f64
    engine's energy: the variational energy is quadratic in the state error,
    and the polish sweep re-solves every site in full precision."""
    m, psi, _ = _ramped_state(L=8, chi=96, sweeps=3)
    psi_ref = psi.copy()
    eng = dmrg.TwoSiteDMRGEngine(psi_ref, m, {
        'trunc_params': {'chi_max': 96, 'svd_min': 1e-12}, 'max_sweeps': 25})
    E_ref, _ = eng.run()

    dev = DeviceSweepEngine(psi, m, {'chi_max': 96, 'svd_min': 1e-12,
                                     'lanczos_K': 10, 'n_sweeps': 6,
                                     'multiple': 16, 'matvec_mode': 'f32',
                                     'polish_sweeps': 1,
                                     'backend': 'jacobi32'})
    E_dev, psi = dev.run()
    assert dev.sweep_stats['mode'] == ['f32'] * 5 + ['f64']
    # mixed sweeps track the energy at the f32 level already
    assert abs(dev.sweep_stats['E'][-2] - E_ref) < 1e-5
    # the polish sweep restores full f64 agreement
    assert abs(E_dev - E_ref) < 1e-10
    psi.test_sanity()


def test_lanczos_exact_E_rayleigh():
    """exact_E: E0 is the f64 Rayleigh quotient even with f32 iterations."""
    from tenpy_tpu.algorithms.mps_common import (
        _lanczos_K_2site_packed_impl, _matvec_2site_packed)
    m, psi, _ = _ramped_state(L=8, chi=24, sweeps=3)
    i0 = 3
    from tenpy_tpu.networks.mpo import MPOEnvironment
    env = MPOEnvironment(psi, m.H_MPO, psi)
    LP = env.get_LP(i0).transpose(['vR*', 'wR', 'vR'])
    RP = env.get_RP(i0 + 1).transpose(['wL', 'vL', 'vL*'])
    W0 = m.H_MPO.get_W(i0).transpose(['wL', 'wR', 'p', 'p*'])
    W1 = m.H_MPO.get_W(i0 + 1).transpose(['wL', 'wR', 'p', 'p*'])
    theta = psi.get_theta(i0, 2).itranspose(['vL', 'p0', 'p1', 'vR'])
    VIRT = ('vL', 'vR', 'vL*', 'vR*')
    LPp = pk.pack(LP, multiple=16, pad_labels=VIRT)
    RPp = pk.pack(RP, multiple=16, pad_labels=VIRT)
    W0p = pk.pack(W0, pad=False).replace_labels(['p', 'p*'], ['p0', 'p0*'])
    W1p = pk.pack(W1, pad=False).replace_labels(['p', 'p*'], ['p1', 'p1*'])
    thp = pk.pack(theta, multiple=16, pad_labels=VIRT)

    E64, th64, _, _ = _lanczos_K_2site_packed_impl(
        LPp, RPp, W0p, W1p, thp, 10)
    E32, th32, _, _ = _lanczos_K_2site_packed_impl(
        LPp, RPp, W0p, W1p, thp, 10, matvec_mode='f32', exact_E=True)
    # Rayleigh quotient of the f32-iterated Ritz vector: variational (>= E64
    # up to f64 noise) and quadratically close
    assert float(E32) >= float(E64) - 1e-12
    assert abs(float(E32) - float(E64)) < 1e-8
    # and it must equal the directly-computed f64 quotient of its own vector
    hw = _matvec_2site_packed(LPp, RPp, W0p, W1p, th32)
    E_check = float(np.real(np.asarray(pk.inner(th32.conj(), hw))))
    assert abs(float(E32) - E_check) < 1e-12


def test_device_sweep_complex_hofstadter():
    """Complex MPO (Hofstadter hopping phases) on the device engine.

    BASELINE config #5: the split re/im channel storage must carry a
    genuinely complex Hamiltonian through a full device sweep and match the
    host engine (complex128 throughout) to 1e-10.  Reference model:
    ``tenpy/models/hofstadter.py:18,145``."""
    from tenpy_tpu.models.hofstadter import HofstadterFermions
    m = HofstadterFermions({'lattice': 'Square', 'Lx': 3, 'Ly': 2,
                            'phi': (1, 3), 'bc_y': 'cylinder',
                            'bc_MPS': 'finite', 'conserve': 'N',
                            'mu': 0.5})
    assert jnp.issubdtype(m.H_MPO.dtype, jnp.complexfloating)
    psi = MPS.from_product_state(
        m.lat.mps_sites(), ['full', 'empty'] * 3, bc='finite')
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': 16, 'svd_min': 1e-12},
        'max_sweeps': 10, 'mixer': True})
    E_ref, _ = eng.run()   # chi=16 >= 2^3: exact; psi is now complex

    psi_dev = psi.copy()
    dev = DeviceSweepEngine(psi_dev, m, {'chi_max': 16, 'svd_min': 1e-12,
                                         'lanczos_K': 10, 'n_sweeps': 6,
                                         'multiple': 8})
    E_dev, psi_dev = dev.run()
    assert abs(E_dev - E_ref) < 1e-10
    psi_dev.test_sanity()
    from tenpy_tpu.networks.mpo import MPOEnvironment
    E_state = float(np.real(MPOEnvironment(psi_dev, m.H_MPO, psi_dev)
                            .full_contraction(3)))
    assert abs(E_state - E_ref) < 1e-10


@pytest.mark.slow
def test_device_sweep_infinite():
    """Device vs host iDMRG energy parity at a Schmidt-spectrum gap.

    chi=30 sits on a multiplet boundary of the S=1 Heisenberg spectrum
    (S[29]/S[30] ~ 3.2), so both engines keep the *same* subspace and the
    energies must coincide at engine precision (measured: 3.3e-10).  At a
    generic chi the cut lands inside a degenerate multiplet and two
    independently-converged variational states differ at O(trunc_err) —
    that is truncation physics, not engine error (the finite-bc test covers
    exact-regime 1e-10 parity)."""
    m, psi, _ = _ramped_state(L=2, chi=30, sweeps=12, bc='infinite')
    psi_ref = psi.copy()
    eng = dmrg.TwoSiteDMRGEngine(psi_ref, m, {
        'trunc_params': {'chi_max': 30, 'svd_min': 1e-12},
        'max_sweeps': 80, 'min_sweeps': 60})
    E_ref, _ = eng.run()

    dev = DeviceSweepEngine(psi, m, {'chi_max': 30, 'svd_min': 1e-12,
                                     'lanczos_K': 10, 'n_sweeps': 40,
                                     'multiple': 16})
    dev.run()
    psi.test_sanity()
    # measure the written-back state's energy density directly
    eng2 = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': 30, 'svd_min': 1e-12}, 'max_sweeps': 1})
    E_check, _ = eng2.run()
    assert abs(E_check - E_ref) < 1e-9


def test_large_ramp_write_back_health():
    """Single-stage 8x chi growth on an infinite chain must write back a
    healthy state (VERDICT r4 item 2: >2.5x ramps used to leave ~1e-2 seam
    drift that canonical_form then compounded into a mangled state).

    With the device mixer + growth-extrapolated capacity + settle sweeps
    + seam-Lanczos cap, the pre-regauge drift stays at the truncation scale
    and the written-back state's energy matches an independently converged
    host reference."""
    import tenpy_tpu.networks.mps as mpsmod
    m, psi, _ = _ramped_state(L=2, chi=8, sweeps=6, bc='infinite')
    assert max(psi.chi) <= 8
    psi_ref = psi.copy()
    eng = dmrg.TwoSiteDMRGEngine(psi_ref, m, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-12},
        'max_sweeps': 60, 'min_sweeps': 40})
    E_ref, _ = eng.run()

    dev = DeviceSweepEngine(psi, m, {'chi_max': 64, 'svd_min': 1e-12,
                                     'lanczos_K': 10, 'n_sweeps': 14,
                                     'multiple': 16})
    # intercept the write-back's final re-gauge to measure the raw seam drift
    orig_cf = mpsmod.MPS.canonical_form
    try:
        mpsmod.MPS.canonical_form = lambda self, **kw: None
        dev.run()
        drift = float(np.max(psi.norm_test()))
    finally:
        mpsmod.MPS.canonical_form = orig_cf
    assert max(psi.chi) >= 60          # the mixer actually grew chi 8x
    assert drift < 1e-5, f"seam drift {drift:.2e} above truncation scale"
    psi.canonical_form()
    # energy of the written-back state, measured independently on the host
    eng2 = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': 64, 'svd_min': 1e-12}, 'max_sweeps': 1})
    E_check, _ = eng2.run()
    assert abs(E_check - E_ref) < 5e-8, (E_check, E_ref)


def test_precompile_covers_sweep():
    """precompile() AOT-compiles every program an infinite sweep needs.

    With the uniform charge gauge the sweep must reuse exactly the
    precompiled executables — zero additional jit entries (a cold start
    through a remote-attached TPU costs minutes per program, so a missed
    structure would silently double the startup cost)."""
    m, psi, _ = _ramped_state(L=2, chi=16, sweeps=8, bc='infinite')
    dev = DeviceSweepEngine(psi, m, {'chi_max': 16, 'svd_min': 1e-12,
                                     'lanczos_K': 6, 'lanczos_K_seam': 8,
                                     'n_sweeps': 3, 'multiple': 8,
                                     'matvec_mode': 'f32',
                                     'polish_sweeps': 1})
    n = dev.precompile()
    # 2 directions x (K, K_seam) x [(f32, expand), (f32, settle),
    # (f64 polish, settle)] = 12 programs
    assert n == 12
    n0 = len(dev._jit_cache)
    dev.run()
    assert len(dev._jit_cache) == n0, "sweep compiled extra programs"
    psi.test_sanity()


def test_device_ramp_staged():
    """device_ramp: the staged fixed-capacity chi ramp (the reference's
    chi_list-with-mixer analogue) grows a small state to the target chi fully
    device-side and reaches the host-DMRG energy.

    Reference machinery being mirrored: ``tenpy/algorithms/dmrg.py:1142``
    (chi_list) + ``mps_common.py:2082`` (subspace expansion)."""
    from tenpy_tpu.algorithms.packed_dmrg import device_ramp
    m, psi, _ = _ramped_state(L=8, chi=4, sweeps=2, bc='finite')
    psi_ref = psi.copy()
    eng_ref = dmrg.TwoSiteDMRGEngine(psi_ref, m, {
        'trunc_params': {'chi_max': 32, 'svd_min': 1e-12},
        'max_sweeps': 20, 'mixer': True})
    E_ref, _ = eng_ref.run()

    eng = device_ramp(psi, m, {'chi_max': 32, 'svd_min': 1e-12,
                               'lanczos_K': 10, 'sweeps_per_stage': 3,
                               'n_sweeps': 10, 'multiple': 8})
    psi.test_sanity()
    assert max(psi.chi) > 8           # actually grew past the seed layout
    E_dev = eng.sweep_stats['E'][-1]
    # staged layout rebuilds replace the mixer: slightly slower tail
    # convergence than mixer-DMRG at equal sweep counts — 1e-6 relative is
    # the machinery check here, exact parity is test_device_ramp_exact
    assert abs(E_dev - E_ref) < 1e-6 * max(1., abs(E_ref)), (E_dev, E_ref)


@pytest.mark.slow
def test_device_ramp_exact():
    """device_ramp parity in the exact regime: chi_max >= 3^4 makes both
    engines exact on the L=8 S=1 chain, so the staged device ramp must land
    on the host-DMRG energy at machine precision (measured: 3.6e-15; the
    truncating-regime machinery check is test_device_ramp_staged)."""
    from tenpy_tpu.algorithms.packed_dmrg import device_ramp
    m, psi, _ = _ramped_state(L=8, chi=4, sweeps=2, bc='finite')
    psi_ref = psi.copy()
    E_ref, _ = dmrg.TwoSiteDMRGEngine(psi_ref, m, {
        'trunc_params': {'chi_max': 96, 'svd_min': 1e-12},
        'max_sweeps': 30, 'mixer': True}).run()
    eng = device_ramp(psi, m, {'chi_max': 96, 'svd_min': 1e-12,
                               'lanczos_K': 10, 'sweeps_per_stage': 3,
                               'n_sweeps': 14, 'multiple': 8})
    psi.test_sanity()
    E_dev = eng.sweep_stats['E'][-1]
    assert abs(E_dev - E_ref) < 1e-12, (E_dev, E_ref)


def test_flop_counter_vs_xla_cost_analysis():
    """Trace-time GEMM FLOP counter pinned against XLA cost analysis
    (VERDICT r4 item 6 / TODO #5).

    (a) one known GEMM through the packed engine: the counter must agree
        with ``compiled.cost_analysis()['flops']`` within 2x (XLA counts
        every op; the GEMM dominates);
    (b) a full precompiled DeviceSweepEngine update program at
        ``lanczos_K=1`` (the while_loop body is counted once by XLA):
        counter within 2x of XLA for every program.
    """
    # ---- (a) single dense GEMM
    rng = np.random.default_rng(3)
    from tenpy_tpu.linalg.charges import LegCharge
    a = npc.Array.from_ndarray_trivial(rng.normal(size=(48, 40)),
                                       labels=['x', 'y'])
    b = npc.Array.from_func(
        lambda size: rng.normal(size=size),
        [a.get_leg('y').conj(),
         LegCharge.from_trivial(56, a.chinfo)], dtype=a.dtype)
    b.iset_leg_labels(['y', 'z'])
    ap = pk.pack(a, multiple=8)
    bp = pk.pack(b, multiple=8)
    rec = pk.FlopRecorder()

    def f(ap, bp):
        with pk.flop_record(rec):
            return pk.tensordot(ap, bp, axes=(['y'], ['y']))

    jf = jax.jit(f)
    out = jf(ap, bp)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    ca = jf.lower(ap, bp).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla_flops = float(ca.get('flops', 0.))
    assert rec.flops > 0 and xla_flops > 0
    assert 0.5 < rec.flops / xla_flops < 2.0, (rec.flops, xla_flops)

    # ---- (b) every precompiled sweep program
    m, psi, _ = _ramped_state(L=4, chi=12, sweeps=2, bc='infinite')
    eng = DeviceSweepEngine(psi, m, {'chi_max': 16, 'svd_min': 1e-10,
                                     'lanczos_K': 1, 'lanczos_K_seam': 1,
                                     'n_sweeps': 1, 'multiple': 8})
    n = eng.precompile()
    assert n > 0
    rows = eng.xla_cost_analysis_flops()
    assert len(rows) == n
    for key, xla_f, traced in rows:
        assert traced > 0 and xla_f > 0, (key, xla_f, traced)
        assert 0.5 < traced / xla_f < 2.0, (key, xla_f, traced)
