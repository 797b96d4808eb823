"""Multi-chip sharding tests, run on the virtual 8-device CPU mesh (conftest).

Covers the real charge-conserving engine sharded over a ``jax.sharding.Mesh``
(``parallel/sharded_matvec.py``) and the dense bond-parallel TEBD layer
(``parallel/dense_tebd.py``) — the genuinely new multi-chip layer the
reference has no analogue of (SURVEY.md §5.8).
"""
import numpy as np
import jax
import pytest

from tenpy_tpu.linalg import np_conserved as npc
from tenpy_tpu.parallel.mesh import make_mesh
from tenpy_tpu.parallel.sharded_matvec import (
    sharded, matvec_2site_sharded, dryrun_sharded_matvec, _small_effH_problem)
from tenpy_tpu.parallel import dense_tebd

from random_test import random_Array, chinfo_U1, chinfo_U1_Z3


def _mesh(n):
    if len(jax.devices('cpu')) < n:
        pytest.skip(f"need {n} virtual CPU devices")
    return make_mesh(n, platform='cpu')


@pytest.mark.parametrize('n_dev', [1, 4, 8])
@pytest.mark.parametrize('chinfo', [chinfo_U1, chinfo_U1_Z3])
def test_sharded_tensordot(n_dev, chinfo):
    """Sharded plan execution == plain tensordot on random charged arrays."""
    mesh = _mesh(n_dev)
    from random_test import gen_random_legcharge
    a = random_Array((22, 18, 15), chinfo)
    legs_b = [a.legs[2].conj(), a.legs[1].conj(),
              gen_random_legcharge(chinfo, 17)]
    rs = np.random.RandomState(7)
    b = npc.Array.from_func(lambda size: rs.normal(size=size), legs_b,
                            dtype=a.dtype)
    if b.stored_blocks == 0:
        pytest.skip("no allowed blocks for this random charge draw")
    ref = npc.tensordot(a, b, axes=[[2, 1], [0, 1]])
    with mesh, sharded(mesh):
        got = npc.tensordot(a, b, axes=[[2, 1], [0, 1]])
    assert np.allclose(got.to_numpy(), ref.to_numpy(), atol=1e-12, rtol=1e-12)


@pytest.mark.parametrize('n_dev', [2, 8])
def test_sharded_matvec_2site(n_dev):
    """Sharded two-site effH matvec == host matvec to 1e-10 (jitted)."""
    mesh = _mesh(n_dev)
    dryrun_sharded_matvec(mesh, chi=24)


def test_sharded_matvec_lanczos_energy():
    """A few power/Lanczos-style iterations through the sharded matvec agree
    with the host path on the Rayleigh quotient (1e-10)."""
    mesh = _mesh(4)
    LP, RP, W0, W1, theta = _small_effH_problem(chi=16, seed=3)
    from tenpy_tpu.algorithms.mps_common import _matvec_2site_plain_impl
    fn = matvec_2site_sharded(mesh)
    v_h = theta * (1. / npc.norm(theta))
    v_s = v_h.copy()
    for _ in range(3):
        w_h = _matvec_2site_plain_impl(LP, RP, W0, W1, v_h)
        with mesh:
            w_s = fn(LP, RP, W0, W1, v_s)
        e_h = npc.inner(v_h.conj(), w_h, axes='range')
        e_s = npc.inner(v_s.conj(), w_s, axes='range')
        assert abs(float(e_h) - float(e_s)) < 1e-10
        v_h = w_h * (1. / npc.norm(w_h))
        v_s = w_s * (1. / float(npc.norm(w_s)))


@pytest.mark.parametrize('n_dev', [2, 4])
def test_dense_tebd_matches_single_device(n_dev):
    """Bond-parallel sharded TEBD == the same program on a 1-device mesh."""
    mesh_n = _mesh(n_dev)
    mesh_1 = _mesh(1)
    L, chi, d = 4 * n_dev, 8, 2
    Bs0 = dense_tebd.make_dense_state(L, chi, d, seed=1)
    step_n = dense_tebd.tebd_train_step(mesh_n, L, chi, d, dt=0.05)
    step_1 = dense_tebd.tebd_train_step(mesh_1, L, chi, d, dt=0.05)
    with mesh_n:
        Bn, nn = step_n(dense_tebd.make_dense_state(L, chi, d, seed=1, mesh=mesh_n))
    with mesh_1:
        B1, n1 = step_1(dense_tebd.make_dense_state(L, chi, d, seed=1, mesh=mesh_1))
    assert np.allclose(float(nn), float(n1), rtol=1e-9)
    assert np.allclose(np.asarray(Bn), np.asarray(B1), atol=1e-9)


def test_packed_engine_sharded_parity():
    """The production DeviceSweepEngine under a GSPMD-sharded mesh (every
    packed GEMM bucket constrained over 8 devices, batch- or tensor-parallel)
    must reproduce the unsharded engine's energies and written-back state to
    1e-10 (VERDICT r4 item 5)."""
    from tenpy_tpu.linalg import packed as pk
    from tenpy_tpu.networks.mps import MPS
    from tenpy_tpu.models.spins import SpinChain
    from tenpy_tpu.algorithms import dmrg as dmrg_mod
    from tenpy_tpu.algorithms.packed_dmrg import DeviceSweepEngine

    def _seed_state():
        m = SpinChain({'S': 1, 'L': 4, 'Jx': 1., 'Jy': 1., 'Jz': 1.,
                       'bc_MPS': 'finite', 'conserve': 'Sz'})
        psi = MPS.from_product_state(m.lat.mps_sites(), ['1.0', '-1.0'] * 2,
                                     bc='finite')
        dmrg_mod.TwoSiteDMRGEngine(psi, m, {
            'trunc_params': {'chi_max': 8, 'svd_min': 1e-10},
            'max_sweeps': 2}).run()
        return m, psi

    opts = {'chi_max': 24, 'svd_min': 1e-10, 'lanczos_K': 6, 'n_sweeps': 3,
            'multiple': 8}
    m, psi_1 = _seed_state()
    E_1, _ = DeviceSweepEngine(psi_1, m, dict(opts)).run()

    m2, psi_n = _seed_state()
    mesh = _mesh(8)
    pk.set_packed_mesh(mesh)
    try:
        with mesh:
            E_n, _ = DeviceSweepEngine(psi_n, m2, dict(opts)).run()
    finally:
        pk.set_packed_mesh(None)
    assert abs(E_n - E_1) < 1e-10, (E_n, E_1)
    # Sharded reductions reorder floating-point sums, which rotates SVD
    # bases inside (near-)degenerate Schmidt subspaces — a pure gauge
    # freedom.  Compare gauge-invariant quantities, not raw tensors.
    assert abs(abs(psi_n.overlap(psi_1)) - 1.) < 1e-9
    Sz_1 = psi_1.expectation_value('Sz')
    Sz_n = psi_n.expectation_value('Sz')
    assert np.allclose(Sz_n, Sz_1, atol=1e-9)


def test_dryrun_multichip_entry():
    """The driver's dry-run entry point passes on the virtual CPU mesh."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_driver_conditions():
    """Regression (VERDICT r3 weak #2): the dryrun child must pin itself to CPU.

    In this environment ``JAX_PLATFORMS=cpu`` is IGNORED when the axon TPU PJRT
    plugin is installed — only ``jax.config.update('jax_platforms', 'cpu')``
    works.  The driver invokes ``dryrun_multichip`` from an environment that
    does NOT carry the conftest's env pins, so simulate that: scrub every
    JAX/XLA env var and run the child exactly as the driver does.  The child's
    in-proc body asserts the backend is CPU before doing any work.
    """
    import subprocess
    import sys
    import os
    entry = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         '__graft_entry__.py')
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'JAX_PLATFORM_NAME', 'XLA_FLAGS')}
    res = subprocess.run(
        [sys.executable, '-c',
         "import runpy, sys; sys.argv=['x']; "
         "mod = runpy.run_path(%r); mod['dryrun_multichip'](8)" % entry],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-4000:]
    assert 'dryrun_multichip OK' in res.stdout
