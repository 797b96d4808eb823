r"""Multi-chip sharding of the charge-conserving contraction engine.

This is the real-engine counterpart of the dense TEBD toy in
:mod:`~tenpy_tpu.parallel.dense_tebd`: the shape-bucketed batched GEMMs that a
:class:`~tenpy_tpu.linalg.np_conserved._Plan` lowers a charge-conserving
``tensordot`` to (the TPU analogue of the reference's ``CblasGemmBatch``,
``tenpy/linalg/_npc_helper.pyx:151,1498``) are split along their *batch*
dimension over a 1D :class:`jax.sharding.Mesh`.  Each device runs its slice of
every GEMM bucket with ``shard_map``; contributions landing on the same output
charge block are combined with a local segment-sum followed by one
``lax.psum`` over ICI.

Usage — any plan-driven contraction (tensordot, and thereby the DMRG
effective-Hamiltonian matvec, environment updates, ...) becomes mesh-sharded
inside the context manager::

    with sharded(mesh):
        theta_out = jax.jit(matvec)(LP, RP, W0, W1, theta)

This is the design SURVEY.md §5.8 calls for: distributing charge-sector GEMM
batches over chips — something the reference (single-process, MKL threads)
has no analogue of.
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..linalg import np_conserved as npc

__all__ = ['sharded', 'matvec_2site_sharded', 'dryrun_sharded_matvec',
           '_execute_plan_sharded']


@contextmanager
def sharded(mesh):
    """Execute all charge-conserving tensordot plans sharded over ``mesh``.

    Affects trace time: use around the first (tracing) call of a jitted
    function; the compiled executable keeps the sharded program.
    """
    prev = npc._SHARDED_MESH
    npc._SHARDED_MESH = mesh
    try:
        yield
    finally:
        npc._SHARDED_MESH = prev


def _execute_plan_sharded(plan, a_data, b_data, dtype, mesh):
    """Run a contraction plan with each GEMM bucket's batch split over ``mesh``.

    For every shape group ``(m, k, n)`` with ``B`` tasks: stack operands to
    ``(B, m, k) @ (B, k, n)``, zero-pad ``B`` to a multiple of the mesh size,
    let each device matmul its slice, segment-sum locally into the group's
    output blocks (padding rows land in a discarded garbage segment), and
    ``psum`` across the mesh.
    """
    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    partial = [None] * plan.n_out
    for (m, k, n), a_idx, b_idx, o_idx in plan.groups:
        B = len(a_idx)
        uniq, inv = np.unique(o_idx, return_inverse=True)
        n_seg = len(uniq)
        B_pad = -(-B // n_dev) * n_dev
        am = jnp.stack([jnp.asarray(a_data[int(i)]).reshape(m, k).astype(dtype)
                        for i in a_idx])
        bm = jnp.stack([jnp.asarray(b_data[int(j)]).reshape(k, n).astype(dtype)
                        for j in b_idx])
        if B_pad != B:
            am = jnp.concatenate([am, jnp.zeros((B_pad - B, m, k), dtype)])
            bm = jnp.concatenate([bm, jnp.zeros((B_pad - B, k, n), dtype)])
        seg = jnp.asarray(np.concatenate(
            [inv.astype(np.int32), np.full(B_pad - B, n_seg, np.int32)]))

        def body(am_l, bm_l, seg_l):
            c = jnp.matmul(am_l, bm_l)
            out = jax.ops.segment_sum(c, seg_l, num_segments=n_seg + 1)
            return jax.lax.psum(out, axis)

        out = shard_map(body, mesh=mesh,
                        in_specs=(P(axis), P(axis), P(axis)),
                        out_specs=P())(am, bm, seg)
        for pos, oi in enumerate(uniq):
            oi = int(oi)
            blk = out[pos]
            partial[oi] = blk if partial[oi] is None else partial[oi] + blk
    return [partial[oi].reshape(plan.out_shapes[oi])
            for oi in range(plan.n_out)]


def matvec_2site_sharded(mesh):
    """Jitted two-site DMRG effective-H matvec with mesh-sharded GEMM buckets.

    Returns ``fn(LP, RP, W0, W1, theta) -> theta'`` — the hot loop of DMRG
    (reference ``tenpy/algorithms/mps_common.py:1321``) distributed over the
    mesh's devices.
    """
    from ..algorithms.mps_common import _matvec_2site_plain_impl

    def impl(LP, RP, W0, W1, theta):
        return _matvec_2site_plain_impl(LP, RP, W0, W1, theta)

    jitted = jax.jit(impl)

    def fn(LP, RP, W0, W1, theta):
        with sharded(mesh):
            return jitted(LP, RP, W0, W1, theta)

    return fn


def _small_effH_problem(chi=24, L=2, seed=0):
    """A small real-valued U(1) Heisenberg two-site effective-H problem."""
    from ..networks.site import SpinHalfSite
    from ..networks.mps import MPS
    from ..networks.mpo import MPOGraph, MPOEnvironment
    from ..networks.terms import CouplingTerms

    site = SpinHalfSite('Sz')
    sites = [site] * L
    ct = CouplingTerms(L)
    for i in range(L):
        ct.add_coupling_term(1., i, i + 1, 'Sz', 'Sz')
        ct.add_coupling_term(0.5, i, i + 1, 'Sp', 'Sm')
        ct.add_coupling_term(0.5, i, i + 1, 'Sm', 'Sp')
    H = MPOGraph.from_terms([ct], sites, 'infinite').build_MPO()
    psi = MPS.from_desired_bond_dimension(sites, chi, bc='infinite', seed=seed,
                                          p_state=['up', 'down'])
    env = MPOEnvironment(psi, H, psi, start_env_sites=1)
    LP = env.get_LP(0)
    RP = env.get_RP(1)
    W0 = H.get_W(0).replace_labels(['p', 'p*'], ['p0', 'p0*'])
    W1 = H.get_W(1).replace_labels(['p', 'p*'], ['p1', 'p1*'])
    theta = psi.get_theta(0, 2)

    def _realify(a):
        res = a.copy(deep=False)
        res._data = [np.asarray(b).real.astype(np.float64) for b in res._data]
        res.dtype = np.dtype(np.float64)
        return res

    return tuple(_realify(x) for x in (LP, RP, W0, W1, theta))


def dryrun_sharded_matvec(mesh, chi=24, rtol=1e-10):
    """Run the sharded charge-conserving matvec on ``mesh`` and verify it
    against the single-device host result to ``rtol``."""
    LP, RP, W0, W1, theta = _small_effH_problem(chi=chi)
    from ..algorithms.mps_common import _matvec_2site_plain_impl
    ref = _matvec_2site_plain_impl(LP, RP, W0, W1, theta)
    with mesh:
        got = matvec_2site_sharded(mesh)(LP, RP, W0, W1, theta)
    err = npc.norm(got - ref) / max(npc.norm(ref), 1e-300)
    assert err < rtol, f"sharded matvec mismatch: rel err {err}"
