r"""Sweep machinery, effective Hamiltonians, mixers, and variational compression.

Rebuild of ``tenpy/algorithms/mps_common.py`` (Sweep :60, IterativeSweeps :773,
EffectiveH :935, OneSiteH :1040, TwoSiteH :1245, ZeroSiteH :1440, Mixer :1547,
DensityMatrixMixer :1903, SubspaceExpansion :2082, VariationalCompression :2204,
VariationalApplyMPO :2383).

TPU design: the effective-Hamiltonian ``matvec`` — where essentially all FLOPs of DMRG
live — is a pure function of the environment/W/theta pytrees and is compiled with
``jax.jit``; JAX caches one executable per block structure, so a sweep at fixed
bond-dimension pattern reuses compiled kernels (the analogue of the reference's Cython
``_tensordot_worker`` + ``CblasGemmBatch``, ``_npc_helper.pyx:1498,151``).
"""

from __future__ import annotations

import logging
import os
import time
import warnings
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .algorithm import Algorithm
from ..linalg import np_conserved as npc
from ..linalg.sparse import NpcLinearOperator, OrthogonalNpcLinearOperator
from ..linalg.truncation import TruncationError, svd_theta, eigh_rho, truncate
from ..networks.mpo import MPOEnvironment
from ..networks.mps import MPSEnvironment
from ..tools.params import asConfig

logger = logging.getLogger(__name__)

__all__ = ['Sweep', 'IterativeSweeps', 'EffectiveH', 'OneSiteH', 'TwoSiteH',
           'ZeroSiteH', 'Mixer', 'DensityMatrixMixer', 'SubspaceExpansion',
           'VariationalCompression', 'VariationalApplyMPO',
           'QRBasedVariationalApplyMPO']


# ---------------------------------------------------------------------- jitted matvecs
# Small effective problems (warm-up sweeps with growing chi) run eagerly: each new
# block structure would trigger a fresh XLA compilation that is never amortized.
# Large problems (production chi) reuse one compiled executable per structure.
# Whole-graph jit of a single matvec only pays off in fixed-structure loops
# (benchmarks); in real sweeps the per-structure compile cost dominates, so it
# is disabled by default -- the fused device Lanczos kernel (DMRG) is the
# production accelerator path.  Override with TENPY_TPU_JIT_N.
JIT_SIZE_THRESHOLD = int(os.environ.get('TENPY_TPU_JIT_N', str(1 << 62)))
# Whole-graph jit is only viable when the charge-block structure is modest:
# tracing/compiling a matvec over thousands of tiny blocks (e.g. Hubbard with
# U(1)xU(1) charges) takes minutes regardless of backend.  Above this stored-
# block count the host per-block GEMM path is used instead.
MAX_JIT_BLOCKS = int(os.environ.get('TENPY_TPU_MAX_JIT_BLOCKS', '256'))
# The fused device Lanczos kernel (one jit per site update) only pays off for
# production-size problems where MXU GEMM time dominates the per-structure
# compile cost; below this, the host numpy path wins.
DEVICE_LANCZOS_THRESHOLD = int(os.environ.get('TENPY_TPU_DEVICE_LANCZOS_N',
                                              str(1 << 20)))
# Sector sizes of virtual legs are rounded up to this multiple on the packed
# device path (see linalg/packed.py): collapses jit-cache keys across sweeps
# and aligns GEMM shapes with the MXU tiles.
BUCKET_MULTIPLE = int(os.environ.get('TENPY_TPU_BUCKET_MULTIPLE', '64'))


def _matvec_2site_plain_impl(LP, RP, W0, W1, theta):
    """(LP W0 W1 RP) . theta for theta with legs (vL, p0, p1, vR)."""
    x = npc.tensordot(LP, theta, axes=[['vR'], ['vL']])
    x = npc.tensordot(x, W0, axes=[['wR', 'p0'], ['wL', 'p0*']])
    x = npc.tensordot(x, W1, axes=[['wR', 'p1'], ['wL', 'p1*']])
    x = npc.tensordot(x, RP, axes=[['wR', 'vR'], ['wL', 'vL']])
    x.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
    return x.itranspose(['vL', 'p0', 'p1', 'vR'])




def _full_qdata(a):
    """All charge-allowed qdata rows for a's legs and qtotal (lexsorted)."""
    import itertools
    legs = a.legs
    chinfo = a.chinfo
    rows = []
    for row in itertools.product(*[range(l.block_number) for l in legs]):
        q = chinfo.make_valid(
            sum(np.asarray(l.charges[r], np.int64) * l.qconj
                for l, r in zip(legs, row)))
        if tuple(q) == tuple(a.qtotal):
            rows.append(row)
    rows.sort()
    return np.array(rows, dtype=np.int64).reshape(len(rows), len(legs))


def _expand_blocks(a, qdata_full):
    """Array with the given (superset) qdata; missing blocks are zeros.

    Keeps the scan carry of the fused Lanczos kernel structure-stable: the
    matvec can only populate charge-allowed blocks, all of which are present."""
    have = {tuple(int(x) for x in row): i for i, row in enumerate(a._qdata)}
    use_jnp = npc._use_jnp(*a._data) if a._data else True
    xp = jnp if use_jnp else np
    blocks = []
    for row in qdata_full:
        key = tuple(int(x) for x in row)
        if key in have:
            blocks.append(a._data[have[key]])
        else:
            shape = tuple(int(l.slices[r + 1] - l.slices[r])
                          for l, r in zip(a.legs, row))
            blocks.append(xp.zeros(shape, a.dtype))
    res = npc.Array(list(a.legs), a.dtype, a.qtotal, list(a.get_leg_labels()))
    res._set_blocks(np.array(qdata_full, dtype=np.int64), blocks)
    return res


def _lanczos_K_2site_impl(LP, RP, W0, W1, theta0, K):
    """K fixed Lanczos steps + Ritz ground state as ONE traced program.

    On TPU every eager op pays device-dispatch latency and every new block
    structure pays a full XLA compile; fusing the whole local eigensolve into a
    single jitted call (lax.scan over the Krylov iteration) makes a DMRG site
    update one device round trip.  Use with size-bucketed padded legs
    (:mod:`~tenpy_tpu.linalg.padding`) so consecutive updates share the
    compile-cache entry.

    Returns ``(E0, theta_gs)`` with theta normalized.
    """
    import jax
    from jax import lax

    qdata_full = _full_qdata(theta0)
    theta0 = _expand_blocks(theta0, qdata_full)
    nrm0 = npc.norm(theta0)
    v0 = theta0 * (1. / nrm0)

    def matvec(v):
        return _matvec_2site_plain_impl(LP, RP, W0, W1, v)

    def body(carry, _):
        v_prev, v, beta_prev = carry
        hw = _expand_blocks(matvec(v), qdata_full)
        alpha = jnp.real(npc.inner(v.conj(), hw, axes='range'))
        hw = hw - alpha * v
        hw = hw - beta_prev * v_prev
        beta = npc.norm(hw)
        ok = beta > 1e-14
        inv = jnp.where(ok, 1. / jnp.where(ok, beta, 1.), 0.)
        v_next = hw * inv   # zero vector once the Krylov space is exhausted
        return (v, v_next, jnp.where(ok, beta, 0.)), (v, alpha, beta)

    real_dtype = jnp.zeros((), theta0.dtype).real.dtype
    zero = jax.tree_util.tree_map(jnp.zeros_like, v0)
    (_, _, _), (vs, alphas, betas) = lax.scan(
        body, (zero, v0, jnp.asarray(0., real_dtype)), None, length=K)
    T = jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1)
    evals, evecs = jnp.linalg.eigh(T)
    c = evecs[:, 0]
    theta_gs = jax.tree_util.tree_map(
        lambda stacked: jnp.tensordot(c.astype(stacked.dtype), stacked,
                                      axes=[[0], [0]]), vs)
    nrm = npc.norm(theta_gs)
    theta_gs = theta_gs * (1. / nrm)
    return evals[0], theta_gs


_lanczos_K_2site_jit = None


def lanczos_K_2site(LP, RP, W0, W1, theta0, K):
    """Jitted wrapper of :func:`_lanczos_K_2site_impl` (K static)."""
    global _lanczos_K_2site_jit
    import jax
    if _lanczos_K_2site_jit is None:
        _lanczos_K_2site_jit = jax.jit(_lanczos_K_2site_impl, static_argnums=5)
    return _lanczos_K_2site_jit(LP, RP, W0, W1, theta0, K)


def _matvec_2site_packed(LPp, RPp, W0p, W1p, v):
    """Two-site effective-H matvec on :class:`~tenpy_tpu.linalg.packed.PackedArray`s."""
    from ..linalg import packed as pk
    x = pk.tensordot(LPp, v, axes=(['vR'], ['vL']))
    x = pk.tensordot(x, W0p, axes=(['wR', 'p0'], ['wL', 'p0*']))
    x = pk.tensordot(x, W1p, axes=(['wR', 'p1'], ['wL', 'p1*']))
    x = pk.tensordot(x, RPp, axes=(['wR', 'vR'], ['wL', 'vL']))
    x = x.replace_labels(['vR*', 'vL*'], ['vL', 'vR'])
    return x.transpose(['vL', 'p0', 'p1', 'vR'])


def _lanczos_K_2site_packed_impl(LPp, RPp, W0p, W1p, theta0, K,
                                 P_tol=0., N_min=2, reortho=False,
                                 matvec_mode=None, exact_E=False,
                                 flop_rec=None):
    """Convergence-controlled Lanczos + Ritz ground state on packed blocks.

    Unlike :func:`_lanczos_K_2site_impl` (per-block pytree leaves, capped by
    ``MAX_JIT_BLOCKS``), the packed layout keeps the traced program size
    independent of the number of charge blocks — this is the device path for
    block-heavy models (Hubbard cylinder U(1)xU(1), the BASELINE.json north
    star).

    A ``lax.while_loop`` takes up to ``K`` steps, exiting early once the
    ground-state Ritz value is converged (``|E_i - E_{i-1}| < P_tol * |E_i|``,
    after at least ``N_min`` steps) or the Krylov space is exhausted — the
    accuracy-control analogue of the reference's adaptive Lanczos
    (``tenpy/linalg/krylov_based.py:154``), with the K x K tridiagonal
    eigensolve fused into the loop (it is negligible next to the matvec).
    ``reortho`` orthogonalizes every new vector against the full stored basis
    (costs one extra pass over the Krylov buffer per step; cures ghost
    eigenvalues from float drift on hard problems).

    Returns ``(E0, theta_gs, N_used, resid)`` with ``resid`` the standard
    residual bound ``|beta_N * <e_N, gs>|``.

    ``matvec_mode`` (``None``/``'f32'``/``'bf16'``) runs the Lanczos matvecs
    in reduced GEMM precision (:func:`~tenpy_tpu.linalg.packed.matmul_mode`)
    while all scalar algebra (alpha/beta, tridiagonal eigensolve,
    orthogonalization) stays f64.  With ``exact_E`` the returned E0 is the
    full-f64 Rayleigh quotient ``<theta|H|theta>`` of the Ritz vector (one
    extra full-precision matvec) — a true variational energy even when the
    iterations ran reduced.
    """
    import jax
    from jax import lax
    from ..linalg import packed as pk

    # promote theta to the matvec result dtype upfront: the loop carry must
    # be dtype-stable (real guess + complex H would otherwise change the
    # pytree aux on the first iteration).  Complex lives in split re/im
    # channels (PackedArray.data_im), never in complex buffers.
    dt = jnp.result_type(LPp.dtype, RPp.dtype, W0p.dtype, W1p.dtype,
                         theta0.dtype)
    if jnp.issubdtype(dt, jnp.complexfloating) and not theta0.iscomplex:
        theta0 = theta0._with_data(list(theta0.data),
                                   [jnp.zeros_like(d) for d in theta0.data])
    elif dt != theta0.dtype:
        theta0 = theta0._with_data([d.astype(dt) for d in theta0.data])
    if reortho and theta0.iscomplex:
        raise NotImplementedError(
            "reortho with complex (split-channel) Krylov vectors needs "
            "complex Gram-Schmidt coefficients; run without reortho")
    nrm0 = pk.norm(theta0)
    v0 = theta0 * (1. / nrm0)
    real_dtype = jnp.zeros((), theta0.dtype).real.dtype

    _mv_recorded = [False]

    def matvec(v):
        with pk.matmul_mode(matvec_mode):   # trace-time switch
            if flop_rec is not None and not _mv_recorded[0]:
                # record one iteration's GEMM FLOPs (the loop body traces
                # once; executed FLOPs need the run-time trip count N)
                _mv_recorded[0] = True
                with pk.flop_record(flop_rec):
                    return _matvec_2site_packed(LPp, RPp, W0p, W1p, v)
            return _matvec_2site_packed(LPp, RPp, W0p, W1p, v)

    def tree_dot(Vbuf, w):
        """<Vbuf_j, w> for all K slots (unfilled slots are zero -> coeff 0)."""
        parts = [jnp.tensordot(jnp.conj(b.reshape(K, -1)), l.reshape(-1),
                               axes=[[1], [0]])
                 for b, l in zip(jax.tree_util.tree_leaves(Vbuf),
                                 jax.tree_util.tree_leaves(w))]
        return sum(parts)

    def tree_back(Vbuf, c):
        return jax.tree_util.tree_map(
            lambda b: jnp.tensordot(c.astype(b.dtype), b, axes=[[0], [0]]),
            Vbuf)

    def T_energy(alphas, betas, n):
        """Ground Ritz value of the leading n x n block (padded, masked).

        Unused slots are shifted just above the spectrum by a Gershgorin
        bound (NOT a huge constant: TPU f64 emulation overflows on extreme
        sentinels and the eigensolve returns garbage)."""
        i = jnp.arange(K)
        big = jnp.max(jnp.abs(alphas)) + 2. * jnp.max(jnp.abs(betas)) + 1.
        diag = jnp.where(i < n, alphas, big)
        off = jnp.where(i[:-1] < n - 1, betas[:-1], 0.)
        T = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
        evals, evecs = jnp.linalg.eigh(T)
        return evals[0], evecs[:, 0]

    def final_E(E_T, theta_gs):
        """Full-f64 variational energy of the (normalized) Ritz vector."""
        if not (exact_E and matvec_mode is not None):
            return E_T
        hw = _matvec_2site_packed(LPp, RPp, W0p, W1p, theta_gs)
        return pk.inner_re(theta_gs, hw)

    # Krylov noise floor: once the residual beta drops to the matvec's GEMM
    # noise (~eps * |H v|), the "next" basis vector is pure noise — adding it
    # corrupts the tridiagonal (junk alphas can land *below* E0) and the Ritz
    # state.  Stop there instead; scale by the running |alpha| + beta.
    mv_eps = {'f32': 2e-7, 'bf16': 3e-3}.get(matvec_mode, 0.)

    def beta_floor(alpha, beta_prev):
        return jnp.maximum(1e-14, 30. * mv_eps * (jnp.abs(alpha)
                                                  + beta_prev))

    if not (P_tol and P_tol > 0) and not reortho:
        # fixed-K path: plain lax.scan, NO eigensolve inside the loop (the
        # in-loop eigh costs compile time and trace complexity for nothing
        # when there is no early exit)
        def body(carry, _):
            v_prev, v, beta_prev = carry
            hw = matvec(v)
            alpha = pk.inner_re(v, hw)
            hw = hw - v * alpha
            hw = hw - v_prev * beta_prev
            beta = pk.norm(hw)
            ok = beta > beta_floor(alpha, beta_prev)
            inv = jnp.where(ok, 1. / jnp.where(ok, beta, 1.), 0.)
            v_next = hw * inv
            return (v, v_next, jnp.where(ok, beta, 0.)), (v, alpha, beta)

        zero = jax.tree_util.tree_map(jnp.zeros_like, v0)
        with pk.flop_scale(K):   # body traced once, executed K times
            (_, _, _), (vs, alphas, betas) = lax.scan(
                body, (zero, v0, jnp.asarray(0., real_dtype)), None, length=K)
        # slots after an early Krylov breakdown are dead (zero vectors, zero
        # alpha/beta): shift their diagonal above the spectrum (Gershgorin)
        # so the min eigenvalue comes from the live block
        live = jnp.concatenate([jnp.ones(1, bool),
                                jnp.cumprod(betas[:-1] > 0).astype(bool)])
        big = jnp.max(jnp.abs(alphas)) + 2. * jnp.max(jnp.abs(betas)) + 1.
        diag = jnp.where(live, alphas, big)
        T = jnp.diag(diag) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1)
        evals, evecs = jnp.linalg.eigh(T)
        c = evecs[:, 0]
        theta_gs = jax.tree_util.tree_map(
            lambda stacked: jnp.tensordot(c.astype(stacked.dtype), stacked,
                                          axes=[[0], [0]]), vs)
        nrm = pk.norm(theta_gs)
        theta_gs = theta_gs * (1. / nrm)
        resid = jnp.abs(betas[-1] * c[-1])
        return final_E(evals[0], theta_gs), theta_gs, jnp.asarray(K), resid

    Vbuf0 = jax.tree_util.tree_map(
        lambda l: jnp.zeros((K,) + l.shape, l.dtype), v0)
    zero = jax.tree_util.tree_map(jnp.zeros_like, v0)
    alphas0 = jnp.zeros(K, real_dtype)
    betas0 = jnp.zeros(K, real_dtype)

    def cond(st):
        i, _, _, _, _, _, _, E_prev, done = st
        return (i < K) & ~done

    def body(st):
        i, v_prev, v, beta_prev, Vbuf, alphas, betas, E_prev, done = st
        Vbuf = jax.tree_util.tree_map(lambda b, l: b.at[i].set(l), Vbuf, v)
        hw = matvec(v)
        alpha = pk.inner_re(v, hw)
        hw = hw - v * alpha
        hw = hw - v_prev * beta_prev
        if reortho:
            c = tree_dot(Vbuf, hw)
            hw = hw - tree_back(Vbuf, c)
        beta = pk.norm(hw)
        ok = beta > beta_floor(alpha, beta_prev)
        inv = jnp.where(ok, 1. / jnp.where(ok, beta, 1.), 0.)
        v_next = hw * inv
        alphas = alphas.at[i].set(alpha)
        betas = betas.at[i].set(jnp.where(ok, beta, 0.))
        E, _ = T_energy(alphas, betas, i + 1)
        conv = (i + 1 >= N_min) & \
            (jnp.abs(E - E_prev) <= P_tol * jnp.abs(E)) if P_tol > 0 \
            else jnp.asarray(False)
        return (i + 1, v, v_next, jnp.where(ok, beta, 0.), Vbuf,
                alphas, betas, E, conv | ~ok)

    st = (jnp.asarray(0), zero, v0, jnp.asarray(0., real_dtype), Vbuf0,
          alphas0, betas0, jnp.asarray(jnp.inf, real_dtype),
          jnp.asarray(False))
    with pk.flop_scale(K):   # body traced once, executed up to K times
        i, _, _, _, Vbuf, alphas, betas, _, _ = lax.while_loop(cond, body, st)
    E0, c = T_energy(alphas, betas, i)
    resid = jnp.abs(betas[jnp.maximum(i - 1, 0)] * c[jnp.maximum(i - 1, 0)])
    theta_gs = tree_back(Vbuf, c)
    nrm = pk.norm(theta_gs)
    theta_gs = theta_gs * (1. / nrm)
    return final_E(E0, theta_gs), theta_gs, i, resid


_lanczos_K_2site_packed_jit = None


def lanczos_K_2site_packed(LPp, RPp, W0p, W1p, theta0, K, P_tol=0.,
                           N_min=2, reortho=False, matvec_mode=None,
                           exact_E=False):
    """Jitted wrapper of :func:`_lanczos_K_2site_packed_impl` (K etc. static)."""
    global _lanczos_K_2site_packed_jit
    import jax
    if _lanczos_K_2site_packed_jit is None:
        _lanczos_K_2site_packed_jit = jax.jit(
            _lanczos_K_2site_packed_impl, static_argnums=(5, 6, 7, 8, 9, 10))
    return _lanczos_K_2site_packed_jit(LPp, RPp, W0p, W1p, theta0, K,
                                       P_tol, N_min, reortho, matvec_mode,
                                       exact_E)


def _matvec_2site_combined_impl(LHeff, RHeff, theta):
    """LHeff . theta . RHeff for theta with legs ((vL.p0), (p1.vR))."""
    x = npc.tensordot(LHeff, theta, axes=[['(vR.p0*)'], ['(vL.p0)']])
    x = npc.tensordot(x, RHeff, axes=[['wR', '(p1.vR)'], ['wL', '(p1*.vL)']])
    x.ireplace_labels(['(vR*.p0)', '(p1.vL*)'], ['(vL.p0)', '(p1.vR)'])
    return x


def _matvec_1site_plain_impl(LP, RP, W0, theta):
    """theta legs (vL, p0, vR)."""
    x = npc.tensordot(LP, theta, axes=[['vR'], ['vL']])
    x = npc.tensordot(x, W0, axes=[['wR', 'p0'], ['wL', 'p0*']])
    x = npc.tensordot(x, RP, axes=[['wR', 'vR'], ['wL', 'vL']])
    x.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
    return x.itranspose(['vL', 'p0', 'vR'])


def _matvec_0site_impl(LP, RP, theta):
    """theta legs (vL, vR)."""
    x = npc.tensordot(LP, theta, axes=[['vR'], ['vL']])
    x = npc.tensordot(x, RP, axes=[['wR', 'vR'], ['wL', 'vL']])
    x.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
    return x.itranspose(['vL', 'vR'])


_matvec_2site_plain_jit = jax.jit(_matvec_2site_plain_impl)
_matvec_2site_combined_jit = jax.jit(_matvec_2site_combined_impl)
_matvec_1site_plain_jit = jax.jit(_matvec_1site_plain_impl)
_matvec_0site_jit = jax.jit(_matvec_0site_impl)


def _matvec_2site_plain(LP, RP, W0, W1, theta, big=False):
    f = _matvec_2site_plain_jit if big else _matvec_2site_plain_impl
    return f(LP, RP, W0, W1, theta)


def _matvec_2site_combined(LHeff, RHeff, theta, big=False):
    f = _matvec_2site_combined_jit if big else _matvec_2site_combined_impl
    return f(LHeff, RHeff, theta)


def _matvec_1site_plain(LP, RP, W0, theta, big=False):
    f = _matvec_1site_plain_jit if big else _matvec_1site_plain_impl
    return f(LP, RP, W0, theta)


def _matvec_0site(LP, RP, theta, big=False):
    f = _matvec_0site_jit if big else _matvec_0site_impl
    return f(LP, RP, theta)


class EffectiveH(NpcLinearOperator):
    """Base for effective Hamiltonians of a few sites in the environment sandwich.

    Reference: ``tenpy/algorithms/mps_common.py:935``.
    """

    length = None
    acts_on = None

    def __init__(self, env, i0, combine=False, move_right=True):
        raise NotImplementedError

    def combine_theta(self, theta):
        return theta

    def to_matrix(self):
        raise NotImplementedError

    def adjoint(self):
        return self  # effective H's here are hermitian


class TwoSiteH(EffectiveH):
    r"""Two-site effective Hamiltonian: LP -- W0 -- W1 -- RP.

    The hot loop of DMRG: ``matvec`` is jitted; with ``combine=True``, ``LHeff``/
    ``RHeff`` are precomputed so each matvec is two big pipe-legged contractions
    straight onto the MXU.  Reference: ``mps_common.py:1245``.
    """

    length = 2
    acts_on = ['vL', 'p0', 'p1', 'vR']

    def __init__(self, env, i0, combine=False, move_right=True):
        self.i0 = i0
        self.combine = combine
        self.LP = env.get_LP(i0)
        self.RP = env.get_RP(i0 + 1)
        self.W0 = env.H.get_W(i0).replace_labels(['p', 'p*'], ['p0', 'p0*'])
        self.W1 = env.H.get_W(i0 + 1).replace_labels(['p', 'p*'], ['p1', 'p1*'])
        self.dtype = jnp.result_type(self.LP.dtype, self.RP.dtype, self.W0.dtype,
                                     self.W1.dtype)
        self.N = (self.LP.get_leg('vR').ind_len * self.W0.get_leg('p0').ind_len *
                  self.W1.get_leg('p1').ind_len * self.RP.get_leg('vL').ind_len)
        if combine:
            self.combine_Heff(env)

    def combine_Heff(self, env):
        """Precompute LHeff / RHeff with combined pipe legs."""
        LHeff = npc.tensordot(self.LP, self.W0, axes=[['wR'], ['wL']])
        LHeff = LHeff.combine_legs([['vR*', 'p0'], ['vR', 'p0*']], qconj=[+1, -1])
        self.LHeff = LHeff.itranspose(['(vR*.p0)', 'wR', '(vR.p0*)'])
        RHeff = npc.tensordot(self.W1, self.RP, axes=[['wR'], ['wL']])
        RHeff = RHeff.combine_legs([['p1', 'vL*'], ['p1*', 'vL']], qconj=[-1, +1])
        self.RHeff = RHeff.itranspose(['(p1*.vL)', 'wL', '(p1.vL*)'])
        self.acts_on = ['(vL.p0)', '(p1.vR)']
        self.pipeL = self.LHeff.get_leg('(vR*.p0)')
        self.pipeR = self.RHeff.get_leg('(p1.vL*)')

    def matvec(self, theta):
        big = self.N >= JIT_SIZE_THRESHOLD and \
            theta.stored_blocks <= MAX_JIT_BLOCKS
        if self.combine:
            return _matvec_2site_combined(self.LHeff, self.RHeff, theta, big)
        return _matvec_2site_plain(self.LP, self.RP, self.W0, self.W1, theta, big)

    def combine_theta(self, theta):
        """Combine legs of theta to match the combined matvec."""
        if self.combine:
            theta = theta.combine_legs([['vL', 'p0'], ['p1', 'vR']],
                                       pipes=[self.pipeL, self.pipeR])
        return theta.itranspose(self.acts_on)

    def to_matrix(self):
        if self.combine:
            mat = npc.tensordot(self.LHeff, self.RHeff, axes=[['wR'], ['wL']])
            mat = mat.combine_legs([['(vR*.p0)', '(p1.vL*)'], ['(vR.p0*)', '(p1*.vL)']],
                                   qconj=[+1, -1])
            return mat
        mat = npc.tensordot(self.LP, self.W0, axes=[['wR'], ['wL']])
        mat = npc.tensordot(mat, self.W1, axes=[['wR'], ['wL']])
        mat = npc.tensordot(mat, self.RP, axes=[['wR'], ['wL']])
        mat = mat.combine_legs([['vR*', 'p0', 'p1', 'vL*'], ['vR', 'p0*', 'p1*', 'vL']],
                               qconj=[+1, -1])
        return mat

    def update_LP(self, env, i, U=None):
        """Update env.LP[i] (using LHeff if combined). Reference: ``mps_common.py:1421``."""
        if self.combine and U is not None:
            LP = npc.tensordot(self.LHeff, U, axes=[['(vR.p0*)'], ['(vL.p0)']])
            LP = npc.tensordot(U.conj(), LP, axes=[['(vL*.p0*)'], ['(vR*.p0)']])
            LP.iset_leg_labels(['vR*', 'wR', 'vR'])
            env.set_LP(i, LP, age=env.get_LP_age(i - 1) + 1)
        else:
            # recompute directly from LP[i-1] (the slot itself may hold stale data)
            LP = env._contract_LP(i - 1, env.get_LP(i - 1, store=False))
            env.set_LP(i, LP, age=env.get_LP_age(i - 1) + 1)

    def update_RP(self, env, i, VH=None):
        if self.combine and VH is not None:
            RP = npc.tensordot(VH, self.RHeff, axes=[['(p1.vR)'], ['(p1*.vL)']])
            RP = npc.tensordot(RP, VH.conj(), axes=[['(p1.vL*)'], ['(p1*.vR*)']])
            RP.iset_leg_labels(['vL', 'wL', 'vL*'])
            RP.itranspose(['vL*', 'wL', 'vL'])
            env.set_RP(i, RP, age=env.get_RP_age(i + 1) + 1)
        else:
            RP = env._contract_RP(i + 1, env.get_RP(i + 1, store=False))
            env.set_RP(i, RP, age=env.get_RP_age(i + 1) + 1)


class OneSiteH(EffectiveH):
    """One-site effective Hamiltonian LP -- W0 -- RP. Reference: ``mps_common.py:1040``."""

    length = 1
    acts_on = ['vL', 'p0', 'vR']

    def __init__(self, env, i0, combine=False, move_right=True):
        self.i0 = i0
        self.combine = combine
        self.move_right = move_right
        self.LP = env.get_LP(i0)
        self.RP = env.get_RP(i0)
        self.W0 = env.H.get_W(i0).replace_labels(['p', 'p*'], ['p0', 'p0*'])
        self.dtype = jnp.result_type(self.LP.dtype, self.RP.dtype, self.W0.dtype)
        self.N = (self.LP.get_leg('vR').ind_len * self.W0.get_leg('p0').ind_len *
                  self.RP.get_leg('vL').ind_len)
        if combine:
            self.combine_Heff(env)

    def combine_Heff(self, env):
        if self.move_right:
            LHeff = npc.tensordot(self.LP, self.W0, axes=[['wR'], ['wL']])
            LHeff = LHeff.combine_legs([['vR*', 'p0'], ['vR', 'p0*']], qconj=[+1, -1])
            self.LHeff = LHeff.itranspose(['(vR*.p0)', 'wR', '(vR.p0*)'])
            self.pipeL = self.LHeff.get_leg('(vR*.p0)')
            self.acts_on = ['(vL.p0)', 'vR']
        else:
            RHeff = npc.tensordot(self.W0, self.RP, axes=[['wR'], ['wL']])
            RHeff = RHeff.combine_legs([['p0', 'vL*'], ['p0*', 'vL']], qconj=[-1, +1])
            self.RHeff = RHeff.itranspose(['(p0*.vL)', 'wL', '(p0.vL*)'])
            self.pipeR = self.RHeff.get_leg('(p0.vL*)')
            self.acts_on = ['vL', '(p0.vR)']

    def matvec(self, theta):
        if not self.combine:
            return _matvec_1site_plain(self.LP, self.RP, self.W0, theta,
                                       self.N >= JIT_SIZE_THRESHOLD
                                       and theta.stored_blocks <= MAX_JIT_BLOCKS)
        if self.move_right:
            x = npc.tensordot(self.LHeff, theta, axes=[['(vR.p0*)'], ['(vL.p0)']])
            x = npc.tensordot(x, self.RP, axes=[['wR', 'vR'], ['wL', 'vL']])
            x.ireplace_labels(['(vR*.p0)', 'vL*'], ['(vL.p0)', 'vR'])
            return x.itranspose(['(vL.p0)', 'vR'])
        x = npc.tensordot(theta, self.RHeff, axes=[['(p0.vR)'], ['(p0*.vL)']])
        x = npc.tensordot(self.LP, x, axes=[['wR', 'vR'], ['wL', 'vL']])
        x.ireplace_labels(['vR*', '(p0.vL*)'], ['vL', '(p0.vR)'])
        return x.itranspose(['vL', '(p0.vR)'])

    def combine_theta(self, theta):
        if self.combine:
            if self.move_right:
                theta = theta.combine_legs([['vL', 'p0']], pipes=[self.pipeL])
            else:
                theta = theta.combine_legs([['p0', 'vR']], pipes=[self.pipeR])
        return theta.itranspose(self.acts_on)

    def to_matrix(self):
        mat = npc.tensordot(self.LP, self.W0, axes=[['wR'], ['wL']])
        mat = npc.tensordot(mat, self.RP, axes=[['wR'], ['wL']])
        mat = mat.combine_legs([['vR*', 'p0', 'vL*'], ['vR', 'p0*', 'vL']],
                               qconj=[+1, -1])
        return mat

    def update_LP(self, env, i, U=None):
        LP = env._contract_LP(i - 1, env.get_LP(i - 1, store=False))
        env.set_LP(i, LP, age=env.get_LP_age(i - 1) + 1)

    def update_RP(self, env, i, VH=None):
        RP = env._contract_RP(i + 1, env.get_RP(i + 1, store=False))
        env.set_RP(i, RP, age=env.get_RP_age(i + 1) + 1)


class ZeroSiteH(EffectiveH):
    """Zero-site effective Hamiltonian LP -- RP on bond i0 (for TDVP backward steps).

    Reference: ``mps_common.py:1440``.
    """

    length = 0
    acts_on = ['vL', 'vR']

    def __init__(self, env, i0):
        self.i0 = i0
        self.LP = env.get_LP(i0)
        self.RP = env.get_RP(i0 - 1)
        self.dtype = jnp.result_type(self.LP.dtype, self.RP.dtype)
        self.N = self.LP.get_leg('vR').ind_len * self.RP.get_leg('vL').ind_len

    @classmethod
    def from_LP_RP(cls, LP, RP, i0=0):
        self = cls.__new__(cls)
        self.i0 = i0
        self.LP = LP
        self.RP = RP
        self.dtype = jnp.result_type(LP.dtype, RP.dtype)
        self.N = LP.get_leg('vR').ind_len * RP.get_leg('vL').ind_len
        return self

    def matvec(self, theta):
        return _matvec_0site(self.LP, self.RP, theta,
                             self.N >= JIT_SIZE_THRESHOLD
                             and theta.stored_blocks <= MAX_JIT_BLOCKS)

    def to_matrix(self):
        mat = npc.tensordot(self.LP, self.RP, axes=[['wR'], ['wL']])
        mat = mat.combine_legs([['vR*', 'vL*'], ['vR', 'vL']], qconj=[+1, -1])
        return mat


# ======================================================================== mixers
class Mixer:
    """Base class for mixers perturbing the density matrix to escape local minima.

    Options: ``amplitude`` (1e-5), ``decay`` (2.), ``disable_after`` (15).
    Reference: ``tenpy/algorithms/mps_common.py:1547``.
    """

    can_decompose_theta = False
    update_sites = 2

    def __init__(self, options, sweep_activated=0):
        self.options = options = asConfig(options, 'Mixer')
        self.amplitude = options.get('amplitude', 1e-5, 'real')
        self.decay = options.get('decay', 2., 'real')
        self.disable_after = options.get('disable_after', 15, int)
        self.sweep_activated = sweep_activated
        self.current_amplitude = self.amplitude

    def update_amplitude(self, sweeps):
        """Reduce amplitude; return None to disable the mixer."""
        amp = self.amplitude / self.decay ** max(0, sweeps - self.sweep_activated)
        if self.disable_after is not None and \
                sweeps >= self.sweep_activated + self.disable_after:
            return None
        self.current_amplitude = amp
        return self

    def perturb_svd(self, engine, theta, i0, update_LP, update_RP):
        raise NotImplementedError


class DensityMatrixMixer(Mixer):
    r"""Perturb the two-site reduced density matrices with environment channels.

    ``rho_L = tr_R |theta><theta| + a * sum_w (LP W0 theta)(...)^dagger`` (and
    mirrored for rho_R); then truncate via eigh.
    Reference: ``tenpy/algorithms/mps_common.py:1903``.
    """

    def perturb_svd(self, engine, theta, i0, update_LP, update_RP):
        """Returns (U, S, VH, err, S_approx) like a truncated SVD of theta."""
        amp = self.current_amplitude
        env = engine.env
        # theta with split legs (vL, p0, p1, vR)
        theta_s = theta
        if theta.rank == 2:
            theta_s = theta.split_legs()
        rho_L = npc.tensordot(theta_s, theta_s.conj(),
                              axes=[['p1', 'vR'], ['p1*', 'vR*']])
        rho_L = rho_L.combine_legs([['vL', 'p0'], ['vL*', 'p0*']], qconj=[+1, -1])
        rho_R = npc.tensordot(theta_s, theta_s.conj(),
                              axes=[['vL', 'p0'], ['vL*', 'p0*']])
        rho_R = rho_R.combine_legs([['p1', 'vR'], ['p1*', 'vR*']], qconj=[-1, +1])
        if update_LP:
            LP = env.get_LP(i0)
            W0 = env.H.get_W(i0).replace_labels(['p', 'p*'], ['p0', 'p0*'])
            mixL = npc.tensordot(LP, theta_s, axes=[['vR'], ['vL']])
            mixL = npc.tensordot(mixL, W0, axes=[['wR', 'p0'], ['wL', 'p0*']])
            # contract the bra side, leaving wR summed with weight amp
            add = npc.tensordot(mixL, mixL.conj(),
                                axes=[['p1', 'vR', 'wR'], ['p1*', 'vR*', 'wR*']])
            # remaining legs: (vR* [ket side], p0, vR** [bra], p0*) -> relabel
            add.iset_leg_labels(['vL', 'p0', 'vL*', 'p0*'])
            add = add.combine_legs([['vL', 'p0'], ['vL*', 'p0*']], qconj=[+1, -1])
            rho_L = rho_L + amp * add
        if update_RP:
            RP = env.get_RP(i0 + 1)
            W1 = env.H.get_W(i0 + 1).replace_labels(['p', 'p*'], ['p1', 'p1*'])
            mixR = npc.tensordot(theta_s, RP, axes=[['vR'], ['vL']])
            mixR = npc.tensordot(mixR, W1, axes=[['wL', 'p1'], ['wR', 'p1*']])
            add = npc.tensordot(mixR, mixR.conj(),
                                axes=[['vL', 'p0', 'wL'], ['vL*', 'p0*', 'wL*']])
            add.iset_leg_labels(['vL', 'p1', 'vL*', 'p1*'])
            add.ireplace_labels(['vL', 'vL*'], ['vR', 'vR*'])
            add = add.combine_legs([['p1', 'vR'], ['p1*', 'vR*']], qconj=[-1, +1])
            rho_R = rho_R + amp * add
        # diagonalize & truncate.  U has legs ('(vL.p0)', inner 'vR');
        # V has legs ('(p1.vR)', inner 'vL').
        trunc_par = engine.trunc_params
        W_L, U, errL, renormL = eigh_rho(rho_L, trunc_par, sort='m>')
        W_R, V, errR, renormR = eigh_rho(rho_R, trunc_par, sort='m>')
        U.iset_leg_labels(['(vL.p0)', 'vR'])
        V.iset_leg_labels(['(p1.vR)', 'vL'])
        # gauge qtotals like svd_theta: U carries the old A-tensor charge, VH the rest
        chinfo = theta.chinfo
        qtotal_L = engine.psi.get_B(i0, None).qtotal
        U = U.gauge_total_charge('vR', chinfo.make_valid(qtotal_L))
        VH = V.transpose(['vL', '(p1.vR)'])
        VH = VH.gauge_total_charge('vL', chinfo.make_valid(
            chinfo.make_valid(theta.qtotal) - qtotal_L))
        theta_c = theta if theta.rank == 2 else \
            theta_s.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
        # theta in the mixed bases: a *non-diagonal* bond matrix
        # S = U^dag . theta . VH^dag.  Keeping it as a matrix (rather than
        # re-SVDing) preserves the mixer's new charge sectors on the bond —
        # a re-SVD would drop sectors where theta has no weight yet, which is
        # precisely what the mixer exists to inject (cf. reference
        # mps_common.py:2029 svd_from_rho).
        S_mat = npc.tensordot(U.conj(), theta_c,
                              axes=[['(vL*.p0*)'], ['(vL.p0)']])
        S_mat = npc.tensordot(S_mat, VH.conj(), axes=[['(p1.vR)'], ['(p1*.vR*)']])
        S_mat.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
        S_mat = S_mat / npc.norm(S_mat)
        S_approx = np.sqrt(np.maximum(np.asarray(W_L), 0.))
        nrm = np.linalg.norm(S_approx)
        if nrm > 0:
            S_approx = S_approx / nrm
        err = TruncationError(errL.eps + errR.eps,
                              (1 - errL.eps) * (1 - errR.eps))
        return U, S_mat, VH, err, S_approx

    def mix_rho(self, engine, theta, i0, update_LP, update_RP):
        raise NotImplementedError



def _isometry_with_complement(M, side='left'):
    """Full left-basis of M = A^dag theta: ``(U_full, S_padded, C)``.

    ``M`` is a 2-leg Array (K x n) of norm 1.  Returns ``U_full`` (K x K unitary,
    block-diagonal per charge sector, first columns = left singular vectors of M),
    ``S_padded`` (K values: singular values of M padded with exact zeros), and
    ``C = U_full^dag M`` whose rows beyond the rank are zero.  With ``side='right'``
    everything is mirrored for the right basis (``C = M V_full``).
    """
    if side == 'right':
        Mt = M.transpose([1, 0])
        V_full, S_pad, Ct = _isometry_with_complement(Mt, 'left')
        C = Ct.transpose([1, 0])
        C.iset_leg_labels(['vL', 'vR'])
        return V_full, S_pad, C
    leg = M.legs[0]
    chinfo = M.chinfo
    # group stored blocks by row sector
    by_row = {}
    for bi, row in enumerate(M._qdata):
        by_row.setdefault(int(row[0]), []).append(bi)
    rows_u = []
    blocks_u = []
    s_parts = []
    charges = []
    sizes = []
    xp_np = np
    for qi in range(leg.block_number):
        m = int(leg.slices[qi + 1] - leg.slices[qi])
        q_row = chinfo.make_valid(leg.charges[qi] * leg.qconj)
        if qi in by_row:
            sub = np.concatenate([np.asarray(M._data[bi]) for bi in by_row[qi]],
                                 axis=1)
            u, s, vh = np.linalg.svd(sub, full_matrices=True)
            k = min(sub.shape)
            s_full = np.zeros(m)
            s_full[:k] = s
        else:
            u = np.eye(m)
            s_full = np.zeros(m)
        inner_idx = len(charges)
        rows_u.append((qi, inner_idx))
        blocks_u.append(u)
        s_parts.append(s_full)
        charges.append(q_row)   # inner charge: qconj -1 with charge q_row
        sizes.append(m)
    slices = np.concatenate([[0], np.cumsum(sizes)])
    from ..linalg.charges import LegCharge, QTYPE
    leg_inner = LegCharge(chinfo, slices,
                          np.array(charges, QTYPE).reshape(len(charges),
                                                           chinfo.qnumber),
                          -1)
    U_full = npc.Array([leg, leg_inner], M.dtype, None, [None, None])
    U_full._set_blocks(np.array(rows_u, QTYPE).reshape(len(rows_u), 2),
                       [b.astype(M.dtype) for b in blocks_u])
    S_pad = np.concatenate(s_parts) if s_parts else np.zeros(0)
    C = npc.tensordot(U_full.conj(), M, axes=[[0], [0]])
    C.iset_leg_labels(['vL', 'vR'])
    return U_full, S_pad, C


class SubspaceExpansion(Mixer):
    """Mixer for single-site DMRG: expand the kept space with env-channel directions.

    Reference: ``tenpy/algorithms/mps_common.py:2082``.
    """

    can_decompose_theta = True
    update_sites = 1

    @staticmethod
    def _trunc(engine):
        return engine.trunc_params

    def perturb_svd(self, engine, theta, i0, move_right, next_B):
        """One-site subspace expansion (theta legs (vL, p0, vR)).

        Moving right: enrich the SVD's row space with the ``amp * LP W0`` channels,
        keep the isometry from the expanded SVD, and recover the bond matrix by
        projecting the ORIGINAL theta onto the new basis (so the neighbor's legs
        stay untouched).  Returns ``(A, S, VH_eff, err)`` / ``(U_eff, S, B, err)``.
        """
        amp = np.sqrt(self.current_amplitude)
        env = engine.env
        theta = theta.itranspose(['vL', 'p0', 'vR'])
        if move_right:
            LP = env.get_LP(i0)
            W0 = env.H.get_W(i0).replace_labels(['p', 'p*'], ['p0', 'p0*'])
            expand = npc.tensordot(LP, theta, axes=[['vR'], ['vL']])
            expand = npc.tensordot(expand, W0, axes=[['wR', 'p0'], ['wL', 'p0*']])
            expand = expand.combine_legs([['wR', 'vR']], qconj=[-1])
            expand.ireplace_labels(['vR*', '(wR.vR)'], ['vL', 'vR'])
            expand = (expand * amp).itranspose(['vL', 'p0', 'vR'])
            theta_ex = npc.concatenate([theta, expand], axis='vR')
            theta_c = theta_ex.combine_legs([['vL', 'p0']], qconj=[+1])
            U, S_mix, VH, err, renorm = svd_theta(theta_c, self._trunc(engine))
            A = U.split_legs([0])
            # Bond tensor in the enriched basis from the ORIGINAL theta.  Rotate A into
            # the left-singular basis of M (padded with its orthogonal complement): the
            # stored Schmidt values are then the TRUE singular values padded with exact
            # zeros, keeping all form conversions well-conditioned while the enriched
            # directions stay available (with zero weight) for the next local update.
            M = npc.tensordot(A.conj(), theta, axes=[['vL*', 'p0*'], ['vL', 'p0']])
            M.iset_leg_labels(['vL', 'vR'])
            M = M / max(npc.norm(M), 1e-300)
            U_full, S_pad, C = _isometry_with_complement(M, 'left')
            # theta = A M = (A U_full) C
            A_f = npc.tensordot(A, U_full, axes=[['vR'], [0]])
            A_f.iset_leg_labels(['vL', 'p0', 'vR'])
            return A_f, S_pad, C, err
        else:
            RP = env.get_RP(i0)
            W0 = env.H.get_W(i0).replace_labels(['p', 'p*'], ['p0', 'p0*'])
            expand = npc.tensordot(theta, RP, axes=[['vR'], ['vL']])
            expand = npc.tensordot(expand, W0, axes=[['wL', 'p0'], ['wR', 'p0*']])
            expand = expand.combine_legs([['wL', 'vL']], qconj=[+1])
            expand.ireplace_label('(wL.vL)', 'vL')
            expand.ireplace_label('vL*', 'vR')
            expand = (expand * amp).itranspose(['vL', 'p0', 'vR'])
            theta_ex = npc.concatenate([theta, expand], axis='vL')
            theta_c = theta_ex.combine_legs([['p0', 'vR']], qconj=[-1])
            theta_c.itranspose(['vL', '(p0.vR)'])
            U, S_mix, VH, err, renorm = svd_theta(theta_c, self._trunc(engine))
            B = VH.split_legs([1])
            M = npc.tensordot(theta, B.conj(), axes=[['p0', 'vR'], ['p0*', 'vR*']])
            M.iset_leg_labels(['vL', 'vR'])
            M = M / max(npc.norm(M), 1e-300)
            V_full, S_pad, C = _isometry_with_complement(M, 'right')
            # theta = M B = C (V_full^T B)
            B_f = npc.tensordot(V_full, B, axes=[[0], ['vL']])
            B_f.iset_leg_labels(['vL', 'p0', 'vR'])
            return C, S_pad, B_f, err

    def mixed_svd_2site(self, engine, theta, i0):
        """Two-site decomposition with subspace expansion of the enclosed bond.

        ``theta`` has combined legs ``('(vL.p0)', '(p1.vR)')``.  The enclosed
        bond's right basis is enriched with the ``W(i0+1) . RP`` environment
        channels (the reference's ``mix_and_decompose_2site`` with
        ``mix_right=True``, ``tenpy/algorithms/mps_common.py:1764``).  Unlike
        the reference — whose fallback leaves ``U`` non-isometric — the
        ORIGINAL theta is then re-split inside the enriched basis via an exact
        chi x chi SVD, so both returned tensors are isometries and ``S`` holds
        theta's true Schmidt values there (expanded directions enter with
        ~zero weight, available to the next update).  Used by two-site DMRG
        and two-site VUMPS when a single-site mixer is configured.

        Returns ``(U, S, VH, err, S_approx)`` with ``theta ~= U diag(S) VH``.
        """
        amp = np.sqrt(self.current_amplitude)
        env = engine.env
        th = theta
        if '(vL.p0)' not in th.get_leg_labels():
            th = th.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
        th_r = th.split_legs(['(p1.vR)']).itranspose(['(vL.p0)', 'p1', 'vR'])
        RP = env.get_RP(i0 + 1)
        W1 = env.H.get_W(i0 + 1).replace_labels(['p', 'p*'], ['p1', 'p1*'])
        ex = npc.tensordot(th_r, RP, axes=[['vR'], ['vL']])
        ex = npc.tensordot(ex, W1, axes=[['wL', 'p1'], ['wR', 'p1*']])
        # legs ('(vL.p0)', vL*, p1, wL): stack the wL channels as extra rows
        ex = ex.combine_legs([['wL', '(vL.p0)']], qconj=[+1])
        ex.ireplace_labels(['(wL.(vL.p0))', 'vL*'], ['(vL.p0)', 'vR'])
        ex = (ex * amp).itranspose(['(vL.p0)', 'p1', 'vR'])
        th_ex = npc.concatenate([th_r, ex], axis='(vL.p0)')
        th_ex = th_ex.combine_legs([['p1', 'vR']], qconj=[-1])
        _, _, VH, err, _ = svd_theta(th_ex, self._trunc(engine),
                                     qtotal_LR=[th_ex.qtotal, None],
                                     inner_labels=['vR', 'vL'])
        # project the ORIGINAL theta onto the enriched right basis (exact)
        M = npc.tensordot(th, VH.conj(), axes=[['(p1.vR)'], ['(p1*.vR*)']])
        M.ireplace_label('vL*', 'vR')
        qtotal_L = engine.psi.get_B(i0, None).qtotal
        chinfo = th.chinfo
        U, S, V2 = npc.svd(M, qtotal_LR=[chinfo.make_valid(qtotal_L), None],
                           inner_labels=['vR', 'vL'])
        S = np.asarray(S)
        nrm = np.linalg.norm(S)
        if nrm > 0:
            S = S / nrm
        VH_f = npc.tensordot(V2, VH, axes=[['vR'], ['vL']])
        return U, S, VH_f, err, S


# ======================================================================== sweeps
class Sweep(Algorithm):
    """Generic L->R->L sweeps with environment updates and effective Hamiltonians.

    Options: ``combine`` (False), ``lanczos_params``, ``trunc_params``, ``chi_list``,
    ``mixer``, ``mixer_params``, ``start_env`` (0).
    Reference: ``tenpy/algorithms/mps_common.py:60``.
    """

    EffectiveH = None
    DefaultMixer = None
    use_mixer_by_default = False

    def __init__(self, psi, model, options, *, orthogonal_to=None, **kwargs):
        if not hasattr(self, 'EffectiveH') or self.EffectiveH is None:
            raise NotImplementedError(f"{self.__class__.__name__} needs EffectiveH")
        super().__init__(psi, model, options, **kwargs)
        options = self.options
        self.combine = options.get('combine', False, bool)
        self.finite = self.psi.finite
        self.lanczos_params = options.subconfig('lanczos_params')
        self.mixer = None
        self.env = None
        self.ortho_to_envs = []
        self.init_env(model, resume_data=self.resume_data,
                      orthogonal_to=orthogonal_to)
        self.i0 = 0
        self.move_right = True
        self.update_LP_RP = (True, False)
        self.sweeps = 0
        self.time0 = time.time()
        self.trunc_err_list = []
        self.e_L = self.e_R = None

    @property
    def n_optimize(self):
        return self.EffectiveH.length

    @property
    def S_inv_cutoff(self):
        return 1e-15

    def init_env(self, model=None, resume_data=None, orthogonal_to=None):
        """(Re)build the MPO environment. Reference: ``mps_common.py:190``."""
        H = model.H_MPO if model is not None else self.env.H
        if resume_data is None:
            resume_data = {}
        init_env_data = resume_data.get('init_env_data', {})
        if not self.psi.finite:
            start_env = self.options.get('start_env', 1, int)
            init_env_data.setdefault('start_env_sites', start_env)
        cache = self.cache.create_subcache('env')
        self.env = MPOEnvironment(self.psi, H, self.psi, cache=cache, **init_env_data)
        if orthogonal_to:
            self.ortho_to_envs = [MPSEnvironment(self.psi, ortho)
                                  for ortho in orthogonal_to]
        self.reset_stats()

    def reset_stats(self, resume_data=None):
        self.sweeps = 0
        self.shelve = False
        self.chi_list = self.options.get('chi_list', None)
        if self.chi_list is not None:
            self.chi_list = dict(self.chi_list)

    def sweep(self, optimize=True):
        """One sweep left->right->left; returns max truncation error.

        Reference: ``mps_common.py:345``."""
        if optimize and self.chi_list is not None:
            new_chi = self.chi_list.get(self.sweeps, None)
            if new_chi is not None:
                self.trunc_params['chi_max'] = new_chi
                logger.info("sweep %d: setting chi_max=%d", self.sweeps, new_chi)
        self.trunc_err_list = []
        schedule = self.get_sweep_schedule()
        for i0, move_right, update_LP_RP in schedule:
            self.i0 = i0
            self.move_right = move_right
            self.update_LP_RP = update_LP_RP
            self._cache_optimize()
            theta = self.prepare_update_local()
            update_data = self.update_local(theta, optimize=optimize)
            self.update_env(**update_data)
            self.post_update_local(**update_data)
            self.free_no_longer_needed_envs()
        if optimize:
            self.sweeps += 1
            self.mixer_cleanup_after_sweep()
        return np.max(self.trunc_err_list) if self.trunc_err_list else 0.

    def get_sweep_schedule(self):
        """(i0, move_right, (update_LP, update_RP)) sequence (reference :419)."""
        L = self.psi.L
        n = self.EffectiveH.length
        if self.finite:
            assert L > n - 1
            if n == 0:
                i0s = list(range(1, L)) + list(range(L - 1, 0, -1))
                move_right = [True] * (L - 1) + [False] * (L - 1)
                update_LP_RP = [[True, False]] * (L - 1) + [[False, True]] * (L - 1)
                return zip(i0s, move_right, update_LP_RP)
            i0s = list(range(0, L - n + 1)) + list(range(L - n, -1, -1)) \
                if n == 1 else list(range(0, L - n)) + list(range(L - n, 0, -1))
            if n == 1:
                i0s = list(range(0, L)) + list(range(L - 1, -1, -1))
                move_right = [True] * L + [False] * L
                update_LP_RP = [[True, False]] * L + [[False, True]] * L
            else:
                move_right = [True] * (L - n) + [False] * (L - n)
                update_LP_RP = [[True, False]] * (L - n) + [[False, True]] * (L - n)
        elif n == 2:
            i0s = list(range(0, L)) + list(range(L, 0, -1))
            move_right = [True] * L + [False] * L
            update_LP_RP = ([[True, True]] * 2 + [[True, False]] * (L - 2) +
                            [[True, True]] * 2 + [[False, True]] * (L - 2))
        elif n == 1:
            i0s = list(range(0, L)) + list(range(L, 0, -1))
            move_right = [True] * L + [False] * L
            update_LP_RP = ([[True, True]] + [[True, False]] * (L - 1) +
                            [[True, True]] + [[False, True]] * (L - 1))
        else:
            raise ValueError("n_optimize not in (1, 2)")
        return zip(i0s, move_right, update_LP_RP)

    def _cache_optimize(self):
        i0 = self.i0
        move_right = self.move_right
        if self.n_optimize == 2:
            kwargs = {'short_term_LP': [i0, i0 + 1], 'short_term_RP': [i0, i0 + 1]}
            if move_right:
                kwargs['preload_RP'] = i0 + 2
            elif move_right is False:
                kwargs['preload_LP'] = i0 - 1
        else:
            if move_right:
                kwargs = {'short_term_LP': [i0, i0 + 1], 'short_term_RP': [i0],
                          'preload_RP': i0 + 1}
            elif move_right is None:
                kwargs = {'short_term_LP': [i0], 'short_term_RP': [i0]}
            else:
                kwargs = {'short_term_LP': [i0], 'short_term_RP': [i0 - 1, i0],
                          'preload_LP': i0 - 1}
        self.env.cache_optimize(**kwargs)

    def prepare_update_local(self):
        """Build eff_H and the current theta guess. Reference: ``mps_common.py:498``."""
        self.make_eff_H()
        theta = self.psi.get_theta(self.i0, n=self.n_optimize, cutoff=self.S_inv_cutoff)
        theta = self.eff_H.combine_theta(theta)
        return theta

    def make_eff_H(self):
        self.eff_H = self.EffectiveH(self.env, self.i0, self.combine, self.move_right)
        if getattr(self.env.H, 'explicit_plus_hc', False) and \
                not hasattr(self.eff_H, 'matvec_hc'):
            raise NotImplementedError(
                "H has explicit_plus_hc=True: use "
                "tenpy_tpu.algorithms.dmrg_parallel.DMRGThreadPlusHC")
        if len(self.ortho_to_envs) > 0:
            self._wrap_ortho_eff_H()

    def _wrap_ortho_eff_H(self):
        """Project out the orthogonal states (excited-state search).

        Reference: ``mps_common.py:524``."""
        ortho_vecs = []
        i0 = self.i0
        n = self.eff_H.length
        for o_env in self.ortho_to_envs:
            theta = o_env.ket.get_theta(i0, n=n)
            LP = o_env.get_LP(i0, store=True)
            RP = o_env.get_RP(i0 + n - 1, store=True)
            theta = npc.tensordot(LP, theta, axes=[['vR'], ['vL']])
            theta = npc.tensordot(theta, RP, axes=[['vR'], ['vL']])
            theta.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
            theta = self.eff_H.combine_theta(theta)
            if float(npc.norm(theta)) < 1e-30:
                continue  # e.g. ortho state in a different charge sector
            ortho_vecs.append(theta)
        if ortho_vecs:
            self.eff_H = OrthogonalNpcLinearOperator(self.eff_H, ortho_vecs)

    def update_local(self, theta, optimize=True):
        raise NotImplementedError

    @property
    def _all_envs(self):
        return [self.env] + self.ortho_to_envs

    def update_env(self, **update_data):
        """Update environments after the local update, invalidating stale tensors.

        After changing sites ``i0 .. i0+n-1``, every cached ``LP[j]`` with ``j > i0``
        and ``RP[j]`` with ``j < i0+n-1`` was computed from outdated tensors and must
        be dropped (the reference's ``free_no_longer_needed_envs``, mps_common.py:614,
        relies on the same invariant).
        """
        i0 = self.i0
        n = self.n_optimize
        L = self.psi.L
        update_LP, update_RP = self.update_LP_RP
        eff_H = self.eff_H
        base_H = eff_H
        while not isinstance(base_H, EffectiveH) and hasattr(base_H, 'orig_operator'):
            base_H = base_H.orig_operator
        # Finite bc: drop stale environments (those computed from pre-update tensors).
        # Infinite bc: keep them -- iDMRG environments intentionally 'age' towards the
        # fixed point, reusing previous-iteration tensors (reference dmrg.py iDMRG).
        if self.finite:
            lo_LP = i0 + 1            # del_LP(j) for j >= lo_LP
            hi_RP = i0 + n - 1        # del_RP(j) for j <  hi_RP
            if n == 1 or getattr(self, 'mixer', None) is not None:
                # 1-site updates absorb S.VH into the neighbor, and mixers
                # (subspace expansion / density-matrix perturbation) modify
                # the tensor on the far side of the grown bond: one more
                # environment column is stale
                if self.move_right:
                    hi_RP += 1
                else:
                    lo_LP -= 1
            for env in self._all_envs:
                for j in range(max(lo_LP, 1), L):
                    env.del_LP(j)
                for j in range(0, min(hi_RP, L - 1)):
                    env.del_RP(j)
        # boundary guards (finite bc): LP[L] / RP[-1] don't exist -- and the mod-L
        # keyed storage would silently clobber LP[0] / RP[L-1]
        if self.finite and i0 + 1 > L - 1:
            update_LP = False
        if self.finite and i0 + n - 2 < 0:
            update_RP = False
        if update_LP:
            base_H.update_LP(self.env, i0 + 1, update_data.get('U', None))
            for o_env in self.ortho_to_envs:
                o_env.get_LP(i0 + 1, store=True)
        if update_RP:
            base_H.update_RP(self.env, i0 + n - 2, update_data.get('VH', None))
            for o_env in self.ortho_to_envs:
                o_env.get_RP(i0 + n - 2, store=True)

    def post_update_local(self, err=None, **update_data):
        self.trunc_err_list.append(err.eps if err is not None else 0.)

    def free_no_longer_needed_envs(self):
        """Stale envs are already dropped in :meth:`update_env`."""
        return

    # ---------------------------------------------------------------- mixer
    def mixer_activate(self):
        """Turn on the mixer if configured. Reference: ``mps_common.py:653``."""
        use_mixer = self.options.get('mixer', self.use_mixer_by_default)
        if use_mixer:
            if use_mixer is True:
                MixerCls = self.DefaultMixer
            elif isinstance(use_mixer, str):
                from ..tools.misc import find_subclass
                MixerCls = find_subclass(Mixer, use_mixer)
            else:
                MixerCls = use_mixer
            if MixerCls is None:
                return
            mixer_params = self.options.subconfig('mixer_params')
            self.mixer = MixerCls(mixer_params, self.sweeps)

    def mixer_deactivate(self):
        if self.mixer is not None:
            logger.info("disable mixer after %d sweeps", self.sweeps)
        self.mixer = None
        had_matrix = any(isinstance(s, npc.Array) for s in self.psi._S)
        self._absorb_matrix_S()
        if had_matrix and self.env is not None:
            # the absorption rotated bond bases: cached environments are stale
            self.env.clear()
            env_data = {}
            reseed = self.options.get('mixer_env_reseed',
                                      'trivial' if self.psi.finite else
                                      'trivial', str) \
                if hasattr(self, 'options') else 'trivial'
            if not self.psi.finite and reseed == 'tm':
                # re-seed from the converged transfer-matrix fixed point.
                # Restarting from *trivial* boundaries puts a sharp edge next
                # to the wavefunction; momentum-space (ky-conserving,
                # mixed_xk) states cannot recover from it — a two-site update
                # can never repopulate a drained ky sector, so the state
                # collapses towards a product state.  (Not the default: on
                # real-space states with noise-floor Schmidt directions the
                # fixed-point solvers can converge to a wrong near-degenerate
                # mode, while the trivial restart is harmless there.)
                from ..networks.mpo import MPOTransferMatrix
                try:
                    env_data = MPOTransferMatrix.find_init_LP_RP(
                        self.env.H, self.psi)
                except Exception as e:
                    logger.warning("TM env re-seed after mixer deactivation "
                                   "failed (%s); using trivial boundaries", e)
                    env_data = {}
            self.env.init_first_LP_last_RP(**env_data)
            for env in self.ortho_to_envs:
                env.clear()
                env.init_first_LP_last_RP()

    def _absorb_matrix_S(self):
        """SVD any matrix-valued bond S left by the mixer back to diagonal form.

        Rotates the bond basis by ``S = U s VH``.  The rotation applied to each
        neighbor depends on its stored form: an A-form left neighbor does not
        contain S (rotate by U); a B-form one already absorbed S (rotate by
        VH^dagger, projecting S's exact null space) — mirrored on the right."""
        psi = self.psi
        for b in range(psi.L + 1 if psi.finite else psi.L):
            S = psi._S[b]
            if not isinstance(S, npc.Array):
                continue
            # drop the numerically-zero directions the mixer injected — they
            # carry no weight of the state, and exact zeros in the diagonal S
            # poison later canonicalization (1/S noise amplification)
            U, s, VH = npc.svd(S, cutoff=1e-14, inner_labels=['vR', 'vL'])
            s = np.asarray(s)
            nrm = np.linalg.norm(s)
            s_diag = s / (nrm if nrm > 0 else 1.)
            if b == psi.L:  # finite right boundary (unreachable in practice)
                psi._S[b] = s_diag
            else:
                psi.set_SL(b, s_diag)  # maintains the _S[L] alias at b=0
            iL = (b - 1) % psi.L
            iR = b % psi.L
            fL = psi.form[iL]
            fR = psi.form[iR]
            if fL is None or fR is None or fL[1] not in (0., 1.) \
                    or fR[0] not in (0., 1.):
                raise ValueError("can't absorb matrix S next to form "
                                 f"{fL}, {fR}")
            TL = psi.get_B(iL, None)
            if fL[1] == 0.:  # e.g. A-form: does not contain S[b]
                TL = npc.tensordot(TL, U, axes=[['vR'], ['vL']])
            else:            # e.g. B-form: T = X.S -> X.U.s = T.VH^dag
                TL = npc.tensordot(TL, VH.conj(), axes=[['vR'], ['vR*']])
                TL.ireplace_label('vL*', 'vR')
            psi.set_B(iL, TL, psi.form[iL])
            TR = psi.get_B(iR, None)
            if fR[0] == 0.:  # B-form right neighbor: does not contain S[b]
                TR = npc.tensordot(VH, TR, axes=[['vR'], ['vL']])
            else:            # A-form right neighbor: T = S.X -> U^dag.T
                TR = npc.tensordot(U.conj(), TR, axes=[['vL*'], ['vL']])
                TR.ireplace_label('vR*', 'vL')
            psi.set_B(iR, TR, psi.form[iR])

    def mixer_cleanup_after_sweep(self):
        if self.mixer is not None:
            mixer = self.mixer.update_amplitude(self.sweeps)
            if mixer is None:
                self.mixer_deactivate()
            else:
                self.mixer = mixer

    def mixer_cleanup(self):
        if self.mixer is not None:
            self.mixer_deactivate()

    def get_resume_data(self, sequential_simulations=False):
        data = super().get_resume_data(sequential_simulations)
        data['sweeps'] = self.sweeps
        return data

    def environment_sweeps(self, N_sweeps):
        """Sweeps that only update the environments (no local optimization)."""
        if N_sweeps <= 0:
            return
        for _ in range(N_sweeps):
            self.sweep(optimize=False)


class IterativeSweeps(Sweep):
    """run() = loop of run_iteration() until stopping_criterion.

    Reference: ``tenpy/algorithms/mps_common.py:773``.
    """

    def run(self):
        self.shelve = False
        self.pre_run_initialize()
        is_first_sweep = True
        result = None
        while True:
            iteration_start_time = time.time()
            if self.stopping_criterion(iteration_start_time=iteration_start_time):
                break
            if not is_first_sweep:
                self.checkpoint.emit(self)
            result = self.run_iteration()
            self.status_update(iteration_start_time=iteration_start_time)
            is_first_sweep = False
        self.post_run_cleanup()
        return result

    def pre_run_initialize(self):
        self.time0 = time.time()

    def run_iteration(self):
        raise NotImplementedError

    def status_update(self, iteration_start_time):
        pass

    def is_converged(self):
        raise NotImplementedError

    def stopping_criterion(self, iteration_start_time):
        """Default: min/max sweeps, max_hours, is_converged.

        Reference: ``mps_common.py:869``."""
        options = self.options
        min_sweeps = options.get('min_sweeps', 1, int)
        max_sweeps = options.get('max_sweeps', 1000, int)
        max_hours = options.get('max_hours', 24 * 365, 'real')
        if self.sweeps >= max_sweeps:
            return True
        if self.sweeps >= min_sweeps and self.is_converged():
            if self.mixer is None:
                return True
            else:
                logger.info("converged with mixer on: disable and continue")
                self.mixer_deactivate()
                return False
        if time.time() - self.time0 > max_hours * 3600:
            self.shelve = True
            logger.warning("max_hours exceeded: shelving")
            return True
        return False

    def post_run_cleanup(self):
        self.mixer_cleanup()


# ======================================================================== compression
class VariationalCompression(IterativeSweeps):
    """Compress an MPS by variationally optimizing overlap with (a copy of) itself.

    Options: ``trunc_params``, ``N_sweeps`` (2), ``tol_theta_diff`` (1e-8).
    Reference: ``tenpy/algorithms/mps_common.py:2204``.
    """

    EffectiveH = TwoSiteH  # two-site updates (only env structure matters)

    def __init__(self, psi, options, resume_data=None):
        self.options = asConfig(options, self.__class__.__name__)
        self.psi = psi
        self.old_psi = psi.copy()
        self.model = None
        self.trunc_params = self.options.subconfig('trunc_params')
        self.renormalize = []
        self.finite = psi.finite
        from ..tools.cache import DictCache
        self.cache = DictCache.trivial()
        self.checkpoint = __import__(
            'tenpy_tpu.tools.events', fromlist=['EventHandler']).EventHandler()
        self.env = MPSEnvironment(self.psi, self.old_psi)
        self.sweeps = 0
        self.mixer = None
        self.time0 = time.time()
        self.trunc_err_list = []
        self._theta_diff = None

    def run(self):
        N_sweeps = self.options.get('N_sweeps', 2, int)
        self.tol_theta_diff = self.options.get('tol_theta_diff', 1e-8, 'real')
        trunc_err = TruncationError()
        for n in range(N_sweeps):
            max_err = self.sweep()
            trunc_err = TruncationError(max_err, 1. - 2. * max_err)
            self.sweeps += 1
            if self._theta_diff is not None and self._theta_diff < self.tol_theta_diff:
                break
        if self.psi.finite:
            self.psi.norm *= max(self.renormalize, default=1.)
        return trunc_err

    def sweep(self, optimize=True):
        self.renormalize = []
        self._theta_diff = 0.
        self.trunc_err_list = []
        L = self.psi.L
        bonds = range(L - 1) if self.finite else range(L)
        # right sweep
        for i0 in list(bonds) + list(reversed(list(bonds))):
            self.update_bond(i0)
        return np.max(self.trunc_err_list) if self.trunc_err_list else 0.

    def update_bond(self, i0):
        LP = self.env.get_LP(i0)
        RP = self.env.get_RP(i0 + 1)
        th = self.old_psi.get_theta(i0, n=2)
        th = npc.tensordot(LP, th, axes=[['vR'], ['vL']])
        th = npc.tensordot(th, RP, axes=[['vR'], ['vL']])
        th.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
        th = th.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
        U, S, VH, err, renorm = self._split_theta(th)
        self.trunc_err_list.append(err.eps)
        self.renormalize.append(renorm)
        A = U.split_legs([0]).ireplace_label('p0', 'p')
        B = VH.split_legs([1]).ireplace_label('p1', 'p')
        self.psi.set_B(i0, A, 'A')
        self.psi.set_SR(i0, S)
        self.psi.set_B(i0 + 1, B, 'B')
        self.env.del_LP(i0 + 1)
        self.env.del_RP(i0)

    def _split_theta(self, th):
        """Truncated decomposition of the (combined-leg) two-site theta."""
        return svd_theta(th, self.trunc_params)

    def is_converged(self):
        return False

    def run_iteration(self):
        return self.sweep()


class VariationalApplyMPO(VariationalCompression):
    """Variationally compute ``U|psi>`` for an MPO U.

    Reference: ``tenpy/algorithms/mps_common.py:2383``.
    """

    def __init__(self, psi, U_MPO, options, resume_data=None):
        super().__init__(psi, options, resume_data)
        self.env = MPOEnvironment(self.psi, U_MPO, self.old_psi)

    def update_bond(self, i0):
        env = self.env
        LP = env.get_LP(i0)
        RP = env.get_RP(i0 + 1)
        W0 = env.H.get_W(i0).replace_labels(['p', 'p*'], ['p0', 'p0*'])
        W1 = env.H.get_W(i0 + 1).replace_labels(['p', 'p*'], ['p1', 'p1*'])
        th = self.old_psi.get_theta(i0, n=2)
        th = npc.tensordot(LP, th, axes=[['vR'], ['vL']])
        th = npc.tensordot(th, W0, axes=[['wR', 'p0'], ['wL', 'p0*']])
        th = npc.tensordot(th, W1, axes=[['wR', 'p1'], ['wL', 'p1*']])
        th = npc.tensordot(th, RP, axes=[['wR', 'vR'], ['wL', 'vL']])
        th.ireplace_labels(['vR*', 'vL*'], ['vL', 'vR'])
        th = th.combine_legs([['vL', 'p0'], ['p1', 'vR']], qconj=[+1, -1])
        U, S, VH, err, renorm = self._split_theta(th)
        self.trunc_err_list.append(err.eps)
        self.renormalize.append(renorm)
        A = U.split_legs([0]).ireplace_label('p0', 'p')
        B = VH.split_legs([1]).ireplace_label('p1', 'p')
        self.psi.set_B(i0, A, 'A')
        self.psi.set_SR(i0, S)
        self.psi.set_B(i0 + 1, B, 'B')
        env.del_LP(i0 + 1)
        env.del_RP(i0)


class QRBasedVariationalApplyMPO(VariationalApplyMPO):
    """Variational MPO application with QR-based truncation (arXiv:2212.09782).

    Replaces the full SVD of the two-site theta after each variational update
    by a QR factorization plus an SVD of the small triangular factor — much
    cheaper at large chi, identical result up to truncation-error estimation.
    Reference: ``tenpy/algorithms/mps_common.py:2492``.
    """

    def _split_theta(self, th):
        Q, R = npc.qr(th, inner_labels=['vR', 'vL'])
        U2, S, VH, err, renorm = svd_theta(R, self.trunc_params,
                                           inner_labels=['vR', 'vL'])
        U = npc.tensordot(Q, U2, axes=[['vR'], ['vL']])
        return U, S, VH, err, renorm
