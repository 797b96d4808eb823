r"""Device-side split + truncation of a two-site wavefunction on the packed layout.

This is the second half of the device-resident DMRG update (the first being the
fused packed Lanczos, :func:`~tenpy_tpu.algorithms.mps_common.lanczos_K_2site_packed`):
given a packed theta with legs ``(vL, p0, p1, vR)``, decompose

    theta  =  A  .  diag(S)  .  B        A: (vL, p0, vR),  B: (vL, p1, vR)

with A/B isometric and S truncated to ``chi_max`` / ``svd_min`` — entirely on
device, with **static shapes**: the new bond leg is a fixed, size-bucketed
*capacity layout*; dropped/unused Schmidt states are exact zeros (zero columns
of A / rows of B and zero S entries), so downstream contractions, environment
updates, and the next site's Lanczos see a structure-stable pytree and never
touch the dead directions (their environment couplings are exactly zero).

The layout transform packed-theta -> per-bond-sector matrices is ONE XLA
gather per (rows, cols) bucket group from a host-precomputed static index map
(:class:`SplitPlan`), so the traced program size is independent of the number
of charge blocks.  This mirrors what the reference does per block with LAPACK
(``tenpy/linalg/truncation.py:258`` ``svd_theta``; ``np_conserved.py:3676``
``svd``), recast as batched device linalg.

Decomposition backends (``TENPY_TPU_DEVICE_SVD``):

``svd``
    ``jnp.linalg.svd`` per bucket group.  Exact; the default on CPU.
``qr_eigh``
    ``eigh(M^H M)`` for the right vectors + f64 QR re-orthonormalization for
    the left vectors.  Built from matmul/eigh/qr only — ``jnp.linalg.svd``
    crashes the XLA TPU compiler in this environment (TransposeFolding
    check-fail), and the Gram-eigh route is the reference's own
    ``use_eig_based_svd`` strategy for large blocks (``truncation.py:474``).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from . import np_conserved as npc
from . import packed as pk
from .charges import LegCharge, QTYPE
from .padding import bucket_size

__all__ = ['bond_layout', 'SplitPlan', 'split_plan', 'split_truncate',
           'scale_bond_plan', 'scale_bond', 'DEFAULT_BACKEND']

DEFAULT_BACKEND = os.environ.get('TENPY_TPU_DEVICE_SVD', 'auto')


# --------------------------------------------------------------- bond layout
def _group_pairs(legs, qconjs, qtotal_part, chinfo):
    """All (sector_i, sector_j) pairs of two legs grouped by total charge.

    Returns dict charge-tuple -> list of (si, sj) (lexsorted)."""
    groups = {}
    l0, l1 = legs
    for s0 in range(l0.block_number):
        q0 = np.asarray(l0.charges[s0], QTYPE) * qconjs[0]
        for s1 in range(l1.block_number):
            q = q0 + np.asarray(l1.charges[s1], QTYPE) * qconjs[1]
            key = tuple(chinfo.make_valid(q + qtotal_part))
            groups.setdefault(key, []).append((s0, s1))
    return groups


def bond_layout(theta_legs, qtotal_theta, qtotal_A, cap_hint=None,
                chi_cap=None, multiple=64, total_cap=None, cap_floor=None):
    """Fixed-capacity bond leg for the device split of a two-site theta.

    Parameters
    ----------
    theta_legs : (vL, p0, p1, vR) LegCharges (the *padded* legs of the packed
        theta).
    qtotal_theta, qtotal_A : charges
        Total charge of theta and the part assigned to A (B gets the rest).
    cap_hint : dict {charge tuple -> int}, optional
        Desired per-sector capacity (e.g. current bond sector sizes).  Sectors
        not in the hint get the minimal bucket.
    chi_cap : int, optional
        Upper bound on any single sector's capacity (defaults to unlimited).

    Returns
    -------
    bond : LegCharge
        qconj=+1 (the B-side convention of :func:`npc.svd` with
        ``inner_qconj=+1``); A's bond leg is ``bond.conj()``.
    """
    chinfo = theta_legs[0].chinfo
    qtotal_theta = np.asarray(qtotal_theta, QTYPE)
    qtotal_A = np.asarray(qtotal_A, QTYPE)
    # bond charge q_b (on the B side, qconj=+1): row charge - qtotal_A
    rows = _group_pairs(theta_legs[:2], [theta_legs[0].qconj, theta_legs[1].qconj],
                        -qtotal_A, chinfo)
    qtotal_B = chinfo.make_valid(qtotal_theta - qtotal_A)
    # col charge must combine with q_b to qtotal_B: q_b = qtotal_B - col charge
    cols = _group_pairs(theta_legs[2:], [theta_legs[2].qconj, theta_legs[3].qconj],
                        np.zeros_like(qtotal_B), chinfo)
    cols = {tuple(chinfo.make_valid(qtotal_B - np.asarray(k, QTYPE))): v
            for k, v in cols.items()}
    charges = []
    hints = []
    limits = []
    for q in sorted(set(rows) & set(cols)):
        R = sum(int(theta_legs[0].slices[a + 1] - theta_legs[0].slices[a])
                * int(theta_legs[1].slices[b + 1] - theta_legs[1].slices[b])
                for a, b in rows[q])
        C = sum(int(theta_legs[2].slices[c + 1] - theta_legs[2].slices[c])
                * int(theta_legs[3].slices[d + 1] - theta_legs[3].slices[d])
                for c, d in cols[q])
        lim = min(R, C)
        if chi_cap is not None:
            lim = min(lim, int(chi_cap))
        charges.append(q)
        hints.append(max(int((cap_hint or {}).get(q, 1)), 1))
        limits.append(lim)
    floors = [min(int((cap_floor or {}).get(q, 1)), lim)
              for q, lim in zip(charges, limits)]

    def alloc(scale):
        return [min(bucket_size(max(int(np.ceil(h * scale)), f, 1), multiple),
                    bucket_size(lim, multiple))
                for h, f, lim in zip(hints, floors, limits)]

    sizes = alloc(1.)
    if total_cap is not None and sum(sizes) > total_cap:
        # The floor mass (current sector sizes + min-bucket padding of newly
        # reachable sectors) is *mandatory* — it cannot be shrunk without
        # dropping state weight.  The budget bounds the mass ABOVE it: grant
        # floors + the budget's slack over chi_cap, then distribute the
        # headroom proportionally to the hints by exact bisection.  (The old
        # scheme compared the raw total against the budget, so many-sector
        # layouts whose padding alone exceeded it collapsed to pure floors —
        # zero growth headroom in dominant sectors; the chi ceiling of
        # VERDICT r4.)
        floor_sizes = alloc(0.)
        budget = max(int(total_cap),
                     sum(floor_sizes) + max(int(total_cap) - int(chi_cap or 0),
                                            0))
        if sum(floor_sizes) >= budget:
            sizes = floor_sizes
        elif sum(sizes) > budget:
            lo, hi = 0., 1.
            for _ in range(30):
                mid = 0.5 * (lo + hi)
                if sum(alloc(mid)) > budget:
                    hi = mid
                else:
                    lo = mid
            sizes = alloc(lo)
    slices = np.concatenate([[0], np.cumsum(sizes)]).astype(np.intp)
    charges = np.array(charges, QTYPE).reshape(len(charges), chinfo.qnumber)
    return LegCharge(chinfo, slices, charges, 1)


# ----------------------------------------------------------------- the plan
class _SplitGroup:
    """One (R, C)-bucket of bond sectors."""
    __slots__ = ('R', 'C', 'K', 'N', 'idx', 'cap_mask', 'sectors')

    def __init__(self, R, C, N, idx, cap_mask, sectors):
        self.R, self.C, self.K, self.N = R, C, min(R, C), N
        self.idx = idx            # int32 (N, R, C) into flat theta (-1 = 0)
        self.cap_mask = cap_mask  # bool (N, K): k < capacity of sector
        self.sectors = sectors    # bond-leg sector indices, len N


class SplitPlan:
    """Host-precomputed index maps for :func:`split_truncate`.

    Built once per (theta structure, bond layout, qtotal_A); all arrays are
    static numpy data converted to device constants at trace time.
    """
    __slots__ = ('groups', 'A_struct', 'B_struct', 'A_idx', 'B_idx', 'S_idx',
                 'bond', 'bond_dim', 'theta_legs', 'theta_labels',
                 'qtotal_A', 'qtotal_B', 'flat_lens')

    pass


def _flat_offsets(shapes, qdatas, extra=0):
    offs = []
    off = 0
    for shape, q in zip(shapes, qdatas):
        offs.append(off)
        off += (q.shape[0] + extra) * int(np.prod(shape, dtype=np.int64))
    return offs, off


_SPLIT_PLAN_CACHE = {}


def split_plan(theta_p, bond, qtotal_A, group_multiple=64):
    """Build (or fetch) the :class:`SplitPlan` for a packed theta.

    ``theta_p`` must have legs labelled ``vL, p0, p1, vR`` (any order) with a
    *complete* packed structure; ``bond`` from :func:`bond_layout`.
    """
    order = [theta_p.get_leg_index(l) for l in ('vL', 'p0', 'p1', 'vR')]
    if order != [0, 1, 2, 3]:
        theta_p = theta_p.transpose(order)
    key = (theta_p.struct_sig(), bond, tuple(int(x) for x in np.ravel(qtotal_A)),
           group_multiple)
    plan = _SPLIT_PLAN_CACHE.get(key)
    if plan is not None:
        return plan
    plan = _build_split_plan(theta_p, bond, qtotal_A, group_multiple)
    if len(_SPLIT_PLAN_CACHE) > 256:
        for k_old in list(_SPLIT_PLAN_CACHE)[:128]:
            del _SPLIT_PLAN_CACHE[k_old]
    _SPLIT_PLAN_CACHE[key] = plan
    return plan


def _build_split_plan(theta_p, bond, qtotal_A, group_multiple):
    legs = theta_p.legs
    chinfo = legs[0].chinfo
    qtotal_A = np.asarray(chinfo.make_valid(np.asarray(qtotal_A, QTYPE)), QTYPE)
    qtotal_B = np.asarray(chinfo.make_valid(
        np.asarray(theta_p.qtotal, QTYPE) - qtotal_A), QTYPE)

    bond_pos = {tuple(np.asarray(bond.charges[b], QTYPE)): b
                for b in range(bond.block_number)}
    caps = np.diff(bond.slices).astype(int)

    size = [np.diff(l.slices).astype(int) for l in legs]

    # ---- per bond sector: ordered row/col pair lists with offsets
    rows_of = {b: [] for b in range(bond.block_number)}   # (s_vL, s_p0)
    cols_of = {b: [] for b in range(bond.block_number)}   # (s_p1, s_vR)
    for a in range(legs[0].block_number):
        qa = np.asarray(legs[0].charges[a], QTYPE) * legs[0].qconj
        for c in range(legs[1].block_number):
            q = chinfo.make_valid(
                qa + np.asarray(legs[1].charges[c], QTYPE) * legs[1].qconj
                - qtotal_A)
            b = bond_pos.get(tuple(np.asarray(q, QTYPE)))
            if b is not None:
                rows_of[b].append((a, c))
    for c in range(legs[2].block_number):
        qc = np.asarray(legs[2].charges[c], QTYPE) * legs[2].qconj
        for d in range(legs[3].block_number):
            q = chinfo.make_valid(
                qtotal_B - qc - np.asarray(legs[3].charges[d], QTYPE) * legs[3].qconj)
            b = bond_pos.get(tuple(np.asarray(q, QTYPE)))
            if b is not None:
                cols_of[b].append((c, d))
    row_off = {}
    col_off = {}
    R_of = np.zeros(bond.block_number, int)
    C_of = np.zeros(bond.block_number, int)
    for b in range(bond.block_number):
        off = 0
        for (a, c) in rows_of[b]:
            row_off[(b, a, c)] = off
            off += size[0][a] * size[1][c]
        R_of[b] = off
        off = 0
        for (c, d) in cols_of[b]:
            col_off[(b, c, d)] = off
            off += size[2][c] * size[3][d]
        C_of[b] = off

    # ---- group sectors by bucketed (R, C)
    def rcb(b):
        return (bucket_size(int(R_of[b]), group_multiple),
                bucket_size(int(C_of[b]), group_multiple))

    by_rc = {}
    for b in range(bond.block_number):
        if R_of[b] == 0 or C_of[b] == 0 or caps[b] == 0:
            continue
        by_rc.setdefault(rcb(b), []).append(b)

    toffs, _ = _flat_offsets(theta_p.shapes, theta_p.qdatas)
    tpos = {}
    for s, q in enumerate(theta_p.qdatas):
        blk = int(np.prod(theta_p.shapes[s], dtype=np.int64))
        for n, row in enumerate(q):
            tpos[tuple(int(x) for x in row)] = toffs[s] + n * blk

    groups = []
    sector_group = {}   # bond sector -> (g, n)
    for (R, C) in sorted(by_rc):
        secs = by_rc[(R, C)]
        N = len(secs)
        K = min(R, C)
        idx = np.full((N, R, C), -1, np.int64)
        cap_mask = np.zeros((N, K), bool)
        for n, b in enumerate(secs):
            sector_group[b] = (len(groups), n)
            cap_mask[n, :min(int(caps[b]), K)] = True
            for (a, c) in rows_of[b]:
                ro = row_off[(b, a, c)]
                rs = size[0][a] * size[1][c]
                for (cc, d) in cols_of[b]:
                    co = col_off[(b, cc, d)]
                    cs = size[2][cc] * size[3][d]
                    base = tpos.get((a, c, cc, d))
                    if base is None:
                        continue   # not charge-allowed given qtotal_theta
                    patch = base + np.arange(rs * cs, dtype=np.int64)
                    idx[n, ro:ro + rs, co:co + cs] = patch.reshape(rs, cs)
        groups.append(_SplitGroup(R, C, N, idx.astype(np.int32),
                                  cap_mask, list(secs)))

    # ---- flat U / V / S offsets (stacked per group)
    uoffs = []
    voffs = []
    soffs = []
    uo = vo = so = 0
    for g in groups:
        uoffs.append(uo)
        voffs.append(vo)
        soffs.append(so)
        uo += g.N * g.R * g.K
        vo += g.N * g.C * g.K
        so += g.N * g.K

    # ---- A assembly
    bond_A = bond.conj()
    A_legs = (legs[0], legs[1], bond_A)
    A_shapes, A_qdatas = pk.complete_structure(A_legs, tuple(int(x)
                                                             for x in qtotal_A))
    A_idx = []
    for shape, qd in zip(A_shapes, A_qdatas):
        d0, d1, db = shape
        ii = np.full((qd.shape[0], d0 * d1, db), -1, np.int64)
        for n, (a, c, b) in enumerate(qd):
            gn = sector_group.get(int(b))
            if gn is None:
                continue
            g_i, n_i = gn
            g = groups[g_i]
            ro = row_off.get((int(b), int(a), int(c)))
            if ro is None:
                continue
            rs = size[0][a] * size[1][c]
            kk = min(int(caps[b]), g.K, db)
            base = uoffs[g_i] + (n_i * g.R + ro) * g.K
            ii[n, :rs, :kk] = (base + np.arange(rs)[:, None] * g.K
                               + np.arange(kk)[None, :])
        A_idx.append(ii.reshape((qd.shape[0],) + tuple(shape)).astype(np.int32))

    # ---- B assembly (values conjugated from V at gather time)
    B_legs = (bond, legs[2], legs[3])
    B_shapes, B_qdatas = pk.complete_structure(B_legs, tuple(int(x)
                                                             for x in qtotal_B))
    B_idx = []
    for shape, qd in zip(B_shapes, B_qdatas):
        db, d2, d3 = shape
        ii = np.full((qd.shape[0], db, d2 * d3), -1, np.int64)
        for n, (b, c, d) in enumerate(qd):
            gn = sector_group.get(int(b))
            if gn is None:
                continue
            g_i, n_i = gn
            g = groups[g_i]
            co = col_off.get((int(b), int(c), int(d)))
            if co is None:
                continue
            cs = size[2][c] * size[3][d]
            kk = min(int(caps[b]), g.K, db)
            base = voffs[g_i] + n_i * g.C * g.K
            ii[n, :kk, :cs] = (base + (co + np.arange(cs))[None, :] * g.K
                               + np.arange(kk)[:, None])
        B_idx.append(ii.reshape((qd.shape[0],) + tuple(shape)).astype(np.int32))

    # ---- S assembly: bond-leg-ordered flat vector
    bond_dim = int(bond.slices[-1])
    S_idx = np.full(bond_dim, -1, np.int64)
    for b in range(bond.block_number):
        gn = sector_group.get(b)
        if gn is None:
            continue
        g_i, n_i = gn
        g = groups[g_i]
        kk = min(int(caps[b]), g.K)
        start = int(bond.slices[b])
        S_idx[start:start + kk] = soffs[g_i] + n_i * g.K + np.arange(kk)

    # On TPU, jnp.take(mode='fill') mishandles negative indices (they wrap
    # to the end instead of producing fill_value — an XLA lowering bug), so
    # ALL index maps use an explicit zero slot appended to the flat buffers:
    # sentinel -1 is remapped to index <flat_len> at build time.
    theta_len = sum(int(np.prod(sh, dtype=np.int64)) * q.shape[0]
                    for sh, q in zip(theta_p.shapes, theta_p.qdatas))
    for g in groups:
        g.idx = np.where(g.idx < 0, theta_len, g.idx).astype(np.int32)
    A_idx = [np.where(ii < 0, uo, ii).astype(np.int32) for ii in A_idx]
    B_idx = [np.where(ii < 0, vo, ii).astype(np.int32) for ii in B_idx]
    S_idx = np.where(S_idx < 0, so, S_idx)

    plan = SplitPlan.__new__(SplitPlan)
    plan.flat_lens = (theta_len, uo, vo, so)
    plan.groups = groups
    plan.A_struct = (A_legs, tuple(int(x) for x in qtotal_A), A_shapes, A_qdatas)
    plan.B_struct = (B_legs, tuple(int(x) for x in qtotal_B), B_shapes, B_qdatas)
    plan.A_idx = A_idx
    plan.B_idx = B_idx
    plan.S_idx = S_idx.astype(np.int32)
    plan.bond = bond
    plan.bond_dim = bond_dim
    plan.theta_legs = legs
    plan.theta_labels = theta_p._labels
    plan.qtotal_A = tuple(int(x) for x in qtotal_A)
    plan.qtotal_B = tuple(int(x) for x in qtotal_B)
    return plan


# ----------------------------------------------------------- decompositions
@lru_cache(maxsize=64)
def _jacobi_schedule(n):
    """Round-robin (tournament) pairing: (n-1) rounds of n//2 disjoint pairs.

    Static numpy schedule; every unordered pair appears exactly once per
    sweep.  Classic parallel-Jacobi ordering (Brent/Luk)."""
    assert n % 2 == 0
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = [(players[i], players[n - 1 - i]) for i in range(n // 2)]
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    sched = np.array(rounds, np.int32)          # (n-1, n//2, 2)
    return np.minimum(sched[..., 0], sched[..., 1]), \
        np.maximum(sched[..., 0], sched[..., 1])


# --------------------------------------------------- channelized complex ops
# A "channel pair" is (X_re, X_im) with X_im None for real data — the split
# re/im storage of :class:`~tenpy_tpu.linalg.packed.PackedArray` carried into
# the decomposition kernels (TPU backends have no complex128).

def _ch_map(fn, *chs):
    """Apply `fn` channel-wise over channel pairs (None im stays None)."""
    re = fn(*[c[0] for c in chs])
    if all(c[1] is None for c in chs):
        return (re, None)
    ims = [c[1] if c[1] is not None else jnp.zeros_like(c[0]) for c in chs]
    return (re, fn(*ims))


def _ch_mm(a, b, conj_a=False, precision=None):
    """Channelized (batched) matmul of channel pairs."""
    ar, ai = a
    br, bi = b
    if conj_a and ai is not None:
        ai = -ai
    mm = lambda x, y: jnp.matmul(x, y, precision=precision)
    if ai is None and bi is None:
        return (mm(ar, br), None)
    if ai is None:
        return (mm(ar, br), mm(ar, bi))
    if bi is None:
        return (mm(ar, br), mm(ai, br))
    t1 = mm(ar, br)
    t2 = mm(ai, bi)
    t3 = mm(ar + ai, br + bi)
    return (t1 - t2, t3 - t1 - t2)


def _ch_swapaxes(x, a, b):
    return _ch_map(lambda t: jnp.swapaxes(t, a, b), x)


def _ch_newton_schulz_orth(V, iters=2, precision=None):
    """Re-orthonormalize a nearly-orthonormal (batch of) V: V <- 1.5V - 0.5 V(V^H V).

    Quadratic: column-orthogonality error eps -> O(eps^2) per iteration.
    Matmul-only, so it works on complex channel pairs on TPU (where QR
    doesn't).  Used to clean up the f32-accumulated rotation matrix of the
    ``jacobi32`` backend (~1e-5 drift -> f64 level in 2 iterations).
    """
    for _ in range(iters):
        Vh = _ch_swapaxes((V[0], None if V[1] is None else -V[1]), -1, -2)
        G = _ch_mm(Vh, V, precision=precision)           # V^H V
        VG = _ch_mm(V, G, precision=precision)
        V = _ch_map(lambda v, vg: 1.5 * v - 0.5 * vg, V, VG)
    return V


def _decomp_jacobi(M, sweeps=14, bulk_f32=False, M_im=None):
    """Batched SVD via one-sided Jacobi: the TPU-native decomposition.

    Orthogonalizes the *columns* of M with (n-1) parallel rounds of n/2
    disjoint Givens rotations per sweep (static round-robin schedule, no
    data-dependent control flow): XLA-friendly, guaranteed-terminating, exact
    on zero/padded columns (they never rotate), and — unlike the Gram/eigh
    route — full f64 relative accuracy on small singular values.  This is
    the workhorse for the device truncation: the stock jnp.linalg.svd/eigh
    lowerings on this TPU stack crash the compiler (f32), return NaN, or
    hang in non-convergent internal loops on padded rank-deficient inputs.

    ``M_im`` turns on split-channel complex mode: unitary rotations with a
    complex off-diagonal phase, all arithmetic on the two real channels.
    Returns ``((U_re, U_im), S, (V_re, V_im))`` in that case (im parts None
    for real input).

    With ``bulk_f32`` most sweeps run in float32 (the TPU emulates f64 on the
    vector units; f32 rounds are several times cheaper), then the accumulated
    rotation V — Newton-Schulz re-orthonormalized in f64 — is applied to the
    *original* f64 M in one (MXU) matmul and two f64 polish sweeps restore
    pairwise orthogonality at the f64 level (Jacobi is self-correcting:
    near convergence one sweep squares the off-diagonal residual).
    """
    complex_in = M_im is not None
    Mc = (M, M_im)
    swap = M.shape[-2] < M.shape[-1]
    if swap:
        # SVD of M^H: one-sided Jacobi wants tall matrices
        Mc = _ch_swapaxes((Mc[0], None if Mc[1] is None else -Mc[1]), -1, -2)
    B, R, C = Mc[0].shape
    pad = C % 2
    if pad:
        Mc = _ch_map(lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, 1))), Mc)
        C += 1
    ps_, qs_ = _jacobi_schedule(C)
    ps_ = jnp.asarray(ps_)                       # (C-1, C//2)
    qs_ = jnp.asarray(qs_)

    def round_body(r, AV):
        (Ar, Ai, Vr, Vi) = AV
        p = ps_[r]
        q = qs_[r]
        take = lambda X: None if X is None else jnp.take(X, p, axis=2)
        takeq = lambda X: None if X is None else jnp.take(X, q, axis=2)
        Apr, Api = take(Ar), take(Ai)
        Aqr, Aqi = takeq(Ar), takeq(Ai)
        app = jnp.sum(Apr ** 2, axis=1)          # (B, C//2)
        aqq = jnp.sum(Aqr ** 2, axis=1)
        apq_re = jnp.sum(Apr * Aqr, axis=1)
        if Ai is not None:
            app = app + jnp.sum(Api ** 2, axis=1)
            aqq = aqq + jnp.sum(Aqi ** 2, axis=1)
            apq_re = apq_re + jnp.sum(Api * Aqi, axis=1)
            apq_im = jnp.sum(Apr * Aqi - Api * Aqr, axis=1)  # conj(Ap).Aq
            abs_apq = jnp.sqrt(apq_re ** 2 + apq_im ** 2)
        else:
            apq_im = None
            abs_apq = jnp.abs(apq_re)
        # complex: rotate the q-column phase so the 2x2 problem is real
        denom = jnp.where(abs_apq > 0, abs_apq, 1.)
        if apq_im is not None:
            ph_re = jnp.where(abs_apq > 0, apq_re / denom, 1.)
            ph_im = jnp.where(abs_apq > 0, apq_im / denom, 0.)
        else:
            ph_re = jnp.where(abs_apq > 0, apq_re / denom, 1.)
            ph_im = None
        tiny = abs_apq <= 1e-300 + 1e-18 * jnp.sqrt(app * aqq)
        tau = (aqq - app) / jnp.where(tiny, 1., 2. * abs_apq)
        # clamp: tau -> inf as the pair converges, and inf arithmetic breaks
        # the TPU's float-float f64 emulation (NaN); at |tau|=1e18 the
        # rotation is ~3e-19 — identical physics, finite intermediates
        tau = jnp.clip(tau, -1e18, 1e18)
        # sign(0) must be +1: exactly degenerate columns (tau = 0) need the
        # full 45-degree rotation, jnp.sign's 0 would freeze them unorthogonal
        sgn = jnp.where(tau >= 0., 1., -1.)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1. + tau ** 2))
        t = jnp.where(tiny, 0., t)
        c = (1. / jnp.sqrt(1. + t ** 2)).astype(Ar.dtype)
        tc = (t * c).astype(Ar.dtype)
        # s = t*c * phase (complex); columns rotate by [[c, -conj(s)],[s, c]]
        sr = tc * ph_re
        si = None if ph_im is None else tc * ph_im
        cb = c[:, None, :]
        srb = sr[:, None, :]
        sib = None if si is None else si[:, None, :]

        def rot(Xr, Xi):
            Xpr, Xpi = ((None if Xr is None else jnp.take(Xr, p, axis=2)),
                        (None if Xi is None else jnp.take(Xi, p, axis=2)))
            Xqr, Xqi = ((None if Xr is None else jnp.take(Xr, q, axis=2)),
                        (None if Xi is None else jnp.take(Xi, q, axis=2)))
            if sib is None:
                np_r = cb * Xpr - srb * Xqr
                nq_r = srb * Xpr + cb * Xqr
                Xr = _scatter_cols(_scatter_cols(Xr, p, np_r), q, nq_r)
                if Xi is not None:
                    np_i = cb * Xpi - srb * Xqi
                    nq_i = srb * Xpi + cb * Xqi
                    Xi = _scatter_cols(_scatter_cols(Xi, p, np_i), q, nq_i)
                return Xr, Xi
            # complex rotation: new_p = c Xp - conj(s) Xq; new_q = s Xp + c Xq
            np_r = cb * Xpr - (srb * Xqr + sib * Xqi)
            np_i = cb * Xpi - (srb * Xqi - sib * Xqr)
            nq_r = srb * Xpr - sib * Xpi + cb * Xqr
            nq_i = srb * Xpi + sib * Xpr + cb * Xqi
            Xr = _scatter_cols(_scatter_cols(Xr, p, np_r), q, nq_r)
            Xi = _scatter_cols(_scatter_cols(Xi, p, np_i), q, nq_i)
            return Xr, Xi

        Ar, Ai = rot(Ar, Ai)
        Vr, Vi = rot(Vr, Vi)
        return (Ar, Ai, Vr, Vi)

    use_im = complex_in

    def run_sweeps(A, V, n):
        Ai = A[1] if A[1] is not None else (jnp.zeros_like(A[0]) if use_im
                                            else None)
        Vi = V[1] if V[1] is not None else (jnp.zeros_like(V[0]) if use_im
                                            else None)
        st = (A[0], Ai, V[0], Vi)

        def sweep_body(_, st):
            return jax.lax.fori_loop(0, C - 1, round_body, st)

        Ar, Ai, Vr, Vi = jax.lax.fori_loop(0, n, sweep_body, st)
        return (Ar, Ai), (Vr, Vi)

    eye = jnp.broadcast_to(jnp.eye(C, dtype=Mc[0].dtype), (B, C, C))
    if bulk_f32 and Mc[0].dtype == jnp.float64:
        M32 = _ch_map(lambda t: t.astype(jnp.float32), Mc)
        eye32 = jnp.broadcast_to(jnp.eye(C, dtype=jnp.float32), (B, C, C))
        _, V32 = run_sweeps(M32, (eye32, None), max(sweeps - 2, 1))
        # f32 rotation roundoff accumulates over thousands of rounds (~1e-5
        # orthogonality drift); Newton-Schulz in f64 cleans it up with
        # matmuls only (QR has no complex TPU path)
        V = _ch_map(lambda t: t.astype(jnp.float64), V32)
        V = _ch_newton_schulz_orth(V, iters=2,
                                   precision=jax.lax.Precision.HIGHEST)
        A = _ch_mm(Mc, V, precision=jax.lax.Precision.HIGHEST)
        A, V = run_sweeps(A, V, 2)
    else:
        A, V = run_sweeps(Mc, (eye, None), sweeps)

    S = jnp.sum(A[0] ** 2, axis=1)
    if A[1] is not None:
        S = S + jnp.sum(A[1] ** 2, axis=1)
    S = jnp.sqrt(S)                                          # (B, C)
    order = jnp.argsort(-S, axis=-1)
    S = jnp.take_along_axis(S, order, -1)
    reorder = lambda X: None if X is None else \
        jnp.take_along_axis(X, order[:, None, :], -1)
    A = (reorder(A[0]), reorder(A[1]))
    V = (reorder(V[0]), reorder(V[1]))
    good = S > 0
    inv = jnp.where(good, 1. / jnp.where(good, S, 1.), 0.)[:, None, :]
    U = _ch_map(lambda t: t * inv, A)
    K = min(R, C - pad)
    cut_u = lambda X: None if X is None else X[:, :, :K]
    cut_v = lambda X: None if X is None else X[:, :C - pad, :K]
    U = (cut_u(U[0]), cut_u(U[1]))
    S = S[:, :K]
    V = (cut_v(V[0]), cut_v(V[1]))
    if swap:
        # we decomposed W^H = U S V^H  =>  W = V S U^H: U and V swap roles
        U, V = V, U
    if not complex_in:
        return U[0], S, V[0]
    return U, S, V


def _scatter_cols(X, idx, vals):
    """X[:, :, idx] = vals with idx a traced 1-D index array."""
    return jnp.swapaxes(jnp.swapaxes(X, 1, 2).at[:, idx].set(
        jnp.swapaxes(vals, 1, 2)), 1, 2)


def _decomp_svd(M):
    U, S, Vh = jnp.linalg.svd(M, full_matrices=False)
    V = jnp.conj(jnp.swapaxes(Vh, -1, -2))
    return U, S, V


def _decomp_qr_eigh(M, f32_seed=False):
    """SVD via Gram-matrix eigh + QR re-orthonormalization (matmul/eigh/qr only).

    Exactness properties: V from eigh is orthonormal to machine precision; U
    from QR is orthonormal by construction; ``theta - U S V^H`` is at the
    eigh backward-error level (~1e-15 * sigma_max).  Singular values below
    ~1e-8 * sigma_max lose relative accuracy (Gram squaring) — irrelevant for
    truncation, their weight is at the f64 noise floor.
    """
    R, C = M.shape[-2], M.shape[-1]
    K = min(R, C)
    Mh = jnp.conj(jnp.swapaxes(M, -1, -2))
    if R >= C:
        rho = jnp.matmul(Mh, M)          # (N, C, C)
        # Regularize: padded DMRG/TEBD inputs make rho exactly singular
        # (whole zero sectors), which the TPU eigh lowering (QDWH spectral
        # divide & conquer) is fragile against on some libtpu rolls (NaN,
        # SMOKE r4).  A uniform diagonal shift leaves the eigenvectors
        # unchanged and is subtracted exactly from the eigenvalues.
        tr = jnp.trace(rho, axis1=-2, axis2=-1).real
        shift = (1e-13 / C) * tr
        rho = rho + shift[..., None, None] * jnp.eye(C, dtype=rho.dtype)
        if f32_seed:
            _, V0 = jnp.linalg.eigh(rho.astype(jnp.float32))
            V0 = V0.astype(M.dtype)[..., ::-1]
            V, _ = jnp.linalg.qr(V0)
            w = jnp.sum(jnp.conj(V) * jnp.matmul(rho, V), axis=-2).real
            ordr = jnp.argsort(-w, axis=-1)
            w = jnp.take_along_axis(w, ordr, -1)
            V = jnp.take_along_axis(V, ordr[..., None, :], -1)
        else:
            w, V = jnp.linalg.eigh(rho)
            w = w[..., ::-1]
            V = V[..., ::-1]
        S = jnp.sqrt(jnp.clip(w - shift[..., None], 0., None))
        U0 = jnp.matmul(M, V)            # columns ~ U * S
        U, Ru = jnp.linalg.qr(U0)
        d = jnp.diagonal(Ru, axis1=-2, axis2=-1)
        sgn = jnp.where(jnp.abs(d) > 0, d / jnp.where(jnp.abs(d) > 0,
                                                      jnp.abs(d), 1.), 1.)
        U = U * jnp.conj(sgn)[..., None, :]
        return U, S, V
    else:
        # wide matrix: work on M^H (tall), swap roles
        V, S, U = _decomp_qr_eigh(Mh, f32_seed=f32_seed)
        return U, S, V


def _decomp(M, backend, M_im=None):
    if M_im is not None:
        # split-channel complex input -> ((U_re, U_im), S, (V_re, V_im))
        if backend == 'svd':
            # CPU fallback: recombine to complex128 (fine off-TPU)
            U, S, V = _decomp_svd(M + 1j * M_im)
            return (U.real, U.imag), S, (V.real, V.imag)
        if backend in ('jacobi', 'jacobi32'):
            return _decomp_jacobi(M, bulk_f32=(backend == 'jacobi32'),
                                  M_im=M_im)
        raise NotImplementedError(
            f"device-SVD backend {backend!r} has no complex path; "
            "use 'jacobi'/'jacobi32' (TPU) or 'svd' (CPU)")
    if backend == 'svd':
        return _decomp_svd(M)
    if backend == 'jacobi':
        return _decomp_jacobi(M)
    if backend == 'jacobi32':
        return _decomp_jacobi(M, bulk_f32=True)
    if backend == 'qr_eigh':
        return _decomp_qr_eigh(M, f32_seed=False)
    if backend == 'qr_eigh32':
        return _decomp_qr_eigh(M, f32_seed=True)
    raise ValueError(f"unknown device-SVD backend {backend!r}")


def _resolve_backend(backend):
    if backend in (None, 'auto'):
        backend = DEFAULT_BACKEND
    if backend == 'auto':
        # TPU: the stock svd/eigh lowerings crash (f32), NaN, or hang in
        # non-convergent internal loops on padded rank-deficient inputs;
        # the fixed-iteration one-sided Jacobi is the robust device path
        backend = 'svd' if jax.default_backend() == 'cpu' else 'jacobi'
    return backend


# -------------------------------------------------------------- the split
def split_truncate(theta_p, plan, chi_max, svd_min=1e-14, backend=None,
                   expand=False, expand_rtol=1e-6):
    """Decompose + truncate a packed theta; fully traceable (shapes static).

    Parameters
    ----------
    theta_p : PackedArray, legs (vL, p0, p1, vR), complete structure matching
        the plan.  Need NOT be normalized.
    plan : SplitPlan
    chi_max : int (static)
    svd_min : float (static) — discard Schmidt values below this (relative).
    expand : bool (static)
        Device-native subspace expansion (the mixer of the packed engine,
        playing the role of the reference's ``SubspaceExpansion`` mixer,
        ``tenpy/algorithms/mps_common.py:2082``): keep the decomposition's
        *orthonormal* singular directions in A/B for every capacity slot
        whose raw singular value is > 0 — not just the slots above the
        truncation threshold — while S stays zero below the threshold.
        The state ``A . diag(S) . B`` is bitwise unchanged (zero-S slots
        carry no weight), but the environments built from the expanded A/B
        gain coupling to every capacity direction, so the *next* update's
        Krylov space reaches them and chi can grow by the full spare
        capacity per sweep instead of only by the above-threshold SVD tail.
        Since theta is the output of K >= 10 H_eff matvecs, its trailing
        singular directions span the K-hop H-channel — the same enrichment
        the reference's mixer injects via ``LP . theta . W`` perturbations.
        Free on the static-capacity layout: the zero columns were being
        multiplied anyway.

    Returns
    -------
    A : PackedArray (vL, p, vR) left-isometric (dropped columns exact zeros)
    S : jnp.ndarray (bond_dim,) normalized Schmidt values in bond-leg order
        (zeros on dropped/padding entries)
    B : PackedArray (vL, p, vR) right-isometric
    err : truncation error (sum of discarded p), scalar
    renorm : sqrt(sum kept S^2) of the raw theta — the norm factor removed
    n_kept : number of kept Schmidt values, scalar int
    """
    backend = _resolve_backend(backend)
    order = [theta_p.get_leg_index(l) for l in ('vL', 'p0', 'p1', 'vR')]
    if order != [0, 1, 2, 3]:
        theta_p = theta_p.transpose(order)
    dtype = theta_p.dtype
    real = jnp.zeros((), dtype).real.dtype
    iscomplex = theta_p.iscomplex
    chans = theta_p.channels()
    flats = [jnp.concatenate([d.reshape(-1) for d in ch]
                             + [jnp.zeros(1, real)])    # zero slot (see plan)
             for ch in chans]

    Us, Ss, Vs = [], [], []
    for g in plan.groups:
        Ms = [jnp.take(f, jnp.asarray(g.idx.reshape(-1)),
                       mode='clip').reshape(g.N, g.R, g.C) for f in flats]
        if iscomplex:
            U, S, V = _decomp(Ms[0], backend, M_im=Ms[1])
        else:
            U, S, V = _decomp(Ms[0], backend)
            U, V = (U, None), (V, None)
        Us.append(U)
        Ss.append(jnp.where(jnp.asarray(g.cap_mask), S.astype(real), 0.))
        Vs.append(V)

    allS = jnp.concatenate([S.reshape(-1) for S in Ss])
    # full norm of theta (not just the layout's sectors): weight in bond
    # sectors outside the fixed capacity layout is *discarded* by the split
    # and must show up in err/renorm
    tot = sum(jnp.sum(d.reshape(-1) ** 2) for ch in chans for d in ch)
    nrm = jnp.sqrt(tot)
    # global top-chi threshold
    k = min(int(chi_max), allS.shape[0])
    thr_chi = jax.lax.top_k(allS, k)[0][-1]
    # floor at 1e-14: values below f64 roundoff of the dominant Schmidt value
    # are numerically meaningless (their "singular vectors" are junk)
    thr = jnp.maximum(thr_chi, max(svd_min, 1e-14) * nrm)

    masks = [(S >= thr) & (S > 0) for S in Ss]
    kept = sum(jnp.sum(S ** 2 * m) for S, m in zip(Ss, masks))
    n_kept = sum(jnp.sum(m) for m in masks)
    err = jnp.maximum(0., 1. - kept / tot)
    renorm = jnp.sqrt(kept)
    if expand:
        # Subspace expansion: A/B keep every orthonormal direction within
        # capacity (Ss is already zeroed outside cap_mask) whose singular
        # value clears the backend's *noise floor*, union the threshold mask.
        # The floor matters: fixed-sweep Jacobi converges tiny singular
        # directions only down to ~1e-7 relative (f64; worse for jacobi32's
        # f32 bulk, ~1e-9 with 0.9 U-column orthogonality error, measured),
        # and non-orthonormal columns in A/B poison the environments — the
        # eigenproblem turns non-variational and the energy collapses below
        # the true ground state.  At S > 1e-6 |theta| the U/V columns are
        # orthonormal to ~1e-14 for both backends.
        col_masks = [m | (S > expand_rtol * nrm)
                     for S, m in zip(Ss, masks)]
    else:
        col_masks = masks

    zslot = [jnp.zeros(1, real)]
    n_chan = 2 if iscomplex else 1

    def masked_flat(Xs, ci):
        return jnp.concatenate([
            (X[ci] * m[:, None, :].astype(real)).reshape(-1)
            for X, m in zip(Xs, col_masks)] + zslot)

    flatU = [masked_flat(Us, ci) for ci in range(n_chan)]
    flatV = [masked_flat(Vs, ci) for ci in range(n_chan)]
    flatS = jnp.concatenate([
        (S * m / renorm).reshape(-1) for S, m in zip(Ss, masks)]
        + [jnp.zeros(1, real)])

    A_legs, qtot_A, A_shapes, A_qdatas = plan.A_struct

    def assemble(flat_ch, idx_list, shapes, qdatas, negate=False):
        out = []
        for ii, shape, qd in zip(idx_list, shapes, qdatas):
            d = jnp.take(flat_ch, jnp.asarray(ii.reshape(-1)),
                         mode='clip').reshape((qd.shape[0],) + shape)
            out.append(-d if negate else d)
        return out

    A_chan = [assemble(f, plan.A_idx, A_shapes, A_qdatas) for f in flatU]
    A = pk.PackedArray(A_legs, qtot_A, ('vL', 'p', 'vR'), A_shapes, A_qdatas,
                       A_chan[0], dtype, A_chan[1] if iscomplex else None)
    B_legs, qtot_B, B_shapes, B_qdatas = plan.B_struct
    # B = V^H: conjugate at assembly (negate the im channel)
    B_chan = [assemble(f, plan.B_idx, B_shapes, B_qdatas, negate=(ci == 1))
              for ci, f in enumerate(flatV)]
    B = pk.PackedArray(B_legs, qtot_B, ('vL', 'p', 'vR'), B_shapes, B_qdatas,
                       B_chan[0], dtype, B_chan[1] if iscomplex else None)
    S_flat = jnp.take(flatS, jnp.asarray(plan.S_idx), mode='clip')
    # renorm = |kept part of theta| (S entries are raw singular values of the
    # unnormalized theta, so sqrt(kept) already carries |theta|)
    return A, S_flat, B, err, renorm, n_kept


# ---------------------------------------------------- bond-S scaling (guess)
@lru_cache(maxsize=1024)
def _scale_bond_idx(struct_sig_legs, bond_sig, axis):
    """Per-group (N, d_axis) indices into the bond-S flat vector."""
    shapes, qdatas, legs = struct_sig_legs
    bond = bond_sig
    idx = []
    for shape, qd in zip(shapes, qdatas):
        d = shape[axis]
        ii = np.zeros((qd.shape[0], d), np.int64)
        for n, row in enumerate(qd):
            b = int(row[axis])
            start = int(bond.slices[b])
            width = int(bond.slices[b + 1]) - start
            ii[n] = start + np.minimum(np.arange(d), max(width - 1, 0))
        idx.append(ii.astype(np.int32))
    return idx


def scale_bond_plan(p, axis):
    """Static gather maps to scale PackedArray ``p`` along bond leg ``axis``."""
    axis = p.get_leg_index(axis)
    key = ((p.shapes, tuple(q.tobytes() for q in p.qdatas)), None, axis)
    # lru_cache needs hashable: rebuild key with legs
    shapes = p.shapes
    qdatas = p.qdatas
    bond = p.legs[axis]
    idx = []
    for shape, qd in zip(shapes, qdatas):
        d = shape[axis]
        ii = np.zeros((qd.shape[0], d), np.int64)
        for n, row in enumerate(qd):
            b = int(row[axis])
            start = int(bond.slices[b])
            ii[n] = start + np.arange(d)
        idx.append(ii.astype(np.int32))
    return (axis, idx)


def scale_bond(p, S_flat, plan):
    """Multiply packed ``p`` by (real) bond values ``S_flat`` along the
    planned axis; complex channels scale independently."""
    axis, idx = plan

    def scale(ch):
        out = []
        for d, ii in zip(ch, idx):
            s = jnp.take(S_flat, jnp.asarray(ii), mode='clip')  # (N, d_axis)
            shape = [d.shape[0]] + [1] * (d.ndim - 1)
            shape[1 + axis] = d.shape[1 + axis]
            out.append(d * s.reshape(shape).astype(d.dtype))
        return out

    if p.iscomplex:
        return p._with_data(scale(p.data), scale(p.data_im))
    return p._with_data(scale(p.data))
