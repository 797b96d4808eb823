r"""Device-resident two-site DMRG sweeps on the bucket-packed layout.

The round-1 device path fused only the local eigensolve (Lanczos) and paid a
full host<->device round trip of theta per site update, plus host-LAPACK
truncation and host environment updates — on a remote-attached TPU those
transfers dominate (PERF.md).  Here the **entire site update** is one jitted
XLA program and the **entire sweep state lives in device memory**:

    theta = C . B_next            (guess; no inverse-S — center-matrix carry)
    E0, theta = Lanczos^K (theta) (fused lax.scan, packed matvec)
    A, S, B   = split_truncate    (batched device decomposition, static shapes)
    LP'/RP'   = env update        (packed tensordot chain)

Per update the host receives only three scalars (E0, err, n_kept).  Shapes are
static because every bond has a fixed, size-bucketed *capacity layout*
(:func:`~tenpy_tpu.linalg.packed_split.split_truncate`): dropped Schmidt
states are exact zero columns/rows with zero S, with exactly zero environment
coupling — invisible to the physics.  One XLA program is compiled per
(site, direction) and reused for every subsequent sweep.

This plays the role of the reference's optimized sweep inner loop
(``tenpy/algorithms/dmrg.py:846`` TwoSiteDMRGEngine over ``_npc_helper.pyx``
batched GEMMs), recast for an accelerator with high dispatch latency.  It is
the *production* phase: run the chi ramp (with mixer) on the host engine
first, then hand the state over for fixed-structure convergence sweeps.

Supports finite and infinite (iDMRG, environments age as they recycle) bc.
Two-site updates carry a built-in device mixer (``mixer`` option, default on):
the split keeps every capacity slot's orthonormal singular direction in A/B
with zero S below the truncation threshold
(:func:`~tenpy_tpu.linalg.packed_split.split_truncate` ``expand``), so the
environments couple to the full capacity layout and chi saturates within a
couple of sweeps — the static-shape analogue of the reference's subspace
-expansion mixers (``tenpy/algorithms/mps_common.py:1547-2203``), at zero
extra FLOPs (the dropped columns were exact zeros being multiplied anyway).
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..linalg import packed as pk
from ..linalg import packed_split as ps
from ..linalg.charges import QTYPE, LegCharge
from ..linalg.padding import pad_leg, embed_array
from .mps_common import _lanczos_K_2site_packed_impl, BUCKET_MULTIPLE

logger = logging.getLogger(__name__)

__all__ = ['DeviceSweepEngine', 'device_ramp', 'uniformize_charge_gauge',
           'uniform_capacity_layout']


def _apply_bond_charge_shift(psi, o):
    """``q_bond[j] -> q_bond[j] - o_j`` on every bond leg of an infinite MPS,
    with the site qtotals adjusted so every tensor stays charge-consistent.
    A pure gauge of the conservation bookkeeping (no data touched); its own
    inverse under ``o -> -o``."""
    L = psi.L
    chinfo = psi._B[0].legs[0].chinfo
    new_bond_leg = {}

    def shifted(leg, j):
        key = (id(leg), j % L)
        if key not in new_bond_leg:
            new_bond_leg[key] = LegCharge(
                leg.chinfo, leg.slices,
                chinfo.make_valid(np.asarray(leg.charges, QTYPE) - o[j % L]),
                leg.qconj)
        return new_bond_leg[key]

    for i in range(L):
        B = psi._B[i]
        iL = B.get_leg_index('vL')
        iR = B.get_leg_index('vR')
        legs = list(B.legs)
        delta = (-o[i % L] * legs[iL].qconj
                 - o[(i + 1) % L] * legs[iR].qconj)
        legs[iL] = shifted(legs[iL], i)
        legs[iR] = shifted(legs[iR], i + 1)
        B.legs = type(B.legs)(legs)
        B.qtotal = tuple(int(q) for q in chinfo.make_valid(
            np.asarray(B.qtotal, QTYPE) + delta))


def scale_psi_charges(psi, k, div=False):
    """Multiply (or exactly divide, ``div=True``) every U(1) charge of an MPS
    by per-charge integer factors ``k``: leg charges, qtotals, and the sites'
    physical legs.  A pure relabeling of the conservation bookkeeping — the
    U(1) grading is preserved under any injective linear map — used to make
    fractional per-site charges (``Q % L != 0``, e.g. Hofstadter at 1/3
    filling, reference config ``tenpy/models/hofstadter.py:145``) integer so
    the uniform charge gauge applies.  In place; ``psi.sites`` are replaced
    by shallow copies carrying the rescaled leg."""
    import copy
    k = np.asarray(k, QTYPE)
    if np.all(k == 1):
        return
    seen = {}

    def scaled(leg):
        key = id(leg)
        if key not in seen:
            q = np.asarray(leg.charges, QTYPE)
            if div:
                assert np.all(q % k == 0), "charge not divisible on unscale"
                q = q // k
            else:
                q = q * k
            seen[key] = LegCharge(leg.chinfo, leg.slices, q, leg.qconj)
        return seen[key]

    for i in range(psi.L):
        B = psi._B[i]
        B.legs = type(B.legs)([scaled(l) for l in B.legs])
        qt = np.asarray(B.qtotal, QTYPE).ravel()
        if div:
            assert np.all(qt % k == 0)
            qt = qt // k
        else:
            qt = qt * k
        B.qtotal = tuple(int(q) for q in qt)
    new_sites = []
    for s in psi.sites:
        s2 = copy.copy(s)
        s2.leg = scaled(s.leg)
        new_sites.append(s2)
    psi.sites = new_sites


def scale_mpo_charges(H, k):
    """A shallow copy of MPO ``H`` with every U(1) charge multiplied by ``k``
    (see :func:`scale_psi_charges`); ``H`` itself is untouched."""
    import copy
    k = np.asarray(k, QTYPE)
    H2 = copy.copy(H)
    if np.all(k == 1):
        return H2
    seen = {}

    def scaled(leg):
        key = id(leg)
        if key not in seen:
            seen[key] = LegCharge(leg.chinfo, leg.slices,
                                  np.asarray(leg.charges, QTYPE) * k,
                                  leg.qconj)
        return seen[key]

    Ws = []
    for i in range(H.L):
        W = H.get_W(i).copy(deep=False)
        W.legs = type(W.legs)([scaled(l) for l in W.legs])
        W.qtotal = tuple(int(q) for q in
                         np.asarray(W.qtotal, QTYPE).ravel() * k)
        Ws.append(W)
    H2._W = Ws
    new_sites = []
    for s in H.sites:
        s2 = copy.copy(s)
        s2.leg = scaled(s.leg)
        new_sites.append(s2)
    H2.sites = new_sites
    return H2


def uniformize_charge_gauge(psi, rescale=False):
    """Regauge the charge bookkeeping of an infinite MPS so all bonds match.

    In a charge-conserving iMPS the bond-leg charge values drift site to site
    (each site's block charge shifts them), so every (site, direction) pair
    compiles its own XLA program even when the physics is translation
    invariant.  This applies the pure *gauge* transformation

        ``q_bond[j] -> q_bond[j] - o_j``,   ``o_{j+1} = o_j - qtotal_j + Q/L``

    (``Q`` = total unit-cell charge), which leaves every block and singular
    value untouched but makes each site's ``qtotal`` equal to ``Q/L`` and
    brings all bond legs into one common charge frame.  With a shared
    capacity layout (:func:`uniform_capacity_layout`) the whole sweep then
    reuses ~2 compiled programs instead of ``2 L``.

    Only applies when every charge is U(1) (``mod == 1``; modular wrapping
    would reorder sectors).  When ``Q`` is not divisible by ``L`` and
    ``rescale`` is set, the charge *units* are first multiplied by
    ``k_c = L / gcd(|Q_c|, L)`` (:func:`scale_psi_charges`) so the per-site
    charge ``k Q / L`` becomes integer — e.g. Hofstadter at 1/3 filling runs
    the 2-program uniform sweep instead of ``2 L`` serial compiles.

    Returns ``None`` if not applicable, else a dict with keys ``k`` (the
    per-charge unit scale, all ones if none was needed) and ``o`` (the bond
    offsets applied); pass these to :func:`scale_psi_charges` /
    :func:`_apply_bond_charge_shift` to invert the transformation exactly
    (:meth:`DeviceSweepEngine.write_back` does).  psi is modified in place.
    """
    if psi.bc == 'finite':
        return None
    L = psi.L
    chinfo = psi.sites[0].leg.chinfo
    nq = chinfo.qnumber
    if nq == 0:
        return {'k': np.ones(0, QTYPE), 'o': [np.zeros(0, QTYPE)] * L}
    if not np.all(np.asarray(chinfo.mod) == 1):
        return None
    qtots = [np.asarray(psi.get_B(i, None).qtotal, QTYPE) for i in range(L)]
    Q = np.sum(qtots, axis=0)
    k = np.ones(nq, QTYPE)
    if np.any(Q % L != 0):
        if not rescale:
            return None
        from math import gcd
        k = np.array([L // gcd(int(abs(int(q))), L) for q in Q.ravel()],
                     QTYPE)
        scale_psi_charges(psi, k)
        qtots = [q * k for q in qtots]
        Q = Q * k
    qeff = Q // L
    o = [np.zeros_like(qeff)]
    for i in range(L - 1):
        o.append(o[i] - qtots[i] + qeff)
    info = {'k': k, 'o': o}
    if all(np.all(oi == 0) for oi in o):
        return info   # already uniform
    _apply_bond_charge_shift(psi, o)
    return info


def uniform_capacity_layout(psi, chi_max, multiple, cap_factor=1.3,
                            total_cap_factor=1.5, n_hops=2):
    """One shared capacity bond layout for all bonds of a regauged iMPS.

    Requires :func:`uniformize_charge_gauge` to have succeeded (all bond legs
    in a common charge frame, all site qtotals equal) and all sites identical.
    The layout is the union of every bond's current sectors (per-sector
    capacity = max over bonds), widened by the same update-reachability
    passes as :func:`capacity_bond_layouts` — computed ONCE since every
    interior bond sees identical inputs.

    Returns ``(bond, psi_legs)`` like :func:`capacity_bond_layouts`, with
    ``bond[i]`` the *same* LegCharge object for every ``i`` (so packed
    structure signatures and split plans coincide across sites and the jitted
    sweep programs collapse to one per direction).
    """
    L = psi.L
    chinfo = psi.sites[0].leg.chinfo
    p_legs = [psi.get_B(i, None).get_leg('p') for i in range(L)]
    if any(leg != p_legs[0] for leg in p_legs[1:]):
        raise ValueError("uniform layout needs identical physical legs")
    qtots = [np.asarray(psi.get_B(i, None).qtotal, QTYPE) for i in range(L)]
    if any(np.any(q != qtots[0]) for q in qtots[1:]):
        raise ValueError("uniform layout needs equal site qtotals "
                         "(run uniformize_charge_gauge first)")
    qeff = qtots[0]
    psi_legs = []
    for i in range(L):
        leg = psi.get_B(i, 'B').get_leg('vL')
        if leg.qconj != 1:
            leg = leg.conj()
        psi_legs.append(leg)
    # union of current sectors with max capacity
    floor = {}
    for leg in psi_legs:
        for s in range(leg.block_number):
            q = tuple(np.asarray(leg.charges[s], QTYPE))
            n = int(leg.slices[s + 1] - leg.slices[s])
            floor[q] = max(floor.get(q, 0), n)
    from ..linalg.padding import bucket_size
    charges = sorted(floor)
    sizes = [bucket_size(floor[q], multiple) for q in charges]
    U = LegCharge(chinfo,
                  np.concatenate([[0], np.cumsum(sizes)]).astype(np.intp),
                  np.array(charges, QTYPE).reshape(len(charges),
                                                   chinfo.qnumber), 1)
    hint = {q: int(np.ceil(n * cap_factor)) for q, n in floor.items()}
    qtotal_th = chinfo.make_valid(2 * qeff)
    for _ in range(max(2, int(n_hops))):
        U = ps.bond_layout((U, p_legs[0], p_legs[0], U.conj()), qtotal_th,
                           qeff, cap_hint=hint, cap_floor=floor,
                           chi_cap=chi_max, multiple=multiple,
                           total_cap=int(np.ceil(total_cap_factor * chi_max)))
    return [U] * L, psi_legs


def device_ramp(psi, model, options):
    """Run the full chi ramp device-resident: staged two-site sweeps.

    Plays the role of the reference's ``chi_list`` ramp with mixer
    (``tenpy/algorithms/dmrg.py:1142``, ``mps_common.py:2082``), recast for
    static XLA shapes: each stage is a fresh fixed-capacity
    :class:`DeviceSweepEngine` at the stage's ``chi``, with the bond layouts
    rebuilt from the *current* state (re-trace point), widened ``n_hops``
    update-reachability hops so new charge sectors can be populated, and
    per-sector capacity extrapolated by ``grow_factor * chi_next/chi_cur``.
    Two-site updates grow chi into the reserved capacity without an explicit
    mixer — the staged layout rebuild supplies what the mixer supplies in the
    reference (reachability of new sectors).

    Options
    -------
    chi_list : list of (chi, n_sweeps) or dict {sweep-stage: chi}
        Stages; default doubles from ``2 * max(psi.chi)`` to ``chi_max``
        with ``sweeps_per_stage`` sweeps each.
    chi_max : int
        Final bond cap (used when ``chi_list`` is absent).
    sweeps_per_stage : int (default 2)
    grow_factor : float (default 1.3) — per-sector capacity headroom.
    n_hops : int (default 3) — sector-reachability widening per stage.
    Remaining options are forwarded to :class:`DeviceSweepEngine`
    (``lanczos_K``, ``backend``, ``matvec_mode``, ``e_tol``, ...); the final
    stage additionally runs ``n_sweeps`` sweeps (default from options) at
    ``chi_max``.

    Returns the last stage's engine (stats in ``engine.sweep_stats``; the
    ramped state is written back into ``psi`` after every stage).
    """
    opts = dict(options)
    chi_max = int(opts.pop('chi_max', max(psi.chi)))
    sweeps_per_stage = int(opts.pop('sweeps_per_stage', 2))
    grow = float(opts.pop('grow_factor', 1.3))
    n_hops = int(opts.pop('n_hops', 3))
    stages = opts.pop('chi_list', None)
    if stages is None:
        stages = []
        c = max(psi.chi)
        while 2 * c < chi_max:
            c *= 2
            stages.append((c, sweeps_per_stage))
        stages.append((chi_max, sweeps_per_stage))
    eng = None
    all_stats = None
    chi_prev = max(1, max(psi.chi, default=1))
    for k, (chi_s, n_s) in enumerate(stages):
        last = k == len(stages) - 1
        stage_opts = dict(opts)
        stage_opts.update({
            'chi_max': chi_s,
            'n_sweeps': n_s if not last
            else max(n_s, int(opts.get('n_sweeps', n_s))),
            # extrapolate per-sector capacity to the stage target (the mixer
            # then saturates it within ~2 sweeps)
            'cap_factor': grow * max(1., chi_s / chi_prev),
            'n_hops': n_hops,
        })
        if not last:
            # interior stages are growth phases: keep the expansion on for
            # every sweep (the settle/polish phases belong to the final stage)
            stage_opts.setdefault('settle_sweeps', 0)
        chi_prev = chi_s
        logger.info("device_ramp stage %d: chi -> %d (%d sweeps)",
                    k + 1, chi_s, stage_opts['n_sweeps'])
        if eng is None:
            eng = DeviceSweepEngine(psi, model, stage_opts)
        else:
            # stay device-resident across the stage boundary: re-embed the
            # packed state + environments into the new capacity layouts
            eng = DeviceSweepEngine.from_engine(eng, stage_opts)
        eng._write_back_on_run = last   # interior stages skip write_back
        eng.run()
        if all_stats is None:
            all_stats = {k2: list(v) for k2, v in eng.sweep_stats.items()}
        else:
            for k2, v in eng.sweep_stats.items():
                all_stats[k2].extend(v)
    eng.sweep_stats = all_stats
    return eng


@jax.jit
def _bond0_transition(A_old, A_new):
    """Exact old->new bond-0 basis transition from the leftward wrap update.

    In an iDMRG sweep the leftward pass's first update (sites ``(L-1, 0)``)
    rewrites bond 0: its input ``Ap[L-1]`` (from the rightward wrap update)
    and its output ``Ap[L-1]`` share their ``vL`` basis *exactly* (same
    sweep, same ``LP``), while their ``vR`` legs carry bond 0 in the old
    (rightward) and new (leftward) bases respectively.  The overlap

        ``M0[a, b] = sum_{vL,p} conj(A_old[vL,p,a]) A_new[vL,p,b]
                   = <bond0_old:a | bond0_new:b>``

    is therefore the exact (up to truncation) transition between the two
    bases — computable *within one sweep*, with no cross-sweep slot
    identification (which breaks under degenerate Schmidt multiplets: the
    basis inside a multiplet rotates freely between sweeps).  It re-gauges
    the final site-0 A-tensor for a seam-consistent mixed-canonical
    write-back (see :meth:`DeviceSweepEngine.write_back`; VERDICT r2 item 6).
    """
    return pk.tensordot(A_old.conj(), A_new, axes=(['vL*', 'p*'], ['vL', 'p']))


def _env_update_L(LP, A, W):
    """LP' strictly left of site i+1 from LP (left of i), A-form tensor, MPO W.

    LP legs (vR*, wR, vR); A legs (vL, p, vR); W legs (wL, wR, p, p*)."""
    x = pk.tensordot(LP, A, axes=(['vR'], ['vL']))            # vR* wR p vR
    x = pk.tensordot(x, W, axes=(['wR', 'p'], ['wL', 'p*']))  # vR* vR wR p
    x = pk.tensordot(x, A.conj(), axes=(['vR*', 'p'], ['vL*', 'p*']))
    return x.transpose(['vR*', 'wR', 'vR'])


def _env_update_R(RP, B, W):
    """RP' strictly right of site i-1 from RP (right of i), B-form tensor, W.

    RP legs (wL, vL, vL*); B legs (vL, p, vR)."""
    x = pk.tensordot(B, RP, axes=(['vR'], ['vL']))            # vL p wL vL*
    x = pk.tensordot(x, W, axes=(['wL', 'p'], ['wR', 'p*']))  # vL vL* wL p
    x = pk.tensordot(x, B.conj(), axes=(['vL*', 'p'], ['vR*', 'p*']))
    return x.transpose(['wL', 'vL', 'vL*'])


def capacity_bond_layouts(psi, chi_max, multiple, cap_factor=1.3,
                          total_cap_factor=1.5, finite=None, n_hops=2):
    """Fixed padded capacity bond layouts for a device-resident engine.

    ``bond[i]`` is the (qconj=+1) vL leg of site ``i`` padded to bucket
    multiples; interior bonds are widened to every ``n_hops``-update-reachable
    charge sector with per-sector capacity grown by ``cap_factor`` and the
    total capacity budgeted to ``total_cap_factor * chi_max`` (many-sector
    U(1)^2 layouts explode otherwise).  ``n_hops`` > 2 lets a ramp stage
    populate charge sectors further from the current state's (each widening
    pass folds the neighbors' previous pass in, one update-reachability hop
    per pass).  Shared by :class:`DeviceSweepEngine` and
    :class:`~tenpy_tpu.algorithms.packed_tebd.DeviceTEBDEngine`.

    Returns ``(bond, psi_leg)``: the capacity layouts and the unpadded legs.
    """
    L = psi.L
    if finite is None:
        finite = psi.bc == 'finite'
    n_bonds = L + 1 if finite else L
    psi_leg = []
    for i in range(n_bonds):
        if finite and i == L:
            leg = psi.get_B(L - 1, 'B').get_leg('vR').conj()
        else:
            leg = psi.get_B(i % L, 'B').get_leg('vL')
        if leg.qconj != 1:
            leg = leg.conj()
        psi_leg.append(leg)
    p_legs = [psi.get_B(i, None).get_leg('p') for i in range(L)]
    qtot = [np.asarray(psi.get_B(i, None).qtotal, QTYPE) for i in range(L)]
    bond = _capacity_layouts(psi_leg, p_legs, qtot, chi_max, multiple,
                             cap_factor, total_cap_factor, finite, n_hops)
    return bond, psi_leg


def _capacity_layouts(cur_legs, p_legs, qtot, chi_max, multiple, cap_factor,
                      total_cap_factor, finite, n_hops=2):
    """Core of :func:`capacity_bond_layouts`, from explicit current legs.

    ``cur_legs[i]``: the current (unpadded, qconj=+1) bond legs — from a host
    MPS or from a running engine's kept Schmidt directions (stage regrow)."""
    L = len(p_legs)
    chinfo = cur_legs[0].chinfo

    def _bond(i, bond_list):
        return bond_list[i if finite else i % L]

    bond = [pad_leg(leg, multiple)[0] for leg in cur_legs]
    interior = (list(range(1, L)) if finite else list(range(1, L)) + [0])
    # >= two passes: capacities are clipped by min(rows, cols) computed from
    # the *neighbor* layouts, so neighbors must be widened first for a
    # growth-capable (chi-ramp) layout; more passes = more reachability hops
    for i in interior * max(2, int(n_hops)):
        iL, iR = (i - 1) % L, i % L
        cur = cur_legs[i if finite else i % L]
        hint = {}
        floor = {}
        for s in range(cur.block_number):
            q = tuple(np.asarray(cur.charges[s], QTYPE))
            n = int(cur.slices[s + 1] - cur.slices[s])
            hint[q] = int(np.ceil(n * cap_factor))
            floor[q] = n
        theta_legs = (_bond(i - 1, bond), p_legs[iL], p_legs[iR],
                      _bond(i + 1, bond).conj())
        qtotal_th = chinfo.make_valid(qtot[iL] + qtot[iR])
        bond[i if finite else i % L] = ps.bond_layout(
            theta_legs, qtotal_th, qtot[iL], cap_hint=hint, cap_floor=floor,
            chi_cap=chi_max, multiple=multiple,
            total_cap=int(np.ceil(total_cap_factor * chi_max)))
    return bond


def pack_S_from_leg(S_host, leg, bond):
    """A bond-S vector (in ``leg`` order) padded into ``bond``-layout order."""
    out = np.zeros(int(bond.slices[-1]))
    pos = {tuple(np.asarray(bond.charges[b], QTYPE)): b
           for b in range(bond.block_number)}
    for s in range(leg.block_number):
        b = pos.get(tuple(np.asarray(leg.charges[s], QTYPE)))
        if b is None:
            continue
        n = min(int(leg.slices[s + 1] - leg.slices[s]),
                int(bond.slices[b + 1] - bond.slices[b]))
        out[int(bond.slices[b]):int(bond.slices[b]) + n] = \
            S_host[int(leg.slices[s]):int(leg.slices[s]) + n]
    return jnp.asarray(out)


def pack_bond_S(psi, i, bond, finite):
    """Bond S as a flat padded device vector in bond-layout order."""
    L = psi.L
    if finite and i == L:
        S_host = np.asarray(psi.get_SR(L - 1))
        leg = psi.get_B(L - 1, 'B').get_leg('vR').conj()
    else:
        S_host = np.asarray(psi.get_SL(i % L))
        leg = psi.get_B(i % L, 'B').get_leg('vL')
    if leg.qconj != 1:
        leg = leg.conj()
    return pack_S_from_leg(S_host, leg, bond)


class DeviceSweepEngine:
    """Device-resident two-site DMRG sweeps starting from a ramped MPS.

    Parameters
    ----------
    psi : MPS
        Finite or infinite MPS in canonical form (the host ramp's output).
        Updated in place by :meth:`run` (via :meth:`write_back`).
    model : MPOModel
    options : dict
        chi_max : int — bond cap for truncation.
        svd_min : float — relative Schmidt-value cutoff (default 1e-10).
        lanczos_K : int — fused Lanczos steps per update (default 10).
        n_sweeps : int — sweeps to run (default 10).
        backend : str — device decomposition backend (see packed_split).
        multiple : int — bucket multiple for padded virtual legs (default 64).
        e_tol : float — stop early when |Delta E| per sweep drops below this.
        mixer : bool — device subspace expansion (default True): environments
            couple to every capacity direction so chi grows by the full spare
            capacity per sweep (see module docstring).
    """

    def __init__(self, psi, model, options, _regrow_from=None):
        self.psi = psi
        self.model = model
        opts = dict(options)
        self.chi_max = int(opts.get('chi_max', max(psi.chi)))
        self.svd_min = float(opts.get('svd_min', 1e-10))
        self.K = int(opts.get('lanczos_K', 10))
        self.n_sweeps = int(opts.get('n_sweeps', 10))
        self.backend = opts.get('backend', None)
        self.multiple = int(opts.get('multiple', BUCKET_MULTIPLE))
        self.e_tol = float(opts.get('e_tol', 0.))
        # cap_factor/n_hops extrapolate per-sector capacity by the *growth
        # ratio* chi_max / max(psi.chi): from a small seed state the layout
        # must reserve room proportional to the target per sector (the mixer
        # then saturates it within ~2 sweeps), and sector reachability must
        # widen with the growth depth — a fixed 1.3x hint starves the layout
        # and chi stalls far below chi_max (VERDICT r4 item 1).
        cur_chi = max(1, max(psi.chi, default=1))
        ratio = max(1., self.chi_max / cur_chi)
        self.cap_factor = float(opts.get('cap_factor', max(1.3, 1.3 * ratio)))
        # hard budget on a bond's total padded capacity, as a multiple of
        # chi_max: without it, widened U(1)^2 layouts explode (many sectors
        # x min-bucket padding -> multi-GB plans)
        self.total_cap_factor = float(opts.get('total_cap_factor', 1.5))
        self.n_hops = int(opts.get(
            'n_hops', max(2, int(np.ceil(np.log2(ratio))) + 1)))
        self.uniform_bonds = bool(opts.get('uniform_bonds', True))
        # device mixer: subspace expansion inside the jitted update — keep
        # every capacity slot's orthonormal singular direction in A/B (with
        # zero S below the truncation threshold) so the environments couple
        # to the full capacity and chi saturates in ~2 sweeps instead of
        # growing by only the above-threshold SVD tail (~20/sweep).  Plays
        # the role of the reference's mixers (tenpy/algorithms/
        # mps_common.py:1547-2203) on the static-shape layout; free in FLOPs
        # (the zero columns were already being multiplied).
        self.mixer = bool(opts.get('mixer', True))
        # The expansion keeps re-injecting weight into spare-capacity
        # directions that the *next* update truncates again — at convergence
        # the state churns at the mixer-weight amplitude (~sqrt(err)) and
        # write_back would inherit that as seam drift (measured 2e-4
        # norm_test on an 8x single-stage ramp).  Like the reference's
        # mixer deactivation (tenpy/algorithms/mps_common.py `disable_after`),
        # the final `settle_sweeps` (+ all polish sweeps) run with the
        # expansion off so the state relaxes onto the fixed kept basis.
        self.settle_sweeps = int(opts.get('settle_sweeps',
                                          2 if self.mixer else 0))
        self.lanczos_P_tol = float(opts.get('lanczos_P_tol', 1e-14))
        # Lanczos cap at the two wrap-seam updates (stale-basis guesses need
        # more iterations; with P_tol early exit the extra cap is ~free once
        # converged)
        # measured: converged seam updates run 20-35 iterations (the stale
        # -basis guess decays slowly through quasi-degenerate H_eff spectra);
        # a cap hit leaves an unconverged Ritz state whose split sprays
        # ~1e-5 truncation junk into the chain (the write-back drift of
        # VERDICT r4 item 2) — cap at 6K so steady-state seams never hit it
        self.K_seam = int(opts.get('lanczos_K_seam', max(6 * self.K, 60)))
        # 'transfer_matrix' (default) | 'naive': how to seed infinite-bc envs
        self.opts_env_init = opts.get('env_init', 'transfer_matrix')
        self.reortho = bool(opts.get('reortho', False))
        # mixed precision (see packed.matmul_mode): Lanczos iterations in
        # reduced-precision GEMMs; the final `polish_sweeps` sweeps rerun in
        # full f64 so the reported energy is the exact variational one
        self.matvec_mode = opts.get('matvec_mode', None)
        self.exact_E = bool(opts.get('exact_E', False))
        self.polish_sweeps = int(opts.get('polish_sweeps',
                                          1 if self.matvec_mode else 0))
        self.log_updates = bool(opts.get('log_updates',
                                         os.environ.get('TENPY_TPU_LOG_UPDATES')))
        self.finite = psi.bc == 'finite'
        self.L = psi.L
        if self.L < 2:
            raise ValueError("DeviceSweepEngine needs L >= 2")
        self.n_bonds = self.L + 1 if self.finite else self.L
        self.sweep_stats = {'sweep': [], 'E': [], 'max_err': [], 'time': [],
                            'mode': [], 'flops_traced': [], 'flops_exec': [],
                            'lanczos_iters': []}
        self._cur_mode = None
        self._cur_expand = self.mixer
        pk.start_transfer_keepalive()   # no-op on CPU
        self._jit_cache = {}
        self._C = None            # center-matrix carry (site of last update)
        self._M0 = None           # bond-0 basis transition (iDMRG seam)
        if _regrow_from is None:
            self._setup()
        else:
            self._setup_from_engine(_regrow_from)

    @classmethod
    def from_engine(cls, old, options):
        """Stage transition for a device-resident chi ramp.

        Build a fresh engine at this ``options``' ``chi_max`` whose packed
        state (B tensors, bond S) *and environments* are the old engine's,
        re-embedded into the new capacity layouts — no host write-back, no
        canonical-form conversions (an ``S^-1`` on ramp-stage noise-floor
        Schmidt values would poison the state), no environment re-init.
        Newly reachable charge sectors enter with exact-zero state/env weight
        and get populated by the sweeps themselves (one reachability hop per
        update), which is what the reference's mixer provides during its
        ``chi_list`` ramp (``tenpy/algorithms/dmrg.py:1142``)."""
        return cls(old.psi, old.model, options, _regrow_from=old)

    # ----------------------------------------------------------- indexing
    def _bond(self, i):
        return self.bond[i if self.finite else i % self.L]

    # ------------------------------------------------------------- setup
    def _setup(self):
        psi, L = self.psi, self.L
        # prefer the real path when possible (complex costs ~3x in GEMMs);
        # genuinely complex states run on split re/im channel storage
        # (PackedArray.data_im — TPU backends have no complex128)
        psi.real_if_close()
        if jnp.issubdtype(psi.dtype, jnp.complexfloating) and \
                not jnp.issubdtype(self.model.H_MPO.dtype,
                                   jnp.complexfloating):
            # real H, real physics: residual imaginary parts are gauge junk
            # from canonicalization eigensolvers; drop them at the truncation
            # noise scale rather than paying the complex path
            psi.real_if_close(tol=1e-6)
            if not jnp.issubdtype(psi.dtype, jnp.complexfloating):
                logger.warning("dropped O(<=1e-6) imaginary gauge junk to "
                               "keep the state on the real device path")
        if jnp.issubdtype(psi.dtype, jnp.complexfloating):
            logger.info("complex state: using split re/im channel storage")
            if self.reortho:
                raise NotImplementedError("reortho unsupported with complex "
                                          "split-channel Lanczos")
        # fixed padded capacity layouts, widened to every one-update-reachable
        # charge sector (weight in a sector outside the layout would be
        # hard-dropped), per-sector capacity grown by cap_factor so the sector
        # distribution can still shift during the fixed-layout sweeps.
        # For translation-invariant infinite problems, regauge the charge
        # bookkeeping and share ONE layout across all bonds: every
        # (site, direction) update then has an identical packed structure and
        # the sweep reuses ~2 compiled XLA programs instead of 2L (the cold
        # -start compile through a remote tunnel is minutes per program).
        self.bond = None
        self._gauge_info = None
        self._H = self.model.H_MPO
        self._orig_sites = list(psi.sites)
        if self.uniform_bonds and not self.finite:
            try:
                info = uniformize_charge_gauge(psi, rescale=True)
                if info is not None:
                    if np.any(info['k'] != 1):
                        # charge units were rescaled: pack (and seed envs
                        # with) a matching rescaled MPO copy; write_back
                        # inverts the whole transformation
                        self._gauge_info = info
                        self._H = scale_mpo_charges(self.model.H_MPO,
                                                    info['k'])
                        logger.info("rescaled U(1) charge units by %s "
                                    "(unit-cell charge not divisible by L)",
                                    list(info['k']))
                    self.bond, _ = uniform_capacity_layout(
                        psi, self.chi_max, self.multiple, self.cap_factor,
                        self.total_cap_factor, self.n_hops)
                    logger.info(
                        "uniform bond layout: %d sectors, capacity %d "
                        "(one compiled program per sweep direction)",
                        self.bond[0].block_number,
                        int(self.bond[0].slices[-1]))
            except ValueError as e:
                logger.info("uniform bond layout not applicable (%s); "
                            "falling back to per-bond layouts", e)
        if self.bond is None:
            self.bond, _ = capacity_bond_layouts(
                psi, self.chi_max, self.multiple, self.cap_factor,
                self.total_cap_factor, self.finite, self.n_hops)

        self.Bp = []
        self.Wp = []
        self.qtotal_site = []
        for i in range(L):
            B = psi.get_B(i, 'B').transpose(['vL', 'p', 'vR'])
            self.qtotal_site.append(
                tuple(int(x) for x in np.asarray(B.qtotal, QTYPE).ravel()))
            self.Bp.append(self._pack_site(B, i))
            W = self._H.get_W(i).transpose(['wL', 'wR', 'p', 'p*'])
            self.Wp.append(pk.pack(W, pad=False))
        self.Sp = [self._pack_S(i) for i in range(self.n_bonds)]
        self.Ap = [None] * L

        # environments via the host machinery (one-time init).  For infinite
        # bc, naive (age-0, IdL-seeded) environments make H_eff the WRONG
        # operator for many sweeps — its ground state differs from the
        # converged theta at O(1) until the envs age in (measured: the first
        # seam-free update on a converged chi=128 Hubbard state rewrote the
        # bond spectrum entirely, and 8 sweeps still left a 2e-5 energy
        # offset).  Seed with the MPO transfer-matrix fixed point instead,
        # exactly like the reference's resume/segment flows
        # (tenpy/networks/mpo.py find_init_LP_RP).
        from ..networks.mpo import MPOEnvironment, MPOTransferMatrix
        init_env_data = {}
        if not self.finite and self.opts_env_init == 'transfer_matrix':
            try:
                init_env_data = MPOTransferMatrix.find_init_LP_RP(
                    self._H, psi)
            except (ValueError, NotImplementedError) as e:
                logger.warning("transfer-matrix env init failed (%s); "
                               "falling back to age-0 environments", e)
        env = MPOEnvironment(psi, self._H, psi, **init_env_data)
        self.LPp = [None] * L
        self.RPp = [None] * L
        self.LPp[0] = self._pack_env(env.get_LP(0), 0, 'L')
        for i in range(L - 1, -1, -1):
            self.RPp[i] = self._pack_env(env.get_RP(i),
                                         i + 1 if self.finite else (i + 1) % L,
                                         'R')

    def _setup_from_engine(self, old):
        """Regrow: adopt the old engine's device state/envs in new layouts.

        Every tensor on bond ``i`` is pruned by the *same* keep mask (the
        final S > 0 slots) and re-embedded sector-prefix-wise, so relative
        slot alignment between state and environments is preserved exactly;
        dropped slots carry exact-zero state weight by the engine's design.
        Stays form-conversion-free (no S^-1 anywhere).
        """
        L, finite = self.L, self.finite
        if (old.L, old.finite) != (L, finite):
            raise ValueError("from_engine: psi/model mismatch")
        # the stage transition stays in the old engine's charge frame
        self._gauge_info = old._gauge_info
        self._H = old._H
        self._orig_sites = old._orig_sites
        with pk.transfer_guard():
            Ss = [np.asarray(jax.device_get(s)) for s in old.Sp]
        keeps = []
        for S in Ss:
            keep = S > 0.
            if not keep.any():
                keep[0] = True
            keeps.append(keep)
        kept_legs = [old._bond(i).project(keeps[i])[2]
                     for i in range(self.n_bonds)]
        p_legs = [old.Bp[i].legs[1] for i in range(L)]
        self.qtotal_site = list(old.qtotal_site)
        qtot = [np.asarray(q, QTYPE) for q in self.qtotal_site]
        self.bond = _capacity_layouts(
            kept_legs, p_legs, qtot, self.chi_max, self.multiple,
            self.cap_factor, self.total_cap_factor, finite, self.n_hops)

        def keepm(i):
            return keeps[i if finite else i % L]

        def reembed(p_arr, ax_bonds):
            """unpack -> prune by keep masks -> embed into new layout -> pack.

            ``ax_bonds``: dict label -> (bond index, conj?)."""
            T = pk.unpack(p_arr)
            grow = {}
            for lab, (bi, conj) in ax_bonds.items():
                T = T.iproject(keepm(bi), T.get_leg_index(lab))
                grow[lab] = self._bond(bi).conj() if conj else self._bond(bi)
            return pk.pack(embed_array(T, grow), pad=False)

        self.Wp = list(old.Wp)   # layout-independent (wL/wR/p legs only)
        self.Bp = [reembed(old.Bp[i], {'vL': (i, False), 'vR': (i + 1, True)})
                   for i in range(L)]
        self.Sp = [pack_S_from_leg(Ss[i][keeps[i]], kept_legs[i],
                                   self._bond(i)) for i in range(self.n_bonds)]
        self.LPp = [reembed(old.LPp[i], {'vR*': (i, False), 'vR': (i, True)})
                    if old.LPp[i] is not None else None for i in range(L)]
        self.RPp = [reembed(old.RPp[i], {'vL': (i + 1, False),
                                         'vL*': (i + 1, True)})
                    if old.RPp[i] is not None else None for i in range(L)]
        self.Ap = [None] * L
        # C is dropped: sweep() re-seeds from S[0] . B[0] (one slightly
        # worse theta guess per stage; avoids cross-pass slot-mask edge
        # cases on the old C's vL basis)
        self._C = None

    def _pack_site(self, B, i):
        padded = embed_array(B, {'vL': self._bond(i),
                                 'vR': self._bond(i + 1).conj()})
        return pk.pack(padded, pad=False)

    def _pack_S(self, i):
        return pack_bond_S(self.psi, i, self._bond(i), self.finite)

    def _pack_env(self, E, i, side):
        if side == 'L':
            E = E.transpose(['vR*', 'wR', 'vR'])
            # 'vR' contracts theta's vL (qconj +1) -> conj layout; 'vR*' +1
            padded = {'vR*': self._bond(i), 'vR': self._bond(i).conj()}
        else:
            E = E.transpose(['wL', 'vL', 'vL*'])
            padded = {'vL': self._bond(i), 'vL*': self._bond(i).conj()}
        return pk.pack(embed_array(E, padded), pad=False)

    # ---------------------------------------------------------- jitted step
    def _get_step(self, move_right, plan, sig, K=None):
        mode = self._cur_mode
        expand = self._cur_expand
        K = self.K if K is None else K
        key = (move_right, id(plan), sig, mode, K, expand)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        fn = self._build_step(move_right, plan, mode, K, expand)
        self._jit_cache[key] = fn
        return fn

    def _build_step(self, move_right, plan, mode, K, expand):
        chi, smin, backend = self.chi_max, self.svd_min, self.backend
        P_tol, reortho = self.lanczos_P_tol, self.reortho
        exact_E = self.exact_E
        # exact executed-FLOP accounting (VERDICT r4 item 6): the program's
        # traced GEMM FLOPs assume K Lanczos iterations; the while_loop exits
        # early, so executed = step - (K - N_used) * matvec.  Recorders fill
        # on the first trace only (jit retraces would double-count).
        rec_step = pk.FlopRecorder()
        rec_mv = pk.FlopRecorder()

        def step(LP, RP, W0, W1, C, N):
            fresh = rec_step.flops == 0          # trace-time python check
            from contextlib import nullcontext
            with pk.flop_record(rec_step) if fresh else nullcontext():
                if move_right:
                    th0 = pk.tensordot(C.replace_labels(['p'], ['p0']),
                                       N.replace_labels(['p'], ['p1']),
                                       axes=(['vR'], ['vL']))
                else:
                    th0 = pk.tensordot(N.replace_labels(['p'], ['p0']),
                                       C.replace_labels(['p'], ['p1']),
                                       axes=(['vR'], ['vL']))
                W0m = W0.replace_labels(['p', 'p*'], ['p0', 'p0*'])
                W1m = W1.replace_labels(['p', 'p*'], ['p1', 'p1*'])
                E0, th, n_iter, _ = _lanczos_K_2site_packed_impl(
                    LP, RP, W0m, W1m, th0, K, P_tol, 2, reortho, mode,
                    exact_E, flop_rec=rec_mv if fresh else None)
                A, S, B, err, renorm, n_kept = ps.split_truncate(
                    th, plan, chi, smin, backend, expand=expand)
                if move_right:
                    Cn = ps.scale_bond(B, S, ps.scale_bond_plan(B, 'vL'))
                    ENVn = _env_update_L(LP, A, W0)
                else:
                    Cn = ps.scale_bond(A, S, ps.scale_bond_plan(A, 'vR'))
                    ENVn = _env_update_R(RP, B, W1)
            return E0, A, S, B, Cn, ENVn, err, n_kept, n_iter

        fn = jax.jit(step)
        fn._flop_recs = (rec_step, rec_mv, K)
        return fn

    def precompile(self, include_polish=True):
        """AOT-compile the sweep's site-update programs, in parallel.

        With the uniform bond layout an infinite sweep reuses ONE program
        per (direction, Lanczos cap, precision mode); a cold start through a
        remote-attached TPU costs minutes of XLA compile per program, and
        the compiles are mutually independent — so build them here and warm
        each one on a thread pool, installing the jitted callables into the
        engine's jit cache.  Warming goes through the normal jit dispatch
        (one throwaway execution per program) rather than AOT
        ``lower().compile()``: only the dispatch path consults the JAX
        persistent compilation cache (measured: AOT recompiles ~5 min/program
        through the axon tunnel on entries the dispatch path hits instantly).
        Returns the number of programs compiled.  No-op (returns 0) for
        finite bc (site-dependent structures) or a non-uniform layout.
        """
        if self.finite or len(set(self.bond)) > 1:
            return 0
        if self._C is None:
            self._C = ps.scale_bond(self.Bp[0], self.Sp[0],
                                    ps.scale_bond_plan(self.Bp[0], 'vL'))
        # phase combos actually used by run(): (mode, expand)
        combos = [(self.matvec_mode, self.mixer)]
        if self.mixer and self.settle_sweeps:
            combos.append((self.matvec_mode, False))
        if include_polish and self.matvec_mode and self.polish_sweeps:
            combos.append((None, False))
        combos = list(dict.fromkeys(combos))
        Ks = {None, self.K_seam}
        L = self.L
        jobs = []   # (cache_key, lowered)
        saved_mode, saved_expand = self._cur_mode, self._cur_expand
        try:
            for mode, expand in combos:
                self._cur_mode = mode
                self._cur_expand = expand
                for move_right in (True, False):
                    for K in Ks:
                        # structural stand-ins: with the uniform gauge, A- and
                        # B-tensors (and every bond's env) share one packed
                        # structure, so site-0 arrays trace for every site
                        LP, RP = self.LPp[0], self.RPp[1 % L]
                        W0, W1 = self.Wp[0], self.Wp[1 % L]
                        C, N = self._C, self.Bp[1 % L]
                        struct = self._theta_struct(C, N, move_right)
                        plan = ps.split_plan(struct, self._bond(1),
                                             self.qtotal_site[0])
                        Kv = self.K if K is None else K
                        key = (move_right, id(plan),
                               (C.struct_sig(), N.struct_sig()), mode, Kv,
                               expand)
                        if key in self._jit_cache or \
                                any(key == j[0] for j in jobs):
                            continue
                        fn = self._build_step(move_right, plan, mode, Kv,
                                              expand)
                        jobs.append((key, fn, (LP, RP, W0, W1, C, N)))
        finally:
            self._cur_mode = saved_mode
            self._cur_expand = saved_expand
        if not jobs:
            return 0
        from concurrent.futures import ThreadPoolExecutor
        t0 = time.time()

        def warm(job):
            _, fn, args = job
            out = fn(*args)          # dispatch-path compile (+ one execution)
            jax.block_until_ready(out)
            return fn

        with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
            warmed = list(ex.map(warm, jobs))
        for (key, _, _), fn in zip(jobs, warmed):
            self._jit_cache[key] = fn
        # keep (key, fn, example_args) around: bench/tests pin the traced
        # FLOP counter against XLA's cost analysis of the compiled program
        # (VERDICT r4 item 6)
        self._programs = [(key, fn, args) for (key, fn, args) in jobs]
        logger.info("precompiled %d sweep programs in %.1fs (parallel)",
                    len(jobs), time.time() - t0)
        return len(jobs)

    def xla_cost_analysis_flops(self):
        """XLA's own FLOP count per precompiled sweep program.

        Pins the trace-time GEMM counter against the compiler's cost
        analysis of the actual compiled executable (VERDICT r4 item 6):
        returns ``[(key, xla_flops, traced_gemm_flops)]`` for every program
        kept by :meth:`precompile`.  Note XLA counts *all* ops and a
        ``while_loop`` body only once, so compare at ``lanczos_K=1`` (or
        accept the K-fold gap for the Lanczos scan).
        """
        out = []
        for key, fn, args in getattr(self, '_programs', []):
            ca = fn.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            rec_step, _, _ = fn._flop_recs
            out.append((key, float(ca.get('flops', 0.)), rec_step.flops))
        return out

    def _theta_struct(self, C, N, move_right):
        """Structure-only PackedArray of ``C . N`` (for plan construction)."""
        thL = (C if move_right else N).replace_labels(['p'], ['p0'])
        thR = (N if move_right else C).replace_labels(['p'], ['p1'])
        out_legs = (thL.legs[0], thL.legs[1], thR.legs[1], thR.legs[2])
        chinfo = out_legs[0].chinfo
        qtotal = tuple(int(x) for x in chinfo.make_valid(
            np.asarray(thL.qtotal, QTYPE) + np.asarray(thR.qtotal, QTYPE)))
        shapes, qdatas = pk.complete_structure(out_legs, qtotal)
        return pk.PackedArray(out_legs, qtotal, ('vL', 'p0', 'p1', 'vR'),
                              shapes, qdatas, [None] * len(shapes), C.dtype)

    # ------------------------------------------------------------- updates
    def _update(self, i0, move_right, K=None):
        self._t_update = time.time()
        L = self.L
        iL, iR = i0 % L, (i0 + 1) % L
        LP = self.LPp[iL]
        RP = self.RPp[iR]
        W0, W1 = self.Wp[iL], self.Wp[iR]
        N = self.Bp[iR] if move_right else self.Ap[iL]
        C = self._C
        struct = self._theta_struct(C, N, move_right)
        bond_mid = i0 + 1 if self.finite else (i0 + 1) % L
        plan = ps.split_plan(struct, self._bond(i0 + 1),
                             self.qtotal_site[iL])
        step = self._get_step(move_right, plan,
                              (C.struct_sig(), N.struct_sig()), K=K)
        E0, A, S, B, Cn, ENVn, err, n_kept, n_iter = step(LP, RP, W0, W1,
                                                          C, N)
        self._upd_flops.append((step._flop_recs, n_iter))
        self.Ap[iL] = A
        self.Bp[iR] = B
        self.Sp[bond_mid] = S
        if self.log_updates:
            with pk.transfer_guard():
                E0h, errh = float(jax.device_get(E0)), float(jax.device_get(err))
            logger.info("  update (%d,%d) %s: E0=%.12f err=%.2e (%.1fs)",
                        iL, iR, 'R' if move_right else 'L', E0h, errh,
                        time.time() - self._t_update)
        if move_right:
            self.LPp[iR] = ENVn
        else:
            self.RPp[iL] = ENVn
        self._C = Cn
        # stay async: jax dispatch queues the whole sweep on the device;
        # the scalars are fetched once per sweep (each device_get through
        # the axon tunnel is a full round trip — 16 per sweep would
        # serialize the pipeline)
        return E0, err

    # --------------------------------------------------------------- sweep
    def sweep(self):
        L = self.L
        Es, errs = [], []
        self._upd_flops = []
        if self._C is None:   # very first sweep: C = S[0] . B[0]
            self._C = ps.scale_bond(self.Bp[0], self.Sp[0],
                                    ps.scale_bond_plan(self.Bp[0], 'vL'))
        n_each = L - 1 if self.finite else L
        for j in range(n_each):                        # rightward
            # seam: the rightward wrap update's guess N = Bp[0] carries a
            # vR basis one half-sweep older than RPp[0]'s (the leftward pass
            # rewrote bond 1 after Bp[0] was written).  H_eff itself is
            # consistent (all open legs match the envs); only the *guess*
            # is partly junk, so give the wrap a deeper Lanczos cap.
            K = self.K_seam if (not self.finite and j == n_each - 1) else None
            E, err = self._update(j, True, K=K)
            Es.append(E)
            errs.append(err)
        A_wrap_old = self.Ap[(L - 1) % L]   # rightward wrap output (vR: old bond 0)
        for j in range(n_each):                        # leftward
            # the final leftward update's theta guess is one of the seam
            # updates whose guess enters in a stale basis (its N = Ap[0]
            # predates this sweep's LPp[0]); deepen its Lanczos cap so the
            # guess junk decays below truncation instead of slowly poisoning
            # the iMPS (the P_tol early exit keeps converged sweeps cheap)
            K = self.K_seam if (not self.finite and j == n_each - 1) else None
            E, err = self._update(n_each - 1 - j, False, K=K)
            if j == 0 and not self.finite:
                # the leftward wrap update just rewrote bond 0; record the
                # exact old->new basis transition for write_back
                self._M0 = _bond0_transition(A_wrap_old, self.Ap[(L - 1) % L])
            Es.append(E)
            errs.append(err)
        with pk.transfer_guard():   # one sync for the whole sweep
            Es, errs, n_iters = jax.device_get(
                (Es, errs, [n for _, n in self._upd_flops]))
        # exact executed GEMM FLOPs of this sweep: per update, the traced
        # program assumes K Lanczos iterations but executed N (early exit)
        self._sweep_iters = [int(n) for n in n_iters]
        self._sweep_flops_exec = sum(
            recs[0].flops - (recs[2] - int(n)) * recs[1].flops
            for (recs, _), n in zip(self._upd_flops, n_iters))
        return float(Es[-1]), float(max(errs))

    def run(self):
        E_prev = None
        # three phases: expansion sweeps (mixer) -> settle sweeps (expansion
        # off, reduced precision) -> polish sweeps (expansion off, full f64)
        n_p = min(self.polish_sweeps, self.n_sweeps)
        n_settle = (min(self.settle_sweeps, self.n_sweeps - n_p)
                    if self.mixer else 0)
        bounds = [self.n_sweeps - n_p - n_settle, self.n_sweeps - n_p,
                  self.n_sweeps]
        sw = 0
        while sw < self.n_sweeps:
            ph = 0 if sw < bounds[0] else (1 if sw < bounds[1] else 2)
            self._cur_mode = self.matvec_mode if ph < 2 else None
            self._cur_expand = self.mixer and ph == 0
            t0 = time.time()
            E, max_err = self.sweep()
            dt = time.time() - t0
            self.sweep_stats['sweep'].append(sw + 1)
            self.sweep_stats['E'].append(E)
            self.sweep_stats['max_err'].append(max_err)
            self.sweep_stats['time'].append(dt)
            self.sweep_stats['mode'].append(self._cur_mode or 'f64')
            # cumulative trace-time GEMM FLOPs: programs trace once (on their
            # first sweep), so the delta across a phase's first sweep is that
            # phase's FLOPs-per-sweep — the MFU numerator (bench_northstar.py)
            self.sweep_stats['flops_traced'].append(pk.FLOPS_TRACED)
            # exact executed GEMM FLOPs (early-exit-corrected) — the MFU
            # numerator (VERDICT r4 item 6)
            self.sweep_stats['flops_exec'].append(self._sweep_flops_exec)
            self.sweep_stats['lanczos_iters'].append(self._sweep_iters)
            logger.info("device sweep %d (%s): E0=%.14f max_err=%.2e (%.2fs)",
                        sw + 1, self._cur_mode or 'f64', E, max_err, dt)
            converged = (E_prev is not None and self.e_tol > 0
                         and abs(E - E_prev) < self.e_tol)
            E_prev = E
            sw += 1
            if converged:
                if ph == 2 or sw >= self.n_sweeps:
                    break
                sw = max(sw, bounds[ph])   # converged early: next phase
                E_prev = None              # E jumps at the phase switch
        # tail guard: an unconverged seam Lanczos occasionally sprays ~1e-5
        # truncation junk into one sweep (see K_seam note); if that was one
        # of the final sweeps the write-back would inherit it — heal with up
        # to 2 extra sweeps at the final phase's settings
        errs = self.sweep_stats['max_err']
        for _ in range(2):
            if len(errs) < 5:
                break
            med = sorted(errs[-5:-1])[2]
            if errs[-1] <= 10 * max(med, 1e-300):
                break
            logger.info("final sweep max_err %.2e is an outlier (median "
                        "%.2e); healing with an extra sweep", errs[-1], med)
            t0 = time.time()
            E, max_err = self.sweep()
            self.sweep_stats['sweep'].append(len(errs) + 1)
            self.sweep_stats['E'].append(E)
            self.sweep_stats['max_err'].append(max_err)
            self.sweep_stats['time'].append(time.time() - t0)
            self.sweep_stats['mode'].append(self._cur_mode or 'f64')
            self.sweep_stats['flops_traced'].append(pk.FLOPS_TRACED)
            self.sweep_stats['flops_exec'].append(self._sweep_flops_exec)
            self.sweep_stats['lanczos_iters'].append(self._sweep_iters)
        if getattr(self, '_write_back_on_run', True):
            self.write_back()
        return self.sweep_stats['E'][-1], self.psi

    # ----------------------------------------------------------- write-back
    def write_back(self):
        """Unpack the device state into ``self.psi``, pruning zero-S entries.

        After a completed sweep (ending left at bond 1) site 0 holds the
        center: it is written in 'A' form scaled back by S — i.e. we store
        B[0] implicitly through psi's canonical-form handling by writing the
        fresh A[0] tensor with form 'A'.
        """
        psi, L = self.psi, self.L
        with pk.transfer_guard():
            Ss = [np.asarray(jax.device_get(s)) for s in self.Sp]
        keeps = []
        for S in Ss:
            keep = S > 0.
            if not keep.any():
                keep = np.zeros(len(S), bool)
                keep[0] = True
            keeps.append(keep)

        def keepL(i):
            return keeps[i if self.finite else i % L]

        for i in range(L):
            if self.finite and i == 0 and self.Ap[0] is not None:
                T = pk.unpack(self.Ap[0])
                form = 'A'
            elif (not self.finite and i == 0 and self.Ap[0] is not None
                    and self._M0 is not None):
                # iDMRG seam: Bp[0].vR is one generation stale (its bond-1
                # basis predates the final (0,1) update).  Instead of a
                # canonical_form repair, write site 0 in A-form: the final
                # Ap[0] is consistent with Sp[1]/Bp[1] on vR, and its vL is
                # rotated by the exact within-sweep bond-0 transition M0
                # into the basis of Sp[0]/Bp[L-1].vR — a mixed-canonical
                # (A at 0, B elsewhere) chain, exact up to truncation.
                A0 = pk.tensordot(self._M0.conj(), self.Ap[0],
                                  axes=(['vR'], ['vL']))
                A0 = A0.replace_labels(['vR*'], ['vL'])
                T = pk.unpack(A0).itranspose(['vL', 'p', 'vR'])
                form = 'A'
            else:
                T = pk.unpack(self.Bp[i])
                form = 'B'
            T = T.iproject(keepL(i), T.get_leg_index('vL'))
            T = T.iproject(keepL(i + 1), T.get_leg_index('vR'))
            psi.set_B(i, T, form=form)
        for i in range(self.n_bonds):
            if self.finite and i == self.n_bonds - 1:
                psi.set_SR(L - 1, Ss[i][keeps[i]])
            elif i == 0:
                psi.set_SL(0, Ss[0][keeps[0]])
            else:
                psi.set_SL(i, Ss[i][keeps[i]])
        if self._gauge_info is not None:
            # invert the charge-unit rescale exactly: undo the bond-charge
            # gauge shift, divide every charge by k, restore the original
            # Site objects — the state data is untouched (pure relabeling)
            o = self._gauge_info['o']
            if any(np.any(oi != 0) for oi in o):
                _apply_bond_charge_shift(psi, [-oi for oi in o])
            scale_psi_charges(psi, self._gauge_info['k'], div=True)
            psi.sites = list(self._orig_sites)
        if not self.finite:
            # The A-form seam write keeps the mixed-canonical chain
            # consistent to truncation error — measured: the residual
            # plateaus at ~5x the per-update truncation error and does NOT
            # decay with further sweeps (it is the within-sweep basis drift
            # of the unit-cell wrap, inherent to iDMRG).  Re-gauge
            # unconditionally, exactly like the reference's post_run_cleanup
            # (tenpy/algorithms/dmrg.py:402) — this is a gauge choice, not a
            # repair: the physics changes only at the truncation scale.
            err = float(np.max(psi.norm_test()))
            if err > 1e-12:
                logger.info("write_back: norm_test=%.2e (seam drift at the "
                            "truncation scale); re-gauging as in the "
                            "reference's post_run_cleanup", err)
                self.psi.canonical_form()
