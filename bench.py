"""Benchmark: device-resident iDMRG sweep time on the north-star workload.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The problem (BASELINE.json north star): two-site iDMRG on Fermi-Hubbard
(U=8) on an infinite Ly=4 square cylinder — U(1)xU(1) charge structure
(N + Sz) — measured as seconds per full sweep of
:class:`tenpy_tpu.algorithms.packed_dmrg.DeviceSweepEngine`, the production
device-resident sweep engine (whole site update = one jitted XLA program,
sweep state lives in HBM; with the uniform charge gauge the whole sweep
reuses ~2 compiled programs).

Baseline (vs_baseline denominator): the reference tenpy 1.1.0
TwoSiteDMRGEngine (combine=True) on the same model/state/protocol, measured
on this machine's CPU (single core, OpenBLAS — this image has no MKL and no
Cython, see PERF.md): 23.54 s/sweep at chi=256 (2026-08-17, via
``bench_northstar.py ref 256``).  vs_baseline > 1 means we beat the
measured reference sweep.

Wall-clock budget (BENCH_BUDGET_S, default 450 s): the full TPU protocol is
attempted in a subprocess; if it cannot finish inside its budget share (e.g.
the XLA compile cache is cold and every program compiles through the remote
tunnel), bench degrades — honestly, stating what was measured — to
(2) a single-program TPU matvec benchmark, then (3) the CPU host-path sweep.
An honest smaller number always beats a timeout with no output.

The benchmark state is shipped in ``tests/benchmark_data/`` (host-ramped
iDMRG state); the full north-star ladder lives in BENCH_NORTHSTAR.json /
PERF.md.
"""

import gzip
import json
import os
import pickle
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_SWEEP_S = 23.54          # measured, see module docstring
REF_MATVEC_MS = 21.87        # reference CPU two-site effH matvec, same regime
                             # (PERF.md round 2, bench_packed protocol)
CHI = int(os.environ.get('BENCH_CHI', '256'))
N_SWEEPS = int(os.environ.get('BENCH_SWEEPS', '3'))
BUDGET_S = float(os.environ.get('BENCH_BUDGET_S', '450'))
T0 = time.time()
STATE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     'tests', 'benchmark_data', f'hubbard_cyl_chi{CHI}.pkl.gz')


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _setup_jax(cpu=False):
    import jax
    if cpu or os.environ.get('BENCH_CPU'):
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    # persistent compile cache: cold-start programs compiled through the
    # remote tunnel get reused across processes/days (harmless if ignored)
    cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                               os.path.expanduser('~/.cache/jax_xla'))
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    except Exception as e:              # noqa: BLE001 - cache is best-effort
        log(f"bench: persistent compile cache unavailable ({e})")
    return jax


def _load_model_state():
    from tenpy_tpu.models.hubbard import FermiHubbardModel
    m = FermiHubbardModel({'lattice': 'Square', 'Lx': 2, 'Ly': 4,
                           'bc_y': 'cylinder', 'bc_MPS': 'infinite',
                           't': 1., 'U': 8., 'mu': 0.})
    with gzip.open(STATE, 'rb') as f:
        psi = pickle.load(f)
    psi.real_if_close()
    return m, psi


def emit(metric, value, unit, vs_baseline):
    print(json.dumps({'metric': metric, 'value': round(value, 3),
                      'unit': unit, 'vs_baseline': round(vs_baseline, 3)}),
          flush=True)


# ------------------------------------------------------------------ rung 1
def rung_sweep():
    """Full device-resident sweep protocol (the real benchmark)."""
    jax = _setup_jax()
    import faulthandler
    faulthandler.dump_traceback_later(max(60., BUDGET_S), repeat=True,
                                      file=sys.stderr)
    from tenpy_tpu.linalg import packed as pk
    from tenpy_tpu.algorithms.packed_dmrg import DeviceSweepEngine
    pk.start_transfer_keepalive()
    m, psi = _load_model_state()
    log(f"bench: backend={jax.default_backend()} chi={CHI} "
        f"state max_chi={max(psi.chi)} t={time.time()-T0:.0f}s")

    # 1 warm-up sweep (pays jit compiles; uniform charge gauge keeps it to
    # ~2 programs; the persistent compile cache keeps reruns warm) +
    # N_SWEEPS timed sweeps, report median.  Production mode: Lanczos
    # iterations in f32-HIGHEST GEMMs (~13x the f64-emulation MXU
    # throughput, see BENCH_TPU_PROBE.json), energy evaluated as the
    # full-f64 Rayleigh quotient of the Ritz state (exact_E) — the
    # reported E0 is the true variational energy.
    eng = DeviceSweepEngine(psi, m, {
        'chi_max': CHI, 'svd_min': 1e-10, 'lanczos_K': 10,
        'lanczos_K_seam': 10,   # one program per direction, not 4
        'n_sweeps': 1 + N_SWEEPS, 'cap_factor': 1.3,
        'matvec_mode': 'f32', 'exact_E': True, 'polish_sweeps': 0})
    log(f"bench: engine set up t={time.time()-T0:.0f}s")
    n = eng.precompile()
    log(f"bench: {n} programs compiled (parallel warm) t={time.time()-T0:.0f}s")
    eng._write_back_on_run = False   # metric is sweep time; skip the host
    eng.run()                        # write-back + re-gauge (~30 s at chi=256)
    times = sorted(eng.sweep_stats['time'][1:])
    median = times[len(times) // 2]
    E = eng.sweep_stats['E'][-1]
    log(f"bench: sweep times {['%.2f' % t for t in eng.sweep_stats['time']]} "
        f"E0={E:.10f}")
    emit(f'iDMRG s/sweep, Hubbard Ly=4 cylinder U(1)xU(1) '
         f'chi={CHI} ({jax.default_backend()})',
         median, 's/sweep (lower is better; vs_baseline = ref_time/our_time)',
         REF_SWEEP_S / median)
    pk.stop_transfer_keepalive()


# ------------------------------------------------------------------ rung 2
def rung_matvec():
    """Single-program fallback: packed two-site effH matvec on the TPU."""
    jax = _setup_jax()
    import faulthandler
    faulthandler.dump_traceback_later(300., repeat=True, file=sys.stderr)
    from tenpy_tpu.linalg import packed as pk
    from tenpy_tpu.algorithms.packed_dmrg import DeviceSweepEngine
    from tenpy_tpu.algorithms.mps_common import _matvec_2site_packed
    from tenpy_tpu.linalg import packed_split as ps
    pk.start_transfer_keepalive()
    m, psi = _load_model_state()
    log(f"bench[matvec]: backend={jax.default_backend()} chi={CHI} "
        f"t={time.time()-T0:.0f}s")
    eng = DeviceSweepEngine(psi, m, {'chi_max': CHI, 'svd_min': 1e-10,
                                     'n_sweeps': 0, 'matvec_mode': 'f32'})
    eng._C = ps.scale_bond(eng.Bp[0], eng.Sp[0],
                           ps.scale_bond_plan(eng.Bp[0], 'vL'))
    C, N = eng._C, eng.Bp[1]
    th = pk.tensordot(C.replace_labels(['p'], ['p0']),
                      N.replace_labels(['p'], ['p1']), axes=(['vR'], ['vL']))
    LP, RP = eng.LPp[0], eng.RPp[1]
    W0 = eng.Wp[0].replace_labels(['p', 'p*'], ['p0', 'p0*'])
    W1 = eng.Wp[1].replace_labels(['p', 'p*'], ['p1', 'p1*'])

    import functools

    @functools.partial(jax.jit, static_argnums=())
    def mv(LP, RP, W0, W1, th):
        with pk.matmul_mode('f32'):
            return _matvec_2site_packed(LP, RP, W0, W1, th)

    t0 = time.time()
    out = mv(LP, RP, W0, W1, th)
    jax.block_until_ready(out.data)
    log(f"bench[matvec]: compile+first run {time.time()-t0:.1f}s")
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        out = mv(LP, RP, W0, W1, out)
    jax.block_until_ready(out.data)
    ms = (time.time() - t0) / reps * 1e3
    log(f"bench[matvec]: {ms:.2f} ms/matvec")
    emit(f'two-site effH matvec ms, Hubbard Ly=4 cylinder chi={CHI} '
         f'({jax.default_backend()}; DEGRADED: full-sweep protocol exceeded '
         f'compile budget)',
         ms, 'ms/matvec (lower is better; vs_baseline = ref_ms/our_ms)',
         REF_MATVEC_MS / ms)
    pk.stop_transfer_keepalive()


# ------------------------------------------------------------------ rung 3
def rung_host():
    """Always-works fallback: host-path (numpy + native GEMM) sweep on CPU."""
    _setup_jax(cpu=True)
    from tenpy_tpu.algorithms import dmrg
    m, psi = _load_model_state()
    log(f"bench[host]: CPU host path chi={CHI} t={time.time()-T0:.0f}s")
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': CHI, 'svd_min': 1e-10},
        'max_sweeps': 1, 'min_sweeps': 1, 'N_sweeps_check': 1,
        'mixer': None, 'combine': True})
    t0 = time.time()
    eng.run()
    dt = time.time() - t0
    log(f"bench[host]: {dt:.2f} s/sweep")
    emit(f'iDMRG s/sweep, Hubbard Ly=4 cylinder chi={CHI} (CPU host path; '
         f'DEGRADED: TPU rungs exceeded budget)',
         dt, 's/sweep (lower is better; vs_baseline = ref_time/our_time)',
         REF_SWEEP_S / dt)


# ------------------------------------------------------------------ driver
def _run_child(rung, timeout):
    """Run one rung in a subprocess; forward its JSON line on success."""
    log(f"bench: rung '{rung}' (budget {timeout:.0f}s)")
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--rung', rung],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired as e:
        log(f"bench: rung '{rung}' timed out after {timeout:.0f}s")
        if e.stderr:
            err = e.stderr if isinstance(e.stderr, str) else \
                e.stderr.decode(errors='replace')
            log(err[-3000:])
        return False
    if res.stderr:
        log(res.stderr[-4000:])
    line = None
    for ln in (res.stdout or '').splitlines():
        ln = ln.strip()
        if ln.startswith('{'):
            line = ln
    if res.returncode == 0 and line:
        print(line, flush=True)
        return True
    log(f"bench: rung '{rung}' failed rc={res.returncode}")
    return False


def main():
    remaining = lambda: BUDGET_S - (time.time() - T0)    # noqa: E731
    # rung 1 gets the budget minus a reserve for the fallbacks (the host
    # rung needs ~120 s: model + state load + ONE chi=256 sweep)
    if _run_child('sweep', max(60., remaining() - 130.)):
        return
    if remaining() > 220. and _run_child('matvec',
                                         max(60., remaining() - 130.)):
        return
    rung_host()


if __name__ == '__main__':
    rc = 0
    try:
        if len(sys.argv) > 2 and sys.argv[1] == '--rung':
            {'sweep': rung_sweep, 'matvec': rung_matvec,
             'host': rung_host}[sys.argv[2]]()
        else:
            main()
    except BaseException:
        import traceback
        traceback.print_exc()
        rc = 1
    # the axon tunnel's client teardown can abort the interpreter (daemon
    # transfer threads racing runtime destructors); by now the JSON line is
    # out — exit hard, skipping interpreter teardown entirely.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)
