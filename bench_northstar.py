"""North-star benchmark: Hubbard-cylinder iDMRG sweep time (BASELINE.json).

Model: Fermi-Hubbard on an infinite Ly=4 square-lattice cylinder (U(1)xU(1)
charge structure: particle number + Sz), two-site iDMRG, Lanczos K=10 — the
``chi=2048 Hubbard-cylinder iDMRG sweep`` of BASELINE.json.

Environment constraints (documented, affects the denominator):
- this image exposes ONE CPU core (sched_getaffinity=1) and ships no Cython
  and no MKL, so "multithreaded-MKL TeNPy" cannot exist here; the reference
  denominator is tenpy 1.1.0 pure-Python + single-thread OpenBLAS, measured
  at the chi values where a sweep finishes in reasonable wall time, with a
  chi^3 fit extrapolating to 2048 (DMRG cost model; stated in the output).

Modes:
  python bench_northstar.py ramp <chi>      # host ramp; caches state to disk
  python bench_northstar.py ours <chi>      # device-resident sweeps (jax backend)
  python bench_northstar.py ref  <chi>      # reference tenpy, same protocol
  python bench_northstar.py ours-ramp <chi> # device-side ramp from cached smaller state

State cache: /tmp/northstar_chi{chi}.pkl (ramp once, bench many).
"""
import functools
import os
import pickle
import sys
import time

print = functools.partial(print, flush=True)

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.environ.get('NORTHSTAR_CACHE', '/tmp')

LY = int(os.environ.get('NORTHSTAR_LY', '4'))
MODEL_PARAMS = {'lattice': 'Square', 'Lx': 2, 'Ly': LY, 'bc_y': 'cylinder',
                'bc_MPS': 'infinite', 't': 1., 'U': 8., 'mu': 0.}
N_SWEEPS_BENCH = int(os.environ.get('NORTHSTAR_SWEEPS', '2'))


def state_path(chi):
    return os.path.join(CACHE, f'northstar_Ly{LY}_chi{chi}.pkl')


def ramp_stages(chi):
    stages = []
    c = 64
    while c < chi:
        stages.append(c)
        c *= 2
    stages.append(chi)
    return stages


# --------------------------------------------------------------------- ours
def build_model():
    sys.path.insert(0, REPO)
    from tenpy_tpu.models.hubbard import FermiHubbardModel
    return FermiHubbardModel(dict(MODEL_PARAMS))


def initial_psi(m):
    from tenpy_tpu.networks.mps import MPS
    L = m.lat.N_sites
    fill = ['up', 'down'] * (L // 2 + 1)
    return MPS.from_product_state(m.lat.mps_sites(), fill[:L], bc='infinite')


def cmd_ramp(chi):
    """Host-path chi ramp (CPU), cached to disk."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    from tenpy_tpu.algorithms import dmrg
    m = build_model()
    # resume from the largest cached smaller state
    psi = None
    for c in reversed(ramp_stages(chi)[:-1]):
        p = state_path(c)
        if os.path.exists(p):
            with open(p, 'rb') as f:
                psi = pickle.load(f)
            print(f"resuming ramp from cached chi={c}")
            break
    if psi is None:
        psi = initial_psi(m)
    for c in ramp_stages(chi):
        if psi.chi and max(psi.chi) >= c and os.path.exists(state_path(c)):
            continue
        t0 = time.time()
        eng = dmrg.TwoSiteDMRGEngine(psi, m, {
            'trunc_params': {'chi_max': c, 'svd_min': 1e-10},
            'max_sweeps': 2, 'min_sweeps': 2, 'mixer': True,
            'N_sweeps_check': 2})
        E, _ = eng.run()
        print(f"ramp stage chi={c}: E/site={E:.10f} max_chi={max(psi.chi)} "
              f"({time.time()-t0:.1f}s)")
        with open(state_path(c), 'wb') as f:
            pickle.dump(psi, f)
    print("ramp done ->", state_path(chi))


V5E_BF16_PEAK = 197e12   # TPU v5e peak bf16 FLOP/s (public spec; 394e12 is int8)


def cmd_ours(chi, ramp_on_device=False):
    import jax
    import logging
    # per-sweep progress (DeviceSweepEngine logs at INFO) — a run killed
    # mid-flight still leaves its sweep times/energies in the log
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format='%(asctime)s %(message)s')
    if os.environ.get('OURS_CPU'):   # JAX_PLATFORMS env is ignored under axon
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    # persistent compile cache (opt-in via JAX_COMPILATION_CACHE_DIR): re-runs
    # of the same capacity layout skip the cold compiles through the tunnel
    if os.environ.get('JAX_COMPILATION_CACHE_DIR'):
        try:
            jax.config.update('jax_compilation_cache_dir',
                              os.environ['JAX_COMPILATION_CACHE_DIR'])
            jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
        except Exception:            # noqa: BLE001 - cache is best-effort
            pass
    import faulthandler
    faulthandler.enable()
    faulthandler.dump_traceback_later(int(os.environ.get(
        'NORTHSTAR_WATCHDOG_S', '900')), repeat=True)
    from tenpy_tpu.linalg import packed as pk
    pk.start_transfer_keepalive()   # axon tunnel: streams die when idle
    print("backend:", jax.default_backend(), jax.devices())
    from tenpy_tpu.algorithms.packed_dmrg import DeviceSweepEngine
    m = build_model()
    src = chi
    if not os.path.exists(state_path(src)):
        for c in reversed(ramp_stages(chi)[:-1]):
            if os.path.exists(state_path(c)):
                src = c
                break
        else:
            raise SystemExit("no cached state; run `ramp` first")
    with open(state_path(src), 'rb') as f:
        psi = pickle.load(f)
    psi.real_if_close()   # gauge eigensolvers may have upcast to complex128
    print(f"loaded chi={src} state (max chi {max(psi.chi)}, {psi.dtype})")
    cur = max(psi.chi)
    if cur < chi and not ramp_on_device:
        raise SystemExit(f"cached state at chi={cur} < {chi}; "
                         "run `ours-ramp` or host `ramp` first")
    # ONE engine whose fixed capacity layout is sized for the TARGET chi:
    # the state grows into the layout over the first sweeps (device-side chi
    # ramp) and the production sweeps reuse the same compiled programs.
    grow = max(1.3, 1.3 * chi / max(cur, 1))
    # big single-stage growth needs more ramp sweeps: the write-back's
    # mixed-canonical seam is only consistent once the per-sweep drift has
    # decayed (a 256->2048 ramp with 3 sweeps left 1.3e-2 norm error and a
    # mangled re-gauge; from 512 with 6 ramp sweeps it is clean)
    n_ramp = int(os.environ.get('NORTHSTAR_RAMP', '3')) if cur < chi else 0
    K = int(os.environ.get('NORTHSTAR_K', '10'))
    # production protocol: Lanczos iterations in f32-HIGHEST GEMMs, final
    # polish sweeps in native (emulated) f64 — the polished energy is the
    # exact f64 variational one (VERDICT r2: median-of-N, energies recorded)
    mode = os.environ.get('NORTHSTAR_MODE', 'f32') or None
    n_polish = int(os.environ.get('NORTHSTAR_POLISH', '1')) if mode else 0
    pk.reset_flops()
    eng = DeviceSweepEngine(psi, m, {
        'chi_max': chi, 'svd_min': 1e-10, 'lanczos_K': K,
        # seam cap = K: one program per (direction, mode) — each extra K
        # value is another minutes-long cold compile through the tunnel
        'lanczos_K_seam': int(os.environ.get('NORTHSTAR_K_SEAM', str(K))),
        # HBM headroom at chi=2048: the default 1.5x capacity budget OOMs
        # (one update program needs 19.5G vs 15.75G HBM; the gathered GEMM
        # buffers scale ~quadratically with total bond capacity)
        'total_cap_factor': float(os.environ.get('NORTHSTAR_TOTAL_CAP',
                                                 '1.5')),
        'n_sweeps': n_ramp + 1 + N_SWEEPS_BENCH + n_polish,
        'cap_factor': grow, 'matvec_mode': mode, 'exact_E': bool(mode),
        'polish_sweeps': n_polish})
    t0 = time.time()
    n_prog = eng.precompile()
    print(f"precompiled {n_prog} programs in {time.time()-t0:.1f}s (parallel)")
    eng.run()
    with open(state_path(chi), 'wb') as f:
        pickle.dump(psi, f)
    st = eng.sweep_stats
    times, modes = st['time'], st['mode']
    print(f"compile+first sweep: {times[0]:.1f}s; chi reached "
          f"{max(psi.chi)}")
    # timed window: post-ramp sweeps in production mode, excluding the very
    # first sweep (compiles); median, not best
    prod_i = [i for i in range(len(times))
              if i >= 1 + n_ramp and modes[i] == (mode or 'f64')]
    prod = [times[i] for i in prod_i]
    prod_sorted = sorted(prod) if prod else [times[-1]]
    med = prod_sorted[len(prod_sorted) // 2]
    # MFU numerator: exact executed GEMM FLOPs per sweep — each update's
    # traced program cost corrected by the run-time Lanczos trip count
    # (DeviceSweepEngine.sweep records flops_exec; VERDICT r4 item 6).
    # Median over the timed window, paired with the median time.
    fe = [st['flops_exec'][i] for i in prod_i] or st['flops_exec'][-1:]
    sweep_flops = sorted(fe)[len(fe) // 2]
    mfu = sweep_flops / med / V5E_BF16_PEAK if med > 0 else 0.
    for i, t in enumerate(times):
        print(f"  sweep {i+1} [{modes[i]}]: {t:.2f}s E0={st['E'][i]:.12f} "
              f"err={st['max_err'][i]:.2e}")
    E_site = float(m.H_MPO.expectation_value(psi))
    print(f"E/site (host TM, f64) = {E_site:.12f}")
    print(f"RESULT ours chi={chi}: {med:.2f} s/sweep median of {len(prod)} "
          f"[{mode or 'f64'}] (best {prod_sorted[0]:.2f}); "
          f"final E0 {st['E'][-1]:.12f}; "
          f"~{sweep_flops/1e12:.2f} GEMM-TFLOP/sweep, "
          f"MFU {100*mfu:.3f}% of bf16 peak")
    return med


# ---------------------------------------------------------------- reference
def cmd_ref(chi):
    sys.path.insert(0, '/root/reference')
    import tenpy
    from tenpy.models.hubbard import FermiHubbardModel
    from tenpy.networks.mps import MPS
    from tenpy.algorithms import dmrg
    print("reference tenpy", tenpy.__version__)
    m = FermiHubbardModel(dict(MODEL_PARAMS))
    L = m.lat.N_sites
    fill = (['up', 'down'] * (L // 2 + 1))[:L]
    ref_cache = os.path.join(CACHE, f'northstar_ref_Ly{LY}_chi{chi}.pkl')
    psi = None
    for c in reversed(ramp_stages(chi)):
        p = os.path.join(CACHE, f'northstar_ref_Ly{LY}_chi{c}.pkl')
        if os.path.exists(p):
            with open(p, 'rb') as f:
                psi = pickle.load(f)
            print(f"resuming from cached ref chi={c}")
            break
    if psi is None:
        psi = MPS.from_product_state(m.lat.mps_sites(), fill, bc='infinite')
    for c in ramp_stages(chi):
        if psi.chi and max(psi.chi) >= c:
            continue   # resumed past this stage
        t0 = time.time()
        eng = dmrg.TwoSiteDMRGEngine(psi, m, {
            'trunc_params': {'chi_max': c, 'svd_min': 1e-10},
            'max_sweeps': 2, 'min_sweeps': 2, 'mixer': True,
            'N_sweeps_check': 2, 'combine': True})
        E, _ = eng.run()
        print(f"ref ramp chi={c}: E/site={E:.10f} max_chi={max(psi.chi)} "
              f"({time.time()-t0:.1f}s)")
        with open(os.path.join(CACHE, f'northstar_ref_Ly{LY}_chi{c}.pkl'),
                  'wb') as f:
            pickle.dump(psi, f)
    # timed sweeps at final chi (no mixer, fixed structure)
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-10},
        'max_sweeps': N_SWEEPS_BENCH, 'min_sweeps': N_SWEEPS_BENCH,
        'N_sweeps_check': N_SWEEPS_BENCH, 'mixer': None, 'combine': True})
    t0 = time.time()
    eng.run()
    dt = (time.time() - t0) / N_SWEEPS_BENCH
    print(f"RESULT ref chi={chi}: {dt:.2f} s/sweep")
    return dt


def cmd_energy(chi):
    """Side-by-side E/site of the cached ref and TPU states at this chi.

    Each state is measured by its *own* framework's MPO transfer-matrix
    energy (both f64, CPU) — the parity evidence for BENCH_NORTHSTAR.json's
    ``energy_match`` fields.
    """
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    E_ours = E_ref = None
    if os.path.exists(state_path(chi)):
        m = build_model()
        with open(state_path(chi), 'rb') as f:
            psi = pickle.load(f)
        psi.real_if_close()
        E_ours = float(m.H_MPO.expectation_value(psi))
        print(f"ours  chi={max(psi.chi):4d}: E/site = {E_ours:.12f}")
    ref_p = os.path.join(CACHE, f'northstar_ref_Ly{LY}_chi{chi}.pkl')
    if os.path.exists(ref_p):
        sys.path.insert(0, '/root/reference')
        from tenpy.models.hubbard import FermiHubbardModel as RefHubbard
        m_ref = RefHubbard(dict(MODEL_PARAMS))
        with open(ref_p, 'rb') as f:
            psi_ref = pickle.load(f)
        E_ref = float(m_ref.H_MPO.expectation_value(psi_ref))
        print(f"ref   chi={max(psi_ref.chi):4d}: E/site = {E_ref:.12f}")
    if E_ours is not None and E_ref is not None:
        print(f"delta = {E_ours - E_ref:+.3e}  "
              "(variational states at equal chi need not agree to machine "
              "precision; both are upper bounds)")
    return E_ours, E_ref


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'ours'
    chi = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    if mode == 'ramp':
        cmd_ramp(chi)
    elif mode == 'ours':
        cmd_ours(chi)
    elif mode == 'ours-ramp':
        cmd_ours(chi, ramp_on_device=True)
    elif mode == 'ref':
        cmd_ref(chi)
    elif mode == 'energy':
        cmd_energy(chi)
    else:
        raise SystemExit(f"unknown mode {mode}")
