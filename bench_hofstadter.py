"""Device-resident iDMRG on a complex Hamiltonian (BASELINE config #5).

Hofstadter fermions (flux 1/3, Landau-x gauge -> complex hopping phases,
reference ``tenpy/models/hofstadter.py:18,145``) on an infinite Lx=3, Ly=3
cylinder at 1/3 filling of the lowest band.  The device engine runs the
split re/im channel storage end to end on the TPU; correctness of the
complex path vs the host complex128 engine is asserted separately at
1e-10 in ``tests/test_packed_dmrg.py::test_device_sweep_complex_hofstadter``.

  python bench_hofstadter.py ramp    # CPU host ramp (complex128), caches state
  python bench_hofstadter.py ours    # device-resident sweeps (TPU)
  python bench_hofstadter.py ref     # reference tenpy, same protocol

Prints s/sweep (median of the post-warm sweeps) + the energy-difference
quotient per site.
"""
import functools
import os
import pickle
import sys
import time

print = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.environ.get('NORTHSTAR_CACHE', '/tmp')
CHI = int(os.environ.get('HOF_CHI', '128'))
N_SWEEPS = int(os.environ.get('HOF_SWEEPS', '3'))
# Charge bookkeeping knob.  conserve='N' at 1/3 filling has unit-cell charge
# Q=3 on L=9 sites, so the uniform charge gauge (needs Q % L == 0) cannot
# apply and a device run pays 2L serial program compiles.  The TPU-first
# protocol is conserve=None: one dense sector per bond -- at chi=128 the
# dense GEMMs tile the MXU far better than 1-20-dim charge blocks anyway,
# and the sweep reuses 2 compiled programs.  Same Hamiltonian/algorithm;
# the (CPU) reference keeps conserve='N', which only helps it.
CONSERVE = os.environ.get('HOF_CONSERVE', 'none')

MODEL = {'lattice': 'Square', 'Lx': 3, 'Ly': 3, 'bc_y': 'cylinder',
         'bc_MPS': 'infinite', 'phi': (1, 3),
         'conserve': None if CONSERVE == 'none' else CONSERVE,
         'mu': 0., 'v': 0.}
REF_MODEL = dict(MODEL, conserve='N')


def state_path(chi):
    tag = '' if CONSERVE == 'N' else f'_{CONSERVE}'
    return os.path.join(CACHE, f'hofstadter{tag}_chi{chi}.pkl')


def build(ref=False):
    if ref:
        sys.path.insert(0, '/root/reference')
        from tenpy.models.hofstadter import HofstadterFermions
    else:
        sys.path.insert(0, REPO)
        from tenpy_tpu.models.hofstadter import HofstadterFermions
    return HofstadterFermions(dict(REF_MODEL if ref else MODEL))


def initial(m, ref=False):
    mod = 'tenpy' if ref else 'tenpy_tpu'
    MPS = __import__(f'{mod}.networks.mps', fromlist=['MPS']).MPS
    L = m.lat.N_sites
    fill = (['full', 'empty', 'empty'] * L)[:L]   # 1/3 filling
    return MPS.from_product_state(m.lat.mps_sites(), fill, bc='infinite')


def cmd_ramp(chi=64):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    from tenpy_tpu.algorithms import dmrg
    m = build()
    psi = initial(m)
    t0 = time.time()
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-10},
        'max_sweeps': 6, 'min_sweeps': 6, 'mixer': True, 'N_sweeps_check': 6})
    E, _ = eng.run()
    print(f"host ramp chi={chi}: E/site={E:.10f} max_chi={max(psi.chi)} "
          f"dtype={psi.dtype} ({time.time()-t0:.1f}s)")
    with open(state_path(chi), 'wb') as f:
        pickle.dump(psi, f)


def cmd_ours(chi=CHI):
    import jax
    if os.environ.get('OURS_CPU'):
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    import logging
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format='%(asctime)s %(message)s')
    from tenpy_tpu.linalg import packed as pk
    pk.start_transfer_keepalive()
    from tenpy_tpu.algorithms.packed_dmrg import DeviceSweepEngine
    m = build()
    src = chi if os.path.exists(state_path(chi)) else 64
    with open(state_path(src), 'rb') as f:
        psi = pickle.load(f)
    print(f"backend: {jax.default_backend()}; loaded chi={max(psi.chi)} "
          f"({psi.dtype})")
    eng = DeviceSweepEngine(psi, m, {
        'chi_max': chi, 'svd_min': 1e-10, 'lanczos_K': 10,
        'lanczos_K_seam': 10, 'n_sweeps': 3 + 1 + N_SWEEPS,
        'cap_factor': max(1.3, 1.3 * chi / max(psi.chi))})
    n = eng.precompile()
    print(f"precompiled {n} programs (parallel)")
    eng.run()
    with open(state_path(chi), 'wb') as f:
        pickle.dump(psi, f)
    st = eng.sweep_stats
    times = sorted(st['time'][1:])
    med = times[len(times) // 2]
    L = m.lat.N_sites
    dE = (st['E'][-1] - st['E'][-2]) / (2 * L)
    print(f"RESULT hofstadter ours chi={chi}: {med:.2f} s/sweep "
          f"(complex split-channel, median of {len(times)}); "
          f"E/site diff-quotient {dE:.10f}")
    return med


def cmd_ref(chi=CHI):
    m = build(ref=True)
    from tenpy.algorithms import dmrg
    psi = initial(m, ref=True)
    t0 = time.time()
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-10},
        'max_sweeps': 6, 'min_sweeps': 6, 'mixer': True, 'N_sweeps_check': 6})
    E, _ = eng.run()
    print(f"ref ramp chi={chi}: E/site={E:.10f} ({time.time()-t0:.1f}s)")
    eng2 = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-10},
        'max_sweeps': N_SWEEPS, 'min_sweeps': N_SWEEPS,
        'N_sweeps_check': N_SWEEPS, 'mixer': None})
    t0 = time.time()
    eng2.run()
    print(f"RESULT hofstadter ref chi={chi}: "
          f"{(time.time()-t0)/N_SWEEPS:.2f} s/sweep")


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'ours'
    chi = int(sys.argv[2]) if len(sys.argv) > 2 else CHI
    rc = 0
    try:
        {'ramp': cmd_ramp, 'ours': cmd_ours, 'ref': cmd_ref}[mode](chi) \
            if mode != 'ramp' else cmd_ramp()
    except BaseException:
        import traceback
        traceback.print_exc()
        rc = 1
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)
