"""Benchmark: device-resident iDMRG sweep time on the north-star workload.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The problem (BASELINE.json north star): two-site iDMRG on Fermi-Hubbard
(U=8) on an infinite Ly=4 square cylinder — U(1)xU(1) charge structure
(N + Sz) — measured as seconds per full sweep of
:class:`tenpy_tpu.algorithms.packed_dmrg.DeviceSweepEngine`, the production
device-resident sweep engine (whole site update = one jitted XLA program,
sweep state lives in HBM).

Baseline (vs_baseline denominator): the reference tenpy 1.1.0
TwoSiteDMRGEngine (combine=True) on the same model/state/protocol, measured
on this machine's CPU (single core, OpenBLAS — this image has no MKL and no
Cython, see PERF.md): 23.54 s/sweep at chi=256 (2026-08-17, via
``bench_northstar.py ref 256``).  vs_baseline > 1 means the TPU engine beats
the measured reference sweep.

The benchmark state is shipped in ``tests/benchmark_data/`` (host-ramped
iDMRG state); the full north-star ladder lives in BENCH_NORTHSTAR.json /
PERF.md.
"""

import gzip
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_SWEEP_S = 23.54         # measured, see module docstring
CHI = int(os.environ.get('BENCH_CHI', '256'))
N_SWEEPS = int(os.environ.get('BENCH_SWEEPS', '3'))
STATE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     'tests', 'benchmark_data', f'hubbard_cyl_chi{CHI}.pkl.gz')


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    if os.environ.get('BENCH_CPU'):
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    from tenpy_tpu.linalg import packed as pk
    from tenpy_tpu.algorithms.packed_dmrg import DeviceSweepEngine
    from tenpy_tpu.models.hubbard import FermiHubbardModel

    pk.start_transfer_keepalive()
    m = FermiHubbardModel({'lattice': 'Square', 'Lx': 2, 'Ly': 4,
                           'bc_y': 'cylinder', 'bc_MPS': 'infinite',
                           't': 1., 'U': 8., 'mu': 0.})
    with gzip.open(STATE, 'rb') as f:
        psi = pickle.load(f)
    psi.real_if_close()
    log(f"bench: backend={jax.default_backend()} chi={CHI} "
        f"state max_chi={max(psi.chi)}")

    # 1 warm-up sweep (pays jit compiles; the compile server caches across
    # processes so reruns are cheap) + N_SWEEPS timed sweeps, report median.
    # Production mode: Lanczos iterations in f32-HIGHEST GEMMs (~13x the
    # f64-emulation MXU throughput, see BENCH_TPU_PROBE.json), energy per
    # update evaluated as the full-f64 Rayleigh quotient of the Ritz state
    # (exact_E) — the reported E0 is the true variational energy.
    eng = DeviceSweepEngine(psi, m, {
        'chi_max': CHI, 'svd_min': 1e-10, 'lanczos_K': 10,
        'n_sweeps': 1 + N_SWEEPS, 'cap_factor': 1.3,
        'matvec_mode': 'f32', 'exact_E': True, 'polish_sweeps': 0})
    eng.run()
    times = sorted(eng.sweep_stats['time'][1:])
    median = times[len(times) // 2]
    E = eng.sweep_stats['E'][-1]
    log(f"bench: sweep times {['%.2f' % t for t in eng.sweep_stats['time']]} "
        f"E0={E:.10f}")
    print(json.dumps({
        'metric': f'iDMRG s/sweep, Hubbard Ly=4 cylinder U(1)xU(1) '
                  f'chi={CHI} ({jax.default_backend()})',
        'value': round(median, 3),
        'unit': 's/sweep (lower is better; vs_baseline = ref_time/our_time)',
        'vs_baseline': round(REF_SWEEP_S / median, 3),
    }), flush=True)
    pk.stop_transfer_keepalive()


if __name__ == '__main__':
    rc = 0
    try:
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
