"""iDMRG sweep benchmark: spin-1 Heisenberg chain (BASELINE config 3).

Protocol mirrors the reference harness (tests/benchmark/dmrg_infinite.py):
ramp up, then time N_SWEEPS two-site sweeps at fixed chi with
Lanczos N_min=N_max=10.

Env: BENCH_CHI (512), BENCH_SWEEPS (3), BENCH_RAMP (12), JAX_PLATFORMS.
Prints per-sweep timings + a JSON summary line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update('jax_enable_x64', True)
if os.environ.get('BENCH_PLATFORM'):  # 'cpu' etc.; the axon plugin ignores
    jax.config.update('jax_platforms', os.environ['BENCH_PLATFORM'])  # JAX_PLATFORMS

import numpy as np
from tenpy_tpu.models.spins import SpinChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.algorithms.dmrg import TwoSiteDMRGEngine


def main():
    chi = int(os.environ.get('BENCH_CHI', '512'))
    n_sweeps = int(os.environ.get('BENCH_SWEEPS', '3'))
    n_ramp = int(os.environ.get('BENCH_RAMP', '12'))
    m = SpinChain({'S': 1, 'L': 2, 'Jx': 1., 'Jy': 1., 'Jz': 1.,
                   'bc_MPS': 'infinite', 'conserve': 'Sz'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['1.0', '-1.0'],
                                 bc='infinite')
    chi_list, c, s = {}, 32, 0
    while c < chi:
        chi_list[s] = c
        c, s = c * 2, s + 2
    chi_list[s] = chi
    eng = TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-10},
        'chi_list': chi_list, 'mixer': True, 'max_sweeps': 1000,
        'mixer_params': {'disable_after': n_ramp - 1},  # off in timed sweeps
        'lanczos_params': {'N_min': 10, 'N_max': 10},
    })
    t0 = time.perf_counter()
    for i in range(max(n_ramp, s + 2)):
        eng.sweep()
        print(f"ramp {i}: chi={max(psi.chi)} t={time.perf_counter()-t0:.1f}s",
              flush=True)
    print(f"ramp done ({time.perf_counter()-t0:.1f}s), backend="
          f"{jax.default_backend()}", flush=True)
    times = []
    for i in range(n_sweeps):
        t1 = time.perf_counter()
        eng.sweep()
        dt = time.perf_counter() - t1
        times.append(dt)
        print(f"sweep {i}: {dt:.2f}s", flush=True)
    E = np.mean(eng.update_stats['E_total'][-4:]) if eng.update_stats['E_total'] else float('nan')
    print(json.dumps({
        'metric': f'iDMRG sweep, spin-1 Heisenberg chi={chi}',
        'value': round(min(times), 3), 'unit': 's/sweep',
        'backend': jax.default_backend(),
        'all_times': [round(t, 2) for t in times],
    }), flush=True)


if __name__ == '__main__':
    main()
