"""Profile iDMRG on a Hubbard cylinder (the BASELINE north-star workload).

Usage: python profile_dmrg.py [chi] [Ly] [sweeps]
Runs on whatever JAX backend is default (TPU under axon; CPU with JAX_PLATFORMS).
"""
import sys
import time

import numpy as np
import jax

CHI = int(sys.argv[1]) if len(sys.argv) > 1 else 256
LY = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N_SWEEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2

sys.path.insert(0, '/root/repo')
jax.config.update('jax_enable_x64', True)

from tenpy_tpu.models.hubbard import FermiHubbardModel  # noqa: E402
from tenpy_tpu.networks.mps import MPS  # noqa: E402
from tenpy_tpu.algorithms.dmrg import TwoSiteDMRGEngine  # noqa: E402

model_params = {
    'lattice': 'Square', 'Lx': 2, 'Ly': LY,
    'bc_MPS': 'infinite', 'bc_y': 'cylinder',
    't': 1.0, 'U': 8.0, 'mu': 0.,
    'cons_N': 'N', 'cons_Sz': 'Sz',
}
m = FermiHubbardModel(model_params)
L = m.lat.N_sites
print(f"Hubbard cylinder Ly={LY}, unit cell {L} sites, backend:",
      jax.default_backend())
state = (['up', 'down'] * (L // 2 + 1))[:L]
psi = MPS.from_product_state(m.lat.mps_sites(), state, bc='infinite')

# ramp chi
chi_list = {}
c, s = 32, 0
while c < CHI:
    chi_list[s] = c
    c *= 2
    s += 2
chi_list[s] = CHI
warmup = s + 2

eng = TwoSiteDMRGEngine(psi, m, {
    'trunc_params': {'chi_max': CHI, 'svd_min': 1e-10},
    'chi_list': chi_list,
    'mixer': True,
    'max_sweeps': 100,
    'lanczos_params': {'N_min': 4, 'N_max': 10},
})

# warm-up sweeps (ramp)
t0 = time.perf_counter()
for i in range(warmup):
    eng.sweep()
    print(f"  warmup sweep {i}: chi={max(psi.chi)} "
          f"t={time.perf_counter()-t0:.1f}s")
print(f"warmup done in {time.perf_counter()-t0:.1f}s, chi={max(psi.chi)}")

# instrument phases
import tenpy_tpu.algorithms.mps_common as mc
import tenpy_tpu.linalg.truncation as tr
from tenpy_tpu.linalg.krylov_based import LanczosGroundState

phase_t = {'lanczos': 0., 'svd_theta': 0., 'other': 0.}
orig_run = LanczosGroundState.run
def timed_run(self):
    t = time.perf_counter()
    res = orig_run(self)
    jax.block_until_ready  # noqa -- npc arrays; timings approximate
    phase_t['lanczos'] += time.perf_counter() - t
    return res
LanczosGroundState.run = timed_run
orig_svdt = tr.svd_theta
def timed_svdt(*a, **k):
    t = time.perf_counter()
    res = orig_svdt(*a, **k)
    phase_t['svd_theta'] += time.perf_counter() - t
    return res
tr.svd_theta = timed_svdt
mc.svd_theta = timed_svdt

times = []
for i in range(N_SWEEPS):
    t0 = time.perf_counter()
    eng.sweep()
    dt = time.perf_counter() - t0
    times.append(dt)
    print(f"sweep {i}: {dt:.2f}s  chi={max(psi.chi)}  "
          f"E_bond~{eng.update_stats['E_total'][-1] if 'E_total' in eng.update_stats else '?'}")

total = sum(times)
print(f"\nper-sweep: {np.mean(times):.2f}s (L={L} sites/sweep)")
print(f"phases over {N_SWEEPS} sweeps: lanczos={phase_t['lanczos']:.2f}s "
      f"svd_theta={phase_t['svd_theta']:.2f}s "
      f"other={total - phase_t['lanczos'] - phase_t['svd_theta']:.2f}s")
