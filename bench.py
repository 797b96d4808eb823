"""Benchmark: the DMRG hot loop on the north-star workload (BASELINE.json).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The problem: the two-site effective-Hamiltonian matvec of Fermi-Hubbard (U=8)
on an infinite Ly=4 square cylinder — U(1)xU(1) charge structure (N + Sz),
chi=256 — i.e. exactly the block-heavy regime the BASELINE.json north star
names.  Our matvec runs as ONE jitted XLA program over the bucket-packed
block layout (gather -> batched matmul -> segment-sum -> scatter-add per
bucket pair; `tenpy_tpu/linalg/packed.py`).

Baseline (vs_baseline denominator): the reference tenpy 1.1.0 two-site
``combine=True`` matvec on the same model/state/bond, measured on this
machine's CPU (single core, OpenBLAS — this image has no MKL and no Cython,
see PERF.md): 21.87 ms/matvec at chi=256 (2026-08-17).

The benchmark state is shipped in ``tests/benchmark_data/`` (host-ramped
iDMRG state); full-sweep north-star numbers live in PERF.md.
"""

import gzip
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_MATVEC_MS = 21.87       # measured, see module docstring
CHI = int(os.environ.get('BENCH_CHI', '256'))
STATE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     'tests', 'benchmark_data', f'hubbard_cyl_chi{CHI}.pkl.gz')


def main():
    import jax
    if os.environ.get('BENCH_CPU'):
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    from tenpy_tpu.linalg import packed as pk
    from tenpy_tpu.algorithms.mps_common import (_matvec_2site_packed,
                                                 BUCKET_MULTIPLE)
    from tenpy_tpu.networks.mpo import MPOEnvironment
    from tenpy_tpu.models.hubbard import FermiHubbardModel

    pk.start_transfer_keepalive()
    m = FermiHubbardModel({'lattice': 'Square', 'Lx': 2, 'Ly': 4,
                           'bc_y': 'cylinder', 'bc_MPS': 'infinite',
                           't': 1., 'U': 8., 'mu': 0.})
    with gzip.open(STATE, 'rb') as f:
        psi = pickle.load(f)
    psi.real_if_close()
    env = MPOEnvironment(psi, m.H_MPO, psi)
    i0 = 4
    LP = env.get_LP(i0)
    RP = env.get_RP(i0 + 1)
    W0 = m.H_MPO.get_W(i0).transpose(['wL', 'wR', 'p', 'p*'])
    W1 = m.H_MPO.get_W(i0 + 1).transpose(['wL', 'wR', 'p', 'p*'])
    theta = psi.get_theta(i0, 2).itranspose(['vL', 'p0', 'p1', 'vR'])

    VIRT = ('vL', 'vR', 'vL*', 'vR*')
    LPp = pk.pack(LP.transpose(['vR*', 'wR', 'vR']), multiple=BUCKET_MULTIPLE,
                  pad_labels=VIRT)
    RPp = pk.pack(RP.transpose(['wL', 'vL', 'vL*']), multiple=BUCKET_MULTIPLE,
                  pad_labels=VIRT)
    W0p = pk.pack(W0, pad=False).replace_labels(['p', 'p*'], ['p0', 'p0*'])
    W1p = pk.pack(W1, pad=False).replace_labels(['p', 'p*'], ['p1', 'p1*'])
    theta_p = pk.pack(theta, multiple=BUCKET_MULTIPLE, pad_labels=VIRT)

    fn = jax.jit(_matvec_2site_packed)
    out = jax.block_until_ready(fn(LPp, RPp, W0p, W1p, theta_p).data)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 5.0 and n < 500:
        out = fn(LPp, RPp, W0p, W1p, theta_p)
        n += 1
    jax.block_until_ready(out.data)
    t = (time.time() - t0) / n
    print(json.dumps({
        'metric': f'two-site effH matvec, Hubbard cylinder U(1)xU(1) '
                  f'chi={CHI} ({jax.default_backend()})',
        'value': round(1.0 / t, 2),
        'unit': 'matvec/s',
        'vs_baseline': round((REF_MATVEC_MS / 1e3) / t, 3),
    }))


if __name__ == '__main__':
    main()
