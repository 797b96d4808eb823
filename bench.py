"""Benchmark: two-site DMRG effective-Hamiltonian matvec (the DMRG hot loop).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The problem: a U(1)-Sz-conserving random iMPS at bond dimension BENCH_CHI (default
256) sandwiching the spin-1/2 Heisenberg MPO — the contraction that dominates DMRG
runtime (SURVEY.md §3.2 hot loop).  The whole matvec is one jitted XLA program of
shape-bucketed batched matmuls over the charge blocks.

Baseline: the reference (tenpy 1.1.0 at /root/reference, pure-Python fallback, numpy
BLAS) measured on this machine's CPU for the same model/chi:
  chi=64: 2.827 ms | chi=128: 7.126 ms | chi=256: 20.698 ms   (2026-08-16)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MS = {64: 2.827, 128: 7.126, 256: 20.698}


def main():
    chi = int(os.environ.get('BENCH_CHI', '256'))
    n_rep = int(os.environ.get('BENCH_REPS', '50'))
    import jax
    from __graft_entry__ import _build_effH_problem
    from tenpy_tpu.algorithms.mps_common import _matvec_2site_plain_impl

    LP, RP, W0, W1, theta = _build_effH_problem(chi=chi)
    fn = jax.jit(_matvec_2site_plain_impl)
    # warmup / compile
    out = fn(LP, RP, W0, W1, theta)
    for b in out._data:
        b.block_until_ready()
    t0 = time.time()
    for _ in range(n_rep):
        out = fn(LP, RP, W0, W1, theta)
    for b in out._data:
        b.block_until_ready()
    t = (time.time() - t0) / n_rep
    base = BASELINE_MS.get(chi)
    vs = (base / 1e3) / t if base else None
    print(json.dumps({
        'metric': f'two-site effH matvec, U(1) Heisenberg iMPS chi={chi}',
        'value': round(1.0 / t, 2),
        'unit': 'matvec/s',
        'vs_baseline': round(vs, 3) if vs else 0.0,
    }))


if __name__ == '__main__':
    main()
