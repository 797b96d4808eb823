"""Microbenchmark: fused Pallas bucket-GEMM kernel vs the XLA chain (TPU).

Times the packed-tensordot hot pattern — gather -> grouped batched GEMM ->
segment-sum — both ways on realistic DMRG bucket workloads (charge-sector
fan-in ~ 4-16, block sizes 64..512), in the production reduced-precision
regime (f32 inputs, ``Precision.HIGHEST``).

Usage:  python bench_pallas.py            # on the TPU
        BENCH_CPU=1 python bench_pallas.py   # interpret-mode smoke on CPU
Writes BENCH_PALLAS.json at the repo root.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def xla_chain(a_src, b_src, seg, ia, ib, n_seg):
    """The production XLA path: gather, batched matmul, segment-sum."""
    import jax
    import jax.numpy as jnp
    ag = a_src[ia]
    bg = b_src[ib]
    prod = jnp.matmul(ag, bg, precision=jax.lax.Precision.HIGHEST)
    return jax.ops.segment_sum(prod, seg, num_segments=n_seg)


def bench_one(m, k, n, n_src, fanin, n_seg, interpret):
    import jax
    import jax.numpy as jnp
    from tenpy_tpu.linalg import pallas_gemm as pg
    rng = np.random.default_rng(0)
    B = fanin * n_seg
    a = jnp.asarray(rng.standard_normal((n_src, m, k)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n_src, k, n)), jnp.float32)
    seg = np.repeat(np.arange(n_seg, dtype=np.int32), fanin)
    ia = rng.integers(0, n_src, B).astype(np.int32)
    ib = rng.integers(0, n_src, B).astype(np.int32)

    fused = jax.jit(lambda A, Bm: pg.grouped_gemm_segsum(
        A, Bm, seg, ia, ib, n_seg, interpret=interpret))
    chain = jax.jit(lambda A, Bm: xla_chain(
        A, Bm, jnp.asarray(seg), jnp.asarray(ia), jnp.asarray(ib), n_seg))

    o1 = fused(a, b).block_until_ready()
    o2 = chain(a, b).block_until_ready()
    err = float(jnp.max(jnp.abs(o1 - o2)) / (jnp.max(jnp.abs(o2)) + 1.))
    reps = 3 if interpret else 20
    ts = {}
    for name, f in [('pallas', fused), ('xla', chain)]:
        f(a, b).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(a, b)
        out.block_until_ready()
        ts[name] = (time.perf_counter() - t0) / reps
    flops = 2. * B * m * k * n
    return {'m': m, 'k': k, 'n': n, 'B': B, 'fanin': fanin,
            'pallas_ms': round(ts['pallas'] * 1e3, 3),
            'xla_ms': round(ts['xla'] * 1e3, 3),
            'speedup': round(ts['xla'] / ts['pallas'], 3),
            'pallas_tflops': round(flops / ts['pallas'] / 1e12, 2),
            'rel_err': err}


def main():
    interpret = bool(os.environ.get('BENCH_CPU'))
    if interpret:
        # the env var alone is not enough with the axon PJRT plugin installed;
        # the config update reliably pins the backend (see tests/conftest.py)
        os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    if interpret:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    print('backend:', jax.default_backend(), file=sys.stderr, flush=True)
    cases = [
        # (m, k, n, n_src, fanin, n_seg) — DMRG bucket regimes
        (64, 64, 64, 40, 8, 30),      # small blocks, bandwidth-bound
        (128, 128, 128, 40, 8, 30),
        (256, 256, 256, 24, 6, 16),
        (256, 1024, 256, 16, 4, 8),   # theta-matvec-like skinny-k
        (512, 512, 512, 12, 4, 8),
    ] if not interpret else [(32, 32, 32, 6, 3, 4)]
    rows = [bench_one(*c, interpret) for c in cases]
    for r in rows:
        print(r, file=sys.stderr, flush=True)
    geo = float(np.exp(np.mean([np.log(r['speedup']) for r in rows])))
    out = {'backend': jax.default_backend(), 'cases': rows,
           'geomean_speedup_vs_xla_chain': round(geo, 3)}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'BENCH_PALLAS.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out['cases'][-1] | {'geomean': out[
        'geomean_speedup_vs_xla_chain']}))


if __name__ == '__main__':
    main()
    sys.stdout.flush()
    os._exit(0)   # axon teardown hygiene (see bench.py)
