"""Probe: TPU matmul throughput vs dtype/precision (the f64-emulation lever).

Measures achieved FLOP/s for square matmuls at DMRG-relevant sizes:
  - f64 (XLA-emulated on TPU)
  - f32 with precision=HIGHEST (bf16x6 passes on MXU)
  - f32 default
  - bf16
  - double-f32 ("float-float"): x = hi + lo split, C = hi@hi + hi@lo + lo@hi
    at HIGHEST precision, accumulated in f32 (candidate f64 substitute,
    ~2^-48 relative error)

plus the accuracy of each against the f64 result.  Writes one JSON line per
config to stdout and a summary artifact to BENCH_TPU_PROBE.json.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_enable_x64', True)
    backend = jax.default_backend()
    print(f"backend: {backend}", file=sys.stderr)
    from tenpy_tpu.linalg import packed as pk
    pk.start_transfer_keepalive()

    results = []
    rng = np.random.default_rng(0)
    for n in (1024, 2048, 4096):
        A = rng.standard_normal((n, n))
        B = rng.standard_normal((n, n))
        with pk.transfer_guard():
            dA = jax.device_put(A.ravel()).reshape(n, n)
            dB = jax.device_put(B.ravel()).reshape(n, n)
            jax.block_until_ready((dA, dB))
        flops = 2.0 * n**3

        def bench(name, fn, ref=None):
            f = jax.jit(fn)
            out = jax.block_until_ready(f(dA, dB))
            t0 = time.time()
            reps = 0
            while time.time() - t0 < 2.0 and reps < 200:
                out = f(dA, dB)
                reps += 1
            jax.block_until_ready(out)
            dt = (time.time() - t0) / reps
            rel = None
            if ref is not None:
                with pk.transfer_guard():
                    o64 = np.asarray(jax.device_get(out), np.float64)
                rel = float(np.linalg.norm(o64 - ref) / np.linalg.norm(ref))
            rec = {'n': n, 'name': name, 'ms': round(dt * 1e3, 3),
                   'gflops': round(flops / dt / 1e9, 1), 'rel_err': rel}
            results.append(rec)
            print(json.dumps(rec), flush=True)
            return np.asarray(jax.device_get(out), np.float64) if ref is None \
                else None

        ref = bench('f64', lambda a, b: a @ b)

        bench('f32_highest',
              lambda a, b: jnp.matmul(a.astype(jnp.float32),
                                      b.astype(jnp.float32),
                                      precision=jax.lax.Precision.HIGHEST),
              ref)
        bench('f32_default',
              lambda a, b: jnp.matmul(a.astype(jnp.float32),
                                      b.astype(jnp.float32)), ref)
        bench('bf16',
              lambda a, b: jnp.matmul(a.astype(jnp.bfloat16),
                                      b.astype(jnp.bfloat16)), ref)

        def ff(a, b):
            ah = a.astype(jnp.float32)
            al = (a - ah.astype(jnp.float64)).astype(jnp.float32)
            bh = b.astype(jnp.float32)
            bl = (b - bh.astype(jnp.float64)).astype(jnp.float32)
            P = jax.lax.Precision.HIGHEST
            hi = jnp.matmul(ah, bh, precision=P)
            cross = jnp.matmul(ah, bl, precision=P) \
                + jnp.matmul(al, bh, precision=P)
            return hi.astype(jnp.float64) + cross.astype(jnp.float64)

        bench('double_f32', ff, ref)

        def ff32acc(a, b):
            # same but f32 accumulation of the correction (cheaper epilogue)
            ah = a.astype(jnp.float32)
            al = (a - ah.astype(jnp.float64)).astype(jnp.float32)
            bh = b.astype(jnp.float32)
            bl = (b - bh.astype(jnp.float64)).astype(jnp.float32)
            P = jax.lax.Precision.HIGHEST
            return (jnp.matmul(ah, bh, precision=P)
                    + (jnp.matmul(ah, bl, precision=P)
                       + jnp.matmul(al, bh, precision=P)))

        bench('double_f32_f32acc', ff32acc, ref)

    with open('BENCH_TPU_PROBE.json', 'w') as f:
        json.dump({'backend': backend, 'results': results}, f, indent=1)
    pk.stop_transfer_keepalive()


if __name__ == '__main__':
    rc = 0
    try:
        main()
    except BaseException:
        import traceback
        traceback.print_exc()
        rc = 1
    sys.stdout.flush()
    sys.stderr.flush()
    import os
    os._exit(rc)
