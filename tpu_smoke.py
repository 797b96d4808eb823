"""TPU smoke test: pin down the device decomposition backends per round.

The CI suite runs CPU-only (tests/conftest.py pins JAX_PLATFORMS=cpu for fast
dispatch + f64); this script is the per-round evidence that the *device*
backends actually work on the real TPU behind the axon tunnel:

- flat-1D transfer hygiene (the only reliable transfer shape, see
  packed.py:_transfer_packed),
- batched one-sided Jacobi SVD (packed_split._decomp_jacobi) vs host LAPACK
  on padded rank-deficient DMRG-like inputs,
- qr_eigh truncation backend,
- f32-HIGHEST matmul residual vs emulated f64 (the mixed-precision Lanczos
  protocol's accuracy assumption, BENCH_TPU_PROBE.json).

Writes SMOKE_TPU.json and always exits 0 cleanly (never kill a TPU client —
a killed client wedges the tunnel; see doc/npc_on_tpu.md).  Budget-guarded:
skips remaining probes once the time budget is spent.
"""
import functools
import json
import os
import sys
import time

print = functools.partial(print, flush=True)

BUDGET_S = float(sys.argv[1]) if len(sys.argv) > 1 else 1800.
T0 = time.time()
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   'SMOKE_TPU.json')
results = {'backend': None, 'ok': False, 'probes': []}


def left():
    return BUDGET_S - (time.time() - T0)


def record(name, **kw):
    kw['name'] = name
    kw['t'] = round(time.time() - T0, 1)
    results['probes'].append(kw)
    print(f"[{kw['t']:7.1f}s] {name}: "
          + " ".join(f"{k}={v}" for k, v in kw.items()
                     if k not in ('name', 't')))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_enable_x64', True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tenpy_tpu.linalg import packed as pk
    from tenpy_tpu.linalg import packed_split as ps

    pk.start_transfer_keepalive()
    results['backend'] = jax.default_backend()
    record('devices', backend=jax.default_backend(),
           n=len(jax.devices()))

    # --- flat 1-D transfer round trip
    rng = np.random.RandomState(0)
    x = rng.normal(size=4096)
    with pk.transfer_guard():
        xd = jax.device_put(jnp.asarray(x))
        back = np.asarray(jax.device_get(xd))
    record('flat_transfer', max_err=float(np.max(np.abs(back - x))))

    # --- batched Jacobi SVD on padded rank-deficient inputs (the DMRG case)
    if left() > 400:
        N, n = 8, 96
        Ms = np.zeros((N, n, n))
        for b in range(N):
            r = rng.randint(4, n // 2)      # heavily rank-deficient
            A = rng.normal(size=(n, r)) * np.exp(-np.arange(r) / 6.)
            Ms[b] = A @ rng.normal(size=(r, n))
        t0 = time.time()
        U, S, V = jax.jit(lambda M: ps._decomp_jacobi(M))(jnp.asarray(Ms))
        S = np.asarray(jax.device_get(S))
        dt = time.time() - t0
        S_host = np.linalg.svd(Ms, compute_uv=False)
        err = float(np.max(np.abs(np.sort(S, axis=-1)
                                  - np.sort(S_host, axis=-1))
                           / np.max(S_host)))
        record('jacobi_svd', compile_plus_run_s=round(dt, 1),
               rel_err=err, ok=err < 1e-9)

    # --- qr_eigh backend
    if left() > 400:
        t0 = time.time()
        U, S, V = jax.jit(lambda M: ps._decomp_qr_eigh(M))(jnp.asarray(Ms))
        S = np.asarray(jax.device_get(S))
        dt = time.time() - t0
        err = float(np.max(np.abs(np.sort(S, axis=-1)
                                  - np.sort(S_host, axis=-1))
                           / np.max(S_host)))
        # qr_eigh leans on the stock f64 eigh lowering, which is
        # libtpu-roll-sensitive (healthy on the 2026-08-17 roll, NaN on the
        # 2026-08-19 one); it is an OPTIONAL alternative backend — the
        # production default is jacobi — so record it without failing the
        # overall verdict.
        record('qr_eigh', compile_plus_run_s=round(dt, 1),
               rel_err=err, ok=err < 1e-7, required=False)

    # --- f32-HIGHEST matmul residual vs f64 (mixed-precision assumption)
    if left() > 200:
        n = 512
        A = jnp.asarray(rng.normal(size=(n, n)))
        B = jnp.asarray(rng.normal(size=(n, n)))

        @jax.jit
        def both(A, B):
            C64 = A @ B
            C32 = (A.astype(jnp.float32) @ B.astype(jnp.float32)).astype(
                jnp.float64)
            Chp = jax.lax.dot(A.astype(jnp.float32), B.astype(jnp.float32),
                              precision=jax.lax.Precision.HIGHEST
                              ).astype(jnp.float64)
            return (jnp.max(jnp.abs(C32 - C64)) / jnp.max(jnp.abs(C64)),
                    jnp.max(jnp.abs(Chp - C64)) / jnp.max(jnp.abs(C64)))
        r32, rhp = jax.device_get(both(A, B))
        record('matmul_precision', f32_rel=float(r32),
               f32_highest_rel=float(rhp), ok=float(rhp) < 1e-5)

    results['ok'] = all(p.get('ok', True) for p in results['probes']
                        if p.get('required', True))


if __name__ == '__main__':
    try:
        main()
    except BaseException as e:
        results['error'] = f"{type(e).__name__}: {e}"[:2000]
        import traceback
        traceback.print_exc()
    with open(OUT, 'w') as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT, "ok =", results['ok'])
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
