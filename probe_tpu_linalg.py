"""Probe: which decompositions are viable ON the TPU (through the axon tunnel)?

The device-resident sweep needs truncation (SVD or eigh of the reduced density
matrix) without a host round trip.  TPU f64 is emulated; round-1 found plain
f64 jnp.linalg.svd did not compile within 400 s.  This measures compile + run
time of the candidate building blocks at DMRG-relevant (batched, padded) sizes:

  - batched f32 SVD   (seed for the subspace)
  - batched f64 QR    (re-orthonormalization -> exact canonical form)
  - batched f64 eigh  (rho-based truncation)
  - batched f64 matmul (sanity/rate reference)

Each probe is budget-guarded; the script always exits cleanly (never kill a
TPU client externally -- a killed client wedges the tunnel for minutes).
"""
import functools
import sys
import time

print = functools.partial(print, flush=True)

BUDGET_S = float(sys.argv[1]) if len(sys.argv) > 1 else 2400.
t_start = time.time()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_enable_x64', True)
print(f"[{time.time()-t_start:7.1f}s] devices: {jax.devices()}")


def left(): return BUDGET_S - (time.time() - t_start)


def probe(name, fn, *args, est_compile=300.):
    if left() < est_compile + 30:
        print(f"[{time.time()-t_start:7.1f}s] SKIP {name} (budget)")
        return
    try:
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jax.block_until_ready(jfn(*args))
        t_compile = time.time() - t0
        t0 = time.time()
        n = 0
        while time.time() - t0 < 3.0 and n < 50:
            out = jax.block_until_ready(jfn(*args))
            n += 1
        t_run = (time.time() - t0) / n
        print(f"[{time.time()-t_start:7.1f}s] {name}: compile {t_compile:.1f}s"
              f"  run {t_run*1e3:.1f}ms")
    except Exception as e:
        print(f"[{time.time()-t_start:7.1f}s] {name}: FAILED {type(e).__name__}: {e}")


key = jax.random.PRNGKey(0)

# 0) transfer + f64 matmul sanity
a64 = jax.random.normal(key, (8, 512, 512), jnp.float64)
probe("matmul f64 (8,512,512)", lambda x: x @ x, a64, est_compile=120.)

# 1) batched f32 SVD
a32 = jax.random.normal(key, (16, 256, 256), jnp.float32)
probe("svd f32 (16,256,256)", lambda x: jnp.linalg.svd(x), a32)
b32 = jax.random.normal(key, (4, 512, 512), jnp.float32)
probe("svd f32 (4,512,512)", lambda x: jnp.linalg.svd(x), b32)

# 2) batched f64 QR
probe("qr f64 (8,512,512)", lambda x: jnp.linalg.qr(x), a64, est_compile=300.)

# 3) batched f64 eigh
s64 = a64 + jnp.swapaxes(a64, -1, -2)
probe("eigh f64 (8,512,512)", lambda x: jnp.linalg.eigh(x), s64, est_compile=400.)
e64 = jax.random.normal(key, (16, 256, 256), jnp.float64)
e64 = e64 + jnp.swapaxes(e64, -1, -2)
probe("eigh f64 (16,256,256)", lambda x: jnp.linalg.eigh(x), e64, est_compile=400.)

# 4) f32 eigh (rho path in mixed precision)
s32 = s64.astype(jnp.float32)
probe("eigh f32 (8,512,512)", lambda x: jnp.linalg.eigh(x), s32, est_compile=200.)

# 5) f64 SVD small batch (expected to fail/slow -- bound it by budget order)
probe("svd f64 (4,256,256)", lambda x: jnp.linalg.svd(x),
      jax.random.normal(key, (4, 256, 256), jnp.float64), est_compile=500.)

print(f"[{time.time()-t_start:7.1f}s] probe done")
