"""Probe: packed fused-Lanczos throughput on the real TPU.

Builds a realistic two-site effective-H at the requested chi (short host-path
DMRG to populate charge sectors), packs it, and times the fused K-step Lanczos
kernel on the default jax backend.  Reports compile time, per-call time,
sustained matvec rate and effective GFLOP/s.

Usage: python bench_packed.py [model] [chi] [K] [multiple]
  model in {spin1, hubbard, tfi}
"""
import functools
import os
import sys
import time
import functools
print = functools.partial(print, flush=True)

import numpy as np

import jax
import jax.numpy as jnp


def build_effH(model, chi):
    from tenpy_tpu.networks.mps import MPS
    from tenpy_tpu.networks.mpo import MPOEnvironment
    from tenpy_tpu.algorithms import dmrg

    if model == 'spin1':
        from tenpy_tpu.models.spins import SpinChain
        m = SpinChain({'S': 1, 'L': 2, 'Jx': 1., 'Jy': 1., 'Jz': 1.,
                       'bc_MPS': 'infinite', 'conserve': 'Sz'})
        p_state = ['1.0', '-1.0']
    elif model == 'hubbard':
        from tenpy_tpu.models.hubbard import FermiHubbardChain
        m = FermiHubbardChain({'L': 2, 't': 1., 'U': 4., 'bc_MPS': 'infinite'})
        p_state = ['up', 'down']
    elif model == 'tfi':
        from tenpy_tpu.models.tf_ising import TFIChain
        m = TFIChain({'L': 2, 'J': 1., 'g': 1.5, 'bc_MPS': 'infinite',
                      'conserve': None})
        p_state = ['up', 'up']
    else:
        raise ValueError(model)
    psi = MPS.from_product_state(m.lat.mps_sites(), p_state, bc='infinite')
    # chi ramp on the host path to populate realistic charge sectors
    ramp = {0: min(64, chi)}
    s = 2
    c = 64
    while c < chi:
        c = min(chi, c * 2)
        ramp[s] = c
        s += 2
    dmrg.run(psi, m, {'trunc_params': {'chi_max': chi, 'svd_min': 1e-12},
                      'chi_list': ramp, 'max_sweeps': s + 4, 'min_sweeps': s + 2,
                      'mixer': True,
                      'lanczos_params': {'device_K': 0},   # host only
                      'max_hours': 0.5})
    env = MPOEnvironment(psi, m.H_MPO, psi)
    LP = env.get_LP(0)
    RP = env.get_RP(1)
    W0 = m.H_MPO.get_W(0).replace_labels(['p', 'p*'], ['p0', 'p0*'])
    W1 = m.H_MPO.get_W(1).replace_labels(['p', 'p*'], ['p1', 'p1*'])
    theta = psi.get_theta(0, 2)
    return LP, RP, W0, W1, theta


def matvec_flops(LPp, RPp, W0p, W1p, thp):
    """FLOPs of one packed matvec: trace the chain abstractly (no execution)
    and sum 2*m*k*n over all plan groups."""
    import jax
    from tenpy_tpu.linalg import packed as pk
    import tenpy_tpu.algorithms.mps_common as mc

    flops = [0]
    orig_td = pk.tensordot

    def counting_td(a, b, axes):
        res = orig_td(a, b, axes)
        if isinstance(axes, (int, np.integer)):
            n_axes = int(axes)
            axes_a = list(range(a.rank - n_axes, a.rank))
            axes_b = list(range(n_axes))
        else:
            axes_a = [a.get_leg_index(x) for x in axes[0]]
            axes_b = [b.get_leg_index(x) for x in axes[1]]
            n_axes = len(axes_a)
        perm_a = [i for i in range(a.rank) if i not in axes_a] + list(axes_a)
        perm_b = list(axes_b) + [i for i in range(b.rank) if i not in axes_b]
        at, bt = a.transpose(perm_a), b.transpose(perm_b)
        plan = pk._packed_plan(at, bt, n_axes)
        for (_, _, _, (m, k, n), a_pos, *_rest) in plan.groups:
            flops[0] += 2 * m * k * n * len(a_pos)
        return res

    pk.tensordot = counting_td
    try:
        jax.eval_shape(mc._matvec_2site_packed, LPp, RPp, W0p, W1p, thp)
    finally:
        pk.tensordot = orig_td
    return flops[0]


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else 'spin1'
    chi = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    multiple = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.time()
    LP, RP, W0, W1, theta = build_effH(model, chi)
    print(f"state built in {time.time()-t0:.1f}s; chi={theta.get_leg('vL').ind_len} "
          f"blocks: LP={LP.stored_blocks} theta={theta.stored_blocks}")

    from tenpy_tpu.linalg import packed as pk
    from tenpy_tpu.algorithms.mps_common import lanczos_K_2site_packed
    VIRT = ('vL', 'vR', 'vL*', 'vR*')
    t0 = time.time()
    LPp = pk.pack(LP, multiple=multiple, pad_labels=VIRT)
    RPp = pk.pack(RP, multiple=multiple, pad_labels=VIRT)
    W0p = pk.pack(W0, pad=False)
    W1p = pk.pack(W1, pad=False)
    thp = pk.pack(theta, multiple=multiple, pad_labels=VIRT)
    print(f"packed in {time.time()-t0:.2f}s; theta groups={thp.n_groups} "
          f"blocks={thp.n_blocks} LP groups={LPp.n_groups}")
    fl = matvec_flops(LPp, RPp, W0p, W1p, thp)
    print(f"matvec FLOPs (padded): {fl/1e9:.3f} GFLOP")

    t0 = time.time()
    E0, th = lanczos_K_2site_packed(LPp, RPp, W0p, W1p, thp, K)
    E0.block_until_ready()
    t_first = time.time() - t0
    print(f"first call (compile+run): {t_first:.1f}s  E0={float(E0):.12f}")
    times = []
    for _ in range(3):
        t0 = time.time()
        E0, th = lanczos_K_2site_packed(LPp, RPp, W0p, W1p, thp, K)
        E0.block_until_ready()
        times.append(time.time() - t0)
    t = min(times)
    print(f"steady call: {t*1e3:.1f} ms for K={K} -> {t/K*1e3:.2f} ms/matvec "
          f"-> {fl*K/t/1e9:.1f} GFLOP/s")
    print(f"RESULT {model} chi={chi} K={K} mult={multiple} "
          f"t_call={t:.4f} t_matvec={t/K:.5f} gflops={fl*K/t/1e9:.1f} "
          f"compile={t_first-t:.1f}")


if __name__ == '__main__':
    main()
