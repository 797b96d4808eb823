"""TEBD benchmark: real-time Trotter step time at chi=512 (BASELINE.json).

The second half of the BASELINE metric: "TEBD step time at chi=512".
Workload (BASELINE config #2's model): infinite spin-1/2 XXZ chain with U(1)
Sz conservation, real-time evolution after a local-quench-free protocol —
start from the gapped Delta=1.5 ground state quench-evolved under the
critical H (Delta=1) until every bond saturates chi=512 (entanglement grows
linearly after the quench, so truncation does real work each step), then
measure further real-time steps; order-2 Suzuki-Trotter, dt=0.05.

Measured: seconds per Trotter step (one dt step = the full order-2 gate
sequence over all bonds), median over N_STEPS, after one warm-up evolve that
pays jit compiles.

  python bench_tebd.py ramp      # CPU: DMRG-ramp the gapped XXZ ground state
  python bench_tebd.py grow      # CPU: quench-evolve until chi saturates 512
  python bench_tebd.py ours      # device-resident TEBD (TPU or CPU backend)
  python bench_tebd.py ref       # reference tenpy TEBDEngine on CPU

Reference hot loop: ``/root/reference/tenpy/algorithms/tebd.py:416``
(update_bond); harness protocol modeled on
``/root/reference/tests/benchmark/tebd_infinite.py``.
"""
import functools
import os
import pickle
import sys
import time

print = functools.partial(print, flush=True)

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.environ.get('NORTHSTAR_CACHE', '/tmp')
CHI = int(os.environ.get('TEBD_CHI', '512'))
DT = 0.05
N_STEPS = int(os.environ.get('TEBD_STEPS', '5'))

# gapped GS (Delta=1.5), quench-evolve under the critical H (Delta=1.0):
# entanglement grows linearly, so the benchmark state genuinely saturates
# chi=512 and truncation does real work each step
MODEL_GS = {'L': 2, 'Jxx': 1., 'Jz': 1.5, 'hz': 0., 'bc_MPS': 'infinite',
            'sort_charge': True}
MODEL_EVO = dict(MODEL_GS, Jz=1.0)


def state_path(chi):
    return os.path.join(CACHE, f'tebd_xxz_chi{chi}.pkl')


def grown_path(chi):
    return os.path.join(CACHE, f'tebd_xxz_grown_chi{chi}.pkl')


def cmd_grow(chi=CHI):
    """Quench-evolve the gapped GS under the critical H on the host engine
    until every bond saturates ``chi`` — the common benchmark start state
    (complex, entanglement still growing) for `ours` and `ref`."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    sys.path.insert(0, REPO)
    from tenpy_tpu.models.xxz_chain import XXZChain
    from tenpy_tpu.algorithms import tebd
    psi = _load(chi, grown=False)
    m = XXZChain(dict(MODEL_EVO))
    eng = tebd.TEBDEngine(psi, m, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-10},
        'dt': DT, 'order': 2, 'N_steps': 2})
    t0 = time.time()
    while min(psi.chi) < chi:
        eng.run()
        print(f"grow: t={eng.evolved_time:.2f} chi={psi.chi} "
              f"({time.time()-t0:.1f}s)")
        if eng.evolved_time > 60:
            raise SystemExit("entanglement growth stalled?")
    with open(grown_path(chi), 'wb') as f:
        pickle.dump(psi, f)
    print("grow done ->", grown_path(chi))


def cmd_ramp(chi=CHI):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    sys.path.insert(0, REPO)
    from tenpy_tpu.models.xxz_chain import XXZChain
    from tenpy_tpu.networks.mps import MPS
    from tenpy_tpu.algorithms import dmrg
    m = XXZChain(dict(MODEL_GS))
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'],
                                 bc='infinite')
    c, t0 = 64, time.time()
    while True:
        eng = dmrg.TwoSiteDMRGEngine(psi, m, {
            'trunc_params': {'chi_max': c, 'svd_min': 1e-12},
            'max_sweeps': 3, 'min_sweeps': 3, 'mixer': True,
            'N_sweeps_check': 3})
        E, _ = eng.run()
        print(f"ramp chi={c}: E/site={E:.10f} max_chi={max(psi.chi)} "
              f"({time.time()-t0:.1f}s)")
        if c >= chi or max(psi.chi) < 0.9 * c:
            break   # gapped GS: Schmidt spectrum exhausted before chi
        c = min(2 * c, chi)
    with open(state_path(chi), 'wb') as f:
        pickle.dump(psi, f)
    print("ramp done ->", state_path(chi))


def _load(chi=CHI, grown=True):
    p = grown_path(chi) if grown else state_path(chi)
    with open(p, 'rb') as f:
        psi = pickle.load(f)
    psi.real_if_close()
    print(f"loaded XXZ state chi={max(psi.chi)} ({psi.dtype})")
    return psi


def cmd_ours(chi=CHI):
    import jax
    if os.environ.get('OURS_CPU'):
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    sys.path.insert(0, REPO)
    from tenpy_tpu.linalg import packed as pk
    pk.start_transfer_keepalive()
    print("backend:", jax.default_backend())
    from tenpy_tpu.models.xxz_chain import XXZChain
    from tenpy_tpu.algorithms.packed_tebd import DeviceTEBDEngine
    psi = _load(chi)
    m = XXZChain(dict(MODEL_EVO))
    if os.environ.get('TEBD_CHECK_E'):
        m_gs = XXZChain(dict(MODEL_GS))
        print(f"E/site(GS-H) = {float(m_gs.H_MPO.expectation_value(psi)):.10f}")
    eng = DeviceTEBDEngine(psi, m, {
        'chi_max': chi, 'svd_min': 1e-10, 'dt': DT, 'order': 2,
        'type_evo': 'real', 'N_steps': 1, 'cap_factor': 1.2,
        'backend': os.environ.get('TEBD_BACKEND') or None})
    t0 = time.time()
    eng.evolve(1)           # warm-up: pays jit compiles
    t_compile = time.time() - t0
    print(f"compile+first step: {t_compile:.1f}s")
    times = []
    for _ in range(N_STEPS):
        t0 = time.time()
        eng.evolve(1)       # evolve() syncs (fetches trunc err) per call
        times.append(time.time() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(f"step times: {['%.2f' % t for t in sorted(times)]}")
    print(f"RESULT ours TEBD chi={chi}: {med:.3f} s/step median of "
          f"{N_STEPS} (trunc_err {eng.trunc_err.eps:.2e}, "
          f"t={eng.evolved_time:.2f})")
    return med


def cmd_ref(chi=CHI):
    sys.path.insert(0, '/root/reference')
    import tenpy
    from tenpy.models.xxz_chain import XXZChain
    from tenpy.algorithms import tebd
    print("reference tenpy", tenpy.__version__)
    psi = _load_ref(chi)
    m = XXZChain(dict(MODEL_EVO))
    eng = tebd.TEBDEngine(psi, m, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-10},
        'dt': DT, 'order': 2, 'N_steps': 1})
    t0 = time.time()
    eng.run()
    print(f"first step: {time.time()-t0:.1f}s")
    times = []
    for _ in range(N_STEPS):
        t0 = time.time()
        eng.run()
        times.append(time.time() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(f"step times: {['%.2f' % t for t in sorted(times)]}")
    print(f"RESULT ref TEBD chi={chi}: {med:.3f} s/step median of {N_STEPS} "
          f"(trunc_err {eng.trunc_err.eps:.2e})")
    return med


def _load_ref(chi=CHI):
    """Rebuild the ramped state as a reference-tenpy MPS (via flat arrays)."""
    import numpy as np
    sys.path.insert(0, REPO)
    psi_ours = _load(chi)
    from tenpy.networks.mps import MPS as RefMPS
    from tenpy.models.xxz_chain import XXZChain as RefXXZ
    m = RefXXZ(dict(MODEL_GS))
    sites = m.lat.mps_sites()
    # hand the state over with fully explicit charge data (no detection:
    # zero-weight sectors of the evolved state would defeat
    # detect_legcharge); our Sz site uses the same (sorted) basis and the
    # same 2*Sz charge convention as the reference
    import tenpy.linalg.np_conserved as ref_npc
    chinfo = sites[0].leg.chinfo

    def ref_leg(leg):
        return ref_npc.LegCharge.from_qflat(
            chinfo, np.asarray(leg.to_qflat()), qconj=leg.qconj)

    Bs_npc = []
    for i in range(2):
        B = psi_ours.get_B(i, 'B').transpose(['vL', 'p', 'vR'])
        legs = [ref_leg(B.get_leg('vL')), sites[i].leg,
                ref_leg(B.get_leg('vR'))]
        Bn = ref_npc.Array.from_ndarray(np.asarray(B.to_ndarray()), legs,
                                        cutoff=1e-14)
        Bn.iset_leg_labels(['vL', 'p', 'vR'])
        Bs_npc.append(Bn)
    Ss = [np.asarray(psi_ours.get_SL(i)) for i in range(2)]
    psi = RefMPS(sites, Bs_npc, Ss + [Ss[0]], bc='infinite', form='B')
    psi.canonical_form()
    if os.environ.get('TEBD_CHECK_E'):
        m_gs = RefXXZ(dict(MODEL_GS))
        print(f"E/site(GS-H) = "
              f"{float(m_gs.H_MPO.expectation_value(psi)):.10f}")
    return psi


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'ours'
    chi = int(sys.argv[2]) if len(sys.argv) > 2 else CHI
    if mode == 'ramp':
        cmd_ramp(chi)
    elif mode == 'grow':
        cmd_grow(chi)
    elif mode == 'ours':
        rc = 0
        try:
            cmd_ours(chi)
        except BaseException:
            import traceback
            traceback.print_exc()
            rc = 1
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(rc)   # axon teardown can abort; result already printed
    elif mode == 'ref':
        cmd_ref(chi)
    else:
        raise SystemExit(f"unknown mode {mode}")
