"""Segment DMRG: a finite window embedded in infinite boundary conditions.

First converge the infinite ground state, then extract a segment and rerun
DMRG only inside the window with fixed infinite environments — the standard
setup for local perturbations/impurities without boundary effects.
Reference analogue: ``examples/advanced/tfi_segment.py``.
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.mpo import MPOTransferMatrix
from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.algorithms import dmrg


def run(g=1.5, chi=24, enlarge=3):
    m_inf = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                      'conserve': 'parity'})
    psi = MPS.from_product_state(m_inf.lat.mps_sites(), ['up', 'up'],
                                 bc='infinite')
    eng = dmrg.TwoSiteDMRGEngine(psi, m_inf, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-12},
        'mixer': True, 'max_E_err': 1e-12, 'max_sweeps': 30})
    E0, _ = eng.run()
    print(f"infinite GS: E/site = {E0:.10f}")

    # infinite boundary environments + a window of `enlarge` unit cells
    env_data, _, _ = MPOTransferMatrix.find_init_LP_RP(m_inf.H_MPO, psi,
                                                       calc_E=True)
    m_seg = m_inf.extract_segment(enlarge=enlarge)
    first, last = m_seg.lat.segment_first_last
    psi_seg = psi.extract_segment(first, last)

    eng_seg = dmrg.TwoSiteDMRGEngine(psi_seg, m_seg, {
        'trunc_params': {'chi_max': chi, 'svd_min': 1e-12},
        'max_sweeps': 6, 'mixer': False},
        resume_data={'init_env_data': dict(env_data)})
    E_seg, _ = eng_seg.run()
    print(f"segment run: E = {E_seg:.10f} (offset includes environments)")
    # physics check: local magnetization in the window matches the infinite GS
    Sz_inf = psi.expectation_value('Sz')
    Sz_seg = psi_seg.expectation_value('Sz')
    mid = len(Sz_seg) // 2
    print(f"<Sz> mid-window {Sz_seg[mid]:.8f} vs infinite {Sz_inf[mid % 2]:.8f}")
    assert abs(Sz_seg[mid] - Sz_inf[mid % 2]) < 1e-5
    return E_seg


if __name__ == '__main__':
    run()
