"""Algorithms: DMRG, TEBD, TDVP, VUMPS, MPO evolution, purification, ED (SURVEY §2.4)."""
from . import algorithm, mps_common, dmrg, dmrg_parallel, exact_diag, tebd, \
    tdvp, vumps, mpo_evolution, purification, disentangler, \
    network_contractor, plane_wave_excitation

__all__ = ['algorithm', 'mps_common', 'dmrg', 'dmrg_parallel', 'exact_diag',
           'tebd', 'tdvp', 'vumps', 'mpo_evolution', 'purification',
           'disentangler', 'network_contractor', 'plane_wave_excitation']
