"""Algorithms: DMRG, TEBD, TDVP, VUMPS, MPO evolution, purification, ED (SURVEY §2.4)."""
from . import algorithm, mps_common, dmrg, exact_diag, tebd, tdvp, vumps, \
    mpo_evolution, purification, disentangler

__all__ = ['algorithm', 'mps_common', 'dmrg', 'exact_diag', 'tebd', 'tdvp',
           'vumps', 'mpo_evolution', 'purification', 'disentangler']
