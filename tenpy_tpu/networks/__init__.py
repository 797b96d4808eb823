"""States and operators on the 1D chain: sites, MPS, MPO, terms (SURVEY.md §2.2)."""
from . import site, terms, mps, mpo, purification_mps, uniform_mps, momentum_mps

__all__ = ['site', 'terms', 'mps', 'mpo', 'purification_mps', 'uniform_mps',
           'momentum_mps']
