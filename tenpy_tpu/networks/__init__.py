"""States and operators on the 1D chain: sites, MPS, MPO, terms (SURVEY.md §2.2)."""
from . import site, terms, mps

__all__ = ['site', 'terms', 'mps']
