"""Tensor engine: charge-conserving block-sparse arrays on JAX/XLA, truncation, Krylov.

Mirrors the role of the reference ``tenpy/linalg/`` (SURVEY.md §2.1).
"""
from . import charges, np_conserved, truncation, sparse, krylov_based, random_matrix

__all__ = ['charges', 'np_conserved', 'truncation', 'sparse', 'krylov_based',
           'random_matrix']
