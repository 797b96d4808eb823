"""Lattices, the coupling-model DSL, and the model zoo (SURVEY.md §2.3)."""
from . import lattice, model
from . import tf_ising, xxz_chain, spins, spins_nnn, fermions_spinless, hubbard
from . import tj_model, aklt, clock, pxp, hofstadter, haldane, toric_code
from . import molecular, mixed_xk

__all__ = ['molecular', 'mixed_xk', 'lattice', 'model', 'tf_ising',
           'xxz_chain', 'spins', 'spins_nnn',
           'fermions_spinless', 'hubbard', 'tj_model', 'aklt', 'clock', 'pxp',
           'hofstadter', 'haldane', 'toric_code']
