"""Lattices, the coupling-model DSL, and the model zoo (SURVEY.md §2.3)."""
from . import lattice, model
from . import tf_ising, xxz_chain, spins, spins_nnn, fermions_spinless, hubbard
from . import tj_model, aklt, clock, pxp, hofstadter, haldane, toric_code
from . import molecular

__all__ = ['molecular', 'lattice', 'model', 'tf_ising', 'xxz_chain', 'spins', 'spins_nnn',
           'fermions_spinless', 'hubbard', 'tj_model', 'aklt', 'clock', 'pxp',
           'hofstadter', 'haldane', 'toric_code']
