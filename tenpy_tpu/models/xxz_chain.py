r"""XXZ spin-1/2 chain.

Rebuild of ``tenpy/models/xxz_chain.py`` (XXZChain :17, XXZChain2 :105):
``H = Jxx/2 (Sp Sm + Sm Sp) + Jz Sz Sz - hz Sz``.
"""

from __future__ import annotations

import numpy as np

from .model import CouplingMPOModel, NearestNeighborModel
from .lattice import Chain
from ..networks.site import SpinHalfSite

__all__ = ['XXZChain', 'XXZChain2']


class XXZChain(CouplingMPOModel, NearestNeighborModel):
    r"""XXZ chain with Sz conservation.

    Options: ``Jxx`` (1.), ``Jz`` (1.), ``hz`` (0.), ``L``, ``bc_MPS``.
    """

    default_lattice = Chain
    force_default_lattice = True

    def init_sites(self, model_params):
        sort_charge = model_params.get('sort_charge', True, bool)
        return SpinHalfSite(conserve='Sz', sort_charge=sort_charge)

    def init_terms(self, model_params):
        Jxx = model_params.get('Jxx', 1., 'real_or_array')
        Jz = model_params.get('Jz', 1., 'real_or_array')
        hz = model_params.get('hz', 0., 'real_or_array')
        self.add_onsite(-hz, 0, 'Sz')
        for u1, u2, dx in self.lat.pairs['nearest_neighbors']:
            self.add_coupling(Jxx * 0.5, u1, 'Sp', u2, 'Sm', dx, plus_hc=True)
            self.add_coupling(Jz, u1, 'Sz', u2, 'Sz', dx)


class XXZChain2(XXZChain):
    """Same Hamiltonian, built through the generic SpinModel path in the reference;
    kept as an alias here. Reference: ``xxz_chain.py:105``."""
