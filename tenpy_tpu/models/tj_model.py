r"""t-J model.

Rebuild of ``tenpy/models/tj_model.py`` (tJModel :11, tJChain :75):
``H = -t sum (c^dag_s,i c_s,j + h.c.) + J sum (S_i . S_j - n_i n_j / 4)``
in the no-double-occupancy subspace (SpinHalfHoleSite).
"""

from __future__ import annotations

import numpy as np

from .model import CouplingMPOModel, NearestNeighborModel
from .lattice import Chain
from ..networks.site import SpinHalfHoleSite

__all__ = ['tJModel', 'tJChain']


class tJModel(CouplingMPOModel):
    """t-J model. Options: ``t`` (1.), ``J`` (0.3), cons_N ('N'), cons_Sz ('Sz')."""

    def init_sites(self, model_params):
        cons_N = model_params.get('cons_N', 'N')
        cons_Sz = model_params.get('cons_Sz', 'Sz')
        return SpinHalfHoleSite(cons_N=cons_N, cons_Sz=cons_Sz)

    def init_terms(self, model_params):
        t = model_params.get('t', 1., 'real_or_array')
        J = model_params.get('J', 0.3, 'real_or_array')
        for u1, u2, dx in self.lat.pairs['nearest_neighbors']:
            self.add_coupling(-t, u1, 'Cdu', u2, 'Cu', dx, plus_hc=True)
            self.add_coupling(-t, u1, 'Cdd', u2, 'Cd', dx, plus_hc=True)
            self.add_coupling(J / 2., u1, 'Sp', u2, 'Sm', dx, plus_hc=True)
            self.add_coupling(J, u1, 'Sz', u2, 'Sz', dx)
            self.add_coupling(-J / 4., u1, 'Ntot', u2, 'Ntot', dx)


class tJChain(tJModel, NearestNeighborModel):
    default_lattice = Chain
    force_default_lattice = True
