r"""Bose-Hubbard and Fermi-Hubbard models.

Rebuild of ``tenpy/models/hubbard.py`` (BoseHubbardModel :21, BoseHubbardChain :91,
FermiHubbardModel :132, FermiHubbardChain :207).
"""

from __future__ import annotations

import numpy as np

from .model import CouplingMPOModel, NearestNeighborModel
from .lattice import Chain
from ..networks.site import BosonSite, SpinHalfFermionSite

__all__ = ['BoseHubbardModel', 'BoseHubbardChain', 'FermiHubbardModel',
           'FermiHubbardChain']


class BoseHubbardModel(CouplingMPOModel):
    r"""Bose-Hubbard: ``H = -t sum (b^dag_i b_j + h.c.) + U/2 sum n(n-1)
    + V sum n_i n_j - mu sum n``.

    Options: ``t`` (1.), ``U`` (0.), ``V`` (0.), ``mu`` (0.), ``n_max`` (3),
    ``conserve`` ('N').
    """

    def init_sites(self, model_params):
        n_max = model_params.get('n_max', 3, int)
        filling = model_params.get('filling', 0.5, 'real')
        conserve = model_params.get('conserve', 'N')
        if conserve == 'best':
            conserve = 'N'
        return BosonSite(Nmax=n_max, conserve=conserve, filling=filling)

    def init_terms(self, model_params):
        t = model_params.get('t', 1., 'real_or_array')
        U = model_params.get('U', 0., 'real_or_array')
        V = model_params.get('V', 0., 'real_or_array')
        mu = model_params.get('mu', 0., 'real_or_array')
        for u in range(len(self.lat.unit_cell)):
            self.add_onsite(-np.asarray(mu) - np.asarray(U) / 2., u, 'N')
            self.add_onsite(np.asarray(U) / 2., u, 'NN')
        for u1, u2, dx in self.lat.pairs['nearest_neighbors']:
            self.add_coupling(-t, u1, 'Bd', u2, 'B', dx, plus_hc=True)
            self.add_coupling(V, u1, 'N', u2, 'N', dx)


class BoseHubbardChain(BoseHubbardModel, NearestNeighborModel):
    default_lattice = Chain
    force_default_lattice = True


class FermiHubbardModel(CouplingMPOModel):
    r"""Fermi-Hubbard: ``H = -t sum (c^dag_{s,i} c_{s,j} + h.c.) + U sum n_up n_down
    + V sum n_i n_j - mu sum n``.

    Options: ``t`` (1.), ``U`` (0.), ``V`` (0.), ``mu`` (0.),
    ``cons_N`` ('N'), ``cons_Sz`` ('Sz').
    """

    def init_sites(self, model_params):
        cons_N = model_params.get('cons_N', 'N')
        cons_Sz = model_params.get('cons_Sz', 'Sz')
        return SpinHalfFermionSite(cons_N=cons_N, cons_Sz=cons_Sz)

    def init_terms(self, model_params):
        t = model_params.get('t', 1., 'real_or_array')
        U = model_params.get('U', 0., 'real_or_array')
        V = model_params.get('V', 0., 'real_or_array')
        mu = model_params.get('mu', 0., 'real_or_array')
        for u in range(len(self.lat.unit_cell)):
            self.add_onsite(-mu, u, 'Ntot')
            self.add_onsite(U, u, 'NuNd')
        for u1, u2, dx in self.lat.pairs['nearest_neighbors']:
            self.add_coupling(-t, u1, 'Cdu', u2, 'Cu', dx, plus_hc=True)
            self.add_coupling(-t, u1, 'Cdd', u2, 'Cd', dx, plus_hc=True)
            if np.any(np.asarray(V) != 0.):
                self.add_coupling(V, u1, 'Ntot', u2, 'Ntot', dx)


class FermiHubbardChain(FermiHubbardModel, NearestNeighborModel):
    default_lattice = Chain
    force_default_lattice = True
