r"""Haldane Chern-insulator models on the honeycomb lattice.

Rebuild of ``tenpy/models/haldane.py`` (BosonicHaldaneModel :13,
FermionicHaldaneModel :91): NN hopping t1 + complex NNN hopping t2 e^{i phi}.
"""

from __future__ import annotations

import numpy as np

from .model import CouplingMPOModel
from .lattice import Honeycomb
from ..networks.site import BosonSite, FermionSite

__all__ = ['BosonicHaldaneModel', 'FermionicHaldaneModel']


class FermionicHaldaneModel(CouplingMPOModel):
    r"""Spinless fermions on the honeycomb with Haldane NNN phases.

    Options: ``t1`` (-1.), ``t2`` (complex, default 0.1*exp(i pi/2)*t1-ish), ``mu``,
    ``V``, ``conserve`` ('N').  Reference: ``haldane.py:91``.
    """

    default_lattice = Honeycomb

    def init_sites(self, model_params):
        conserve = model_params.get('conserve', 'N')
        return FermionSite(conserve=conserve)

    def init_terms(self, model_params):
        t1 = model_params.get('t1', -1., 'real_or_array')
        t2_default = 0.1 * abs(np.asarray(t1).flat[0]) * np.exp(1j * np.pi / 2.)
        t2 = model_params.get('t2', t2_default)
        mu = model_params.get('mu', 0., 'real_or_array')
        V = model_params.get('V', 0., 'real_or_array')
        for u in (0, 1):
            self.add_onsite(-mu, u, 'N')
        for u1, u2, dx in self.lat.pairs['nearest_neighbors']:
            self.add_coupling(t1, u1, 'Cd', u2, 'C', dx, plus_hc=True)
            if np.any(np.asarray(V) != 0.):
                self.add_coupling(V, u1, 'N', u2, 'N', dx)
        # NNN with chirality: +phi on sublattice A loops, -phi on B
        for u1, u2, dx in self.lat.pairs['next_nearest_neighbors']:
            # opposite chirality phases on the two sublattices
            amp = t2 if u1 == 0 else np.conj(t2)
            self.add_coupling(amp, u1, 'Cd', u2, 'C', dx, plus_hc=True)


class BosonicHaldaneModel(CouplingMPOModel):
    r"""Hardcore-boson Haldane model. Reference: ``haldane.py:13``."""

    default_lattice = Honeycomb

    def init_sites(self, model_params):
        conserve = model_params.get('conserve', 'N')
        return BosonSite(Nmax=1, conserve=conserve)

    def init_terms(self, model_params):
        t1 = model_params.get('t1', -1., 'real_or_array')
        t2_default = 0.1 * abs(np.asarray(t1).flat[0]) * np.exp(1j * np.pi / 2.)
        t2 = model_params.get('t2', t2_default)
        mu = model_params.get('mu', 0., 'real_or_array')
        V = model_params.get('V', 0., 'real_or_array')
        for u in (0, 1):
            self.add_onsite(-mu, u, 'N')
        for u1, u2, dx in self.lat.pairs['nearest_neighbors']:
            self.add_coupling(t1, u1, 'Bd', u2, 'B', dx, plus_hc=True)
            if np.any(np.asarray(V) != 0.):
                self.add_coupling(V, u1, 'N', u2, 'N', dx)
        for u1, u2, dx in self.lat.pairs['next_nearest_neighbors']:
            self.add_coupling(t2 if u1 == 0 else np.conj(t2), u1, 'Bd', u2, 'B',
                              dx, plus_hc=True)
