r"""Hofstadter models: charged particles on a square lattice in a magnetic field.

Rebuild of ``tenpy/models/hofstadter.py`` (gauge_hopping :18, HofstadterFermions
:145, HofstadterBosons :242).  Hopping phases in Landau gauge.
"""

from __future__ import annotations

import numpy as np

from .model import CouplingMPOModel
from .lattice import Square
from ..networks.site import FermionSite, BosonSite

__all__ = ['gauge_hopping', 'HofstadterFermions', 'HofstadterBosons']


def gauge_hopping(model_params, Lx, Ly):
    """Hopping amplitude arrays (hop_x, hop_y) in the chosen gauge.

    flux phi = phi_p/phi_q per plaquette; 'landau_x' gauge: hop_y picks up
    exp(2 pi i phi x). Reference: ``hofstadter.py:18``."""
    gauge = model_params.get('gauge', 'landau_x', str)
    phi_p, phi_q = model_params.get('phi', (1, 3))
    phi = 2. * np.pi * phi_p / phi_q
    Jx = model_params.get('Jx', 1., 'real')
    Jy = model_params.get('Jy', 1., 'real')
    if gauge == 'landau_x':
        # hopping in y-direction with x-dependent phase
        x = np.arange(Lx)
        hop_x = -Jx * np.ones((Lx, Ly))
        hop_y = -Jy * np.exp(1.j * phi * x)[:, None] * np.ones((Lx, Ly))
    elif gauge == 'landau_y':
        y = np.arange(Ly)
        hop_x = -Jx * np.exp(-1.j * phi * y)[None, :] * np.ones((Lx, Ly))
        hop_y = -Jy * np.ones((Lx, Ly))
    else:
        raise ValueError(f"unknown gauge {gauge!r}")
    return hop_x, hop_y


class HofstadterFermions(CouplingMPOModel):
    r"""Spinless fermions with flux. Options: ``phi`` ((1,3)), ``Jx,Jy``, ``mu``,
    ``v`` (interaction), ``conserve`` ('N'), ``gauge``.  Reference: ``:145``."""

    default_lattice = Square

    def init_sites(self, model_params):
        conserve = model_params.get('conserve', 'N')
        return FermionSite(conserve=conserve)

    def init_terms(self, model_params):
        Lx, Ly = self.lat.Ls
        hop_x, hop_y = gauge_hopping(model_params, Lx, Ly)
        mu = model_params.get('mu', 0., 'real_or_array')
        v = model_params.get('v', 0., 'real_or_array')
        self.add_onsite(-mu, 0, 'N')
        dx_x = np.array([1, 0])
        dx_y = np.array([0, 1])
        shape_x, _ = self.lat.coupling_shape(dx_x)
        shape_y, _ = self.lat.coupling_shape(dx_y)
        self.add_coupling(hop_x[:shape_x[0], :shape_x[1]], 0, 'Cd', 0, 'C', dx_x,
                          plus_hc=True)
        self.add_coupling(hop_y[:shape_y[0], :shape_y[1]], 0, 'Cd', 0, 'C', dx_y,
                          plus_hc=True)
        if np.any(np.asarray(v) != 0.):
            self.add_coupling(v, 0, 'N', 0, 'N', dx_x)
            self.add_coupling(v, 0, 'N', 0, 'N', dx_y)


class HofstadterBosons(CouplingMPOModel):
    r"""Bosons with flux. Options add ``Nmax`` (3), ``U`` (onsite).  Reference: ``:242``."""

    default_lattice = Square

    def init_sites(self, model_params):
        Nmax = model_params.get('Nmax', 3, int)
        conserve = model_params.get('conserve', 'N')
        return BosonSite(Nmax=Nmax, conserve=conserve)

    def init_terms(self, model_params):
        Lx, Ly = self.lat.Ls
        hop_x, hop_y = gauge_hopping(model_params, Lx, Ly)
        mu = model_params.get('mu', 0., 'real_or_array')
        U = model_params.get('U', 0., 'real_or_array')
        self.add_onsite(-np.asarray(mu) - np.asarray(U) / 2., 0, 'N')
        self.add_onsite(np.asarray(U) / 2., 0, 'NN')
        dx_x = np.array([1, 0])
        dx_y = np.array([0, 1])
        shape_x, _ = self.lat.coupling_shape(dx_x)
        shape_y, _ = self.lat.coupling_shape(dx_y)
        self.add_coupling(hop_x[:shape_x[0], :shape_x[1]], 0, 'Bd', 0, 'B', dx_x,
                          plus_hc=True)
        self.add_coupling(hop_y[:shape_y[0], :shape_y[1]], 0, 'Bd', 0, 'B', dx_y,
                          plus_hc=True)
