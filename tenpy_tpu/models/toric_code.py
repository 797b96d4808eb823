r"""Kitaev's toric code on a (dual) square lattice.

Rebuild of ``tenpy/models/toric_code.py`` (DualSquare :17, ToricCode :90):
``H = -Jv sum_v A_v - Jp sum_p B_p`` with vertex stars A_v = prod sigma^x and
plaquettes B_p = prod sigma^z.
"""

from __future__ import annotations

import numpy as np

from .model import CouplingMPOModel
from .lattice import Lattice
from ..networks.site import SpinHalfSite

__all__ = ['DualSquare', 'ToricCode']


class DualSquare(Lattice):
    """Square lattice with sites on the BONDS (2-site unit cell: horizontal and
    vertical edges). Reference: ``toric_code.py:17``."""

    dim = 2

    def __init__(self, Lx, Ly, site, **kwargs):
        sites = [site, site]
        pos = np.array([[0.5, 0.], [0., 0.5]])
        kwargs.setdefault('positions', pos)
        super().__init__([Lx, Ly], sites, **kwargs)


class ToricCode(CouplingMPOModel):
    """Toric code. Options: ``Jv`` (1.), ``Jp`` (1.), ``Lx``, ``Ly``,
    ``conserve`` (None).  Reference: ``toric_code.py:90``."""

    default_lattice = DualSquare
    force_default_lattice = True

    def init_sites(self, model_params):
        conserve = model_params.get('conserve', 'parity')
        return SpinHalfSite(conserve=conserve)

    def init_terms(self, model_params):
        Jv = model_params.get('Jv', 1., 'real_or_array')
        Jp = model_params.get('Jp', 1., 'real_or_array')
        # vertex star at (x, y): edges (x,y,u=0), (x,y,u=1), (x-1,y,u=0), (x,y-1,u=1)
        self.add_multi_coupling(-np.asarray(Jv), [
            ('Sigmax', [0, 0], 0), ('Sigmax', [0, 0], 1),
            ('Sigmax', [-1, 0], 0), ('Sigmax', [0, -1], 1)])
        # plaquette at (x, y): edges (x,y,u=1)? standard: B_p = product of sigma^z
        # around the square: (x, y, 0), (x+1, y, 1), (x, y+1, 0), (x, y, 1)
        self.add_multi_coupling(-np.asarray(Jp), [
            ('Sigmaz', [0, 0], 0), ('Sigmaz', [1, 0], 1),
            ('Sigmaz', [0, 1], 0), ('Sigmaz', [0, 0], 1)])
