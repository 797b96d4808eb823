r"""Transverse-field Ising model.

Rebuild of ``tenpy/models/tf_ising.py`` (TFIModel :20, TFIChain :74):
``H = -J sum sigma^x_i sigma^x_j - g sum sigma^z_i``.
"""

from __future__ import annotations

import numpy as np

from .model import CouplingMPOModel, NearestNeighborModel
from .lattice import Chain
from ..networks.site import SpinHalfSite

__all__ = ['TFIModel', 'TFIChain']


class TFIModel(CouplingMPOModel):
    r"""Transverse-field Ising on a generic lattice.

    Options: ``J`` (1.), ``g`` (1.), ``conserve`` ('parity' | None | 'best').
    """

    def init_sites(self, model_params):
        conserve = model_params.get('conserve', 'parity')
        if conserve == 'best':
            conserve = 'parity'
        site = SpinHalfSite(conserve=conserve)
        return site

    def init_terms(self, model_params):
        J = model_params.get('J', 1., 'real_or_array')
        g = model_params.get('g', 1., 'real_or_array')
        for u in range(len(self.lat.unit_cell)):
            self.add_onsite(-g, u, 'Sigmaz')
        for u1, u2, dx in self.lat.pairs['nearest_neighbors']:
            self.add_coupling(-J, u1, 'Sigmax', u2, 'Sigmax', dx)


class TFIChain(TFIModel, NearestNeighborModel):
    """TFI on a chain (with H_bond for TEBD). Reference: ``tf_ising.py:74``."""

    default_lattice = Chain
    force_default_lattice = True
