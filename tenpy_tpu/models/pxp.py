r"""PXP model (Rydberg blockade).

Rebuild of ``tenpy/models/pxp.py`` (PXPChain :13):
``H = Omega sum P_{i-1} X_i P_{i+1}`` with P = |0><0|.
"""

from __future__ import annotations

import numpy as np

from .model import CouplingMPOModel
from .lattice import Chain
from ..networks.site import SpinHalfSite

__all__ = ['PXPChain']


class PXPChain(CouplingMPOModel):
    """PXP chain. Options: ``Omega`` (1.)."""

    default_lattice = Chain
    force_default_lattice = True

    def init_sites(self, model_params):
        site = SpinHalfSite(conserve=None)
        # projector onto down (vacuum) and X
        P = np.array([[0., 0.], [0., 1.]])  # |down><down| in [up, down] order
        site.add_op('P0', P, permute_dense=True)
        return site

    def init_terms(self, model_params):
        Omega = model_params.get('Omega', 1., 'real_or_array')
        self.add_multi_coupling(Omega, [('P0', [-1], 0), ('Sigmax', [0], 0),
                                        ('P0', [1], 0)])
