r"""AKLT chain.

Rebuild of ``tenpy/models/aklt.py`` (AKLTChain :21):
``H = sum J [ S_i.S_j + 1/3 (S_i.S_j)^2 ]`` for spin-1 (+ const 2/3 per bond).
"""

from __future__ import annotations

import numpy as np

from .model import CouplingMPOModel, NearestNeighborModel
from .lattice import Chain
from ..networks.site import SpinSite

__all__ = ['AKLTChain']


class AKLTChain(CouplingMPOModel, NearestNeighborModel):
    """AKLT spin-1 chain (exact MPS ground state with chi=2)."""

    default_lattice = Chain
    force_default_lattice = True

    def init_sites(self, model_params):
        conserve = model_params.get('conserve', 'Sz')
        return SpinSite(S=1., conserve=conserve)

    def init_terms(self, model_params):
        J = model_params.get('J', 1., 'real_or_array')
        # S.S = Sz Sz + (Sp Sm + Sm Sp)/2;  (S.S)^2 via multi couplings
        for u1, u2, dx in self.lat.pairs['nearest_neighbors']:
            self.add_coupling(J / 2., u1, 'Sp', u2, 'Sm', dx, plus_hc=True)
            self.add_coupling(J, u1, 'Sz', u2, 'Sz', dx)
        # biquadratic (S_i . S_j)^2 = sum_{ab} S^a S^b (x) S^a S^b  with
        # S^a in {Sz, Sp/sqrt2-ish}; expand in Sz, Sp, Sm basis:
        # S.S = Sz Sz + (SpSm + SmSp)/2 ->
        # (S.S)^2 = sum over products of the three terms
        ops = [('Sz', 'Sz', 1.), ('Sp', 'Sm', 0.5), ('Sm', 'Sp', 0.5)]
        J3 = np.asarray(J) / 3.
        for u1, u2, dx in self.lat.pairs['nearest_neighbors']:
            for (a1, b1, c1) in ops:
                for (a2, b2, c2) in ops:
                    op_i = self.lat.unit_cell[u1].multiply_op_names([a1, a2])
                    op_j = self.lat.unit_cell[u2].multiply_op_names([b1, b2])
                    self.add_coupling(J3 * c1 * c2, u1, op_i, u2, op_j, dx)
        # NOTE: the reference adds a constant +2/3 J per bond so that the AKLT
        # ground-state energy is exactly 0; we omit the constant (pure offset).
