r"""Spin chains with next-nearest-neighbor couplings.

Rebuild of ``tenpy/models/spins_nnn.py`` (SpinChainNNN :26 via grouped 2-site cell,
SpinChainNNN2 :125 via plain multi-range couplings).
"""

from __future__ import annotations

import numpy as np

from .model import CouplingMPOModel, NearestNeighborModel
from .lattice import Chain
from ..networks.site import SpinSite, GroupedSite

__all__ = ['SpinChainNNN', 'SpinChainNNN2']


class SpinChainNNN2(CouplingMPOModel):
    r"""NN + NNN anisotropic couplings on a chain (MPO-based).

    Options: ``S``, ``conserve``, ``Jx,Jy,Jz`` (1.), ``Jxp,Jyp,Jzp`` (1.),
    ``hx,hy,hz`` (0.).
    """

    default_lattice = Chain
    force_default_lattice = True

    def init_sites(self, model_params):
        S = model_params.get('S', 0.5)
        conserve = model_params.get('conserve', 'best')
        if conserve == 'best':
            Jx = model_params.silent_get('Jx', 1.)
            Jy = model_params.silent_get('Jy', 1.)
            Jxp = model_params.silent_get('Jxp', 1.)
            Jyp = model_params.silent_get('Jyp', 1.)
            if np.allclose(Jx, Jy) and np.allclose(Jxp, Jyp):
                conserve = 'Sz'
            else:
                conserve = 'parity'
        return SpinSite(S=S, conserve=conserve)

    def init_terms(self, model_params):
        Jx = np.asarray(model_params.get('Jx', 1., 'real_or_array'))
        Jy = np.asarray(model_params.get('Jy', 1., 'real_or_array'))
        Jz = model_params.get('Jz', 1., 'real_or_array')
        Jxp = np.asarray(model_params.get('Jxp', 1., 'real_or_array'))
        Jyp = np.asarray(model_params.get('Jyp', 1., 'real_or_array'))
        Jzp = model_params.get('Jzp', 1., 'real_or_array')
        hz = model_params.get('hz', 0., 'real_or_array')
        self.add_onsite(-hz, 0, 'Sz')
        for J_x, J_y, J_z, dx in [(Jx, Jy, Jz, [1]), (Jxp, Jyp, Jzp, [2])]:
            self.add_coupling((J_x + J_y) / 4., 0, 'Sp', 0, 'Sm', dx, plus_hc=True)
            if np.any((J_x - J_y) != 0.):
                self.add_coupling((J_x - J_y) / 4., 0, 'Sp', 0, 'Sp', dx,
                                  plus_hc=True)
            self.add_coupling(J_z, 0, 'Sz', 0, 'Sz', dx)


class SpinChainNNN(SpinChainNNN2, NearestNeighborModel):
    r"""NNN chain using a grouped 2-site unit cell so that all couplings become
    nearest-neighbor (TEBD-able).  Reference: ``spins_nnn.py:26``."""

    def init_sites(self, model_params):
        site = SpinChainNNN2.init_sites(self, model_params)
        return GroupedSite([site, site], charges='same')

    def init_terms(self, model_params):
        Jx = np.asarray(model_params.get('Jx', 1., 'real_or_array'))
        Jy = np.asarray(model_params.get('Jy', 1., 'real_or_array'))
        Jz = model_params.get('Jz', 1., 'real_or_array')
        Jxp = np.asarray(model_params.get('Jxp', 1., 'real_or_array'))
        Jyp = np.asarray(model_params.get('Jyp', 1., 'real_or_array'))
        Jzp = model_params.get('Jzp', 1., 'real_or_array')
        hz = model_params.get('hz', 0., 'real_or_array')
        self.add_onsite(-hz, 0, 'Sz0')
        self.add_onsite(-hz, 0, 'Sz1')
        # NN: distance-1 couplings connect subsite 0-1 within a cell and 1-0
        # across cells; NNN (distance 2) connect equal subsites of adjacent cells.
        for (Ja, Jb, Jc, pairs) in [
            (Jx, Jy, Jz, [('0', '1', [0]), ('1', '0', [1])]),      # dist 1
            (Jxp, Jyp, Jzp, [('0', '0', [1]), ('1', '1', [1])]),   # dist 2
        ]:
            for (sa, sb, dx) in pairs:
                self.add_coupling((Ja + Jb) / 4., 0, 'Sp' + sa, 0, 'Sm' + sb, dx,
                                  plus_hc=True)
                if np.any((Ja - Jb) != 0.):
                    self.add_coupling((Ja - Jb) / 4., 0, 'Sp' + sa, 0, 'Sp' + sb,
                                      dx, plus_hc=True)
                self.add_coupling(Jc, 0, 'Sz' + sa, 0, 'Sz' + sb, dx)
