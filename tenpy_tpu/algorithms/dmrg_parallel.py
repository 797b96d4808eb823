r"""DMRG for ``explicit_plus_hc`` MPOs, with the h.c. matvec on a worker thread.

Rebuild of ``tenpy/algorithms/dmrg_parallel.py`` (TwoSiteHThreadPlusHC :16,
DMRGThreadPlusHC :57).

An MPO with ``explicit_plus_hc=True`` stores only half of ``H + H^dagger``
(halving the bond dimension); the effective Hamiltonian then applies both the
stored part and its hermitian conjugate per matvec.  The h.c. contraction is
independent of the direct one, so it runs on a worker thread concurrently --
on the host path both halves use BLAS/the native executor, so the two threads
genuinely overlap.
"""

from __future__ import annotations

import logging

from ..linalg import np_conserved as npc
from ..tools.thread import Worker
from .dmrg import TwoSiteDMRGEngine
from .mps_common import TwoSiteH

logger = logging.getLogger(__name__)

__all__ = ['DMRGThreadPlusHC', 'TwoSiteHThreadPlusHC']


class TwoSiteHThreadPlusHC(TwoSiteH):
    """TwoSiteH applying ``Heff + Heff^dagger``, h.c. part on a worker thread.

    Reference: ``tenpy/algorithms/dmrg_parallel.py:16``."""

    def __init__(self, env, i0, combine=True, move_right=True, *,
                 plus_hc_worker=None):
        super().__init__(env, i0, True, move_right)
        self._plus_hc_worker = plus_hc_worker
        if not self.combine:
            raise NotImplementedError("TwoSiteHThreadPlusHC needs combine=True")
        self.RHeff_for_hc = self.RHeff.transpose(['(p1*.vL)', '(p1.vL*)', 'wL'])

    def matvec(self, theta):
        if self._plus_hc_worker is None:
            return super().matvec(theta) + self.matvec_hc(theta)
        res = {}
        self._plus_hc_worker.put_task(self.matvec_hc, theta,
                                      return_dict=res, return_key='theta')
        theta_direct = super().matvec(theta)
        self._plus_hc_worker.join_tasks()
        return theta_direct + res['theta']

    def matvec_hc(self, theta):
        """Apply ``Heff^dagger`` (contract from the conjugate side).

        Reference: ``dmrg_parallel.py:39``."""
        theta = theta.conj()  # labels gain stars
        theta = npc.tensordot(theta, self.LHeff,
                              axes=[['(vL*.p0*)'], ['(vR*.p0)']])
        theta = npc.tensordot(self.RHeff_for_hc, theta,
                              axes=[['(p1.vL*)', 'wL'], ['(p1*.vR*)', 'wR']])
        theta = theta.iconj().itranspose()
        theta.ireplace_labels(['(vR*.p0)', '(p1.vL*)'], ['(vL.p0)', '(p1.vR)'])
        return theta

    def to_matrix(self):
        mat = super().to_matrix()
        mat_hc = mat.conj().itranspose([1, 0])
        mat_hc.iset_leg_labels(mat.get_leg_labels())
        mat_hc.legs = mat.legs
        return mat + mat_hc

    def adjoint(self):
        return self  # Heff + Heff^dagger is hermitian


class DMRGThreadPlusHC(TwoSiteDMRGEngine):
    """Two-site DMRG on an ``explicit_plus_hc`` MPO.

    Reference: ``tenpy/algorithms/dmrg_parallel.py:57``."""

    EffectiveH = TwoSiteHThreadPlusHC

    def __init__(self, psi, model, options, **kwargs):
        self._plus_hc_worker = None
        if not model.H_MPO.explicit_plus_hc:
            raise ValueError("DMRGThreadPlusHC needs an explicit_plus_hc MPO")
        options = dict(options) if not hasattr(options, 'touch') else options
        super().__init__(psi, model, options, **kwargs)
        self.combine = True  # h.c. contraction needs the combined form

    def make_eff_H(self):
        assert self.env.H.explicit_plus_hc
        self.eff_H = self.EffectiveH(self.env, self.i0, True, self.move_right,
                                     plus_hc_worker=self._plus_hc_worker)
        if len(self.ortho_to_envs) > 0:
            self._wrap_ortho_eff_H()

    def run(self):
        self._plus_hc_worker = Worker('EffectiveHPlusHC worker',
                                      max_queue_size=1, daemon=False)
        with self._plus_hc_worker:
            res = super().run()
        self._plus_hc_worker = None
        return res
