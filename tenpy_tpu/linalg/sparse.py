"""Linear-operator abstraction on charge-conserving Arrays + scipy bridge.

Rebuild of ``tenpy/linalg/sparse.py`` (NpcLinearOperator :35, Sum/Shift/Boost/Orthogonal
wrappers :144-270, FlatLinearOperator :273, FlatHermitianOperator :746).

The ``matvec`` of concrete operators (effective Hamiltonians) is where the FLOPs are; those
implementations jit their contraction graph.  The wrappers here are thin host-side
compositions.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import scipy.sparse.linalg

from . import np_conserved as npc
from .charges import LegCharge, QTYPE

__all__ = ['NpcLinearOperator', 'NpcLinearOperatorWrapper', 'SumNpcLinearOperator',
           'ShiftNpcLinearOperator', 'BoostNpcLinearOperator',
           'OrthogonalNpcLinearOperator', 'FlatLinearOperator', 'FlatHermitianOperator']


class NpcLinearOperator:
    """Base class: linear operator acting on :class:`~tenpy_tpu.linalg.np_conserved.Array`.

    Attributes: ``dtype``, ``acts_on`` (leg labels of the vectors).
    """

    dtype = None
    acts_on = None

    def matvec(self, vec):
        raise NotImplementedError("subclass must implement matvec")

    def to_matrix(self):
        """Contract to a dense 2-leg Array (small systems / testing only)."""
        raise NotImplementedError

    def adjoint(self):
        raise NotImplementedError("adjoint not defined for this operator")


class NpcLinearOperatorWrapper:
    """Base for wrappers delegating everything to ``orig_operator``."""

    def __init__(self, orig_operator):
        self.orig_operator = orig_operator

    def __getattr__(self, name):
        return getattr(self.orig_operator, name)

    def unwrapped(self):
        parent = self.orig_operator
        while isinstance(parent, NpcLinearOperatorWrapper):
            parent = parent.orig_operator
        return parent


class SumNpcLinearOperator(NpcLinearOperatorWrapper):
    """``(A + B) @ v``. Reference: ``sparse.py:144``."""

    def __init__(self, orig_operator, other_operator):
        super().__init__(orig_operator)
        self.other_operator = other_operator

    def matvec(self, vec):
        from .krylov_based import _v_axpy
        return _v_axpy(1., self.other_operator.matvec(vec),
                       self.orig_operator.matvec(vec))

    def to_matrix(self):
        return self.orig_operator.to_matrix() + self.other_operator.to_matrix()

    def adjoint(self):
        return SumNpcLinearOperator(self.orig_operator.adjoint(),
                                    self.other_operator.adjoint())


class ShiftNpcLinearOperator(NpcLinearOperatorWrapper):
    """``(A + shift * 1) @ v`` — e.g. to make an operator definite."""

    def __init__(self, orig_operator, shift):
        if shift == 0.:
            import warnings
            warnings.warn("shift=0: no-op wrapper", stacklevel=2)
        super().__init__(orig_operator)
        self.shift = shift

    def matvec(self, vec):
        from .krylov_based import _v_axpy
        return _v_axpy(self.shift, vec, self.orig_operator.matvec(vec))

    def to_matrix(self):
        mat = self.orig_operator.to_matrix()
        return mat + self.shift * npc.eye_like(mat)

    def adjoint(self):
        return ShiftNpcLinearOperator(self.orig_operator.adjoint(),
                                      np.conj(self.shift))


class BoostNpcLinearOperator(NpcLinearOperatorWrapper):
    """``(A + sum_i E_i |psi_i><psi_i|) @ v``: penalize given states (excited DMRG)."""

    def __init__(self, orig_operator, penalties, ortho_vecs):
        super().__init__(orig_operator)
        self.penalties = list(penalties)
        self.ortho_vecs = list(ortho_vecs)

    def matvec(self, vec):
        from .krylov_based import _v_axpy, _v_inner
        res = self.orig_operator.matvec(vec)
        for E, o in zip(self.penalties, self.ortho_vecs):
            res = _v_axpy(E * _v_inner(o, vec), o, res)
        return res

    def to_matrix(self):
        mat = self.orig_operator.to_matrix()
        for E, o in zip(self.penalties, self.ortho_vecs):
            mat = mat + E * npc.outer(o, o.conj())
        return mat

    def adjoint(self):
        return BoostNpcLinearOperator(self.orig_operator.adjoint(),
                                      [np.conj(E) for E in self.penalties],
                                      self.ortho_vecs)


class OrthogonalNpcLinearOperator(BoostNpcLinearOperator):
    """``P A P`` with ``P`` projecting out given states.

    Reference: ``sparse.py:220`` — used to find excited states orthogonal to lower ones.
    """

    def __init__(self, orig_operator, ortho_vecs):
        BoostNpcLinearOperator.__init__(self, orig_operator, [], ortho_vecs)

    def _project(self, vec):
        from .krylov_based import _v_axpy, _v_inner
        for o in self.ortho_vecs:
            if isinstance(o, npc.Array) and isinstance(vec, npc.Array) and \
                    not np.array_equal(o.qtotal, vec.qtotal):
                continue  # different charge sector: <o|vec> = 0 identically
            vec = _v_axpy(-_v_inner(o, vec), o, vec)
        return vec

    def matvec(self, vec):
        from .krylov_based import _v_copy
        vec = self._project(_v_copy(vec))
        vec = self.orig_operator.matvec(vec)
        return self._project(vec)

    def to_matrix(self):
        mat = self.orig_operator.to_matrix()
        P = npc.eye_like(mat)
        for o in self.ortho_vecs:
            oc = o if o.rank == 1 else o.combine_legs([list(range(o.rank))])
            P = P - npc.outer(oc, oc.conj())
        return npc.tensordot(P, npc.tensordot(mat, P, axes=[[1], [0]]), axes=[[1], [0]])

    def adjoint(self):
        return OrthogonalNpcLinearOperator(self.orig_operator.adjoint(), self.ortho_vecs)


class FlatLinearOperator(scipy.sparse.linalg.LinearOperator):
    """Bridge: npc operator -> scipy LinearOperator on flat numpy vectors.

    Maps flat vectors into a fixed charge sector of a given leg structure and back;
    enables ARPACK cross-checks and exact diagonalization.
    Reference: ``tenpy/linalg/sparse.py:273``.
    """

    def __init__(self, npc_matvec, leg, dtype, charge_sector=0, vec_label=None,
                 compact_flat=None):
        self.npc_matvec = npc_matvec
        self.leg = leg
        self.vec_label = vec_label
        self.matvec_count = 0
        self._charge_sector = None
        self._mask = None
        self.possible_charge_sectors = leg.charge_sectors()
        super().__init__(dtype=dtype, shape=(leg.ind_len, leg.ind_len))
        self.charge_sector = charge_sector

    @classmethod
    def from_NpcArray(cls, mat, charge_sector=0):
        if mat.rank != 2:
            raise ValueError("need 2-leg array")
        return cls(lambda v: npc.tensordot(mat, v, axes=[[1], [0]]), mat.legs[0],
                   np.dtype(str(mat.dtype)), charge_sector)

    @classmethod
    def from_guess_with_pipe(cls, npc_matvec, v0_guess, labels_split=None, dtype=None):
        """Build from a guess vector with several legs: combine into one pipe leg."""
        if labels_split is None:
            labels_split = v0_guess.get_leg_labels()
        v0_combined = v0_guess.combine_legs(list(range(v0_guess.rank)))
        pipe = v0_combined.legs[0]

        def flat_matvec(v_combined):
            v = v_combined.split_legs([0])
            res = npc_matvec(v)
            return res.combine_legs([list(range(res.rank))], pipes=[pipe])

        if dtype is None:
            dtype = np.dtype(str(v0_guess.dtype))
        res = cls(flat_matvec, pipe, dtype,
                  charge_sector=tuple(int(q) for q in v0_guess.qtotal))
        return res, v0_combined

    @property
    def charge_sector(self):
        return self._charge_sector

    @charge_sector.setter
    def charge_sector(self, value):
        if isinstance(value, int) and value == 0:
            value = self.leg.chinfo.make_valid()
        if value is not None:
            value = tuple(int(q) for q in self.leg.chinfo.make_valid(value))
            # mask: which flat indices belong to this sector
            qflat = self.leg.to_qflat() * self.leg.qconj
            want = np.array(value, QTYPE)
            self._mask = np.all(self.leg.chinfo.make_valid(qflat) ==
                                self.leg.chinfo.make_valid(want[None, :]), axis=1)
            size = int(self._mask.sum())
        else:
            self._mask = None
            size = self.leg.ind_len
        self._charge_sector = value
        self.shape = (size, size)

    def flat_to_npc(self, vec):
        """Flat (sector-restricted) numpy vector -> npc Array."""
        vec = np.asarray(vec)
        if self._charge_sector is not None:
            full = np.zeros(self.leg.ind_len, dtype=vec.dtype)
            full[self._mask] = vec
            qtotal = self._charge_sector
        else:
            full = vec
            qtotal = None
        arr = npc.Array.from_ndarray(full, [self.leg], qtotal=qtotal,
                                     warn_wrong_sector=False)
        if self.vec_label is not None:
            arr.iset_leg_labels([self.vec_label])
        return arr

    def npc_to_flat(self, npc_vec):
        full = np.asarray(npc_vec.to_ndarray())
        if self._charge_sector is not None:
            return full[self._mask]
        return full

    def _matvec(self, vec):
        vec = np.asarray(vec).reshape(-1)
        npc_vec = self.flat_to_npc(vec)
        self.matvec_count += 1
        res = self.npc_matvec(npc_vec)
        return self.npc_to_flat(res)

    def eigenvectors(self, num_ev=1, max_num_ev=None, max_tol=1e-12, which='LM',
                     v0=None, v0_npc=None, cutoff=1e-10, hermitian=False, **kwargs):
        """ARPACK eigenvectors, returned as npc Arrays. Reference: ``sparse.py:621``."""
        if max_num_ev is None:
            max_num_ev = num_ev + 2
        if v0_npc is not None:
            v0 = self.npc_to_flat(v0_npc)
        if v0 is not None:
            kwargs['v0'] = np.asarray(v0)
        for k in range(num_ev, max_num_ev + 1):
            if k > num_ev:
                kwargs['tol'] = max(max_tol, kwargs.get('tol', 0))
            try:
                if hermitian:
                    eta, A = scipy.sparse.linalg.eigsh(self, k=k, which=which, **kwargs)
                else:
                    eta, A = scipy.sparse.linalg.eigs(self, k=k, which=which, **kwargs)
                break
            except scipy.sparse.linalg.ArpackNoConvergence:
                if k == max_num_ev:
                    raise
        from ..tools.misc import argsort
        perm = argsort(eta, which)
        eta = eta[perm]
        A = A[:, perm]
        vecs = [self.flat_to_npc(A[:, j]) for j in range(A.shape[1])]
        return eta, vecs


class FlatHermitianOperator(FlatLinearOperator):
    """Hermitian variant using eigsh. Reference: ``sparse.py:746``."""

    def _adjoint(self):
        return self

    def eigenvectors(self, *args, **kwargs):
        kwargs['hermitian'] = True
        return super().eigenvectors(*args, **kwargs)
