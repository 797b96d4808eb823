r"""Uniform (tangent-space) MPS: AL/AR/AC/C representation for VUMPS.

Rebuild of ``tenpy/networks/uniform_mps.py`` (UniformMPS :39, from_MPS :427,
to_MPS :262, to_diagonal_gauge :308).

A uniform MPS stores, per site, the left-canonical ``AL``, right-canonical
``AR`` and the one-site orthogonality center ``AC``; per bond the center matrix
``C`` (``C[i]`` sits left of site ``i``).  The canonical-form identities
``AL_i C_{i+1} = AC_i = C_i AR_i`` hold only at convergence of a tangent-space
algorithm; their violation is the VUMPS "split error".
"""

from __future__ import annotations

import logging

import numpy as np
import jax.numpy as jnp

from ..linalg import np_conserved as npc
from .mps import MPS
from ..tools.math import entropy

logger = logging.getLogger(__name__)

__all__ = ['UniformMPS']


class UniformMPS(MPS):
    """Uniform MPS in the AL/AR/AC/C representation. Reference: ``uniform_mps.py:39``."""

    _B_labels = ['vL', 'p', 'vR']
    _C_labels = ['vL', 'vR']

    def __init__(self, sites, ALs, ARs, ACs, Cs, norm=1.):
        self.sites = list(sites)
        self.chinfo = self.sites[0].leg.chinfo
        self.bc = 'infinite'
        self._AL = [AL.itranspose(self._B_labels) for AL in ALs]
        self._AR = [AR.itranspose(self._B_labels) for AR in ARs]
        self._AC = [AC.itranspose(self._B_labels) for AC in ACs]
        self._C = [C.itranspose(self._C_labels) for C in Cs]
        self.dtype = jnp.result_type(*[A.dtype for A in self._AR])
        self.norm = norm
        self.grouped = 1
        self.form = [None] * len(self._AR)
        self._S = [None] * (len(self._AR) + 1)
        self.valid_umps = True
        self.diagonal_gauge = False
        self.left_U = None
        self.right_U = None
        self.segment_boundaries = (None, None)
        self.test_sanity()

    # ------------------------------------------------------------- sanity
    def test_sanity(self):
        L = self.L
        assert len(self._AL) == len(self._AR) == len(self._AC) == L
        assert len(self._C) == L
        for i in range(L):
            for A in (self._AL[i], self._AR[i], self._AC[i]):
                assert tuple(A.get_leg_labels()) == ('vL', 'p', 'vR')
            assert tuple(self._C[i].get_leg_labels()) == ('vL', 'vR')

    def test_validity(self, cutoff=1e-8):
        """Check AL_i C_{i+1} = AC_i = C_i AR_i up to `cutoff`.

        Reference: ``uniform_mps.py:184``."""
        errs = []
        for i in range(self.L):
            ALC = npc.tensordot(self.get_AL(i), self.get_C(i + 1),
                                axes=[['vR'], ['vL']])
            CAR = npc.tensordot(self.get_C(i), self.get_AR(i),
                                axes=[['vR'], ['vL']])
            AC = self.get_AC(i)
            errs.append((float(npc.norm(ALC - AC)), float(npc.norm(CAR - AC))))
        max_err = max(max(e) for e in errs)
        if max_err > cutoff:
            logger.warning("UniformMPS.test_validity: max split error %.2e", max_err)
        self.valid_umps = max_err <= cutoff
        return np.array(errs)

    def copy(self):
        res = UniformMPS(self.sites,
                         [A.copy(deep=False) for A in self._AL],
                         [A.copy(deep=False) for A in self._AR],
                         [A.copy(deep=False) for A in self._AC],
                         [C.copy(deep=False) for C in self._C],
                         self.norm)
        res.valid_umps = self.valid_umps
        res.diagonal_gauge = self.diagonal_gauge
        res._S = list(self._S)
        return res

    # ------------------------------------------------------------- properties
    @property
    def L(self):
        return len(self._AR)

    @property
    def finite(self):
        return False

    @property
    def chi(self):
        return [C.get_leg('vL').ind_len for C in self._C]

    @property
    def nontrivial_bonds(self):
        return slice(0, self.L)

    # ------------------------------------------------------------- access
    def get_B(self, i, form='B', copy=False, cutoff=1e-16, label_p=None):
        """Map canonical-form requests onto the stored AL/AR/AC tensors.

        ``'B'``/``(0,1)`` -> AR, ``'A'``/``(1,0)`` -> AL, ``'Th'``/``(1,1)`` -> AC.
        Reference: ``uniform_mps.py:593``."""
        if form in ('B', (0., 1.), (0, 1), 'AR'):
            A = self._AR[self._to_valid_index(i)]
        elif form in ('A', (1., 0.), (1, 0), 'AL'):
            A = self._AL[self._to_valid_index(i)]
        elif form in ('Th', (1., 1.), (1, 1), 'AC', None):
            A = self._AC[self._to_valid_index(i)]
        elif form == 'C':
            A = self._C[self._to_valid_index(i)]
        else:
            raise ValueError(f"form {form!r} not defined for UniformMPS")
        if copy:
            A = A.copy(deep=False)
        if label_p is not None:
            A = A.copy(deep=False)
            A.ireplace_label('p', 'p' + str(label_p))
        return A

    def get_AL(self, i, copy=False):
        return self.get_B(i, 'AL', copy)

    def get_AR(self, i, copy=False):
        return self.get_B(i, 'AR', copy)

    def get_AC(self, i, copy=False):
        return self.get_B(i, 'AC', copy)

    def get_C(self, i, copy=False):
        C = self._C[self._to_valid_index(i)]
        return C.copy(deep=False) if copy else C

    def set_B(self, i, B, form='B'):
        i = self._to_valid_index(i)
        if form in ('B', 'AR', (0., 1.)):
            self._AR[i] = B.itranspose(self._B_labels)
        elif form in ('A', 'AL', (1., 0.)):
            self._AL[i] = B.itranspose(self._B_labels)
        elif form in ('Th', 'AC', (1., 1.), None):
            self._AC[i] = B.itranspose(self._B_labels)
        else:
            raise ValueError(f"form {form!r} not defined for UniformMPS")
        self.dtype = jnp.result_type(self.dtype, B.dtype)

    def set_AL(self, i, AL):
        self.set_B(i, AL, 'AL')

    def set_AR(self, i, AR):
        self.set_B(i, AR, 'AR')

    def set_AC(self, i, AC):
        self.set_B(i, AC, 'AC')

    def set_C(self, i, C):
        i = self._to_valid_index(i)
        self._C[i] = C.itranspose(self._C_labels)
        self._S[i] = None  # cached Schmidt values are stale now
        self.diagonal_gauge = False

    def get_SL(self, i):
        """Schmidt data left of site i: the 1D singular values if in diagonal
        gauge, else the center matrix C[i] itself (npc Array)."""
        i = self._to_valid_index(i)
        if self._S[i] is not None:
            return self._S[i]
        return self._C[i]

    def _schmidt_1d(self, i):
        i = self._to_valid_index(i)
        if self._S[i] is not None:
            return np.asarray(self._S[i])
        S = np.asarray(npc.svd(self._C[i], compute_uv=False))
        return np.sort(S)[::-1]

    def get_SR(self, i):
        return self.get_SL((i + 1) % self.L)

    def set_SL(self, i, S):
        self._S[self._to_valid_index(i)] = np.asarray(S)

    def set_SR(self, i, S):
        self.set_SL((i + 1) % self.L, S)

    # ------------------------------------------------------------- theta
    def get_theta(self, i, n=2, cutoff=1e-16, formL=1., formR=1.):
        """n-site wavefunction AC_i AR_{i+1} ... AR_{i+n-1}. Reference: ``:729``."""
        theta = self.get_AC(i).replace_label('p', 'p0')
        for k in range(1, n):
            B = self.get_AR(i + k, copy=True)
            B.ireplace_label('p', f'p{k}')
            theta = npc.tensordot(theta, B, axes=[['vR'], ['vL']])
        return theta

    # ------------------------------------------------------------- measurements
    def entanglement_entropy(self, n=1, bonds=None, for_matrix_S=True):
        if bonds is None:
            bonds = range(self.L)
        res = []
        for i in bonds:
            S = self._schmidt_1d(i)
            S = S / np.linalg.norm(S)
            res.append(entropy(S ** 2, n))
        return np.array(res)

    def entanglement_spectrum(self, by_charge=False):
        return [self._schmidt_1d(i) for i in range(self.L)]

    def expectation_value(self, ops, sites=None, axes=None):
        """<AC|op|AC> per site (single-site operators)."""
        if isinstance(ops, str):
            ops = [ops]
        if sites is None:
            sites = range(self.L)
        res = []
        for i in sites:
            op = self.get_op(ops, i)
            AC = self.get_AC(i)
            val = npc.tensordot(op, AC, axes=[['p*'], ['p']])
            val = npc.tensordot(AC.conj(), val,
                                axes=[['vL*', 'p*', 'vR*'], ['vL', 'p', 'vR']])
            res.append(complex(val))
        res = np.array(res)
        if np.allclose(res.imag, 0., atol=1e-14):
            res = res.real
        return res

    def norm_test(self, force=False):
        """Check AL/AR canonicalization; columns (AL err, AR err).

        Reference: ``uniform_mps.py:952``."""
        res = np.empty((self.L, 2))
        for i in range(self.L):
            AL = self.get_AL(i)
            c = npc.tensordot(AL.conj(), AL, axes=[['vL*', 'p*'], ['vL', 'p']])
            res[i, 0] = npc.norm(c - npc.eye_like(c, 0))
            AR = self.get_AR(i)
            c = npc.tensordot(AR, AR.conj(), axes=[['p', 'vR'], ['p*', 'vR*']])
            res[i, 1] = npc.norm(c - npc.eye_like(c, 0))
        return res

    # ------------------------------------------------------------- conversion
    @classmethod
    def from_MPS(cls, psi):
        """Infinite MPS -> UniformMPS.

        ``AR`` and ``AC`` come from multiply-only form conversions; ``AL`` is
        solved inverse-free from ``AC = AL C`` via a polar decomposition
        (``AL = UV^H`` of ``AC C^dagger``), so Schmidt values at the numerical
        noise floor never get divided by.  Reference: ``uniform_mps.py:427``.
        """
        assert not psi.finite
        AC = [psi.get_B(i, 'Th', copy=True).itranspose(cls._B_labels)
              for i in range(psi.L)]
        AL = []
        AR = []
        for i in range(psi.L):
            SR = np.asarray(psi.get_SR(i))
            M = AC[i].scale_axis(SR, 'vR')  # = AC C^dagger (C diagonal, real)
            M = M.combine_legs([['vL', 'p']], qconj=[+1])
            W, _, VH = npc.svd(M, inner_labels=['vR', 'vL'])
            ALi = npc.tensordot(W, VH, axes=[['vR'], ['vL']])
            AL.append(ALi.split_legs(['(vL.p)']).itranspose(cls._B_labels))
            SL = np.asarray(psi.get_SL(i))
            M = AC[i].scale_axis(SL, 'vL')  # = C^dagger AC
            M = M.combine_legs([['p', 'vR']], qconj=[-1])
            W, _, VH = npc.svd(M, inner_labels=['vR', 'vL'])
            ARi = npc.tensordot(W, VH, axes=[['vR'], ['vL']])
            AR.append(ARi.split_legs(['(p.vR)']).itranspose(cls._B_labels))
        Cs = []
        for i in range(psi.L):
            S = np.asarray(psi.get_SL(i))
            C = npc.diag(S, AL[i].get_leg('vL'), labels=['vL', 'vR'])
            Cs.append(C)
        obj = cls(psi.sites, AL, AR, AC, Cs, psi.norm)
        obj.diagonal_gauge = True
        obj.valid_umps = False
        obj._S = [np.asarray(psi.get_SL(i)) for i in range(psi.L)] + [None]
        obj._S[psi.L] = obj._S[0]
        return obj

    def to_MPS(self, cutoff=1e-16, check_overlap=False):
        """UniformMPS -> right-canonical infinite MPS. Reference: ``:262``."""
        if not self.diagonal_gauge:
            self.to_diagonal_gauge(cutoff=cutoff)
        SVs = [np.asarray(self._S[i]) for i in range(self.L)] + \
            [np.asarray(self._S[0])]
        psi = MPS(self.sites, [self.get_AR(i, copy=True) for i in range(self.L)],
                  SVs, bc='infinite', form='B')
        psi.canonical_form()
        if check_overlap:
            try:
                psi_A = MPS(self.sites,
                            [self.get_AL(i, copy=True) for i in range(self.L)],
                            SVs, bc='infinite', form='A')
                psi_A.canonical_form()
                ov = abs(psi.overlap(psi_A, understood_infinite=True))
                logger.info("UniformMPS.to_MPS: |<AR-MPS|AL-MPS>| = %.10f", ov)
                if abs(ov - 1.) > 1e-8:
                    logger.warning("to_MPS overlap not 1: %.10f", ov)
            except ValueError as e:  # e.g. chi mismatch after truncation
                logger.warning("to_MPS overlap check skipped: %s", e)
        return psi

    def to_diagonal_gauge(self, cutoff=1e-16):
        """Rotate so every C is diagonal; records left_U/right_U of bond 0.

        Reference: ``uniform_mps.py:308``."""
        if self.L > 1 and cutoff > 0.:
            cutoff = 0.  # a cutoff would change bond dims mid-unit-cell
        self._S = [None] * (self.L + 1)
        for i in range(self.L):
            C = self.get_C(i)
            U, S, VH = npc.svd(C, cutoff=cutoff if cutoff else None,
                               qtotal_LR=[C.qtotal, None],
                               inner_labels=['vR', 'vL'])
            S = np.asarray(S)
            C_diag = npc.diag(S, VH.get_leg('vL'), labels=['vL', 'vR'])
            if i % self.L == 0:
                self.left_U = U
                self.right_U = VH
            # rotate neighbors: AL[i-1] U, U^d AL[i]; VH AR[i], AR[i-1] VH^d
            self.set_AL(i - 1, npc.tensordot(self.get_AL(i - 1), U,
                                             axes=[['vR'], ['vL']]))
            self.set_AL(i, npc.tensordot(U.conj(), self.get_AL(i),
                                         axes=[['vL*'], ['vL']])
                        .ireplace_label('vR*', 'vL'))
            self.set_AR(i, npc.tensordot(VH, self.get_AR(i),
                                         axes=[['vR'], ['vL']]))
            self.set_AR(i - 1, npc.tensordot(self.get_AR(i - 1), VH.conj(),
                                             axes=[['vR'], ['vR*']])
                        .ireplace_label('vL*', 'vR'))
            # rotate the ACs touching bond i
            self.set_AC(i, npc.tensordot(U.conj(), self.get_AC(i),
                                         axes=[['vL*'], ['vL']])
                        .ireplace_label('vR*', 'vL'))
            self.set_AC(i - 1, npc.tensordot(self.get_AC(i - 1), VH.conj(),
                                             axes=[['vR'], ['vR*']])
                        .ireplace_label('vL*', 'vR'))
            self.set_C(i, C_diag)
            self.set_SL(i, S)
        self._S[self.L] = self._S[0]
        self.diagonal_gauge = True

    # ------------------------------------------------------------- misc
    def _to_valid_index(self, i):
        return i % self.L

    def __repr__(self):
        return f"<UniformMPS L={self.L} max_chi={max(self.chi)}>"

    # disable MPS methods that don't apply
    def canonical_form(self, **kwargs):
        raise NotImplementedError("UniformMPS is kept canonical by construction; "
                                  "use to_MPS() + MPS.canonical_form()")

    def convert_form(self, new_form='B'):
        raise NotImplementedError("UniformMPS stores all forms explicitly")
