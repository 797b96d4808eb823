"""MolecularModel MPO vs dense second quantization (full spectrum)."""
import functools
import itertools

import numpy as np

from tenpy_tpu.models.molecular import MolecularModel
from tenpy_tpu.algorithms.exact_diag import ExactDiag


def test_molecular_model_spectrum():
    rng = np.random.default_rng(5)
    norb = 3
    h1 = rng.normal(size=(norb, norb))
    h1 = (h1 + h1.T) / 2
    h2 = rng.normal(size=(norb,) * 4)
    perms = [(0, 1, 2, 3), (1, 0, 3, 2), (2, 3, 0, 1), (3, 2, 1, 0),
             (1, 0, 2, 3), (0, 1, 3, 2), (2, 3, 1, 0), (3, 2, 0, 1)]
    h2 = sum(h2.transpose(p) for p in perms) / 8  # real-orbital symmetry
    const = 0.37
    m = MolecularModel({'one_body_tensor': h1, 'two_body_tensor': h2,
                        'constant': const, 'cons_N': 'N', 'cons_Sz': 'Sz'})
    ed = ExactDiag.from_H_mpo(m.H_MPO)
    ed.build_full_H_from_mpo()
    w_mpo = np.linalg.eigvalsh(np.asarray(ed.full_H.to_ndarray()))

    site = m.lat.mps_sites()[0]
    d = 4

    def op(name, i):
        mat = np.asarray(site.get_op(name).to_ndarray())
        JW = np.asarray(site.get_op('JW').to_ndarray())
        ops = [JW if x < i else (mat if x == i else np.eye(d))
               for x in range(norb)]
        return functools.reduce(np.kron, ops)

    def c_dag(sp, i):
        return op({0: 'Cdu', 1: 'Cdd'}[sp], i)

    def c_(sp, i):
        return op({0: 'Cu', 1: 'Cd'}[sp], i)

    H = np.eye(d ** norb) * const
    for sp in (0, 1):
        for i in range(norb):
            for j in range(norb):
                H += h1[i, j] * (c_dag(sp, i) @ c_(sp, j))
    for sp in (0, 1):
        for tp in (0, 1):
            for i, j, k, l in itertools.product(range(norb), repeat=4):
                H += 0.5 * h2[i, j, k, l] * (
                    c_dag(sp, i) @ c_dag(tp, k) @ c_(tp, l) @ c_(sp, j))
    w_exact = np.linalg.eigvalsh(H)
    assert np.max(np.abs(w_mpo - w_exact)) < 1e-9
