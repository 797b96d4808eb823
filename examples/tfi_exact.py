r"""Exact transverse-field-Ising results for benchmarking DMRG/TEBD output.

H = -J sum_i sx_i sx_{i+1} - g sum_i sz_i   (Pauli matrices).

Two independent cross-checks (reference analogue: ``examples/tfi_exact.py``):
- ``infinite_gs_energy``: the Pfeuty free-fermion integral for the energy
  density in the thermodynamic limit.
- ``finite_gs_energy``: sparse ED of the finite open chain (L <~ 16).
"""
import numpy as np
import scipy.integrate
import scipy.sparse as sparse
import scipy.sparse.linalg


def infinite_gs_energy(J, g):
    """Energy density of the infinite TFI chain (free-fermion integral)."""
    def eps(k, lam):
        return np.sqrt(1. + lam * lam + 2. * lam * np.cos(k))

    val, _ = scipy.integrate.quad(eps, -np.pi, np.pi, args=(J / g,))
    return -g / (2. * np.pi * J) * val * J   # = -g/(2 pi) * integral


def finite_gs_energy(L, J, g):
    """Ground-state energy of the open finite chain from sparse ED."""
    sx = np.array([[0., 1.], [1., 0.]])
    sz = np.array([[1., 0.], [0., -1.]])

    def op_at(op, i):
        mats = [sparse.identity(2, format='csr')] * L
        mats[i] = sparse.csr_matrix(op)
        full = mats[0]
        for m in mats[1:]:
            full = sparse.kron(full, m, 'csr')
        return full

    H = sparse.csr_matrix((2 ** L, 2 ** L))
    for i in range(L - 1):
        H = H - J * op_at(sx, i) @ op_at(sx, i + 1)
    for i in range(L):
        H = H - g * op_at(sz, i)
    E, _ = scipy.sparse.linalg.eigsh(H, k=1, which='SA')
    return float(E[0])


if __name__ == '__main__':
    print("TFI exact results (J=1):")
    for g in [0.5, 1.0, 1.5]:
        print(f"  g={g}: e0(infinite) = {infinite_gs_energy(1., g):.12f}")
    print(f"  L=12, g=1.5: E0(finite) = {finite_gs_energy(12, 1., 1.5):.10f}")
