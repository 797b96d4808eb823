"""Exponentially decaying long-range couplings as a constant-size MPO.

A coupling J * lambda^{|i-j|} Sz_i Sz_j for all i < j costs exactly ONE extra
MPO bond state (the finite-state machine loops on identity with weight
lambda).  Cross-checked against a brute-force sum of two-site terms on a
finite chain.  Reference analogue:
``examples/advanced/mpo_exponential_decay.py``.
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.model import CouplingMPOModel
from tenpy_tpu.algorithms.exact_diag import ExactDiag


class ExpDecayModel(CouplingMPOModel):
    default_lattice = 'Chain'

    def init_sites(self, params):
        from tenpy_tpu.networks.site import SpinHalfSite
        return SpinHalfSite(conserve=params.get('conserve', 'Sz', str))

    def init_terms(self, params):
        J = params.get('J', 1., 'real')
        lam = params.get('lambda_', 0.5, 'real')
        self.add_exponentially_decaying_coupling(J, lam, 'Sz', 'Sz')


class BruteForceModel(CouplingMPOModel):
    """Same Hamiltonian as explicit pair couplings (finite chain only)."""
    default_lattice = 'Chain'

    def init_sites(self, params):
        from tenpy_tpu.networks.site import SpinHalfSite
        return SpinHalfSite(conserve=params.get('conserve', 'Sz', str))

    def init_terms(self, params):
        J = params.get('J', 1., 'real')
        lam = params.get('lambda_', 0.5, 'real')
        L = self.lat.N_sites
        for dx in range(1, L):
            self.add_coupling(J * lam ** dx, 0, 'Sz', 0, 'Sz', dx)


def run(L=8, J=1., lam=0.5):
    p = {'L': L, 'bc_MPS': 'finite', 'J': J, 'lambda_': lam}
    m1 = ExpDecayModel(dict(p))
    m2 = BruteForceModel(dict(p))
    print("MPO bond dimensions (exp-decay):", m1.H_MPO.chi)
    print("MPO bond dimensions (brute force):", m2.H_MPO.chi)

    ed1 = ExactDiag(m1)
    ed1.build_full_H_from_mpo()
    ed1.full_diagonalization()
    E1, _ = ed1.groundstate()
    ed2 = ExactDiag(m2)
    ed2.build_full_H_from_mpo()
    ed2.full_diagonalization()
    E2, _ = ed2.groundstate()
    print(f"E0 exp-decay MPO: {E1:.12f}; brute force: {E2:.12f}")
    assert abs(E1 - E2) < 1e-10
    return E1


if __name__ == '__main__':
    run()
