"""VUMPS ground state + plane-wave quasiparticle dispersion (TFI chain).

Converge the transverse-field Ising chain with VUMPS (tangent-space
uniform-MPS optimization, no environment aging), then compute single-particle
excitation energies at a few momenta with the plane-wave excitation ansatz and
compare against the exact free-fermion dispersion
eps(k) = 2 sqrt(1 + g^2 - 2 g cos k).  Reference analogue:
``examples/advanced/vumps_and_plane_wave.py``.
"""
import numpy as np

from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.models.tf_ising import TFIChain
from tenpy_tpu.algorithms import dmrg
from tenpy_tpu.algorithms.vumps import SingleSiteVUMPSEngine
from tenpy_tpu.algorithms.plane_wave_excitation import PlaneWaveExcitationEngine


def run(g=1.5, chi=16, momenta=(0., np.pi / 2, np.pi)):
    m = TFIChain({'L': 2, 'J': 1., 'g': g, 'bc_MPS': 'infinite',
                  'conserve': None})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up', 'up'],
                                 bc='infinite')
    # cheap DMRG seed, then VUMPS to machine-precision translation invariance
    dmrg.run(psi, m, {'trunc_params': {'chi_max': chi, 'svd_min': 1e-12},
                      'max_sweeps': 10, 'mixer': True})
    eng = SingleSiteVUMPSEngine(psi, m, {
        'max_sweeps': 30, 'max_E_err': 1e-13, 'max_split_err': 1e-9,
        'check_overlap': False})
    E0, _ = eng.run()
    print(f"VUMPS: E/site = {E0:.12f}")

    pw = PlaneWaveExcitationEngine(eng.psi, m,
                                   {'lanczos_params': {'N_max': 40}})

    def eps_exact(k):
        # 2-site unit cell folds k and k + pi into the same sector
        return min(2 * np.sqrt(1 + g ** 2 - 2 * g * np.cos(k)),
                   2 * np.sqrt(1 + g ** 2 - 2 * g * np.cos(k + np.pi)))

    omegas = []
    for p in momenta:
        Es, _, _ = pw.run(p)
        w = float(np.real(Es[0]))
        omegas.append(w)
        print(f"p={p:5.3f}: omega = {w:.8f}  (exact {eps_exact(p):.8f})")
        assert abs(w - eps_exact(p)) < 1e-6
    return E0, omegas


if __name__ == '__main__':
    run()
