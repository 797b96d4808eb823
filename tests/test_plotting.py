"""Plotting helpers: Lattice.plot_*, DMRG stats plots, correlation plots.

Smoke tests against a non-interactive matplotlib backend: every helper must
draw onto an Axes without raising and leave the expected artists behind.
Mirrors the reference's plotting surface (``tenpy/models/lattice.py:1366``,
``tenpy/algorithms/dmrg.py:754``, ``tenpy/simulations/post_processing.py:397``).
"""
import numpy as np
import pytest

matplotlib = pytest.importorskip('matplotlib')
matplotlib.use('Agg')
import matplotlib.pyplot as plt

from tenpy_tpu.models.lattice import (Chain, Square, Honeycomb, Kagome,
                                      Triangular)
from tenpy_tpu.networks.site import SpinHalfSite


def _site():
    return SpinHalfSite(conserve='Sz')


@pytest.mark.parametrize('make', [
    lambda s: Chain(4, s, bc='periodic', bc_MPS='infinite'),
    lambda s: Square(3, 3, s, bc=['open', 'periodic']),
    lambda s: Honeycomb(2, 3, [s, s], bc=['open', 'periodic']),
    lambda s: Kagome(2, 2, [s, s, s], bc=['open', 'periodic']),
    lambda s: Triangular(3, 3, s, bc=['open', 'periodic']),
])
def test_lattice_plot_methods(make):
    lat = make(_site())
    fig, ax = plt.subplots()
    lat.plot_sites(ax)
    assert len(ax.lines) >= lat.Lu
    lat.plot_order(ax)
    lat.plot_coupling(ax)
    lat.plot_coupling(ax, wrap=True)
    lat.plot_basis(ax)
    lat.plot_reciprocal_basis(ax)
    if not lat.bc[-1]:
        lat.plot_bc_identified(ax)
    plt.close(fig)


def test_brillouin_zone():
    lat = Square(3, 3, _site(), bc='periodic', bc_MPS='infinite')
    verts = lat.BZ.vertices()
    # square lattice: BZ is the square [-pi, pi]^2
    assert verts.shape == (4, 2)
    assert np.allclose(np.abs(verts), np.pi)
    fig, ax = plt.subplots()
    lat.plot_brillouin_zone(ax)
    assert len(ax.lines) == 1
    plt.close(fig)

    tri = Triangular(3, 3, _site(), bc='periodic', bc_MPS='infinite')
    verts = tri.BZ.vertices()   # hexagon
    assert verts.shape == (6, 2)
    fig, ax = plt.subplots()
    tri.plot_brillouin_zone(ax)
    plt.close(fig)

    ch = Chain(4, _site(), bc='periodic', bc_MPS='infinite')
    verts = ch.BZ.vertices()
    assert np.allclose(sorted(verts.ravel()), [-np.pi, np.pi])


def test_dmrg_stats_plots():
    from tenpy_tpu.models.tf_ising import TFIChain
    from tenpy_tpu.networks.mps import MPS
    from tenpy_tpu.algorithms import dmrg
    m = TFIChain({'L': 8, 'J': 1., 'g': 1.2, 'bc_MPS': 'finite',
                  'conserve': 'parity'})
    psi = MPS.from_product_state(m.lat.mps_sites(), ['up'] * 8, bc='finite')
    eng = dmrg.TwoSiteDMRGEngine(psi, m, {
        'trunc_params': {'chi_max': 16}, 'max_sweeps': 3})
    E, _ = eng.run()
    fig, ax = plt.subplots()
    eng.plot_sweep_stats(ax)
    assert len(ax.lines) == 1
    eng.plot_sweep_stats(ax, xaxis='sweep', yaxis='max_chi')
    eng.plot_update_stats(ax, xaxis='index', yaxis='E', y_exact=E)
    assert ax.get_yscale() == 'log'
    plt.close(fig)


def test_pp_plot_correlations_on_lattice(tmp_path):
    from tenpy_tpu.simulations.post_processing import (
        DataLoader, pp_plot_correlations_on_lattice)
    lat = Square(3, 3, _site(), bc=['open', 'periodic'])
    N = lat.N_sites
    rng = np.random.default_rng(0)
    corr = rng.standard_normal((N, N)) * 0.3
    data = {'measurements': {'corr': corr},
            'simulation_parameters': {'model_class': 'SpinModel',
                                      'model_params': {
                                          'lattice': 'Square', 'Lx': 3,
                                          'Ly': 3, 'bc_y': 'cylinder',
                                          'conserve': 'Sz'}}}
    dl = DataLoader(data=data)
    path = pp_plot_correlations_on_lattice(
        dl, data_key='corr', default_dir=str(tmp_path), save_as='c.pdf')
    import os
    assert os.path.isfile(path) and os.path.getsize(path) > 0
