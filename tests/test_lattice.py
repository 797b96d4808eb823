"""Tests for tenpy_tpu.models.lattice.

Coverage modeled on the reference's ``tests/test_lattice.py`` (374 LoC):
orderings are permutations, index conversion round-trips, neighbor-pair
counts per lattice, coupling enumeration vs. brute force, irregular/helical
lattices, segments, and plotting smoke tests.
"""
import itertools

import numpy as np
import pytest

from tenpy_tpu.models import lattice
from tenpy_tpu.networks.site import SpinHalfSite, FermionSite


site = SpinHalfSite(conserve='Sz')
fsite = FermionSite(conserve='N')


def test_bc_choices():
    for bc in ['open', 'periodic']:
        lat = lattice.Chain(4, site, bc=bc)
        assert lat.N_sites == 4
    lat = lattice.Square(3, 4, site, bc=['periodic', 'open'])
    assert lat.N_sites == 12
    with pytest.raises(ValueError):
        lattice.Chain(4, site, bc='nonsense')


@pytest.mark.parametrize('LatCls, Ls, n_sites_cell', [
    (lattice.Chain, (6,), 1),
    (lattice.Ladder, (4,), 2),
    (lattice.Square, (3, 4), 1),
    (lattice.Triangular, (3, 4), 1),
    (lattice.Honeycomb, (3, 3), 2),
    (lattice.Kagome, (3, 3), 3),
])
def test_ordering_is_permutation(LatCls, Ls, n_sites_cell):
    if LatCls in (lattice.Ladder,):
        lat = LatCls(*Ls, [site] * 2)
    elif LatCls in (lattice.Honeycomb,):
        lat = LatCls(*Ls, [site] * 2)
    elif LatCls in (lattice.Kagome,):
        lat = LatCls(*Ls, [site] * 3)
    else:
        lat = LatCls(*Ls, site)
    N = lat.N_sites
    assert N == int(np.prod(Ls)) * n_sites_cell
    order = lat.order
    # order maps MPS index -> lattice index rows; must be a bijection
    assert order.shape == (N, lat.dim + 1)
    assert len(set(map(tuple, order))) == N
    # index conversion round-trips
    for i in [0, 1, N // 2, N - 1]:
        lat_idx = lat.mps2lat_idx(i)
        assert lat.lat2mps_idx(lat_idx) == i


def test_chain_snake_ordering():
    lat_def = lattice.Chain(6, site, order='default')
    lat_folded = lattice.Chain(6, site, order='folded')
    assert not np.array_equal(lat_def.order, lat_folded.order)
    # folded: first half interleaved with reversed second half
    assert len(set(map(tuple, lat_folded.order))) == 6


def test_square_orderings_differ():
    kw = dict(bc='periodic', bc_MPS='infinite')
    lat_c = lattice.Square(3, 4, site, order='default', **kw)
    lat_s = lattice.Square(3, 4, site, order='snake', **kw)
    assert not np.array_equal(lat_c.order, lat_s.order)
    for lat in (lat_c, lat_s):
        assert len(set(map(tuple, lat.order))) == 12


def test_positions():
    lat = lattice.Honeycomb(2, 2, [site, site])
    for i in range(lat.N_sites):
        pos = lat.position(lat.mps2lat_idx(i))
        assert pos.shape == (2,)
    # basis vectors are linearly independent
    assert abs(np.linalg.det(lat.basis)) > 1e-10


def test_mps2lat_values():
    lat = lattice.Square(3, 4, site)
    vals = np.arange(lat.N_sites, dtype=float)
    grid = lat.mps2lat_values(vals)
    assert grid.shape == (3, 4, 1)
    # round trip through the ordering
    for i in range(lat.N_sites):
        x, y, u = lat.mps2lat_idx(i)
        assert grid[x, y, u] == vals[i]


@pytest.mark.parametrize('LatCls, n_u, nn_per_site', [
    (lattice.Square, 1, 2.),        # 2N bonds for N sites (periodic)
    (lattice.Triangular, 1, 3.),
    (lattice.Honeycomb, 2, 1.5),
    (lattice.Kagome, 3, 2.),
])
def test_number_nearest_neighbors(LatCls, n_u, nn_per_site):
    """Count NN bonds on a fully periodic lattice via possible_couplings."""
    sites = [site] * n_u if n_u > 1 else site
    lat = LatCls(4, 4, sites, bc='periodic', bc_MPS='infinite')
    count = 0
    for (u1, u2, dx) in lat.pairs['nearest_neighbors']:
        mps_i, mps_j, _, _ = lat.possible_couplings(u1, u2, dx)
        count += len(mps_i)
    assert count == nn_per_site * lat.N_sites


def test_pairs_vs_find_coupling_pairs():
    """The hard-coded `pairs` of each lattice match distance detection."""
    for lat in [lattice.Square(3, 3, site, bc='periodic'),
                lattice.Triangular(3, 3, site, bc='periodic'),
                lattice.Honeycomb(3, 3, [site, site], bc='periodic'),
                lattice.Kagome(3, 3, [site] * 3, bc='periodic')]:
        found = lat.find_coupling_pairs()
        for key in ['nearest_neighbors', 'next_nearest_neighbors']:
            if key not in lat.pairs:
                continue
            declared = lat.pairs[key]
            auto = found[key]
            assert len(declared) == len(auto), (type(lat).__name__, key)

            def canon(pairs):
                out = set()
                for u1, u2, dx in pairs:
                    a = (u1, u2, tuple(int(x) for x in dx))
                    b = (u2, u1, tuple(-int(x) for x in dx))
                    out.add(min(a, b))
                return out

            assert canon(declared) == canon(auto), (type(lat).__name__, key)


def test_possible_couplings_brute_force():
    """possible_couplings on an open Square equals brute-force enumeration."""
    lat = lattice.Square(3, 4, site, bc='open')
    for dx in [(1, 0), (0, 1), (1, 1)]:
        mps_i, mps_j, _, _ = lat.possible_couplings(0, 0, dx)
        got = set(zip(map(int, mps_i), map(int, mps_j)))
        expect = set()
        for x, y in itertools.product(range(3), range(4)):
            x2, y2 = x + dx[0], y + dx[1]
            if 0 <= x2 < 3 and 0 <= y2 < 4:
                expect.add((lat.lat2mps_idx([x, y, 0]),
                            lat.lat2mps_idx([x2, y2, 0])))
        assert got == expect


def test_cylinder_couplings_wrap():
    """bc_y='periodic' (cylinder) adds exactly the Ly wrap bonds per ring."""
    lat_open = lattice.Square(3, 4, site, bc=['open', 'open'])
    lat_cyl = lattice.Square(3, 4, site, bc=['open', 'periodic'])
    n_open = len(lat_open.possible_couplings(0, 0, (0, 1))[0])
    n_cyl = len(lat_cyl.possible_couplings(0, 0, (0, 1))[0])
    assert n_open == 3 * 3
    assert n_cyl == 3 * 4


def test_TrivialLattice():
    lat = lattice.TrivialLattice([site, fsite, site])
    assert lat.N_sites == 3
    assert lat.mps_sites() == [site, fsite, site]
    lat.test_sanity()


def test_IrregularLattice():
    reg = lattice.Honeycomb(2, 2, [site, site])
    ir = lattice.IrregularLattice(reg, remove=[[0, 0, 0]])
    assert ir.N_sites == reg.N_sites - 1
    ir.test_sanity()
    # removed site is gone from the order
    removed = [0, 0, 0]
    assert not any(np.array_equal(row, removed) for row in ir.order)


def test_HelicalLattice():
    honey = lattice.Honeycomb(2, 3, [site, site], bc=['periodic', -1],
                              bc_MPS='infinite', order='Cstyle')
    hel = lattice.HelicalLattice(honey, 2)
    assert hel.N_sites == 4
    hel.test_sanity()
    # couplings must be translation invariant along the helix
    i, j, _, _ = hel.possible_couplings(0, 1, (0, 0))
    assert len(i) > 0


def test_extract_segment():
    lat = lattice.Chain(6, site, bc='periodic', bc_MPS='infinite')
    seg = lat.extract_segment(enlarge=3)
    assert seg.bc_MPS == 'segment'
    assert seg.N_sites == 18


def test_enlarge_mps_unit_cell():
    lat = lattice.Square(2, 3, site, bc_MPS='infinite', bc=['periodic', 'periodic'])
    big = lat.enlarge_mps_unit_cell(2)
    assert big.N_sites == 2 * lat.N_sites


def test_BZ():
    sq = lattice.Square(2, 2, site)
    bz = sq.BZ
    assert len(bz.vertices()) == 4
    tri = lattice.Triangular(2, 2, site)
    assert len(tri.BZ.vertices()) == 6


def test_plotting_smoke():
    matplotlib = pytest.importorskip('matplotlib')
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    for lat in [lattice.Chain(4, site),
                lattice.Honeycomb(2, 2, [site, site])]:
        fig, ax = plt.subplots()
        lat.plot_sites(ax)
        lat.plot_order(ax)
        if lat.dim == 2:
            lat.plot_coupling(ax)
            lat.plot_basis(ax)
            lat.plot_brillouin_zone(ax)
        plt.close(fig)


def test_get_lattice():
    assert lattice.get_lattice('Square') is lattice.Square
    assert lattice.get_lattice('Kagome') is lattice.Kagome
    with pytest.raises(ValueError):
        lattice.get_lattice('NoSuchLattice')
