r"""Lattice geometry: unit cell x Ls, MPS ordering, neighbor pairs, coupling enumeration.

Rebuild of ``tenpy/models/lattice.py`` (Lattice :61, ordering :427, mps2lat_idx :718,
possible_couplings :1161, possible_multi_couplings :1285, concrete lattices
Chain :2493, Ladder :2605, Square :2855, Triangular :2926, Honeycomb :3002,
Kagome :3130, get_lattice :3550, get_order :3569).

All of this is host-side geometry metadata; nothing touches the device.
Conventions (matching the reference):

* A lattice site is ``(x_0, ..., x_{dim-1}, u)`` with ``u`` indexing the unit cell.
* ``order`` is an ``(N_sites, dim+1)`` array: row ``i`` is the lattice index of MPS
  site ``i`` (the "snake" through the lattice).
* ``bc`` per axis: ``'open'`` or ``'periodic'`` (integer entries = shifted periodic
  for cylinders); ``bc_MPS`` in {'finite', 'segment', 'infinite'} — for 'infinite',
  axis 0 is the infinite direction.
"""

from __future__ import annotations

import itertools
import logging

import numpy as np

from ..networks.site import Site

logger = logging.getLogger(__name__)

__all__ = ['Lattice', 'TrivialLattice', 'SimpleLattice', 'MultiSpeciesLattice',
           'IrregularLattice', 'HelicalLattice', 'Chain', 'Ladder', 'NLegLadder',
           'Square', 'Triangular', 'Honeycomb', 'Kagome', 'get_lattice', 'get_order',
           'get_order_grouped', 'SimpleBZ']


class Lattice:
    """A lattice of unit cells with sites, MPS ordering, and neighbor tables.

    Parameters
    ----------
    Ls : list of int
        Extent in each direction.
    unit_cell : list of Site
    order : str | (priority-spec)
        MPS ordering; 'default' (C-style) or 'snake'.
    bc : (list of) {'open', 'periodic', int}
    bc_MPS : 'finite' | 'segment' | 'infinite'
    basis : array (dim, D) | None
        Lattice vectors (default: unit vectors).
    positions : array (len(unit_cell), D) | None
        Positions of the sites within the unit cell.
    pairs : dict
        Neighbor tables: ``{'nearest_neighbors': [(u1, u2, dx), ...], ...}``.
    """

    dim = None  # set per instance
    Lu = None   # number of sites in the unit cell (set per instance)

    _valid_bc_MPS = ('finite', 'segment', 'infinite')

    def __init__(self, Ls, unit_cell, order='default', bc='open', bc_MPS='finite',
                 basis=None, positions=None, pairs=None):
        self.Ls = tuple(int(L) for L in Ls)
        self.unit_cell = list(unit_cell)
        self.Lu = len(self.unit_cell)
        self.dim = len(self.Ls)
        self.shape = self.Ls + (self.Lu,)
        self.N_cells = int(np.prod(self.Ls))
        self.N_sites = self.N_cells * self.Lu
        self.N_sites_per_ring = self.N_sites // self.Ls[0]
        self.chinfo = self.unit_cell[0].leg.chinfo
        if bc_MPS not in self._valid_bc_MPS:
            raise ValueError(f"invalid bc_MPS {bc_MPS!r}")
        self.bc_MPS = bc_MPS
        self._set_bc(bc)
        if basis is None:
            basis = np.eye(self.dim)
        self.basis = np.asarray(basis, float)
        if positions is None:
            positions = np.zeros((self.Lu, self.basis.shape[1]))
        self.position_vectors = np.asarray(positions, float)
        self.pairs = dict(pairs or {})
        self._order_name = order
        self.order = self.ordering(order)

    # ---------------------------------------------------------------- bc handling
    def _set_bc(self, bc):
        if isinstance(bc, str):
            bc = [bc] * self.dim
        bc = list(bc)
        if len(bc) != self.dim:
            raise ValueError("bc length != dim")
        self.bc_shift = np.zeros(self.dim, int)
        self.bc = np.zeros(self.dim, bool)  # True = open
        for a, b in enumerate(bc):
            if b == 'open':
                self.bc[a] = True
            elif b == 'periodic':
                self.bc[a] = False
            elif isinstance(b, (int, np.integer)):
                self.bc[a] = False
                self.bc_shift[a] = int(b)
            else:
                raise ValueError(f"invalid bc entry {b!r}")
        if self.bc_MPS == 'infinite' and self.bc[0]:
            raise ValueError("bc_MPS='infinite' requires periodic bc along axis 0")
        if self.bc_shift[0] != 0:
            raise ValueError("no bc_shift along the MPS axis")

    @property
    def boundary_conditions(self):
        res = []
        for a in range(self.dim):
            if self.bc[a]:
                res.append('open')
            elif self.bc_shift[a]:
                res.append(int(self.bc_shift[a]))
            else:
                res.append('periodic')
        return res

    # ---------------------------------------------------------------- ordering
    def ordering(self, order):
        """Compute the (N_sites, dim+1) MPS ordering array. Reference: ``:427``."""
        if isinstance(order, np.ndarray):
            return order
        if order in ('default', 'Cstyle'):
            return get_order(self.shape, [True] * (self.dim + 1))
        if order == 'Fstyle':
            res = get_order(self.shape[::-1], [True] * (self.dim + 1))
            return res[:, ::-1]
        if order == 'snake':
            return get_order(self.shape, [True] * (self.dim + 1),
                             snake_winding=[False] * self.dim + [False],
                             snaked=True)
        if isinstance(order, tuple) and order and order[0] == 'grouped':
            return get_order_grouped(self.shape, order[1])
        raise ValueError(f"unknown ordering {order!r}")

    # ---------------------------------------------------------------- index conversion
    @property
    def order(self):
        return self._order

    @order.setter
    def order(self, order):
        self._order = np.asarray(order, int)
        # inverse lookup: lattice index tuple -> mps index
        self._perm = np.full(self.shape, -1, dtype=int)
        for i, idx in enumerate(self._order):
            self._perm[tuple(idx)] = i

    def mps_sites(self):
        """Sites in MPS order (length N_sites). Reference lattice.py ``mps_sites``.

        For charges with non-trivial spatial shifts (dipole conservation), the
        unit-cell sites — defined at position 0 — get their charges shifted to
        each site's actual lattice position (reference ``lattice.py:699``).
        """
        import copy as _copy
        sites = []
        for lat_idx in self._order:
            site = self.unit_cell[lat_idx[-1]]
            if site is not None and not site.leg.chinfo.trivial_shift:
                dx = np.array(lat_idx, int)
                dx[-1] = 0
                leg = site.leg.apply_charge_mapping(
                    site.leg.chinfo.shift_charges, func_kwargs={'dx': dx})
                site = _copy.copy(site)
                site.change_charge(leg)
            sites.append(site)
        return sites

    def mps2lat_idx(self, i):
        """MPS index -> lattice index array. Reference: ``:718``."""
        i = np.asarray(i)
        if i.ndim == 0:
            return self._order[int(i) % self.N_sites].copy()
        return self._order[i % self.N_sites].copy()

    def lat2mps_idx(self, lat_idx):
        """Lattice index -> MPS index. Reference lattice.py ``lat2mps_idx``."""
        lat_idx = np.asarray(lat_idx, int)
        single = lat_idx.ndim == 1
        lat = lat_idx.reshape(-1, self.dim + 1).copy()
        shift = np.zeros(lat.shape[0], int)
        for a in range(self.dim):
            La = self.Ls[a]
            if a == 0 and self.bc_MPS == 'infinite':
                cells = np.floor_divide(lat[:, 0], La)
                shift += cells * self.N_sites
                lat[:, 0] -= cells * La
            elif not self.bc[a]:
                # periodic wrap (with possible bc_shift applied to axis 0... reference
                # shifts axis 0 when wrapping other axes; here the shift convention:
                # wrapping axis a adds bc_shift[a] to axis 0)
                wraps = np.floor_divide(lat[:, a], La)
                lat[:, a] -= wraps * La
                lat[:, 0] += wraps * self.bc_shift[a]
        # re-handle axis 0 if the bc_shift pushed it out of range
        if self.bc_MPS == 'infinite':
            cells = np.floor_divide(lat[:, 0], self.Ls[0])
            shift += cells * self.N_sites
            lat[:, 0] -= cells * self.Ls[0]
        if np.any(lat < 0) or np.any(lat >= np.array(self.shape)):
            raise IndexError("lattice index out of bounds (open bc?)")
        res = self._perm[tuple(lat.T)] + shift
        return int(res[0]) if single else res

    def mps_idx_fix_u(self, u=None):
        """MPS indices of all sites with the given unit-cell index `u`."""
        if u is None:
            return np.arange(self.N_sites)
        return np.nonzero(self._order[:, -1] == u)[0]

    def mps_lat_idx_fix_u(self, u=None):
        idx = self.mps_idx_fix_u(u)
        return idx, self._order[idx, :-1]

    def position(self, lat_idx):
        """Real-space position of lattice site(s)."""
        lat_idx = np.asarray(lat_idx, int)
        single = lat_idx.ndim == 1
        lat = lat_idx.reshape(-1, self.dim + 1)
        pos = lat[:, :-1] @ self.basis + self.position_vectors[lat[:, -1]]
        return pos[0] if single else pos

    def site(self, i):
        return self.unit_cell[self._order[int(i) % self.N_sites, -1]]

    # ---------------------------------------------------------------- mps<->lat values
    def mps2lat_values(self, A, axes=0, u=None):
        """Reshape an array indexed by MPS sites into lattice shape.

        Reference: ``:817``."""
        A = np.asarray(A)
        if axes != 0:
            A = np.moveaxis(A, axes, 0)
        if u is None:
            shape = self.shape
            order = self._order
        else:
            idx = self.mps_idx_fix_u(u)
            order = self._order[idx][:, :-1]
            shape = self.Ls
        res = np.empty(tuple(shape) + A.shape[1:], dtype=A.dtype)
        if u is None:
            for i, lat in enumerate(order):
                res[tuple(lat)] = A[i]
        else:
            for k, lat in enumerate(order):
                res[tuple(lat)] = A[k]
        return res

    # ---------------------------------------------------------------- couplings
    def possible_couplings(self, u1, u2, dx, strength=None):
        """Enumerate two-site couplings ``A_{u1, x} B_{u2, x+dx}``.

        Returns ``(mps_i, mps_j, lat_indices, coupling_shape)``; for given `strength`
        additionally filters zero entries and returns the strength values.
        Reference: ``tenpy/models/lattice.py:1161``.
        """
        dx = np.asarray(dx, int)
        coupling_shape, shift_lat = self.coupling_shape(dx)
        Ls = np.array(self.Ls)
        mps_i = []
        mps_j = []
        lat_idx = []
        for x in itertools.product(*[range(n) for n in coupling_shape]):
            x0 = np.asarray(x, int) + shift_lat
            x1 = x0 + dx
            # validity: per open axis both ends in range
            i_lat = np.concatenate([x0, [u1]])
            j_lat = np.concatenate([x1, [u2]])
            ok = True
            for a in range(self.dim):
                if self.bc[a]:
                    if not (0 <= i_lat[a] < Ls[a] and 0 <= j_lat[a] < Ls[a]):
                        ok = False
                        break
                elif a != 0 or self.bc_MPS != 'infinite':
                    pass  # periodic wrap handled by lat2mps_idx
            if not ok:
                continue
            try:
                i = self.lat2mps_idx(i_lat)
                j = self.lat2mps_idx(j_lat)
            except IndexError:
                continue
            if self.bc_MPS == 'infinite':
                # normalize translation: 0 <= min(i, j) < N_sites (reference
                # convention; required e.g. by the HelicalLattice restriction)
                shift = (min(i, j) // self.N_sites) * self.N_sites
                i -= shift
                j -= shift
            mps_i.append(i)
            mps_j.append(j)
            lat_idx.append(x)
        mps_i = np.array(mps_i, int)
        mps_j = np.array(mps_j, int)
        lat_idx = np.array(lat_idx, int).reshape(len(mps_i), self.dim)
        return mps_i, mps_j, lat_idx, tuple(coupling_shape)

    def possible_multi_couplings(self, ops):
        """Enumerate multi-site couplings: ops = [(opname, dx, u), ...].

        Returns ``(mps_ijkl, lat_indices, coupling_shape)``.
        Reference: ``:1285``."""
        dxs = np.array([dx for _, dx, _ in ops], int)
        us = [u for _, _, u in ops]
        dx_min = dxs.min(axis=0)
        dxs = dxs - dx_min  # normalize: smallest zero
        span = dxs.max(axis=0)
        coupling_shape, shift_lat = self.coupling_shape(span)
        Ls = np.array(self.Ls)
        mps_ijkl = []
        lat_idx = []
        for x in itertools.product(*[range(n) for n in coupling_shape]):
            x0 = np.asarray(x, int) + shift_lat
            ijkl = []
            ok = True
            for dx, u in zip(dxs, us):
                xl = x0 + dx
                lat = np.concatenate([xl, [u]])
                for a in range(self.dim):
                    if self.bc[a] and not (0 <= lat[a] < Ls[a]):
                        ok = False
                        break
                if not ok:
                    break
                try:
                    ijkl.append(self.lat2mps_idx(lat))
                except IndexError:
                    ok = False
                    break
            if not ok:
                continue
            if self.bc_MPS == 'infinite':
                shift = (min(ijkl) // self.N_sites) * self.N_sites
                ijkl = [x - shift for x in ijkl]
            mps_ijkl.append(ijkl)
            lat_idx.append(x)
        mps_ijkl = np.array(mps_ijkl, int).reshape(len(mps_ijkl), len(ops))
        lat_idx = np.array(lat_idx, int).reshape(len(mps_ijkl), self.dim)
        return mps_ijkl, lat_idx, tuple(coupling_shape)

    def coupling_shape(self, dx):
        """Shape of the coupling-strength array for offset `dx`, and index shift.

        Open axes shrink by |dx|; periodic/infinite axes keep full length.
        """
        dx = np.asarray(dx, int)
        shape = []
        shift = []
        for a in range(self.dim):
            La = self.Ls[a]
            if self.bc[a]:
                shape.append(max(La - abs(int(dx[a])), 0))
                shift.append(max(-int(dx[a]), 0))
            else:
                shape.append(La)
                shift.append(0)
        return tuple(shape), np.array(shift, int)

    def find_coupling_pairs(self, max_dx=3, cutoff=None, eps=1e-10):
        """Automatically detect neighbor pairs by distance. Reference: ``:1085``."""
        pos = []
        info = []
        for u in range(self.Lu):
            for dx in itertools.product(*[range(-max_dx, max_dx + 1)] * self.dim):
                for u2 in range(self.Lu):
                    vec = (self.position(np.concatenate([np.array(dx), [u2]])) -
                           self.position(np.concatenate([np.zeros(self.dim, int),
                                                         [u]])))
                    d = np.linalg.norm(vec)
                    if d > eps:
                        pos.append(d)
                        info.append((u, u2, np.array(dx, int)))
        pos = np.array(pos)
        dists = np.sort(np.unique(np.round(pos, 8)))
        if cutoff is not None:
            dists = dists[dists <= cutoff]
        result = {}
        names = ['nearest_neighbors', 'next_nearest_neighbors',
                 'next_next_nearest_neighbors']
        for k, d in enumerate(dists[:len(names)]):
            # d is rounded to 8 decimals: select with a matching tolerance
            # (eps alone drops irrational distances like sqrt(2))
            sel = np.abs(pos - d) < max(eps, 1e-7)
            seen = set()
            pairs = []
            for (u, u2, dx) in [info[i] for i in np.nonzero(sel)[0]]:
                key = (u, u2, tuple(dx))
                rkey = (u2, u, tuple(-dx))
                if key in seen or rkey in seen:
                    continue
                seen.add(key)
                pairs.append((u, u2, dx))
            result[names[k]] = pairs
        return result

    # ---------------------------------------------------------------- unit cell ops
    def enlarge_mps_unit_cell(self, factor=2):
        """Repeat the lattice along axis 0 (for infinite bc). Reference: ``:636``."""
        assert self.bc_MPS == 'infinite'
        Ls = (self.Ls[0] * factor,) + self.Ls[1:]
        return self.__class__.__new__(self.__class__) if False else Lattice(
            Ls, self.unit_cell, self._order_name, self.boundary_conditions,
            self.bc_MPS, self.basis, self.position_vectors, self.pairs)

    def extract_segment(self, first=0, last=None, enlarge=None):
        """Lattice for a finite segment of an infinite system.

        Either give ``enlarge`` (segment = that many MPS unit cells) or
        ``first=0, last=n*L-1``.  Partial-unit-cell segments would need an
        irregular lattice and are not supported.
        Returns a copy with ``bc_MPS='segment'`` and ``segment_first_last``.
        Reference: ``tenpy/models/lattice.py:585``.
        """
        import copy as _copy
        L = self.N_sites
        if enlarge is not None:
            if self.bc_MPS != 'infinite':
                raise ValueError("enlarge only possible for infinite MPS")
            if last is not None or first != 0:
                raise ValueError("specify either first+last or enlarge")
            assert enlarge > 0
            last = enlarge * L - 1
        elif last is None:
            last = L - 1
            enlarge = 1
        else:
            enlarge = last // L + 1
        if first != 0 or (last + 1) % L != 0:
            raise NotImplementedError("partial-unit-cell segments need an "
                                      "irregular lattice (round-2 item)")
        if enlarge > 1:
            cp = self.enlarge_mps_unit_cell(enlarge)
        else:
            cp = _copy.copy(self)
        cp.bc_MPS = 'segment'
        cp.segment_first_last = (first, last)
        return cp

    # ---------------------------------------------------------------- plotting
    # Matplotlib helpers with the reference's API surface
    # (``tenpy/models/lattice.py:1366-1683``), implemented over this class's
    # position()/order/pairs data.  All take an existing ``ax``.

    def _pos2d(self, pos):
        """Project positions to 2D for plotting (pad 1D with zeros)."""
        pos = np.atleast_2d(np.asarray(pos, float))
        if pos.shape[1] == 1:
            pos = np.hstack([pos, np.zeros((len(pos), 1))])
        return pos[:, :2]

    def plot_sites(self, ax, markers=['o', '^', 's', 'p', 'h', 'D'],
                   labels=None, **kwargs):
        """Scatter all lattice sites, one marker per unit-cell index.

        Reference: ``lattice.py:1366``."""
        kwargs.setdefault('linestyle', 'None')
        for u in range(self.Lu):
            _, lat = self.mps_lat_idx_fix_u(u)
            pos = self._pos2d(self.position(
                np.hstack([lat, np.full((len(lat), 1), u, int)])))
            m = markers[u % len(markers)]
            label = None if labels is None else labels[u % len(labels)]
            ax.plot(pos[:, 0], pos[:, 1], marker=m, label=label, **kwargs)

    def plot_order(self, ax, order=None, textkwargs={}, **kwargs):
        """Draw a line through the sites in MPS order (+ index labels).

        Reference: ``lattice.py:1397``."""
        if order is None:
            order = self._order
        pos = self._pos2d(self.position(order))
        kwargs.setdefault('color', 'r')
        ax.plot(pos[:, 0], pos[:, 1], **kwargs)
        if textkwargs is not None:
            textkwargs = dict(textkwargs)
            textkwargs.setdefault('color', kwargs['color'])
            for i, p in enumerate(pos):
                ax.text(p[0], p[1], str(i), **textkwargs)

    def plot_coupling(self, ax, coupling=None, wrap=False, **kwargs):
        """Draw lines between coupled site pairs.

        ``coupling``: list of ``(u1, u2, dx)`` (default: nearest neighbors
        from ``self.pairs``).  With ``wrap``, couplings crossing a periodic
        boundary are drawn wrapped to the neighbor's true image position
        (possibly outside the cell); otherwise they are skipped when they'd
        span the whole system.  Reference: ``lattice.py:1427``."""
        if coupling is None:
            coupling = self.pairs.get('nearest_neighbors', [])
        kwargs.setdefault('color', 'k')
        Ls = np.array(self.Ls)
        for u1, u2, dx in coupling:
            dx = np.asarray(dx, int)
            mps_i, mps_j, lat_idx, _ = self.possible_couplings(u1, u2, dx)
            if len(mps_i) == 0:
                continue
            lat_i = self._order[mps_i % self.N_sites, :-1] \
                + (mps_i // self.N_sites)[:, None] * np.array(
                    [self.Ls[0]] + [0] * (self.dim - 1))
            pos_i = self._pos2d(self.position(
                np.hstack([lat_i, np.full((len(mps_i), 1), u1, int)])))
            # neighbor's image position: i's cell + dx (not the wrapped cell)
            pos_j = self._pos2d(self.position(
                np.hstack([lat_i + dx, np.full((len(mps_j), 1), u2, int)])))
            if not wrap:
                # drop couplings that wrapped around a periodic direction
                lat_j_wrapped = self._order[mps_j % self.N_sites, :-1]
                raw = lat_i + dx
                keep = np.ones(len(mps_i), bool)
                for a in range(self.dim):
                    if not self.bc[a] and (a != 0 or self.bc_MPS != 'infinite'):
                        keep &= (raw[:, a] % Ls[a]) == raw[:, a]
                pos_i, pos_j = pos_i[keep], pos_j[keep]
            segs = np.stack([pos_i, pos_j], axis=1)     # (n, 2, 2)
            xs = np.empty((len(segs) * 3,))
            ys = np.empty_like(xs)
            xs[0::3], xs[1::3], xs[2::3] = segs[:, 0, 0], segs[:, 1, 0], np.nan
            ys[0::3], ys[1::3], ys[2::3] = segs[:, 0, 1], segs[:, 1, 1], np.nan
            ax.plot(xs, ys, **kwargs)

    def plot_basis(self, ax, origin=(0., 0.), shade=None, **kwargs):
        """Arrows for the lattice basis vectors.  Reference: ``:1479``."""
        kwargs.setdefault('angles', 'xy')
        kwargs.setdefault('scale_units', 'xy')
        kwargs.setdefault('scale', 1.)
        origin = np.asarray(origin, float)
        vecs = self._pos2d(self.basis)
        if shade and len(vecs) >= 2:
            import matplotlib.patches as mpatches
            corners = np.array([origin, origin + vecs[0],
                                origin + vecs[0] + vecs[1], origin + vecs[1]])
            ax.add_patch(mpatches.Polygon(corners, alpha=0.2, color='gray'))
        for v in vecs:
            ax.quiver([origin[0]], [origin[1]], [v[0]], [v[1]], **kwargs)

    def plot_reciprocal_basis(self, ax, origin=(0., 0.), plot_symmetric=True,
                              **kwargs):
        """Arrows for the reciprocal basis vectors.  Reference: ``:1510``."""
        kwargs.setdefault('angles', 'xy')
        kwargs.setdefault('scale_units', 'xy')
        kwargs.setdefault('scale', 1.)
        recip = self.BZ.reciprocal_basis
        origin = np.asarray(origin, float)
        for v in self._pos2d(recip):
            ax.quiver([origin[0]], [origin[1]], [v[0]], [v[1]], **kwargs)
        if plot_symmetric:
            lim = 0.6 * np.abs(self._pos2d(recip)).max()
            ax.set_xlim(-lim, lim)
            ax.set_ylim(-lim, lim)

    def plot_bc_identified(self, ax, direction=-1, origin=None,
                           cylinder_axis=False, **kwargs):
        """Mark the sites identified by periodic boundary conditions.

        Draws markers on the first row of sites and on their periodic images
        along ``direction`` (default: the last periodic direction).
        Reference: ``lattice.py:1547``."""
        if direction < 0:
            direction += self.dim
        assert not self.bc[direction], "direction must be periodic"
        kwargs.setdefault('marker', 'o')
        kwargs.setdefault('markersize', 10)
        kwargs.setdefault('fillstyle', 'none')
        kwargs.setdefault('linestyle', 'None')
        kwargs.setdefault('color', 'orange')
        shift = self.Ls[direction] * self.basis[direction]
        if self.bc_shift[direction]:
            shift = shift + self.bc_shift[direction] * self.basis[0]
        first = [idx for idx in self._order if idx[direction] == 0]
        pos = self.position(np.asarray(first, int))
        for p in [self._pos2d(pos), self._pos2d(pos + shift)]:
            ax.plot(p[:, 0], p[:, 1], **kwargs)
        if cylinder_axis and self.dim == 2:
            c = self._pos2d(pos).mean(0)
            axis = self._pos2d(np.atleast_2d(shift))[0]
            perp = np.array([-axis[1], axis[0]])
            n = perp / max(np.linalg.norm(perp), 1e-15)
            span = np.linalg.norm(self._pos2d(self.basis).sum(0)) * max(self.Ls)
            ax.plot([c[0] - n[0] * span, c[0] + n[0] * span],
                    [c[1] - n[1] * span, c[1] + n[1] * span], 'k--', lw=1)

    @property
    def BZ(self):
        """First Brillouin zone of this lattice's basis."""
        if getattr(self, '_BZ', None) is None:
            self._BZ = SimpleBZ(self.basis, self.dim)
        return self._BZ

    def plot_brillouin_zone(self, ax, *args, **kwargs):
        """Plot the first Brillouin zone boundary.  Reference: ``:1602``."""
        return self.BZ.plot_brillouin_zone(ax, *args, **kwargs)

    def test_sanity(self):
        assert len(self._order) == self.N_sites
        assert sorted(map(tuple, self._order)) == sorted(
            itertools.product(*[range(n) for n in self.shape]))

    def __repr__(self):
        return (f"{self.__class__.__name__}({list(self.Ls)}, "
                f"{[s.__class__.__name__ for s in self.unit_cell]}, "
                f"bc={self.boundary_conditions}, bc_MPS={self.bc_MPS!r})")


def get_order(shape, cstyle_priority, snake_winding=None, snaked=False):
    """C-style (or snaked) enumeration of a hypercubic index set.

    Reference: ``tenpy/models/lattice.py:3569``."""
    if not snaked:
        return np.array(list(itertools.product(*[range(n) for n in shape])), int)
    # snake: reverse every other row recursively
    dims = len(shape)
    res = []

    def rec(prefix, axis, reverse):
        if axis == dims:
            res.append(tuple(prefix))
            return
        rng = range(shape[axis])
        if reverse:
            rng = reversed(rng)
        for k, x in enumerate(rng):
            rec(prefix + [x], axis + 1, (k % 2 == 1))
    rec([], 0, False)
    return np.array(res, int)


def get_order_grouped(shape, groups, priority=None):
    """Ordering that visits unit-cell groups together (reference ``:3650``)."""
    Ls = shape[:-1]
    Lu = shape[-1]
    res = []
    for cell in itertools.product(*[range(n) for n in Ls]):
        for group in groups:
            for u in group:
                res.append(tuple(cell) + (u,))
    return np.array(res, int)


class SimpleBZ:
    """First Brillouin zone helper (reciprocal vectors). Reference: ``:3246``."""

    def __init__(self, basis, dim):
        self.basis = np.asarray(basis)
        self.dim = dim
        self.reciprocal_basis = 2 * np.pi * np.linalg.pinv(self.basis).T

    @classmethod
    def from_recip_basis_vectors(cls, recip, dim):
        self = cls.__new__(cls)
        self.reciprocal_basis = np.asarray(recip)
        self.dim = dim
        return self

    def vertices(self):
        """Corners of the first BZ (2D: Voronoi cell of the reciprocal
        lattice around the origin; 1D: the interval endpoints)."""
        recip = np.atleast_2d(self.reciprocal_basis)
        if self.dim == 1 or len(recip) == 1:
            g = np.linalg.norm(recip[0])
            return np.array([[-g / 2.], [g / 2.]])
        from scipy.spatial import Voronoi
        pts = [i * recip[0][:2] + j * recip[1][:2]
               for i in range(-2, 3) for j in range(-2, 3)]
        vor = Voronoi(np.asarray(pts))
        region = vor.regions[vor.point_region[12]]   # the origin's cell
        verts = vor.vertices[region]
        ang = np.arctan2(verts[:, 1], verts[:, 0])
        return verts[np.argsort(ang)]

    def plot_brillouin_zone(self, ax, *args, **kwargs):
        """Draw the first-BZ boundary polygon.  Reference: ``lattice.py:3459``."""
        kwargs.setdefault('color', 'k')
        v = self.vertices()
        if v.shape[1] == 1:
            ax.axvline(v[0, 0], *args, **kwargs)
            ax.axvline(v[1, 0], *args, **kwargs)
        else:
            closed = np.vstack([v, v[:1]])
            ax.plot(closed[:, 0], closed[:, 1], *args, **kwargs)


# ======================================================================== concrete
class TrivialLattice(Lattice):
    """Lattice of N sites with unit cell = all sites (Ls = [1])."""

    def __init__(self, mps_sites, **kwargs):
        super().__init__([1], mps_sites, **kwargs)


class SimpleLattice(Lattice):
    """Lattice with a single-site unit cell; `dx` may omit the trailing 0."""

    def __init__(self, Ls, site, **kwargs):
        super().__init__(Ls, [site], **kwargs)


class Chain(SimpleLattice):
    """1D chain. Reference: ``lattice.py:2493``."""

    dim = 1

    def __init__(self, L, site, **kwargs):
        kwargs.setdefault('pairs', {
            'nearest_neighbors': [(0, 0, np.array([1]))],
            'next_nearest_neighbors': [(0, 0, np.array([2]))],
            'next_next_nearest_neighbors': [(0, 0, np.array([3]))],
        })
        super().__init__([L], site, **kwargs)

    def ordering(self, order):
        if isinstance(order, str) and order == 'folded':
            # [0, L-1, 1, L-2, ...]: maps a periodic ring onto an open MPS
            # with only short-range matrix elements (reference lattice.py:2510)
            L = self.shape[0]
            idx = []
            for i in range((L + 1) // 2):
                idx.append(i)
                if i != L - 1 - i:
                    idx.append(L - 1 - i)
            return np.array([[i, 0] for i in idx], np.intp)
        return super().ordering(order)


class Ladder(Lattice):
    """Two-leg ladder. Reference: ``:2605``."""

    dim = 1

    def __init__(self, L, sites, **kwargs):
        if isinstance(sites, Site):
            sites = [sites, sites]
        kwargs.setdefault('pairs', {
            'nearest_neighbors': [(0, 0, np.array([1])), (1, 1, np.array([1])),
                                  (0, 1, np.array([0]))],
            'next_nearest_neighbors': [(0, 1, np.array([1])),
                                       (1, 0, np.array([1]))],
        })
        kwargs.setdefault('positions', [[0., 0.], [0., 1.]])
        kwargs.setdefault('basis', [[1., 0.]])
        super().__init__([L], sites, **kwargs)


class NLegLadder(Lattice):
    """N-leg ladder. Reference: ``:2721``."""

    dim = 1

    def __init__(self, L, n_legs, sites, **kwargs):
        if isinstance(sites, Site):
            sites = [sites] * n_legs
        nn = [(u, u, np.array([1])) for u in range(n_legs)] + \
             [(u, u + 1, np.array([0])) for u in range(n_legs - 1)]
        kwargs.setdefault('pairs', {'nearest_neighbors': nn})
        kwargs.setdefault('positions', [[0., u] for u in range(n_legs)])
        kwargs.setdefault('basis', [[1., 0.]])
        super().__init__([L], sites, **kwargs)


class Square(SimpleLattice):
    """2D square lattice. Reference: ``:2855``."""

    dim = 2

    def __init__(self, Lx, Ly, site, **kwargs):
        kwargs.setdefault('pairs', {
            'nearest_neighbors': [(0, 0, np.array([1, 0])),
                                  (0, 0, np.array([0, 1]))],
            'next_nearest_neighbors': [(0, 0, np.array([1, 1])),
                                       (0, 0, np.array([1, -1]))],
            'next_next_nearest_neighbors': [(0, 0, np.array([2, 0])),
                                            (0, 0, np.array([0, 2]))],
        })
        super().__init__([Lx, Ly], site, **kwargs)


class Triangular(SimpleLattice):
    """2D triangular lattice. Reference: ``:2926``."""

    dim = 2

    def __init__(self, Lx, Ly, site, **kwargs):
        kwargs.setdefault('basis', [[1., 0.], [0.5, 0.5 * np.sqrt(3.)]])
        kwargs.setdefault('pairs', {
            'nearest_neighbors': [(0, 0, np.array([1, 0])),
                                  (0, 0, np.array([0, 1])),
                                  (0, 0, np.array([1, -1]))],
            'next_nearest_neighbors': [(0, 0, np.array([2, -1])),
                                       (0, 0, np.array([1, 1])),
                                       (0, 0, np.array([-1, 2]))],
        })
        super().__init__([Lx, Ly], site, **kwargs)


class Honeycomb(Lattice):
    """2D honeycomb lattice (2-site unit cell). Reference: ``:3002``."""

    dim = 2

    def __init__(self, Lx, Ly, sites, **kwargs):
        if isinstance(sites, Site):
            sites = [sites, sites]
        basis = np.array([[1., 0.], [0.5, 0.5 * np.sqrt(3.)]])
        pos = np.array([[0., 0.], (basis[0] + basis[1]) / 3.])
        kwargs.setdefault('basis', basis)
        kwargs.setdefault('positions', pos)
        kwargs.setdefault('pairs', {
            'nearest_neighbors': [(0, 1, np.array([0, 0])),
                                  (1, 0, np.array([1, 0])),
                                  (1, 0, np.array([0, 1]))],
            'next_nearest_neighbors': [(0, 0, np.array([1, 0])),
                                       (0, 0, np.array([0, 1])),
                                       (0, 0, np.array([1, -1])),
                                       (1, 1, np.array([1, 0])),
                                       (1, 1, np.array([0, 1])),
                                       (1, 1, np.array([1, -1]))],
        })
        super().__init__([Lx, Ly], sites, **kwargs)


class Kagome(Lattice):
    """2D kagome lattice (3-site unit cell). Reference: ``:3130``."""

    dim = 2

    def __init__(self, Lx, Ly, sites, **kwargs):
        if isinstance(sites, Site):
            sites = [sites, sites, sites]
        basis = np.array([[1., 0.], [0.5, 0.5 * np.sqrt(3.)]])
        pos = np.array([[0., 0.], basis[0] / 2., basis[1] / 2.])
        kwargs.setdefault('basis', basis)
        kwargs.setdefault('positions', pos)
        kwargs.setdefault('pairs', {
            'nearest_neighbors': [
                (0, 1, np.array([0, 0])), (0, 2, np.array([0, 0])),
                (1, 2, np.array([0, 0])), (1, 0, np.array([1, 0])),
                (2, 0, np.array([0, 1])), (2, 1, np.array([-1, 1]))],
        })
        super().__init__([Lx, Ly], sites, **kwargs)


class MultiSpeciesLattice(Lattice):
    """Wrap a SimpleLattice replacing each site by several species sites.

    Reference: ``lattice.py:1750``."""

    def __init__(self, simple_lattice, species_sites, species_names=None):
        self.simple_lattice = simple_lattice
        n_sp = len(species_sites)
        if species_names is None:
            species_names = [str(s) for s in range(n_sp)]
        self.species_names = list(species_names)
        unit_cell = []
        for u in range(simple_lattice.Lu):
            unit_cell.extend(species_sites)
        positions = np.repeat(simple_lattice.position_vectors, n_sp, axis=0)
        # species-resolved pair names (reference lattice.py:1750):
        #   '<key>'            — all species combinations (backwards compat)
        #   '<key>_all-all'    — same as '<key>'
        #   '<key>_diag'       — same species on both ends
        #   '<key>_<a>-<b>'    — species a on the first, b on the second end
        # plus 'onsite_<a>-<b>' pairs within one unit-cell site (a < b).
        pairs = {}
        for name, entries in simple_lattice.pairs.items():
            allall = []
            diag = []
            by_sp = {(a, b): [] for a in range(n_sp) for b in range(n_sp)}
            for (u1, u2, dx) in entries:
                for s1 in range(n_sp):
                    for s2 in range(n_sp):
                        e = (u1 * n_sp + s1, u2 * n_sp + s2, dx)
                        allall.append(e)
                        if s1 == s2:
                            diag.append(e)
                        by_sp[s1, s2].append(e)
            pairs[name] = allall
            pairs[name + '_all-all'] = allall
            pairs[name + '_diag'] = diag
            for (a, b), lst in by_sp.items():
                pairs[f'{name}_{species_names[a]}-{species_names[b]}'] = lst
        zero_dx = np.zeros(simple_lattice.dim, np.intp)
        onsite_all = []
        for u in range(simple_lattice.Lu):
            for a in range(n_sp):
                for b in range(a + 1, n_sp):
                    e = (u * n_sp + a, u * n_sp + b, zero_dx)
                    onsite_all.append(e)
                    key = f'onsite_{species_names[a]}-{species_names[b]}'
                    pairs.setdefault(key, []).append(e)
        pairs['onsite_all-all'] = onsite_all
        super().__init__(simple_lattice.Ls, unit_cell,
                         bc=simple_lattice.boundary_conditions,
                         bc_MPS=simple_lattice.bc_MPS,
                         basis=simple_lattice.basis, positions=positions,
                         pairs=pairs)


class IrregularLattice(Lattice):
    """Lattice with sites removed/added relative to a regular one.

    Reference: ``lattice.py:1990``.  Only removal is supported here."""

    def __init__(self, regular_lattice, remove=None):
        self.regular_lattice = regular_lattice
        reg = regular_lattice
        order = reg.order
        if remove is not None:
            remove_set = {tuple(r) for r in np.asarray(remove, int)}
            keep = [k for k, idx in enumerate(order)
                    if tuple(idx) not in remove_set]
            order = order[keep]
        # initialize basic attributes without regenerating order
        self.Ls = reg.Ls
        self.unit_cell = reg.unit_cell
        self.Lu = reg.Lu
        self.dim = reg.dim
        self.shape = reg.shape
        self.N_cells = reg.N_cells
        self.N_sites = len(order)
        self.N_sites_per_ring = max(self.N_sites // self.Ls[0], 1)
        self.chinfo = reg.chinfo
        self.bc_MPS = reg.bc_MPS
        self.bc = reg.bc
        self.bc_shift = reg.bc_shift
        self.basis = reg.basis
        self.position_vectors = reg.position_vectors
        self.pairs = reg.pairs
        self._order_name = 'irregular'
        self.order = order

    def test_sanity(self):
        assert len(self._order) == self.N_sites


class HelicalLattice(Lattice):
    """Translation-invariant helical winding of a tilted 2D cylinder.

    With shifted periodic boundary ``bc=['periodic', -1]`` the site at
    ``(x, Ly-1)`` neighbors ``(x+1, 0)``: the MPS winds as a helix around the
    cylinder and the system is translation invariant under a shift by a single
    *lattice* unit cell.  The MPS unit cell then holds only
    ``N_unit_cells * len(unit_cell)`` sites; couplings are those of the
    regular lattice restricted to ``min(i, j, ...) < N_sites``.
    Reference: ``tenpy/models/lattice.py:2234``.
    """

    def __init__(self, regular_lattice, N_unit_cells):
        reg = regular_lattice
        if isinstance(reg, HelicalLattice):
            raise ValueError("regular_lattice can't itself be helical")
        if reg.dim != 2:
            raise ValueError("HelicalLattice works only for 2D lattices")
        if reg.bc_MPS != 'infinite':
            raise ValueError("HelicalLattice requires bc_MPS='infinite'")
        if tuple(reg.bc_shift[1:]) != (-1,):
            raise ValueError("initialize the regular lattice with "
                             "bc=['periodic', -1] (shifted periodic around y)")
        if reg.N_cells % N_unit_cells != 0 or N_unit_cells > reg.N_cells:
            raise ValueError("N_unit_cells incommensurate with the regular "
                             "lattice; increase Lx")
        self.regular_lattice = reg
        self._N_cells_helical = N_unit_cells
        # copy geometry from the regular lattice; only N_sites/order shrink
        self.Ls = reg.Ls
        self.unit_cell = reg.unit_cell
        self.Lu = reg.Lu
        self.dim = reg.dim
        self.shape = reg.shape
        self.N_cells = N_unit_cells
        self.N_sites = N_unit_cells * reg.Lu
        self.N_sites_per_ring = None  # not meaningful for a helix
        self.N_rings = None
        self.chinfo = reg.chinfo
        self.bc_MPS = reg.bc_MPS
        self.bc = reg.bc
        self.bc_shift = reg.bc_shift
        self.basis = reg.basis
        self.position_vectors = reg.position_vectors
        self.pairs = reg.pairs
        self._order_name = 'helical'
        order = np.asarray(reg.order, int)
        # require C-style order of the regular lattice (up to the unit-cell
        # internal order): translation invariance along the helix needs the MPS
        # to wind ring by ring
        self.order = order[:self.N_sites]

    def test_sanity(self):
        assert len(self._order) == self.N_sites

    # index conversions delegate to the regular lattice (same winding,
    # just a smaller translation cell)
    def mps2lat_idx(self, i):
        return self.regular_lattice.mps2lat_idx(i)

    def lat2mps_idx(self, lat_idx):
        return self.regular_lattice.lat2mps_idx(lat_idx)

    def mps2lat_values(self, *args, **kwargs):
        raise NotImplementedError("ill-defined on a helix: values repeat with "
                                  "the helical period")

    def possible_couplings(self, u1, u2, dx, strength=None):
        reg = self.regular_lattice
        mps_i, mps_j, lat_idx, coupling_shape = reg.possible_couplings(u1, u2,
                                                                       dx)
        keep = np.min([mps_i, mps_j], axis=0) < self.N_sites
        return mps_i[keep], mps_j[keep], lat_idx[keep], coupling_shape

    def possible_multi_couplings(self, ops):
        reg = self.regular_lattice
        mps_ijkl, lat_idx, coupling_shape = reg.possible_multi_couplings(ops)
        keep = np.min(mps_ijkl, axis=1) < self.N_sites
        return mps_ijkl[keep, :], lat_idx[keep, :], coupling_shape

    def enlarge_mps_unit_cell(self, factor=2):
        if (self._N_cells_helical * factor > self.regular_lattice.N_cells or
                self.regular_lattice.N_cells %
                (self._N_cells_helical * factor) != 0):
            self.regular_lattice.enlarge_mps_unit_cell(factor)
        HelicalLattice.__init__(self, self.regular_lattice,
                                self._N_cells_helical * factor)


def get_lattice(lattice_name):
    """Resolve a lattice class by name. Reference: ``:3550``."""
    from ..tools.misc import find_subclass
    return find_subclass(Lattice, lattice_name)
