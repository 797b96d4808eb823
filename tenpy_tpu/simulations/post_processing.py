r"""Post-processing of simulation output files.

Rebuild of ``tenpy/simulations/post_processing.py`` (DataLoader :37, DataFiles :244,
pp_spectral_function :364).
"""

from __future__ import annotations

import logging

import numpy as np

from ..tools import io as tio
from ..tools.spectral_function_tools import spectral_function

logger = logging.getLogger(__name__)

__all__ = ['DataLoader', 'DataFiles', 'pp_spectral_function',
           'pp_plot_correlations_on_lattice']


class DataLoader:
    """Load one results file and give convenient access to measurements."""

    def __init__(self, filename=None, data=None):
        self.filename = filename
        self._data = data if data is not None else tio.load(filename)

    @property
    def measurements(self):
        return self._data.get('measurements', {})

    @property
    def sim_params(self):
        return self._data.get('simulation_parameters', {})

    def get_data_m(self, key):
        return np.asarray(self.measurements[key])

    def get_data(self, key, default=None):
        return self._data.get(key, default)

    def __getitem__(self, key):
        return self._data[key]

    def keys(self):
        return self._data.keys()

    @property
    def lat(self):
        """The simulation's lattice, rebuilt from the saved model params."""
        if getattr(self, '_lat', None) is None:
            from ..models.model import Model
            from ..tools.misc import find_subclass
            params = dict(self.sim_params.get('model_params', {}))
            cls = find_subclass(Model, self.sim_params['model_class'])
            self._lat = cls(params).lat
        return self._lat


class DataFiles:
    """Dict-like collection of DataLoaders keyed by filename."""

    def __init__(self, filenames=()):
        self._loaders = {}
        for fn in filenames:
            self._loaders[fn] = DataLoader(fn)

    def __getitem__(self, fn):
        if fn not in self._loaders:
            self._loaders[fn] = DataLoader(fn)
        return self._loaders[fn]

    def keys(self):
        return self._loaders.keys()


def pp_spectral_function(data_loader, *, correlation_key='correlation_t',
                         dt=None, **kwargs):
    """Compute S(k, w) from measured time-dependent correlations.

    Reference: ``post_processing.py:364``."""
    C_t = data_loader.get_data_m(correlation_key)
    if dt is None:
        alg = data_loader.sim_params.get('algorithm_params', {})
        dt = alg.get('dt', 0.1) * alg.get('N_steps', 1)

    class _Lat1D:
        dim = 1
        Ls = (C_t.shape[1],)
    return spectral_function(C_t, _Lat1D(), dt, **kwargs)


def pp_plot_correlations_on_lattice(data_loader, *, data_key, t_step=0,
                                    keys='nearest_neighbors',
                                    default_dir='plots',
                                    save_as='Correlations.pdf', markers='D',
                                    figsize=(8, 8), **kwargs):
    """Save a plot of measured correlations drawn on the lattice.

    ``data_key`` selects an ``(N, N)`` (or ``(T, N, N)``, with ``t_step``)
    correlation matrix from the measurements; line thickness encodes the
    correlation strength on each bond of ``lat.pairs[keys]``.
    Reference: ``tenpy/simulations/post_processing.py:397``.
    """
    import os
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from ..tools.spectral_function_tools import plot_correlations_on_lattice
    os.makedirs(default_dir, exist_ok=True)
    if isinstance(keys, str):
        keys = [keys]
    if isinstance(markers, str):
        markers = [markers]
    lat = data_loader.lat
    correlations = data_loader.get_data_m(data_key)
    fig, ax = plt.subplots(figsize=figsize)
    title = f'Correlations {data_key}'
    if correlations.ndim == 3:
        correlations = correlations[t_step]
        title += f', timestep {t_step}'
    ax.set_title(title)
    for key in keys:
        plot_correlations_on_lattice(ax, lat, correlations, pairs=key,
                                     **kwargs)
    lat.plot_sites(ax, markers=markers)
    path = os.path.join(default_dir, save_as)
    fig.savefig(path, bbox_inches='tight')
    plt.close(fig)
    return path
