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

__all__ = ['DataLoader', 'DataFiles', 'pp_spectral_function']


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
