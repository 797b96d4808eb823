"""Algorithm base classes: options, checkpoints, resume data, time evolution loop.

Rebuild of ``tenpy/algorithms/algorithm.py`` (Algorithm :23, TimeEvolutionAlgorithm :341,
TimeDependentHAlgorithm :509).
"""

from __future__ import annotations

import logging
import warnings

import numpy as np

from ..tools.params import asConfig
from ..tools.events import EventHandler
from ..tools.cache import DictCache
from ..tools.misc import consistency_check

logger = logging.getLogger(__name__)

__all__ = ['Algorithm', 'TimeEvolutionAlgorithm', 'TimeDependentHAlgorithm']


class Algorithm:
    """Base class for algorithms: psi + model + options + checkpoint event.

    Options: ``trunc_params`` (subconfig).  Reference: ``algorithm.py:23``.
    """

    time_dependent_H = False

    def __init__(self, psi, model, options, *, resume_data=None, cache=None):
        self.options = asConfig(options, self.__class__.__name__)
        self.psi = psi
        self.model = model
        self.resume_data = resume_data or {}
        self.checkpoint = EventHandler("algorithm")
        self.cache = cache if cache is not None else DictCache.trivial()
        self.trunc_params = self.options.subconfig('trunc_params')
        if model is not None and getattr(model, 'lat', None) is not None:
            bc = getattr(model.lat, 'bc_MPS', 'finite')
            if bc != 'finite' and model.lat.dim > 1:
                consistency_check(max(model.lat.Ls[1:]) if len(model.lat.Ls) > 1 else 0,
                                  self.options, 'max_N_sites_per_ring', 18,
                                  "2D cylinder circumference too large")

    @property
    def verbose(self):
        warnings.warn("verbose is deprecated; use logging", FutureWarning)
        return 1

    def run(self):
        raise NotImplementedError("subclass must implement run")

    def resume_run(self):
        """Resume a run from checkpoint data (default: just run)."""
        return self.run()

    def get_resume_data(self, sequential_simulations=False):
        """Data needed to resume the algorithm. Reference: ``algorithm.py:174``."""
        return {'psi': self.psi}

    def estimate_RAM(self, mem_saving_factor=None):
        """Rough RAM estimate in MB (reference ``algorithm.py:208``)."""
        total = 0
        for B in getattr(self.psi, '_B', []):
            total += sum(int(np.prod(blk.shape)) for blk in B._data) * 16
        return total * 4 / 1024 ** 2

    def switch_engine(self, other_engine_class, *, options=None):
        """Create a new engine of a different class continuing with the same state."""
        if options is None:
            options = self.options
        return other_engine_class(self.psi, self.model, options,
                                  resume_data=self.get_resume_data(),
                                  cache=self.cache)


class TimeEvolutionAlgorithm(Algorithm):
    """Common interface for time evolution: evolved_time tracking + run loop.

    Options: ``start_time``, ``dt``, ``N_steps``, ``preserve_norm``.
    Reference: ``tenpy/algorithms/algorithm.py:341``.
    """

    time_dependent_H = False

    def __init__(self, psi, model, options, **kwargs):
        super().__init__(psi, model, options, **kwargs)
        self.evolved_time = self.options.get('start_time', 0.)
        if 'evolved_time' in self.resume_data:
            self.evolved_time = self.resume_data['evolved_time']

    def get_resume_data(self, sequential_simulations=False):
        data = super().get_resume_data(sequential_simulations)
        data['evolved_time'] = self.evolved_time
        return data

    def run(self):
        """Evolve by ``N_steps * dt`` (one call). Reference: ``algorithm.py:394``."""
        dt = self.options.get('dt', 0.1, 'real')
        N_steps = self.options.get('N_steps', 1, int)
        self.prepare_evolve(dt)
        preserve_norm = self.options.get('preserve_norm', not self.time_dependent_H)
        if preserve_norm:
            old_norm = self.psi.norm
        trunc_err = self.run_evolution(N_steps, dt)
        if preserve_norm:
            self.psi.norm = old_norm
        return trunc_err

    def run_evolution(self, N_steps, dt):
        return self.evolve(N_steps, dt)

    def prepare_evolve(self, dt):
        raise NotImplementedError

    def evolve(self, N_steps, dt):
        raise NotImplementedError


class TimeDependentHAlgorithm(TimeEvolutionAlgorithm):
    """Time evolution with H(t): re-initialize the model before each time step.

    Reference: ``tenpy/algorithms/algorithm.py:509``.
    """

    time_dependent_H = True

    def reinit_model(self):
        """Re-build the model at the current ``evolved_time``."""
        model = self.model.update_time_parameter(self.evolved_time)
        self.model = model

    def run_evolution(self, N_steps, dt):
        trunc_err = None
        for _ in range(N_steps):
            self.reinit_model()
            self.prepare_evolve(dt)
            err = self.evolve(1, dt)
            trunc_err = err if trunc_err is None else trunc_err + err
        return trunc_err
