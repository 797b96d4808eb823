r"""Time-evolution simulations: dynamic correlations and spectral functions.

Rebuild of ``tenpy/simulations/time_evolution.py`` (RealTimeEvolution :26,
TimeDependentCorrelation :132, TimeDependentCorrelationEvolveBraKet :385,
SpectralSimulation :503, SpectralSimulationEvolveBraKet :548).

``TimeDependentCorrelation`` computes ``C(r, t) = <psi_0| B_r(t) A_{r0} |psi_0>``
by applying ``A`` to a ground state, evolving in real time, and measuring
overlaps against the (phase-rotated) ground state each N_steps.
``SpectralSimulation`` Fourier-transforms the result into S(k, w) during
post-processing.
"""

from __future__ import annotations

import logging
import warnings

import numpy as np

from .simulation import Simulation, RealTimeEvolution
from ..networks.mps import MPS, MPSEnvironment
from ..tools.misc import to_iterable, consistency_check
from ..tools import io as tio

logger = logging.getLogger(__name__)

__all__ = ['RealTimeEvolution', 'TimeDependentCorrelation',
           'TimeDependentCorrelationEvolveBraKet', 'SpectralSimulation',
           'SpectralSimulationEvolveBraKet']


class TimeDependentCorrelation(RealTimeEvolution):
    r"""C(r, t) = <psi_0| B_r(t) A_{r0} |psi_0> for a ground state psi_0.

    Options (on top of :class:`RealTimeEvolution`): ``ground_state_filename``,
    ``gs_energy``, ``operator_t`` (str | list of str), ``operator_t0``
    (subconfig: ``opname``, ``mps_idx`` | ``lat_idx``, ``key_name``).
    Reference: ``tenpy/simulations/time_evolution.py:132``.
    """

    default_measurements = RealTimeEvolution.default_measurements + [
        ('simulation_method', 'm_correlation_function'),
    ]

    def __init__(self, options, *, ground_state_data=None,
                 ground_state_filename=None, **kwargs):
        super().__init__(options, **kwargs)
        resume_data = kwargs.get('resume_data', None)
        if resume_data is not None and 'psi_ground_state' in resume_data:
            self.psi_ground_state = resume_data['psi_ground_state']
            self.gs_energy = resume_data.get('gs_energy', None)
        if ground_state_filename is None:
            ground_state_filename = self.options.get('ground_state_filename',
                                                     None)
        if ground_state_data is None and ground_state_filename is not None:
            logger.info("loading ground state from %r", ground_state_filename)
            ground_state_data = tio.load(ground_state_filename)
        if ground_state_data is not None:
            self._init_from_gs_data(ground_state_data)
        self.gs_energy = self.options.get('gs_energy',
                                          getattr(self, 'gs_energy', None),
                                          'real')
        self.operator_t = self.options['operator_t']
        self.operator_t0_config = self.options.subconfig('operator_t0')
        self.operator_t0_name = self._get_operator_t0_name()
        self.operator_t0 = None

    def _init_from_gs_data(self, gs_data):
        if isinstance(gs_data, MPS):
            self.psi_ground_state = gs_data
            return
        if 'energy' in gs_data:
            self.options['gs_energy'] = gs_data['energy']
        if 'psi' not in gs_data:
            raise ValueError("ground-state data has no 'psi'")
        psi = gs_data['psi']
        if not isinstance(psi, MPS):
            raise TypeError("ground state must be an MPS")
        if not hasattr(self, 'psi_ground_state'):
            self.psi_ground_state = psi

    def init_state(self):
        if getattr(self, 'psi_ground_state', None) is None:
            warnings.warn(f"{self.__class__.__name__}: no ground-state data "
                          "supplied; building the initial state from config")
            super().init_state()
            self.psi_ground_state = self.psi.copy()
            self.psi = None
        if getattr(self, 'psi', None) is None:
            self.psi = self.psi_ground_state.copy()
            self.apply_operator_t0_to_psi()
        if self.options.get('save_psi', True, bool):
            self.results['psi'] = self.psi
            self.results['psi_ground_state'] = self.psi_ground_state

    def init_algorithm(self, **kwargs):
        super().init_algorithm(**kwargs)
        if self.gs_energy is None:
            self.gs_energy = float(np.real(
                self.model.H_MPO.expectation_value(self.psi_ground_state)))
        if not self.engine.psi.finite:
            raise NotImplementedError(
                "dynamic correlations need finite MPS boundary conditions")

    def get_resume_data(self):
        data = super().get_resume_data() if hasattr(super(), 'get_resume_data') \
            else {}
        data['psi_ground_state'] = self.psi_ground_state
        data['gs_energy'] = self.gs_energy
        return data

    # ---------------------------------------------------------------- operators
    def _get_operator_t0_name(self):
        name = self.operator_t0_config.get('key_name', None)
        if name is None:
            opname = self.operator_t0_config['opname']
            if len(to_iterable(opname)) == 1:
                name = opname if isinstance(opname, str) else opname[0]
            else:
                raise KeyError("key_name required for multiple operators")
        return name

    def _get_operator_t0_list(self):
        ops = to_iterable(self.operator_t0_config['opname'])
        mps_idx = self.operator_t0_config.get('mps_idx', None)
        lat_idx = self.operator_t0_config.get('lat_idx', None)
        if mps_idx is not None and lat_idx is not None:
            raise KeyError("give either mps_idx or lat_idx, not both")
        if mps_idx is not None:
            idx = to_iterable(mps_idx)
        elif lat_idx is not None:
            idx = to_iterable(self.model.lat.lat2mps_idx(lat_idx))
        else:
            idx = to_iterable(self.model.lat.N_sites // 2)
        if len(ops) > len(idx):
            if len(idx) != 1:
                raise ValueError("ill-defined operator/index tiling")
            idx = list(idx) * len(ops)
        elif len(ops) < len(idx):
            if len(ops) != 1:
                raise ValueError("ill-defined operator/index tiling")
            ops = list(ops) * len(idx)
        return list(zip(ops, idx))

    def apply_operator_t0_to_psi(self):
        self.operator_t0 = ops = self._get_operator_t0_list()
        if len(ops) == 1:
            op, i = ops[0]
            self.psi.apply_local_op(i, op)
        else:
            for op, i in ops:
                self.psi.apply_local_op(i, op)

    # ---------------------------------------------------------------- measure
    def m_correlation_function(self, results, psi, model, simulation, **kwargs):
        r"""Measure ``e^{i E_0 t} <psi_0| op_j e^{-iHt} A |psi_0>`` per site.

        Reference: ``time_evolution.py:345``."""
        for op in to_iterable(self.operator_t):
            env = MPSEnvironment(self.psi_ground_state, psi)
            phase = np.exp(1j * self.gs_energy * self.engine.evolved_time)
            key = f"correlation_function_t_{op}_{self.operator_t0_name}"
            results[key] = np.asarray(env.expectation_value(op)) * phase


class TimeDependentCorrelationEvolveBraKet(TimeDependentCorrelation):
    r"""Evolve bra AND ket: works for arbitrary initial states.

    ``C(r, t) = <psi| e^{iHt} B_r e^{-iHt} A_{r0} |psi>``.
    Reference: ``tenpy/simulations/time_evolution.py:385``.
    """

    def __init__(self, *args, **kwargs):
        self.engine_bra = None
        super().__init__(*args, **kwargs)

    def init_algorithm(self, **kwargs):
        Simulation.init_algorithm(self, **kwargs)  # skip the gs-energy logic
        AlgClass = self.engine.__class__
        params = self.options.subconfig('algorithm_params')
        self.engine_bra = AlgClass(self.psi_ground_state, self.model, params)
        if self.gs_energy is None:
            self.gs_energy = 0.  # unused: both sides evolve

    def run_algorithm(self):
        while True:
            if np.real(self.engine.evolved_time) >= self.final_time - 1e-10:
                break
            self.engine_bra.run()
            self.engine.run()
            assert np.isclose(np.real(self.engine_bra.evolved_time),
                              np.real(self.engine.evolved_time)), \
                "bra evolved to a different time than ket"
            self.make_measurements()
            self.engine.checkpoint.emit(self.engine)

    def m_correlation_function(self, results, psi, model, simulation, **kwargs):
        for op in to_iterable(self.operator_t):
            env = MPSEnvironment(self.engine_bra.psi, psi)
            key = f"correlation_function_t_{op}_{self.operator_t0_name}"
            results[key] = np.asarray(env.expectation_value(op))


class SpectralSimulation(TimeDependentCorrelation):
    """Dynamic correlations + Fourier transform to S(k, w) in post-processing.

    Options add ``spectral_function_params`` (kwargs of
    :func:`~tenpy_tpu.tools.spectral_function_tools.spectral_function`) and
    ``max_rel_prediction_time``.
    Reference: ``tenpy/simulations/time_evolution.py:503``.
    """

    def run_post_processing(self):
        extra_kwargs = self.options.get('spectral_function_params', {})
        consistency_check(
            extra_kwargs.get('rel_prediction_time', 1), self.options,
            'max_rel_prediction_time', 3,
            "excessive linear prediction: max_rel_prediction_time exceeded")
        for key in list(self.results.get('measurements', {}).keys()):
            if 'correlation_function_t' in key:
                results_key = key.replace('correlation_function_t',
                                          'spectral_function')
                kw = {'results_key': results_key, 'correlation_key': key}
                kw.update(extra_kwargs)
                entry = ('tenpy_tpu.simulations.post_processing',
                         'pp_spectral_function', kw)
                self.default_post_processing = \
                    list(self.default_post_processing) + [entry]
        return super().run_post_processing()


class SpectralSimulationEvolveBraKet(SpectralSimulation,
                                     TimeDependentCorrelationEvolveBraKet):
    """Spectral function with bra-and-ket evolution. Reference: ``:548``."""
