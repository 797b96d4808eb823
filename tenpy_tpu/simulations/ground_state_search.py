r"""Ground-state search drivers + excited-state simulations.

Rebuild of ``tenpy/simulations/ground_state_search.py`` (GroundStateSearch :30,
PlaneWaveExcitations :80, OrthogonalExcitations :275).

``GroundStateSearch`` itself lives in :mod:`.simulation` (re-exported here for
reference-layout parity).  The excitation drivers:

* :class:`OrthogonalExcitations` — repeated DMRG runs, each orthogonalized
  against the ground state and all previously found excitations.  Finite
  ground states are used directly; infinite ground states are handled on a
  finite segment embedded in the infinite MPO environments (the
  MPOTransferMatrix fixed point), so excitation energies come out relative to
  the infinite ground state.
* :class:`PlaneWaveExcitations` — momentum-resolved quasiparticle excitations
  on a uniform MPS via :class:`~tenpy_tpu.algorithms.plane_wave_excitation.
  PlaneWaveExcitationEngine`.
"""

from __future__ import annotations

import logging

import numpy as np

from .simulation import Simulation, GroundStateSearch
from ..networks.mps import MPS
from ..tools import io as tio
from ..tools.misc import find_subclass

logger = logging.getLogger(__name__)

__all__ = ['GroundStateSearch', 'OrthogonalExcitations', 'PlaneWaveExcitations']


class OrthogonalExcitations(GroundStateSearch):
    """Excited states via repeated orthogonalized ground-state searches.

    For a **finite** ground state, each excitation is found by DMRG
    orthogonalized against the ground state and previously found excitations.

    For an **infinite** ground state, the search runs on a finite *segment*
    embedded in the infinite environments (reference ground_state_search.py
    :275): the model/MPS are extracted with ``segment_enlarge`` unit cells and
    the MPO environments are initialized from the
    :class:`~tenpy_tpu.networks.mpo.MPOTransferMatrix` fixed point, so
    excitation energies are measured relative to the infinite ground state.

    Options (on top of :class:`GroundStateSearch`): ``N_excitations`` (1),
    ``ground_state_filename`` | constructor kwarg ``ground_state_data``,
    ``segment_enlarge`` (int, infinite case; default 2),
    ``apply_local_op`` (dict ``{'i': int, 'op': str}``, optional perturbation
    defining the initial guess — e.g. a spin flip; also useful to change the
    charge sector), ``initial_state_params`` for each excitation run.
    """

    def __init__(self, options, *, orthogonal_to=None, ground_state_data=None,
                 **kwargs):
        super().__init__(options, **kwargs)
        self.orthogonal_to = list(orthogonal_to) if orthogonal_to else None
        self.excitations = []
        self.results['excitation_energies'] = []
        if self.options.get('save_psi', True, bool):
            self.results['excitations'] = self.excitations
        self._gs_data = ground_state_data
        self.init_env_data = {}

    def init_state(self):
        if self.orthogonal_to is None:
            gs_fn = self.options.get('ground_state_filename', None)
            gs_data = self._gs_data
            if gs_data is None and gs_fn is not None:
                gs_data = tio.load(gs_fn)
            if gs_data is not None:
                psi0 = gs_data if isinstance(gs_data, MPS) else gs_data['psi']
                self.ground_state = psi0
                self.orthogonal_to = [psi0]
            else:
                super().init_state()  # build + find the ground state first
                self.ground_state = None  # found in run_algorithm
                self.orthogonal_to = []
                return
        if not self.ground_state.finite:
            self._extract_segment()
        self.psi = self._initial_guess()
        if self.options.get('save_psi', True, bool):
            self.results['psi'] = self.psi

    def _extract_segment(self):
        """Infinite GS -> segment GS + fixed-point MPO environments."""
        from ..networks.mpo import MPOTransferMatrix
        psi0_inf = self.ground_state
        enlarge = self.options.get('segment_enlarge', 2, int)
        env_data, Es, _ = MPOTransferMatrix.find_init_LP_RP(
            self.model.H_MPO, psi0_inf, calc_E=True)
        self.results['ground_state_energy_density'] = float(np.real(Es[0]))
        self.model_inf = self.model
        self.model = self.model.extract_segment(enlarge=enlarge)
        first, last = self.model.lat.segment_first_last
        self.ground_state = psi0_inf.extract_segment(first, last)
        self.init_env_data = env_data
        self.orthogonal_to = [self.ground_state]

    def _initial_guess(self):
        params = self.options.subconfig('initial_state_params')
        if len(params.as_dict()) > 0:
            from ..networks.mps import InitialStateBuilder
            builder = InitialStateBuilder(self.model.lat, params)
            return builder.run()
        psi = self.ground_state.copy()
        local_op = self.options.get('apply_local_op', None)
        if local_op is not None:
            psi.apply_local_op(local_op['i'], local_op['op'],
                               unitary=False, renormalize=True)
            if psi.bc != 'segment':  # segment canonicalization would break
                psi.canonical_form()  # the embedding (see TODO.md)
            return psi
        # a copy of the ground state is (nearly) parallel to the projected-out
        # states: the orthogonalized eigensolve would start from ~zero.
        # Perturb with identity-close random two-site unitaries instead.
        from ..algorithms.tebd import RandomUnitaryEvolution
        RandomUnitaryEvolution(psi, {
            'N_steps': 2, 'close_1': True,
            'trunc_params': {'chi_max': max(max(psi.chi), 8),
                             'svd_min': 1e-12}}).run()
        if psi.bc != 'segment':
            psi.canonical_form()
        return psi

    def init_algorithm(self, **kwargs):
        from ..algorithms.algorithm import Algorithm
        alg_name = self.options.get('algorithm_class', self.default_algorithm)
        AlgClass = find_subclass(Algorithm, alg_name)
        params = self.options.subconfig('algorithm_params')
        resume_data = {'init_env_data': dict(self.init_env_data)} \
            if self.init_env_data else None
        self.engine = AlgClass(self.psi, self.model, params,
                               orthogonal_to=list(self.orthogonal_to),
                               resume_data=resume_data)
        self.engine.checkpoint.connect(self.save_at_checkpoint)

    def run_algorithm(self):
        N = self.options.get('N_excitations', 1, int)
        if self.ground_state is None:
            # first find the ground state itself
            super().init_algorithm()
            E0, psi0 = self.engine.run()
            self.results['ground_state_energy'] = E0
            self.ground_state = psi0.copy()
            self.orthogonal_to = [self.ground_state]
            logger.info("OrthogonalExcitations: ground state E0=%.14f", E0)
        else:
            E0 = self.options.get('ground_state_energy', None, 'real')
            if E0 is None:
                if self.init_env_data:
                    # segment: energy includes the infinite-environment
                    # constants; they cancel in E_exc - E0.
                    from ..networks.mpo import MPOEnvironment
                    env = MPOEnvironment(self.ground_state, self.model.H_MPO,
                                         self.ground_state,
                                         **dict(self.init_env_data))
                    E0 = float(np.real(env.full_contraction(1)))
                else:
                    E0 = float(np.real(
                        self.model.H_MPO.expectation_value(self.ground_state)))
            self.results.setdefault('ground_state_energy', E0)
        while len(self.excitations) < N:
            self.psi = self._initial_guess()
            self.init_algorithm()
            E, psi = self.engine.run()
            self.results['excitation_energies'].append(
                E - self.results['ground_state_energy'])
            self.excitations.append(psi.copy())
            self.orthogonal_to.append(psi.copy())
            logger.info("excitation %d: E - E0 = %.14f",
                        len(self.excitations),
                        E - self.results['ground_state_energy'])
            self.make_measurements()
        return self.results['excitation_energies']


class PlaneWaveExcitations(GroundStateSearch):
    """Momentum-resolved quasiparticle excitations on a uniform MPS.

    Options: ``ground_state_filename`` | ctor kwarg ``ground_state_data``
    (an infinite, canonical MPS), ``momenta`` (list of floats, or
    ``num_momenta`` for a uniform grid over the unit-cell Brillouin zone),
    ``qtotal_change``, ``num_ev``, plus
    :class:`~tenpy_tpu.algorithms.plane_wave_excitation.PlaneWaveExcitationEngine`
    options under ``algorithm_params``.
    Reference: ``tenpy/simulations/ground_state_search.py:80``.
    """

    default_algorithm = 'PlaneWaveExcitationEngine'

    def __init__(self, options, *, ground_state_data=None, **kwargs):
        super().__init__(options, **kwargs)
        self._gs_data = ground_state_data
        self.results['excitation_energies'] = []
        self.results['momenta'] = []

    def init_state(self):
        gs_data = self._gs_data
        gs_fn = self.options.get('ground_state_filename', None)
        if gs_data is None and gs_fn is not None:
            gs_data = tio.load(gs_fn)
        if gs_data is None:
            super().init_state()  # fall back to config-built state
            return
        self.psi = gs_data if isinstance(gs_data, MPS) else gs_data['psi']
        if self.options.get('save_psi', True, bool):
            self.results['psi'] = self.psi

    def init_algorithm(self, **kwargs):
        from ..algorithms.plane_wave_excitation import PlaneWaveExcitationEngine
        params = self.options.subconfig('algorithm_params')
        self.engine = PlaneWaveExcitationEngine(self.psi, self.model, params)

    def run_algorithm(self):
        momenta = self.options.get('momenta', None)
        if momenta is None:
            n = self.options.get('num_momenta', 8, int)
            momenta = list(np.linspace(0., np.pi, n))
        qtotal_change = self.options.get('qtotal_change', None)
        num_ev = self.options.get('num_ev', 1, int)
        for p in momenta:
            Es, psis, N = self.engine.run(float(p),
                                          qtotal_change=qtotal_change,
                                          num_ev=num_ev)
            self.results['momenta'].append(float(p))
            self.results['excitation_energies'].append(
                [float(np.real(E)) for E in np.atleast_1d(Es)])
            logger.info("p=%.4f: E_exc=%s", p, Es)
        return self.results['excitation_energies']
