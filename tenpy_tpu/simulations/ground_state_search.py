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
from ..networks.mps import MPS, InitialStateBuilder
from ..tools import io as tio
from ..tools.misc import find_subclass

logger = logging.getLogger(__name__)

__all__ = ['GroundStateSearch', 'OrthogonalExcitations', 'TopologicalExcitations',
           'PlaneWaveExcitations', 'ExcitationInitialState']


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
        """Build the next excitation's initial state via a declarative builder.

        Dispatches on ``initial_state_builder_class`` (default
        :class:`ExcitationInitialState`), mirroring the reference's
        ``init_state`` wiring (reference ground_state_search.py:520).  Any
        other :class:`~tenpy_tpu.networks.mps.InitialStateBuilder` subclass
        gets the standard ``(lattice, params)`` constructor.
        """
        from ..networks.mps import InitialStateBuilder
        params = self.options.subconfig('initial_state_params')
        builder_class = self.options.get('initial_state_builder_class',
                                         'ExcitationInitialState')
        Builder = find_subclass(InitialStateBuilder, builder_class)
        if issubclass(Builder, ExcitationInitialState):
            builder = Builder(self, params)
        else:
            builder = Builder(self.model.lat, params)
        return builder.run()

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


class ExcitationInitialState(InitialStateBuilder):
    """Declarative initial states for :class:`OrthogonalExcitations`.

    Rebuild of the reference's ``ExcitationInitialState``
    (``tenpy/simulations/ground_state_search.py:1249``): a builder that knows
    the parent simulation, so the next excitation's initial guess can start
    from the previously found states.

    Options (method ``'from_orthogonal'`` is the default):

    use_highest_excitation : bool
        True (default): perturb the last state in ``sim.orthogonal_to`` (the
        most recently found excitation); False: perturb the ground state.
    apply_local_op : dict ``{'i': int, 'op': str}``
        Apply a local operator (e.g. a spin flip) instead of the random
        perturbation — also switches the charge sector.  Falls back to the
        simulation-level option of the same name.
    randomize_params : dict
        Options for :meth:`~tenpy_tpu.networks.mps.MPS.perturb` (random
        near-identity two-site unitaries).
    randomize_close_1 : bool
        Whether the perturbing unitaries stay close to the identity (True).
    """

    def __init__(self, sim, options):
        self.sim = sim
        super().__init__(sim.model.lat, options)
        self.options.setdefault('method', 'from_orthogonal')

    def from_orthogonal(self):
        sim = self.sim
        use_highest = self.options.get('use_highest_excitation', True, bool)
        if use_highest and sim.orthogonal_to:
            psi = sim.orthogonal_to[-1]
        else:
            psi = sim.ground_state
        psi = psi.copy()
        local_op = self.options.get('apply_local_op', None)
        if local_op is None:
            local_op = sim.options.get('apply_local_op', None)
        if local_op is not None:
            psi.apply_local_op(local_op['i'], local_op['op'],
                               unitary=False, renormalize=True)
            if psi.bc != 'segment':  # segment canonicalization would break
                psi.canonical_form()  # the infinite-environment embedding
            return psi
        return self._perturb(psi)

    def _perturb(self, psi):
        # a copy of the previous state is (nearly) parallel to the projected-
        # out states: the orthogonalized eigensolve would start from ~zero.
        # Perturb with identity-close random two-site unitaries instead.
        randomize = self.options.subconfig('randomize_params')
        randomize.setdefault('N_steps', 2)
        randomize.setdefault('trunc_params',
                             {'chi_max': max(max(psi.chi), 8),
                              'svd_min': 1e-12})
        close_1 = self.options.get('randomize_close_1', True, bool)
        psi.perturb(randomize, close_1=close_1,
                    canonicalize=(psi.bc != 'segment'))
        return psi


class TopologicalExcitations(OrthogonalExcitations):
    """Domain-wall (topological) excitations: different left/right ground states.

    A finite segment is built whose *left* half comes from ground state
    ``alpha`` and whose *right* half from ground state ``beta`` (two
    degenerate, symmetry-broken — or topologically distinct — ground states
    of the same model).  The two halves are glued at ``segment_boundary`` by
    solving the zero-site problem ``LP_alpha -- RP_beta`` on the interface
    bond in a chosen *gluing charge* sector, and DMRG then relaxes the domain
    wall inside the fixed alpha/beta environments.  Excitation energies are
    measured relative to the glued unrelaxed reference state.

    Reference: ``tenpy/simulations/ground_state_search.py:647``
    (``TopologicalExcitations``).

    Options (on top of :class:`OrthogonalExcitations`):
    ``ground_state_filename_left`` / ``_right`` (or constructor kwargs
    ``gs_data_alpha`` / ``gs_data_beta``), ``segment_enlarge`` (infinite
    case, default 2), ``segment_boundary`` (site index; default: middle),
    ``join_method`` ('average charge' | 'most probable charge'),
    ``switch_charge_sector`` (charge vector added to the gluing charge).
    """

    def __init__(self, options, *, gs_data_alpha=None, gs_data_beta=None,
                 **kwargs):
        super().__init__(options, **kwargs)
        self._gs_data_alpha = gs_data_alpha
        self._gs_data_beta = gs_data_beta

    def _load_pair(self):
        def load(data, key):
            if data is None:
                fn = self.options.get(key, None)
                if fn is None:
                    raise ValueError(f"TopologicalExcitations needs {key}")
                data = tio.load(fn)
            return data if isinstance(data, MPS) else data['psi']
        psi_a = load(self._gs_data_alpha, 'ground_state_filename_left')
        psi_b = load(self._gs_data_beta, 'ground_state_filename_right')
        return psi_a, psi_b

    def init_state(self):
        psi_a, psi_b = self._load_pair()
        if psi_a.L != psi_b.L or psi_a.bc != psi_b.bc:
            raise ValueError("left/right ground states are incompatible")
        for psi in (psi_a, psi_b):
            if float(np.max(psi.norm_test())) > 1e-10 and psi.bc != 'segment':
                psi.canonical_form()
        self.ground_state = self._glue(psi_a, psi_b)
        # the glued state IS the (unrelaxed) domain-wall trial state: the
        # first DMRG run relaxes it without orthogonalization; further
        # excitations orthogonalize against the found kinks
        self.orthogonal_to = []
        self.psi = self.ground_state.copy()
        if self.options.get('save_psi', True, bool):
            self.results['psi'] = self.psi

    def _initial_guess(self):
        if not self.excitations:
            return self.ground_state.copy()
        return super()._initial_guess()

    def _glue(self, psi_a, psi_b):
        from ..networks.mpo import MPOEnvironment, MPOTransferMatrix
        from ..algorithms.mps_common import ZeroSiteH
        from ..linalg import krylov_based
        from ..linalg import np_conserved as npc
        H = self.model.H_MPO
        L = psi_a.L
        if psi_a.bc == 'infinite':
            enlarge = self.options.get('segment_enlarge', 2, int)
            first, last = 0, enlarge * L - 1
            boundary = self.options.get('segment_boundary',
                                        (enlarge // 2) * L, int)
            env_data_a, Es, _ = MPOTransferMatrix.find_init_LP_RP(
                H, psi_a, calc_E=True)
            env_data_b, _, _ = MPOTransferMatrix.find_init_LP_RP(
                H, psi_b, calc_E=True)
            self.results['ground_state_energy_density'] = float(np.real(Es[0]))
            env_a = MPOEnvironment(psi_a, H, psi_a, **env_data_a)
            env_b = MPOEnvironment(psi_b, H, psi_b, **env_data_b)
            self.model_inf = self.model
            self.model = self.model.extract_segment(enlarge=enlarge)
        else:
            first = self.options.get('segment_first', 0, int)
            last = self.options.get('segment_last', psi_a.L - 1, int)
            if last is None:
                last = psi_a.L - 1
            boundary = self.options.get('segment_boundary',
                                        (last + 1 - first) // 2 + first, int)
            env_a = MPOEnvironment(psi_a, H, psi_a)
            env_b = MPOEnvironment(psi_b, H, psi_b)
            self.model_orig = self.model
            self.model = self.model.extract_segment(first, last)
        if not (first < boundary <= last):
            raise ValueError("segment_boundary outside the segment")
        # boundary-bond environments (LP strictly left of `boundary`, RP
        # strictly right of `boundary - 1` -> both live on the gluing bond)
        LP_mid = env_a.get_LP(boundary)
        RP_mid = env_b.get_RP(boundary - 1)
        self.init_env_data = {'init_LP': env_a.get_LP(first),
                              'init_RP': env_b.get_RP(last),
                              'age_LP': 0, 'age_RP': 0}
        seg_a = psi_a.extract_segment(first, boundary - 1)
        seg_b = psi_b.extract_segment(boundary, last)

        # ---- gluing charge
        vL = LP_mid.get_leg('vR').conj()
        vR = RP_mid.get_leg('vL').conj()
        chinfo = vL.chinfo
        join_method = self.options.get('join_method', 'average charge', str)
        switch = self.options.get('switch_charge_sector', None)
        qtotal_glue = chinfo.make_valid()
        if chinfo.qnumber > 0:
            if join_method == 'average charge' and psi_a.bc == 'infinite':
                Qa = np.mean([psi_a.average_charge(i) for i in range(L)], 0)
                Qb = np.mean([psi_b.average_charge(i) for i in range(L)], 0)
            else:
                pa = seg_a.probability_per_charge(seg_a.L)
                pb = seg_b.probability_per_charge(0)
                Qa = np.asarray(max(pa, key=lambda qp: qp[1])[0], float)
                Qb = np.asarray(max(pb, key=lambda qp: qp[1])[0], float)
            Q_offset = Qa - Qb
            glue = Q_offset if switch is None else \
                np.asarray(switch, float) + Q_offset
            qtotal_glue = chinfo.make_valid(np.around(glue))
            logger.info("gluing charge: %r (offset %r)", qtotal_glue, Q_offset)
        # ---- zero-site interface problem in the gluing sector
        H0 = ZeroSiteH.from_LP_RP(LP_mid, RP_mid)
        th0 = npc.Array.from_func(np.ones, [vL, vR],
                                  qtotal=list(np.asarray(qtotal_glue, int)),
                                  labels=['vL', 'vR'])
        if float(npc.norm(th0)) == 0.:
            raise ValueError(f"gluing charge {qtotal_glue!r} not reachable "
                             "on the interface bond")
        lanczos_params = self.options.subconfig('lanczos_params')
        _, th0, _ = krylov_based.LanczosGroundState(H0, th0,
                                                    lanczos_params).run()
        U, s, Vh = npc.svd(th0, cutoff=1e-14, inner_labels=['vR', 'vL'])
        A_last = npc.tensordot(seg_a.get_B(seg_a.L - 1, 'A'), U,
                               axes=[['vR'], ['vL']])
        seg_a.set_B(seg_a.L - 1, A_last, form='A')
        seg_a.set_SR(seg_a.L - 1, np.asarray(s))
        B_first = npc.tensordot(Vh, seg_b.get_B(0, 'B'),
                                axes=[['vR'], ['vL']])
        seg_b.set_B(0, B_first, form='B')
        seg_b.set_SL(0, np.asarray(s))
        # ---- energy reference: the *uniform* alpha state on the segment
        # with the same left environment (the domain-wall energy is measured
        # against the uniform background; gauge constants cancel for
        # degenerate alpha/beta)
        seg_a_full = psi_a.extract_segment(first, last)
        env_ref = MPOEnvironment(seg_a_full, self.model.H_MPO, seg_a_full,
                                 init_LP=env_a.get_LP(first),
                                 init_RP=env_a.get_RP(last),
                                 age_LP=0, age_RP=0)
        E_ref = float(np.real(env_ref.full_contraction(1)))
        self.options['ground_state_energy'] = E_ref
        logger.info("uniform-segment reference energy: %.14f", E_ref)
        # ---- concatenate into one segment MPS
        sites = seg_a.sites + seg_b.sites
        tensors = [seg_a.get_B(i, 'A') for i in range(seg_a.L)] + \
            [seg_b.get_B(i, 'B') for i in range(seg_b.L)]
        Ss = [np.asarray(seg_a.get_SL(i)) for i in range(seg_a.L)] + \
            [np.asarray(seg_b.get_SL(i)) for i in range(seg_b.L)] + \
            [np.asarray(seg_b.get_SR(seg_b.L - 1))]
        forms = ['A'] * seg_a.L + ['B'] * seg_b.L
        glued = MPS(sites, tensors, Ss, bc='segment', form=forms,
                    norm=psi_a.norm)
        return glued


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
