r"""Config-driven simulation driver: init -> run -> measure -> checkpoint -> save.

Rebuild of ``tenpy/simulations/simulation.py`` (Simulation :65 with run :335,
init_model :482, init_state :505, init_algorithm :571, make_measurements :731,
save_results :1082 with backup-file swap :1062, save_at_checkpoint :1189,
handle_abort_signal :290; functional wrappers init_simulation :1266,
run_simulation :1300, resume_from_checkpoint :1392, run_seq_simulations :1454,
estimate_simulation_RAM :1613; Skip :1248).
"""

from __future__ import annotations

import importlib
import logging
import os
import signal
import time
import warnings

import numpy as np

from ..tools.params import asConfig, Config
from ..tools.events import EventHandler
from ..tools.misc import find_subclass, setup_logging, get_recursive, set_recursive
from ..tools import io as tio
from ..tools.cache import CacheFile
from ..models.model import Model
from ..algorithms.algorithm import Algorithm
from ..networks.mps import InitialStateBuilder

logger = logging.getLogger(__name__)

__all__ = ['Simulation', 'Skip', 'GroundStateSearch', 'RealTimeEvolution',
           'init_simulation', 'run_simulation', 'init_simulation_from_checkpoint',
           'resume_from_checkpoint', 'run_seq_simulations',
           'estimate_simulation_RAM', 'output_filename_from_dict']


class Skip(ValueError):
    """Raised when the output file already exists and overwriting is disabled."""


class Simulation:
    """Base simulation: orchestrates model/state/algorithm/measurements/saving.

    Options: ``model_class``, ``model_params``, ``initial_state_params``,
    ``algorithm_class``, ``algorithm_params``, ``connect_measurements``,
    ``output_filename``, ``overwrite_output``, ``save_every_x_seconds``,
    ``save_psi``, ``cache_params``, ``log_params``.
    Reference: ``tenpy/simulations/simulation.py:65``.
    """

    default_algorithm = 'TwoSiteDMRGEngine'
    default_post_processing = []

    default_measurements = [
        ('tenpy_tpu.simulations.measurement', 'm_measurement_index'),
        ('tenpy_tpu.simulations.measurement', 'm_bond_dimension'),
        ('tenpy_tpu.simulations.measurement', 'm_entropy'),
    ]

    def __init__(self, options, *, setup_logging_options=True, resume_data=None):
        self.options = asConfig(options, self.__class__.__name__)
        self.results = {
            'simulation_parameters': self.options.as_dict(),
            'version_info': self.get_version_info(),
            'finished_run': False,
        }
        self._resume_data = resume_data
        self.measurement_event = EventHandler("results, psi, model, simulation")
        self.checkpoint_interval = self.options.get('save_every_x_seconds', None)
        self._last_save = time.time()
        self._abort_requested = False
        self.cache = None
        self.engine = None
        self.model = None
        self.psi = None
        self.output_filename = self.options.get('output_filename', None)
        if self.output_filename is None and 'output_filename_params' in self.options:
            # derive the filename from parameter values (reference
            # ``simulation.py:1062`` fix_output_filenames + ``:1677``)
            fn_params = self.options.subconfig('output_filename_params')
            self.output_filename = output_filename_from_dict(
                self.options,
                parts=fn_params.get('parts', {}),
                prefix=fn_params.get('prefix', 'result'),
                suffix=fn_params.get('suffix', '.pkl'))
        if setup_logging_options:
            log_params = self.options.subconfig('log_params')
            setup_logging(log_params, self.output_filename)
        self._check_output()

    # ---------------------------------------------------------------- context
    def __enter__(self):
        cache_params = self.options.subconfig('cache_params')
        self.cache = CacheFile.open(**cache_params.as_dict())
        self._old_sigint = signal.getsignal(signal.SIGINT)
        try:
            signal.signal(signal.SIGINT, self.handle_abort_signal)
        except ValueError:
            pass  # not in main thread
        return self

    def __exit__(self, exc_type, exc, tb):
        try:
            signal.signal(signal.SIGINT, self._old_sigint)
        except (ValueError, AttributeError):
            pass
        if self.cache is not None:
            self.cache.close()
        if exc_type is None:
            self.options.warn_unused(recursive=True)

    def handle_abort_signal(self, signum, frame):
        """First Ctrl-C: finish to the next checkpoint, save, then raise.

        Reference: ``simulation.py:290``."""
        if self._abort_requested:
            raise KeyboardInterrupt("second SIGINT: aborting now")
        logger.warning("SIGINT: will save and abort at the next checkpoint")
        self._abort_requested = True

    # ---------------------------------------------------------------- phases
    def run(self):
        """Full simulation run. Reference: ``simulation.py:335``."""
        self.init_model()
        self.init_state()
        self.init_algorithm()
        self.init_measurements()
        self.run_algorithm()
        self.final_measurements()
        self.run_post_processing()
        self.results['finished_run'] = True
        results = self.prepare_results_for_save()
        self.save_results(results)
        return self.results

    def resume_run(self):
        """Resume from checkpoint resume_data. Reference: ``simulation.py:408``."""
        self.init_model()
        if self._resume_data is None:
            raise ValueError("no resume data")
        self.psi = self._resume_data['psi']
        self.init_algorithm(resume_data=self._resume_data)
        self.init_measurements()
        self.run_algorithm()
        self.final_measurements()
        self.results['finished_run'] = True
        results = self.prepare_results_for_save()
        self.save_results(results)
        return self.results

    def init_model(self):
        """Build the model from ``model_class`` + ``model_params``.

        Reference: ``simulation.py:482``."""
        model_class_name = self.options.get('model_class', None)
        if model_class_name is None:
            raise ValueError("missing option 'model_class'")
        ModelClass = find_subclass(Model, model_class_name)
        params = self.options.subconfig('model_params')
        self.model = ModelClass(params)

    def init_state(self):
        """Build the initial MPS via InitialStateBuilder. Reference: ``:505``."""
        params = self.options.subconfig('initial_state_params')
        builder_class = self.options.get('initial_state_builder_class',
                                         InitialStateBuilder)
        if isinstance(builder_class, str):
            builder_class = find_subclass(InitialStateBuilder, builder_class)
        builder = builder_class(self.model.lat, params)
        self.psi = builder.run()

    def init_algorithm(self, resume_data=None):
        """Build the algorithm engine. Reference: ``simulation.py:571``."""
        alg_name = self.options.get('algorithm_class', self.default_algorithm)
        AlgClass = find_subclass(Algorithm, alg_name)
        params = self.options.subconfig('algorithm_params')
        kwargs = {}
        if resume_data is not None:
            kwargs['resume_data'] = resume_data
        self.engine = AlgClass(self.psi, self.model, params, cache=self.cache
                               if self.cache is not None else None, **kwargs)
        self.engine.checkpoint.connect(self.save_at_checkpoint)

    def init_measurements(self):
        """Connect measurement functions from config. Reference: ``:623``."""
        con = self.options.get('connect_measurements', None)
        entries = list(self.default_measurements)
        if con:
            for entry in con:
                entries.append(tuple(entry))
        self._measurement_entries = []
        for entry in entries:
            module_name, func_name = entry[0], entry[1]
            kwargs = entry[2] if len(entry) > 2 else {}
            if module_name == 'psi_method':
                from . import measurement as meas_mod
                func = meas_mod.psi_method
                kwargs = dict(kwargs)
                kwargs['method'] = func_name
            elif module_name == 'simulation_method':
                from . import measurement as meas_mod
                func = meas_mod.simulation_method
                kwargs = dict(kwargs)
                kwargs['method'] = func_name
            else:
                mod = importlib.import_module(module_name)
                func = getattr(mod, func_name)
            self.measurement_event.connect(
                (lambda f, kw: lambda *a: f(*a, **kw))(func, kwargs))
        self.results.setdefault('measurements', {})

    def make_measurements(self):
        """Emit the measurement event, collecting results (errors contained).

        Reference: ``simulation.py:731``."""
        results = {}
        max_errors = self.options.get('max_errors_before_abort', 10, int)
        errors = self.results.setdefault('errors_during_run', [])
        for listener in self.measurement_event._ordered():
            try:
                listener.callback(results, self.psi, self.model, self)
            except Exception as e:  # noqa: BLE001 - contained per reference policy
                logger.exception("measurement failed")
                errors.append(repr(e))
                if max_errors is not None and len(errors) > max_errors:
                    raise
        meas = self.results['measurements']
        for k, v in results.items():
            meas.setdefault(k, []).append(v)
        return results

    def run_algorithm(self):
        self.engine.run()

    def final_measurements(self):
        self.make_measurements()

    def run_post_processing(self):
        """Run the entries of ``default_post_processing`` + option
        ``post_processing``: tuples ``(module, func_name, kwargs)`` called with a
        DataLoader over the in-memory results.  Results are stored under
        ``kwargs['results_key']`` (or the function name).
        Reference: ``simulation.py`` run_post_processing."""
        entries = list(getattr(self, 'default_post_processing', []))
        extra = self.options.get('post_processing', None)
        if extra:
            entries.extend(tuple(e) for e in extra)
        if not entries:
            return
        from .post_processing import DataLoader
        loader = DataLoader(data=self.results)
        pp_results = self.results.setdefault('post_processing', {})
        for entry in entries:
            module_name, func_name = entry[0], entry[1]
            kwargs = dict(entry[2]) if len(entry) > 2 else {}
            module_name = module_name.replace('tenpy.simulations',
                                              'tenpy_tpu.simulations')
            mod = importlib.import_module(module_name)
            func = getattr(mod, func_name)
            key = kwargs.pop('results_key', func_name)
            try:
                pp_results[key] = func(loader, **kwargs)
            except Exception as e:  # noqa: BLE001 - contained like measurements
                logger.exception("post-processing %s failed", func_name)
                self.results.setdefault('errors_during_run', []).append(repr(e))

    # ---------------------------------------------------------------- saving
    def get_version_info(self):
        import tenpy_tpu
        import jax
        return {'tenpy_tpu': tenpy_tpu.__version__, 'jax': jax.__version__,
                'simulation_class': self.__class__.__name__,
                'numpy': np.__version__}

    def _check_output(self):
        fn = self.output_filename
        if fn is None:
            return
        if os.path.exists(fn):
            if self.options.get('overwrite_output', False, bool):
                return
            if self.options.get('skip_if_output_exists', False, bool):
                raise Skip(f"output file exists: {fn}")
            # append .1, .2, ... to avoid clobbering
            base, ext = os.path.splitext(fn)
            k = 1
            while os.path.exists(f"{base}_{k}{ext}"):
                k += 1
            self.output_filename = f"{base}_{k}{ext}"
            logger.warning("output exists; writing to %s", self.output_filename)

    def get_backup_filename(self, fn):
        """Reference: ``simulation.py:1062``."""
        base, ext = os.path.splitext(fn)
        return base + '.backup' + ext

    def prepare_results_for_save(self):
        """Snapshot of the results dict (+psi, +resume_data). Reference: ``:1127``."""
        results = dict(self.results)
        results['simulation_parameters'] = self.options.as_dict()
        if self.options.get('save_psi', True, bool) and self.psi is not None:
            results['psi'] = self.psi
        if self.engine is not None:
            try:
                results['resume_data'] = self.engine.get_resume_data()
            except Exception:  # noqa: BLE001
                pass
        return results

    def save_results(self, results=None):
        """Atomic-ish save: move the previous file to a backup first.

        Reference: ``simulation.py:1082``."""
        if results is None:
            results = self.prepare_results_for_save()
        fn = self.output_filename
        if fn is None:
            return results
        backup = self.get_backup_filename(fn)
        if os.path.exists(fn):
            os.replace(fn, backup)
        tio.save(results, fn)
        if os.path.exists(backup):
            os.remove(backup)
        self._last_save = time.time()
        logger.info("saved results to %s", fn)
        return results

    def save_at_checkpoint(self, engine):
        """Checkpoint listener: save every `save_every_x_seconds`.

        Reference: ``simulation.py:1189``."""
        if self._abort_requested:
            self.save_results()
            raise KeyboardInterrupt("aborted at checkpoint (SIGINT)")
        interval = self.checkpoint_interval
        if interval is None or self.output_filename is None:
            return
        now = time.time()
        if now - self._last_save > interval:
            t0 = time.time()
            self.save_results()
            save_time = time.time() - t0
            if save_time > 0.1 * interval:
                self.checkpoint_interval = max(interval, save_time * 20)
                logger.info("saving is slow: checkpoint interval -> %.1fs",
                            self.checkpoint_interval)

    @classmethod
    def from_saved_checkpoint(cls, filename=None, checkpoint_results=None,
                              **kwargs):
        """Reference: ``simulation.py:369``."""
        if checkpoint_results is None:
            checkpoint_results = tio.load(filename)
        options = checkpoint_results['simulation_parameters']
        resume_data = checkpoint_results.get('resume_data', None)
        if resume_data is None and 'psi' in checkpoint_results:
            resume_data = {'psi': checkpoint_results['psi']}
        sim = cls(options, resume_data=resume_data, setup_logging_options=False)
        sim.results = checkpoint_results
        sim.results['finished_run'] = False
        return sim

    def estimate_RAM(self):
        if self.model is None:
            self.init_model()
        if self.psi is None:
            self.init_state()
        if self.engine is None:
            self.init_algorithm()
        return self.engine.estimate_RAM()


class GroundStateSearch(Simulation):
    """DMRG (or other GS search) driver. Reference: ``ground_state_search.py:30``."""

    default_algorithm = 'TwoSiteDMRGEngine'
    default_measurements = Simulation.default_measurements + [
        ('tenpy_tpu.simulations.measurement', 'm_energy_MPO'),
    ]

    def run_algorithm(self):
        E, psi = self.engine.run()
        self.results['energy'] = E


class RealTimeEvolution(Simulation):
    """Time-evolution driver: evolve N_steps -> measure -> repeat until final_time.

    Options: ``final_time``.  Reference: ``time_evolution.py:26``.
    """

    default_algorithm = 'TEBDEngine'
    default_measurements = Simulation.default_measurements + [
        ('tenpy_tpu.simulations.measurement', 'm_evolved_time'),
    ]

    def __init__(self, options, **kwargs):
        super().__init__(options, **kwargs)
        self.final_time = self.options.get('final_time', 1., 'real')

    def run_algorithm(self):
        while True:
            if self.engine.evolved_time >= self.final_time - 1e-10:
                break
            self.engine.run()
            self.make_measurements()
            self.engine.checkpoint.emit(self.engine)


# ======================================================================== wrappers
def init_simulation(*, simulation_class='Simulation', **simulation_params):
    """Reference: ``simulation.py:1266``."""
    SimClass = find_subclass(Simulation, simulation_class) \
        if isinstance(simulation_class, str) else simulation_class
    return SimClass(simulation_params)


def run_simulation(simulation_class='GroundStateSearch', **simulation_params):
    """Run a simulation from parameters. Reference: ``simulation.py:1300``."""
    SimClass = find_subclass(Simulation, simulation_class) \
        if isinstance(simulation_class, str) else simulation_class
    kwargs = {}
    # heavy non-serializable inputs are constructor kwargs, not options
    if 'ground_state_data' in simulation_params:
        kwargs['ground_state_data'] = simulation_params.pop('ground_state_data')
    sim = SimClass(simulation_params, **kwargs)
    with sim:
        results = sim.run()
    return results


def init_simulation_from_checkpoint(*, filename=None, checkpoint_results=None,
                                    update_sim_params=None):
    """Reference: ``simulation.py:1327``."""
    if checkpoint_results is None:
        checkpoint_results = tio.load(filename)
    options = checkpoint_results['simulation_parameters']
    if update_sim_params:
        from ..tools.misc import update_recursive
        update_recursive(options, update_sim_params)
    cls_name = checkpoint_results.get('version_info', {}).get(
        'simulation_class', 'Simulation')
    SimClass = find_subclass(Simulation, cls_name)
    return SimClass.from_saved_checkpoint(checkpoint_results=checkpoint_results)


def resume_from_checkpoint(*, filename=None, checkpoint_results=None,
                           update_sim_params=None):
    """Reference: ``simulation.py:1392``."""
    sim = init_simulation_from_checkpoint(filename=filename,
                                          checkpoint_results=checkpoint_results,
                                          update_sim_params=update_sim_params)
    with sim:
        results = sim.resume_run()
    return results


def run_seq_simulations(sequential, simulation_class='GroundStateSearch',
                        **simulation_params):
    """Sequential runs threading the state through a parameter ramp.

    ``sequential = {'recursive_keys': [...], 'value_lists': [[...], ...]}``.
    When ``value_lists`` is absent, the values are taken from the simulation
    options themselves: each ``recursive_keys`` entry must then point at a
    list (the reference's yaml convention, e.g.
    ``examples/yaml/sequential_chi_ramp.yml``).  Reference: ``simulation.py:1454``."""
    sequential = dict(sequential)
    keys = sequential['recursive_keys']
    value_lists = sequential.get('value_lists', None)
    if value_lists is None:
        value_lists = [get_recursive(simulation_params, key) for key in keys]
    results = []
    resume_data = None
    for values in zip(*value_lists):
        params = dict(simulation_params)
        for key, val in zip(keys, values):
            set_recursive(params, key, val, insert_dicts=True)
        SimClass = find_subclass(Simulation, simulation_class) \
            if isinstance(simulation_class, str) else simulation_class
        sim = SimClass(params, resume_data=resume_data)
        with sim:
            if resume_data is not None:
                sim.init_model()
                sim.psi = resume_data['psi']
                sim.init_algorithm()
                sim.init_measurements()
                sim.run_algorithm()
                sim.final_measurements()
                sim.results['finished_run'] = True
                res = sim.save_results()
            else:
                res = sim.run()
        resume_data = {'psi': sim.psi}
        results.append(res)
    return results


def estimate_simulation_RAM(unit='MB', **simulation_params):
    """Reference: ``simulation.py:1613``."""
    sim = init_simulation(**simulation_params)
    ram = sim.estimate_RAM()
    return ram


def output_filename_from_dict(options, parts=None, prefix='result', suffix='.pkl'):
    """Generate a filename encoding parameter values. Reference: ``:1677``."""
    parts = parts or {}
    pieces = [prefix]
    for key, fmt in parts.items():
        val = get_recursive(options, key)
        pieces.append(fmt.format(val) if '{' in fmt else f"{fmt}{val}")
    return '_'.join(pieces) + suffix
