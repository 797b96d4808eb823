"""tenpy_tpu: a TPU-native tensor-network library (MPS/MPO/DMRG/TEBD/TDVP/...).

From-scratch rebuild of the capabilities of TeNPy (tenpy/tenpy) on JAX/XLA:
charge-conserving block-sparse tensors whose contractions lower to batched MXU
matmuls, with all charge bookkeeping hoisted to trace time.  See SURVEY.md for the
layer map and design notes.
"""

import os as _os

__version__ = '0.1.0.dev0'


def _setup_jax():
    """Configure JAX defaults required for correctness/performance.

    * float64 enabled: the algorithms target 1e-10+ accuracy (BASELINE.json).
    * persistent compilation cache: MPS block structures generate many small
      executables; caching them across processes removes recompilation cost.
    """
    import jax
    jax.config.update('jax_enable_x64', True)
    # opt-in only: the XLA AOT cache is machine-feature sensitive
    cache_dir = _os.environ.get('TENPY_TPU_JAX_CACHE', '')
    if cache_dir and cache_dir.lower() != 'none':
        try:
            jax.config.update('jax_compilation_cache_dir', cache_dir)
            jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
            jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        except Exception:  # noqa: BLE001 - older jax without these options
            pass


_setup_jax()

from . import tools     # noqa: E402
from . import linalg    # noqa: E402
from . import networks  # noqa: E402
from . import algorithms  # noqa: E402

__all__ = ['tools', 'linalg', 'networks', 'algorithms', '__version__']


def console_main(args=None):
    """CLI entry point: parse YAML parameter files and run the simulation.

    Reference: ``tenpy/__init__.py:358`` (console_main).
    """
    import argparse
    import importlib
    from .tools.params import load_yaml_with_py_eval
    from .tools.misc import merge_recursive, set_recursive
    from .simulations.simulation import run_simulation, run_seq_simulations

    parser = argparse.ArgumentParser(
        prog='tenpy_tpu',
        description="Run a tensor-network simulation from YAML parameter files.")
    parser.add_argument('parameter_files', nargs='+',
                        help="YAML files; multiple files are merged (later wins)")
    parser.add_argument('-o', '--option', action='append', default=[],
                        metavar='KEY=VALUE',
                        help="override options with dotted keys, "
                             "e.g. -o algorithm_params.trunc_params.chi_max=256")
    parser.add_argument('-i', '--import-module', action='append', default=[],
                        help="import custom module(s) defining subclasses")
    parser.add_argument('--RAM', action='store_true',
                        help="estimate memory usage and exit")
    args = parser.parse_args(args)

    for mod in args.import_module:
        importlib.import_module(mod)
    configs = [load_yaml_with_py_eval(fn) for fn in args.parameter_files]
    options = merge_recursive(*configs, conflict='last') if len(configs) > 1 \
        else configs[0]
    for override in args.option:
        key, _, value = override.partition('=')
        try:
            import ast as _ast
            value = _ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
        set_recursive(options, key, value, insert_dicts=True)
    sim_class = options.pop('simulation_class', 'GroundStateSearch')
    if args.RAM:
        from .simulations.simulation import estimate_simulation_RAM
        ram = estimate_simulation_RAM(simulation_class=sim_class, **options)
        print(f"estimated RAM: {ram:.1f} MB")
        return 0
    if 'sequential' in options:
        run_seq_simulations(options.pop('sequential'),
                            simulation_class=sim_class, **options)
    else:
        run_simulation(simulation_class=sim_class, **options)
    return 0
