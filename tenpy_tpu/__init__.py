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
