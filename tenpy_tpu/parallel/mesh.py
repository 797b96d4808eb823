"""Device-mesh helpers for multi-chip runs."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec, NamedSharding

__all__ = ['make_mesh', 'PartitionSpec', 'NamedSharding']


def make_mesh(n_devices=None, axis_name='bonds', platform=None):
    """1D mesh over `n_devices` devices.

    ``platform`` selects the backend explicitly (e.g. ``'cpu'`` for a virtual
    multi-chip dry-run honoring ``--xla_force_host_platform_device_count``).
    Without it, the default backend is used, falling back to the host CPU
    devices when the default backend has fewer devices than requested — so a
    1-real-TPU machine can still build an 8-way virtual mesh.
    """
    if platform is not None:
        devs = jax.devices(platform)
    else:
        devs = jax.devices()
        if n_devices is not None and len(devs) < n_devices:
            devs = jax.devices('cpu')
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))
