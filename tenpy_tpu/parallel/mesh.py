"""Device-mesh helpers for multi-chip runs."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec, NamedSharding

__all__ = ['make_mesh', 'PartitionSpec', 'NamedSharding']


def make_mesh(n_devices=None, axis_name='bonds'):
    """1D mesh over `n_devices` devices (default backend, CPU fallback).

    If the default backend has fewer devices than requested (e.g. 1 real TPU but a
    virtual multi-chip dry-run is wanted), fall back to the host CPU devices, which
    honor ``--xla_force_host_platform_device_count``.
    """
    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        devs = jax.devices('cpu')
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))
