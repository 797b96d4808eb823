"""Multi-chip execution: device meshes and sharded tensor-network steps.

The reference has NO distributed backend (SURVEY.md §2.7/§5.8) — this layer is the
genuinely new TPU-native part: real-space parallelism over `jax.sharding.Mesh` with XLA
collectives over ICI.
"""
from . import mesh, dense_tebd

__all__ = ['mesh', 'dense_tebd']
