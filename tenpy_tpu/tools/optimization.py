"""Global optimization level controlling sanity checks.

Rebuild of ``tenpy/tools/optimization.py:118`` (``OptimizationFlag``/``optimize``).  The
reference's ``use_cython`` dispatch has no analogue here: the compiled fast path on TPU is
``jax.jit`` itself.  Instead the level gates host-side sanity checks (``test_sanity``) and
maps to debug options (e.g. disabling ``checkify``).  Env var: ``TENPY_OPTIMIZE`` (0-3).
"""

from __future__ import annotations

import os
from enum import IntEnum

__all__ = ['bottleneck', 'OptimizationFlag', 'to_OptimizationFlag', 'set_level', 'get_level',
           'optimize', 'temporary_level']

bottleneck = None


class OptimizationFlag(IntEnum):
    none = 0
    default = 1
    safe = 1
    skip_arg_checks = 2
    skip_sanity_checks = 3


def to_OptimizationFlag(level):
    if level is None:
        return _level
    if isinstance(level, str):
        try:
            level = int(level)
        except ValueError:
            return OptimizationFlag[level]
    return OptimizationFlag(level)


_level = OptimizationFlag(int(os.environ.get('TENPY_OPTIMIZE', 1)))


def set_level(level=1):
    global _level
    _level = to_OptimizationFlag(level)


def get_level():
    return _level


def optimize(level_compare=OptimizationFlag.default):
    """True if the global level is >= `level_compare` (i.e. the check should be *skipped*)."""
    return _level >= level_compare


class temporary_level:
    """Context manager temporarily setting the optimization level."""

    def __init__(self, level):
        self.level = level

    def __enter__(self):
        self.old = get_level()
        if self.level is not None:
            set_level(self.level)
        return self

    def __exit__(self, *exc):
        set_level(self.old)
