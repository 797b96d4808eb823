"""Cross-cutting tools: config system, events, misc utilities, optimization flags, I/O.

Mirrors the role of the reference's ``tenpy/tools/`` (see SURVEY.md §2.6).
"""
from . import params, events, misc, optimization, string, io, cache, thread, process
from . import math as math_tools
from . import fit, prediction, spectral_function_tools

__all__ = ['params', 'events', 'misc', 'optimization', 'string', 'io', 'cache', 'thread',
           'process', 'math_tools', 'fit', 'prediction', 'spectral_function_tools']
