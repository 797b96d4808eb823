"""Priority-ordered event/listener system.

Rebuild of ``tenpy/tools/events.py:19`` (``EventHandler``): used for algorithm checkpoints
and simulation measurement events.
"""

from __future__ import annotations

import functools
import logging

logger = logging.getLogger(__name__)

__all__ = ['EventHandler', 'Listener']


class Listener:
    __slots__ = ('listener_id', 'callback', 'priority')

    def __init__(self, listener_id, callback, priority):
        self.listener_id = listener_id
        self.callback = callback
        self.priority = priority


class EventHandler:
    """Handler for an event with multiple listeners, called in descending priority.

    Parameters
    ----------
    arg_descr : str, optional
        Documentation of the arguments passed to callbacks on :meth:`emit`.
    """

    def __init__(self, arg_descr=None):
        self.arg_descr = arg_descr
        self.listeners = []
        self._next_id = 0

    @property
    def id_of_last_connected(self):
        return self._next_id - 1

    def copy(self):
        res = EventHandler(self.arg_descr)
        res.listeners = list(self.listeners)
        res._next_id = self._next_id
        return res

    def connect(self, callback, priority=0):
        """Register a callback; higher priority runs first. Returns the callback."""
        self.listeners.append(Listener(self._next_id, callback, priority))
        self._next_id += 1
        return callback

    def connect_by_name(self, module_name, func_name, priority=0):
        import importlib
        mod = importlib.import_module(module_name)
        self.connect(getattr(mod, func_name), priority)

    def disconnect(self, listener_id):
        for i, listener in enumerate(self.listeners):
            if listener.listener_id == listener_id:
                del self.listeners[i]
                return
        logger.warning("disconnect: no listener with id %d", listener_id)

    def emit(self, *args, **kwargs):
        """Call all listeners (priority order); return their results as a list."""
        results = []
        for listener in self._ordered():
            results.append(listener.callback(*args, **kwargs))
        return results

    def emit_until_result(self, *args, **kwargs):
        """Call listeners until one returns something not-None; return that."""
        for listener in self._ordered():
            res = listener.callback(*args, **kwargs)
            if res is not None:
                return res
        return None

    def _ordered(self):
        return sorted(self.listeners, key=lambda listener: -listener.priority)

    def __repr__(self):
        return f"<EventHandler with {len(self.listeners)} listeners>"
