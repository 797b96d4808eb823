"""Configuration dictionaries with default-tracking and unused-key warnings.

TPU-native rebuild of the reference option system (``tenpy/tools/params.py:24`` ``Config``,
``:482 asConfig``, ``:532 load_yaml_with_py_eval``).  Semantics preserved:

* ``get(key, default, expect_type)`` records the default into the dict so that saved results
  contain the *complete* parameter set actually used;
* every key that is never read is reported by :meth:`Config.warn_unused` (typo detection);
* nested option dicts become sub-:class:`Config` objects sharing the mechanism;
* YAML files may embed python expressions via the ``!py_eval`` tag.
"""

from __future__ import annotations

import logging
import warnings
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ['Config', 'asConfig', 'load_yaml_with_py_eval']


class Config:
    """Dict-like options container with defaults-recording and unused-key tracking.

    Parameters
    ----------
    config : dict
        The raw option values.
    name : str
        Descriptive name (used in log messages / warnings).
    """

    def __init__(self, config, name):
        self.options = dict(config)
        self.name = str(name)
        self.unused = set(self.options.keys())
        self.documented = set()

    # ---------------------------------------------------------------- dict interface
    def __getitem__(self, key):
        self.unused.discard(key)
        val = self.options[key]
        return self._convert_subconfig(key, val)

    def __setitem__(self, key, value):
        if key not in self.options:
            self.unused.add(key)
        self.options[key] = value

    def __delitem__(self, key):
        self.unused.discard(key)
        del self.options[key]

    def __contains__(self, key):
        return key in self.options

    def __iter__(self):
        return iter(self.options)

    def __len__(self):
        return len(self.options)

    def keys(self):
        return self.options.keys()

    def values(self):
        return self.options.values()

    def items(self):
        return self.options.items()

    def copy(self):
        res = Config(dict(self.options), self.name)
        res.unused = set(self.unused)
        return res

    def as_dict(self):
        """Plain-dict snapshot (sub-Configs converted recursively)."""
        res = {}
        for k, v in self.options.items():
            res[k] = v.as_dict() if isinstance(v, Config) else v
        return res

    def update(self, other):
        for k, v in dict(other).items():
            self[k] = v

    def setdefault(self, key, default):
        if key not in self.options:
            self.options[key] = default
        return self.get(key, default)

    # ---------------------------------------------------------------- the core
    def get(self, key, default, expect_type=None):
        """Read an option, *recording* the default value if the key was absent.

        Parameters
        ----------
        key : str
        default
            Value returned (and stored!) if `key` is not present.
        expect_type : type | 'real' | 'complex' | 'array' | None
            Optional type check emitting a warning on mismatch.
        """
        use_default = key not in self.options
        if use_default:
            self.options[key] = default
            logger.debug("%s: reading option %r (default) = %r", self.name, key, default)
        else:
            logger.debug("%s: reading option %r = %r", self.name, key, self.options[key])
        self.unused.discard(key)
        val = self.options[key]
        if expect_type is not None and val is not None:
            self._check_type(key, val, expect_type)
        return self._convert_subconfig(key, val)

    def silent_get(self, key, default):
        """Like :meth:`get` but without recording the default / marking as used."""
        return self.options.get(key, default)

    def touch(self, *keys):
        """Mark keys as used without reading them."""
        for k in keys:
            self.unused.discard(k)
        return self

    def subconfig(self, key, default=None):
        """Return a sub-:class:`Config` for nested option dicts."""
        self.unused.discard(key)
        if key not in self.options:
            self.options[key] = {} if default is None else default
        val = self.options[key]
        if isinstance(val, Config):
            return val
        sub = Config(val if isinstance(val, dict) else {}, f"{self.name}.{key}")
        self.options[key] = sub
        return sub

    def deprecated_alias(self, old_key, new_key, extra_msg=''):
        if old_key in self.options:
            warnings.warn(f"{self.name}: option {old_key!r} deprecated in favor of "
                          f"{new_key!r}. {extra_msg}", FutureWarning, stacklevel=3)
            self.options[new_key] = self.options[old_key]
            self.unused.discard(old_key)

    def any_nonzero(self, keys, log_msg=None):
        """True if any of the given options is set and nonzero (after touch)."""
        for k in keys:
            if k in self.options:
                v = self.options[k]
                if isinstance(v, (dict, Config)):
                    if any(np.any(np.asarray(x) != 0) for x in dict(v).values()):
                        return True
                elif v is not None and np.any(np.asarray(v) != 0):
                    return True
        return False

    def warn_unused(self, recursive=False):
        unused = sorted(self.unused)
        if unused:
            warnings.warn(f"unused options in config {self.name!r}: {unused}",
                          UserWarning, stacklevel=2)
        if recursive:
            for v in self.options.values():
                if isinstance(v, Config):
                    v.warn_unused(True)

    def _check_type(self, key, val, expect_type):
        ok = True
        if expect_type == 'real':
            ok = np.isrealobj(val) if not np.isscalar(val) else not isinstance(val, complex)
        elif expect_type == 'complex':
            ok = True
        elif expect_type == 'array':
            ok = True
        elif isinstance(expect_type, type):
            if expect_type is int:
                ok = isinstance(val, (int, np.integer)) and not isinstance(val, bool)
            elif expect_type is float:
                ok = isinstance(val, (int, float, np.integer, np.floating))
            else:
                ok = isinstance(val, expect_type)
        if not ok:
            warnings.warn(f"{self.name}: option {key!r}={val!r} not of expected type "
                          f"{expect_type}", UserWarning, stacklevel=4)

    def _convert_subconfig(self, key, val):
        return val

    def __repr__(self):
        return f"Config({self.name!r}, <{len(self.options)} options>)"

    def __getstate__(self):
        return {'options': self.as_dict(), 'name': self.name,
                'unused': sorted(self.unused)}

    def __setstate__(self, state):
        self.options = dict(state['options'])
        self.name = state['name']
        self.unused = set(state.get('unused', ()))
        self.documented = set()


def asConfig(config, name):
    """Wrap a dict as :class:`Config` (no-op for existing Configs)."""
    if isinstance(config, Config):
        return config
    return Config(config, name)


def load_yaml_with_py_eval(filename=None, yaml_content=None, context=None):
    """Load a YAML file supporting the ``!py_eval`` tag for python expressions.

    Reference: ``tenpy/tools/params.py:504-591``.
    """
    import yaml

    context_ns = {'np': np}
    if context:
        context_ns.update(context)

    class PyEvalLoader(yaml.SafeLoader):
        pass

    def _py_eval(loader, node):
        expr = loader.construct_scalar(node)
        return eval(expr, context_ns)  # noqa: S307 - explicit opt-in feature of the format

    PyEvalLoader.add_constructor('!py_eval', _py_eval)
    if yaml_content is not None:
        return yaml.load(yaml_content, Loader=PyEvalLoader)
    with open(filename, 'r') as f:
        return yaml.load(f, Loader=PyEvalLoader)
