"""Miscellaneous utilities: broadcasting helpers, subclass lookup, recursive dicts, logging.

Rebuild of the reference ``tenpy/tools/misc.py`` (to_array :79, find_subclass :500,
get/set/merge_recursive :561-621, setup_logging :727, consistency_check :973).
"""

from __future__ import annotations

import logging
import logging.config
import os
import warnings
import numpy as np

__all__ = [
    'to_iterable', 'to_iterable_of_len', 'to_array', 'anynan', 'argsort',
    'inverse_permutation', 'list_to_dict_list', 'atleast_2d_pad',
    'transpose_list_list', 'zero_if_close', 'pad',
    'find_subclass', 'get_recursive', 'set_recursive', 'update_recursive',
    'merge_recursive', 'flatten', 'setup_logging', 'consistency_check',
    'TenpyInconsistencyError', 'TenpyInconsistencyWarning', 'BetaWarning',
    'convert_memory_units', 'group_by_degeneracy',
]

_UNSET = object()


class TenpyInconsistencyError(Exception):
    """Raised by :func:`consistency_check` when a physics guard rail is violated."""


class TenpyInconsistencyWarning(UserWarning):
    """Warning analogue of :class:`TenpyInconsistencyError`."""


class BetaWarning(UserWarning):
    """Feature still in beta."""


def to_iterable(a):
    """Wrap scalars/strings into a list; pass through iterables."""
    if isinstance(a, str):
        return [a]
    try:
        iter(a)
        return a
    except TypeError:
        return [a]


def to_iterable_of_len(a, L):
    """Like :func:`to_iterable`, but tile a length-1 result to length `L`."""
    a = list(to_iterable(a))
    if len(a) == 1:
        return a * L
    if len(a) != L:
        raise ValueError(f"length {len(a)} != {L}")
    return a


def to_array(a, shape=(None,), dtype=None, allow_incommensurate=False):
    """Convert to ndarray and tile periodically to the desired shape.

    Scalars broadcast to any shape; non-scalars must have matching ndim and each axis is
    tiled periodically (error if incommensurate unless `allow_incommensurate`).
    Reference: ``tenpy/tools/misc.py:79``.
    """
    a = np.array(a, dtype=dtype)
    if a.ndim != len(shape):
        if a.size == 1:
            a = np.reshape(a, [1] * len(shape))
        else:
            raise ValueError("cannot cast to required number of dimensions")
    reps = [1] * a.ndim
    crop = [slice(None)] * a.ndim
    need_crop = False
    for i, want in enumerate(shape):
        if want is None:
            continue
        q, r = divmod(want, a.shape[i])
        if r != 0:
            if not allow_incommensurate:
                raise ValueError(f"incommensurate tiling {a.shape[i]} -> {want}")
            q += 1
            crop[i] = slice(None, want)
            need_crop = True
        reps[i] = q
    a = np.tile(a, reps)
    if need_crop:
        a = a[tuple(crop)]
    return a


def anynan(a):
    return bool(np.isnan(np.sum(a)))


def argsort(a, sort=None, **kwargs):
    """np.argsort with sort order 'm>'/'m<'/'>'/'<'/'LM'/'SM'/'LR'/'SR' or None."""
    if sort is None:
        return np.arange(len(a))
    a = np.asarray(a)
    if sort in ('m>', 'LM'):
        return np.argsort(-np.abs(a), kind='stable', **kwargs)
    if sort in ('m<', 'SM'):
        return np.argsort(np.abs(a), kind='stable', **kwargs)
    if sort in ('>', 'LR', 'LA'):
        return np.argsort(-np.real(a), kind='stable', **kwargs)
    if sort in ('<', 'SR', 'SA'):
        return np.argsort(np.real(a), kind='stable', **kwargs)
    raise ValueError(f"unknown sort order {sort!r}")


def inverse_permutation(perm):
    perm = np.asarray(perm, np.intp)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv


def list_to_dict_list(l):
    """Map entries of a list to their indices: ``{value: [indices]}`` (values as tuples)."""
    res = {}
    for i, v in enumerate(l):
        k = tuple(v) if isinstance(v, (list, np.ndarray)) else v
        res.setdefault(k, []).append(i)
    return res


def atleast_2d_pad(a, pad_item=0):
    """Stack a ragged list of lists into a padded 2D array."""
    rows = [np.asarray(r).ravel() for r in a]
    maxlen = max(len(r) for r in rows)
    res = np.full((len(rows), maxlen), pad_item, dtype=np.result_type(*rows))
    for i, r in enumerate(rows):
        res[i, :len(r)] = r
    return res


def transpose_list_list(D, pad=None):
    """Transpose a list of lists, padding ragged rows with `pad`."""
    nrow = len(D)
    ncol = max(len(r) for r in D)
    return [[D[i][j] if j < len(D[i]) else pad for i in range(nrow)]
            for j in range(ncol)]


def zero_if_close(a, tol=1e-15):
    a = np.asarray(a)
    if np.iscomplexobj(a):
        ar = np.where(np.abs(a.real) < tol, 0., a.real)
        ai = np.where(np.abs(a.imag) < tol, 0., a.imag)
        return ar + 1j * ai
    return np.where(np.abs(a) < tol, 0., a)


def pad(a, w_l=0, v_l=0, w_r=0, v_r=0, axis=0):
    """Pad `a` along `axis` with `w_l` entries of value `v_l` left / `w_r`, `v_r` right."""
    shape = list(a.shape)
    shape[axis] += w_l + w_r
    res = np.empty(shape, a.dtype)
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(w_l, shape[axis] - w_r)
    res[tuple(idx)] = a
    if w_l:
        idx[axis] = slice(0, w_l)
        res[tuple(idx)] = v_l
    if w_r:
        idx[axis] = slice(shape[axis] - w_r, None)
        res[tuple(idx)] = v_r
    return res


def group_by_degeneracy(E, *args, subset=None, cutoff=1e-12):
    """Group indices of `E` (and optionally further arrays) by degenerate values."""
    E = np.asarray(E)
    if subset is None:
        subset = np.arange(len(E))
    subset = np.asarray(subset)
    groups = []
    used = np.zeros(len(subset), bool)
    for i in range(len(subset)):
        if used[i]:
            continue
        gi = [subset[i]]
        used[i] = True
        for j in range(i + 1, len(subset)):
            if used[j]:
                continue
            same = abs(E[subset[i]] - E[subset[j]]) < cutoff
            for a in args:
                same = same and abs(a[subset[i]] - a[subset[j]]) < cutoff
            if same:
                gi.append(subset[j])
                used[j] = True
        groups.append(tuple(gi))
    return groups


# ---------------------------------------------------------------------- class lookup
def find_subclass(base_class, subclass_name):
    """Recursively search loaded subclasses of `base_class` for one named `subclass_name`.

    Used for config-driven class selection (``algorithm_class: 'TwoSiteDMRGEngine'``).
    Reference: ``tenpy/tools/misc.py:500``.
    """
    if not isinstance(subclass_name, str):
        if isinstance(subclass_name, type) and issubclass(subclass_name, base_class):
            return subclass_name
        raise TypeError(f"expect str or subclass of {base_class}, got {subclass_name!r}")
    if '.' in subclass_name:
        import importlib
        mod_name, cls_name = subclass_name.rsplit('.', 1)
        mod = importlib.import_module(mod_name)
        cls = getattr(mod, cls_name)
        if not (isinstance(cls, type) and issubclass(cls, base_class)):
            raise ValueError(f"{subclass_name} is not a subclass of {base_class.__name__}")
        return cls
    found = set()
    to_check = [base_class]
    seen = set()
    while to_check:
        cls = to_check.pop()
        if cls in seen:
            continue
        seen.add(cls)
        if cls.__name__ == subclass_name:
            found.add(cls)
        to_check.extend(cls.__subclasses__())
    if len(found) == 1:
        return found.pop()
    if len(found) > 1:
        raise ValueError(f"multiple subclasses named {subclass_name!r}: {found}")
    raise ValueError(f"no subclass of {base_class.__name__} named {subclass_name!r} "
                     "is loaded (import the defining module first)")


# ---------------------------------------------------------------------- recursive dicts
def get_recursive(nested_data, recursive_key, separator='.', default=_UNSET):
    keys = recursive_key.lstrip(separator).split(separator)
    data = nested_data
    try:
        for k in keys:
            data = data[k]
    except KeyError:
        if default is _UNSET:
            raise
        return default
    return data


def set_recursive(nested_data, recursive_key, value, separator='.', insert_dicts=False):
    keys = recursive_key.lstrip(separator).split(separator)
    data = nested_data
    for k in keys[:-1]:
        if insert_dicts and k not in data:
            data[k] = {}
        data = data[k]
    data[keys[-1]] = value


def update_recursive(nested_data, update_data, separator='.', insert_dicts=True):
    for k, v in update_data.items():
        set_recursive(nested_data, k, v, separator, insert_dicts)


def merge_recursive(*nested_data, conflict='error', path=None):
    """Recursively merge nested dicts; `conflict` in {'error', 'first', 'last'}."""
    if len(nested_data) == 0:
        raise ValueError("need at least one dict")
    if len(nested_data) == 1:
        return nested_data[0]
    merged = dict(nested_data[0])
    for data in nested_data[1:]:
        for key, val in data.items():
            if key in merged:
                old = merged[key]
                if isinstance(old, dict) and isinstance(val, dict):
                    merged[key] = merge_recursive(
                        old, val, conflict=conflict,
                        path=(path or []) + [repr(key)])
                elif old is not val and old != val:
                    if conflict == 'error':
                        loc = '.'.join((path or []) + [repr(key)])
                        raise ValueError(f"conflicting values for {loc}: "
                                         f"{old!r} vs {val!r}")
                    elif conflict == 'last':
                        merged[key] = val
                    elif conflict != 'first':
                        raise ValueError(f"unknown conflict resolution {conflict!r}")
            else:
                merged[key] = val
    return merged


def flatten(mapping, separator='.'):
    """Flatten nested dicts into a single dict with dotted keys."""
    res = {}
    for k, v in mapping.items():
        if isinstance(v, dict):
            for k2, v2 in flatten(v, separator).items():
                res[k + separator + k2] = v2
        else:
            res[k] = v
    return res


# ---------------------------------------------------------------------- logging
def setup_logging(options=None, output_filename=None, **kwargs):
    """Configure python logging: stdout + optional per-run logfile.

    Reference: ``tenpy/tools/misc.py:727``.

    Options: ``skip_setup, to_stdout, to_file, filename, format, datefmt, levels,
    capture_warnings, dict_config``.
    """
    from .params import asConfig
    options = asConfig(options if options is not None else {}, 'log')
    options.update(kwargs)
    if options.get('skip_setup', False):
        return
    dict_config = options.get('dict_config', None)
    if dict_config is None:
        to_stdout = options.get('to_stdout', 'INFO')
        to_file = options.get('to_file', 'INFO')
        fmt = options.get('format', '%(levelname)-8s : %(message)s')
        datefmt = options.get('datefmt', None)
        filename = options.get('filename', None)
        if filename is None and output_filename is not None and to_file:
            filename = os.path.splitext(output_filename)[0] + '.log'
        handlers = {}
        if to_stdout:
            handlers['to_stdout'] = {'class': 'logging.StreamHandler',
                                     'level': to_stdout, 'formatter': 'custom',
                                     'stream': 'ext://sys.stdout'}
        if to_file and filename is not None:
            handlers['to_file'] = {'class': 'logging.FileHandler', 'level': to_file,
                                   'formatter': 'custom', 'filename': filename,
                                   'mode': 'a'}
        dict_config = {
            'version': 1,
            'disable_existing_loggers': False,
            'formatters': {'custom': {'format': fmt, 'datefmt': datefmt}},
            'handlers': handlers,
            'root': {'handlers': list(handlers.keys()), 'level': 'DEBUG'},
            'loggers': {},
        }
        for name, level in options.get('levels', {}).items():
            dict_config['loggers'][name] = {'level': level}
    logging.config.dictConfig(dict_config)
    if options.get('capture_warnings', True):
        logging.captureWarnings(True)


# ---------------------------------------------------------------------- guard rails
def consistency_check(value, options, threshold_key, threshold_default, msg, compare='<='):
    """Raise :class:`TenpyInconsistencyError` if `value` violates a configurable threshold.

    Reference: ``tenpy/tools/misc.py:973``.
    """
    threshold = options.get(threshold_key, threshold_default)
    if threshold is None:
        return
    if compare == '<=':
        ok = value <= threshold
    elif compare == '<':
        ok = value < threshold
    elif compare == '>=':
        ok = value >= threshold
    elif compare == '>':
        ok = value > threshold
    else:
        raise ValueError(f"unknown compare {compare!r}")
    if not ok:
        raise TenpyInconsistencyError(
            f"{msg} (got {value!r}, threshold {threshold_key}={threshold!r}; raise the "
            f"threshold option to silence this check)")


def convert_memory_units(value, unit_from='bytes', unit_to=None):
    """Convert memory sizes between bytes/KB/MB/GB; unit_to=None picks human-readable."""
    units = ['bytes', 'KB', 'MB', 'GB', 'TB']
    val = float(value) * 1024 ** units.index(unit_from)
    if unit_to is None:
        i = 0
        while val >= 1024 and i < len(units) - 1:
            val /= 1024.
            i += 1
        return val, units[i]
    return val / 1024 ** units.index(unit_to), unit_to
