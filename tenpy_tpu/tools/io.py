"""Result/object serialization: pickle (+gzip) always, HDF5 when ``h5py`` is available.

Rebuild of ``tenpy/tools/hdf5_io.py`` (save :147, load :187, Hdf5Exportable :330).  In this
environment ``h5py`` is not installed, so the pickle path is the default; the HDF5
saver/loader activates automatically when ``h5py`` import succeeds, using the same
``save_hdf5``/``from_hdf5`` protocol and type registry as the reference format.

JAX arrays are converted to numpy on save (device -> host) and restored as numpy; consumers
re-device-put lazily.
"""

from __future__ import annotations

import gzip
import importlib
import pickle
import types
import warnings

import numpy as np

try:
    import h5py
    _HAS_H5PY = True
except ImportError:
    h5py = None
    _HAS_H5PY = False

__all__ = ['save', 'load', 'save_to_hdf5', 'load_from_hdf5', 'Hdf5Exportable',
           'Hdf5Saver', 'Hdf5Loader', 'valid_hdf5_path_component', 'find_global',
           'ATTR_TYPE', 'ATTR_CLASS', 'ATTR_MODULE', 'ATTR_LEN', 'REPR_HDF5EXPORTABLE']

ATTR_TYPE = 'type'
ATTR_CLASS = 'class'
ATTR_MODULE = 'module'
ATTR_LEN = 'len'
ATTR_FORMAT = 'format'
REPR_HDF5EXPORTABLE = 'instance'


def _to_host(obj):
    """Recursively convert jax arrays to numpy for serialization."""
    import jax
    if isinstance(obj, jax.Array):
        return np.asarray(obj)
    if isinstance(obj, dict):
        return {k: _to_host(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        return t(_to_host(v) for v in obj)
    return obj


def save(data, filename, mode='w'):
    """Save `data` to file; format chosen by extension (.pkl / .pkl.gz / .h5 / .hdf5).

    Reference: ``tenpy/tools/hdf5_io.py:147``.
    """
    filename = str(filename)
    if filename.endswith('.pkl') or filename.endswith('.pickle'):
        with open(filename, mode + 'b') as f:
            pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)
    elif filename.endswith('.pkl.gz') or filename.endswith('.pklz'):
        with gzip.open(filename, mode + 'b') as f:
            pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)
    elif filename.endswith('.h5') or filename.endswith('.hdf5'):
        if not _HAS_H5PY:
            raise ImportError("h5py not available; use .pkl / .pkl.gz filenames")
        with h5py.File(filename, mode) as f:
            save_to_hdf5(f, data)
    else:
        raise ValueError(f"unsupported filename extension: {filename}")


def load(filename):
    """Load an object saved with :func:`save`. Reference: ``hdf5_io.py:187``."""
    filename = str(filename)
    if filename.endswith('.pkl') or filename.endswith('.pickle'):
        with open(filename, 'rb') as f:
            return pickle.load(f)
    elif filename.endswith('.pkl.gz') or filename.endswith('.pklz'):
        with gzip.open(filename, 'rb') as f:
            return pickle.load(f)
    elif filename.endswith('.h5') or filename.endswith('.hdf5'):
        if not _HAS_H5PY:
            raise ImportError("h5py not available")
        with h5py.File(filename, 'r') as f:
            return load_from_hdf5(f)
    raise ValueError(f"unsupported filename extension: {filename}")


def valid_hdf5_path_component(name):
    return str(name).replace('/', '|')


def find_global(module, qualified_name):
    mod = importlib.import_module(module)
    obj = mod
    for part in qualified_name.split('.'):
        obj = getattr(obj, part)
    return obj


class Hdf5Exportable:
    """Mixin: default save/load of ``self.__dict__`` to HDF5 (reference ``hdf5_io.py:330``)."""

    def save_hdf5(self, hdf5_saver, h5gr, subpath):
        for k, v in self.__dict__.items():
            if not k.startswith('_'):
                hdf5_saver.save(v, subpath + valid_hdf5_path_component(k))

    @classmethod
    def from_hdf5(cls, hdf5_loader, h5gr, subpath):
        obj = cls.__new__(cls)
        hdf5_loader.memorize_load(h5gr, obj)
        for k in h5gr.keys():
            setattr(obj, str(k), hdf5_loader.load(subpath + k))
        return obj


class Hdf5Saver:
    """Save nested python objects into an HDF5 group (requires h5py).

    Format-compatible in spirit with the reference ``Hdf5Saver`` (``hdf5_io.py:431``):
    type metadata in attributes, memoization of shared objects via hard links.
    """

    def __init__(self, h5file):
        if not _HAS_H5PY:
            raise ImportError("h5py not available")
        self.h5file = h5file
        self.memo = {}

    def save(self, obj, path='/'):
        obj = _to_host(obj)
        key = id(obj)
        if key in self.memo:
            self.h5file[path.rstrip('/')] = self.memo[key]  # hard link
            return self.memo[key]
        gr = self._dispatch(obj, path)
        return gr

    def _dispatch(self, obj, path):
        f = self.h5file
        p = path.rstrip('/')
        if obj is None:
            g = f.create_group(p)
            g.attrs[ATTR_TYPE] = 'None'
        elif isinstance(obj, (bool, np.bool_)):
            f[p] = bool(obj)
            f[p].attrs[ATTR_TYPE] = 'bool'
        elif isinstance(obj, (int, np.integer)):
            f[p] = int(obj)
            f[p].attrs[ATTR_TYPE] = 'int'
        elif isinstance(obj, (float, np.floating)):
            f[p] = float(obj)
            f[p].attrs[ATTR_TYPE] = 'float'
        elif isinstance(obj, (complex, np.complexfloating)):
            f[p] = np.complex128(obj)
            f[p].attrs[ATTR_TYPE] = 'complex'
        elif isinstance(obj, str):
            f[p] = obj
            f[p].attrs[ATTR_TYPE] = 'str'
        elif isinstance(obj, np.ndarray):
            f[p] = obj
            f[p].attrs[ATTR_TYPE] = 'array'
        elif isinstance(obj, (list, tuple)):
            g = f.create_group(p)
            g.attrs[ATTR_TYPE] = 'list' if isinstance(obj, list) else 'tuple'
            g.attrs[ATTR_LEN] = len(obj)
            self.memo[id(obj)] = g
            for i, v in enumerate(obj):
                self.save(v, f"{p}/{i}")
        elif isinstance(obj, dict):
            g = f.create_group(p)
            g.attrs[ATTR_TYPE] = 'dict'
            self.memo[id(obj)] = g
            for k, v in obj.items():
                self.save(v, f"{p}/{valid_hdf5_path_component(k)}")
        elif hasattr(obj, 'save_hdf5'):
            g = f.create_group(p)
            g.attrs[ATTR_TYPE] = REPR_HDF5EXPORTABLE
            g.attrs[ATTR_CLASS] = obj.__class__.__qualname__
            g.attrs[ATTR_MODULE] = obj.__class__.__module__
            self.memo[id(obj)] = g
            obj.save_hdf5(self, g, p + '/')
        else:
            # last resort: pickle into a byte dataset
            f[p] = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
            f[p].attrs[ATTR_TYPE] = 'pickle'
        return f[p]


class Hdf5Loader:
    """Load objects saved by :class:`Hdf5Saver` (reference ``hdf5_io.py:838``)."""

    def __init__(self, h5file):
        if not _HAS_H5PY:
            raise ImportError("h5py not available")
        self.h5file = h5file
        self.memo = {}

    def memorize_load(self, h5gr, obj):
        self.memo[h5gr.id] = obj

    def load(self, path='/'):
        node = self.h5file[path.rstrip('/') or '/']
        if node.id in self.memo:
            return self.memo[node.id]
        t = node.attrs.get(ATTR_TYPE, None)
        if t == 'None':
            return None
        if t in ('bool', 'int', 'float', 'complex', 'str'):
            v = node[()]
            if t == 'str' and isinstance(v, bytes):
                v = v.decode()
            return {'bool': bool, 'int': int, 'float': float,
                    'complex': complex, 'str': str}[t](v)
        if t == 'array':
            return np.asarray(node[()])
        if t in ('list', 'tuple'):
            n = int(node.attrs[ATTR_LEN])
            res = [self.load(f"{node.name}/{i}") for i in range(n)]
            return res if t == 'list' else tuple(res)
        if t == 'dict':
            return {k: self.load(f"{node.name}/{k}") for k in node.keys()}
        if t == REPR_HDF5EXPORTABLE:
            cls = find_global(node.attrs[ATTR_MODULE], node.attrs[ATTR_CLASS])
            return cls.from_hdf5(self, node, node.name + '/')
        if t == 'pickle':
            return pickle.loads(bytes(node[()]))
        raise ValueError(f"unknown hdf5 node type {t!r} at {node.name}")


def save_to_hdf5(h5group, obj, path='/'):
    return Hdf5Saver(h5group).save(obj, path)


def load_from_hdf5(h5group, path='/'):
    return Hdf5Loader(h5group).load(path)
