"""Aux subsystems: cache backends, events, worker thread, io round trips,
params Config, fits, prediction."""
import os
import time

import numpy as np
import pytest

from tenpy_tpu.tools.cache import DictCache, CacheFile, PickleStorage, Storage
from tenpy_tpu.tools.events import EventHandler
from tenpy_tpu.tools.thread import Worker
from tenpy_tpu.tools import io as tio
from tenpy_tpu.tools.params import Config, asConfig
from tenpy_tpu.tools.fit import fit_with_sum_of_exp, sum_of_exp
from tenpy_tpu.tools.prediction import linear_prediction


def test_dict_cache_trivial():
    c = DictCache.trivial()
    c['x'] = np.arange(5)
    assert np.all(c['x'] == np.arange(5))
    assert 'x' in c
    sub = c.create_subcache('env')
    sub['y'] = 3
    assert sub['y'] == 3


def test_pickle_storage_cache(tmp_path):
    with CacheFile.open(storage_class='PickleStorage',
                        tmpdir=str(tmp_path)) as c:
        for i in range(6):
            c[f'k{i}'] = np.full(4, i)
        c.set_short_term_keys('k0', 'k1')
        for i in range(6):
            assert np.all(c[f'k{i}'] == i)


def test_hdf5_storage_cache(tmp_path):
    pytest.importorskip('h5py')
    with CacheFile.open(storage_class='Hdf5Storage', tmpdir=str(tmp_path),
                        use_threading=True) as c:
        assert type(c.storage.storage).__name__ == 'Hdf5Storage'
        for i in range(4):
            c[f'k{i}'] = {'arr': np.full(4, i), 'tag': f't{i}'}
        c.preload('k2', 'k3')
        for i in range(4):
            v = c[f'k{i}']
            assert np.all(v['arr'] == i) and v['tag'] == f't{i}'
        del c['k0']
        assert 'k0' not in c


def test_event_handler_priorities():
    ev = EventHandler("arg")
    calls = []
    ev.connect(lambda x: calls.append(('low', x)), priority=-1)
    ev.connect(lambda x: calls.append(('high', x)), priority=5)
    ev.emit(7)
    assert calls == [('high', 7), ('low', 7)]


def test_worker_thread():
    results = {}
    with Worker('test') as w:
        w.put_task(lambda a, b: a + b, 2, 3, return_dict=results,
                   return_key='sum')
        w.put_task(np.square, np.arange(3), return_dict=results,
                   return_key='sq')
        w.join_tasks()
    assert results['sum'] == 5
    assert np.all(results['sq'] == [0, 1, 4])


def test_io_roundtrip(tmp_path):
    from tenpy_tpu.networks.site import SpinHalfSite
    from tenpy_tpu.networks.mps import MPS
    site = SpinHalfSite('Sz')
    psi = MPS.from_singlets(site, 4, [(0, 1), (2, 3)], bc='finite')
    data = {'psi': psi, 'energy': -1.23,
            'measurements': {'Sz': [np.zeros(4)]}}
    fn = str(tmp_path / 'result.pkl')
    tio.save(data, fn)
    loaded = tio.load(fn)
    assert abs(loaded['energy'] + 1.23) < 1e-15
    assert np.allclose(loaded['psi'].expectation_value('Sz'),
                       psi.expectation_value('Sz'))


def test_config_unused_warning():
    import warnings
    cfg = asConfig({'a': 1, 'typo_key': 2}, 'test')
    assert cfg.get('a', 0, int) == 1
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        cfg.warn_unused()
        assert any('typo_key' in str(x.message) for x in w)


def test_fit_sum_of_exp():
    lam_true, pref_true = np.array([0.9, 0.4]), np.array([2.0, -1.0])
    n = np.arange(1, 30)
    f = lambda k: (pref_true[:, None] * lam_true[:, None] ** k).sum(0)
    lam, pref = fit_with_sum_of_exp(f, n=2, N=20)
    assert np.allclose(sorted(lam), sorted(lam_true), atol=1e-8)
    assert np.allclose(sum_of_exp(lam, pref, n), f(n), atol=1e-8)


def test_linear_prediction():
    t = np.arange(80)
    sig = (np.exp(-0.05 * t) * np.cos(0.7 * t))[:, None]
    ext = linear_prediction(sig, rel_prediction_time=0.5, rel_num_points=0.5)
    assert ext.shape[0] == 120
    exact = np.exp(-0.05 * np.arange(120)) * np.cos(0.7 * np.arange(120))
    # predicted tail follows the damped oscillation
    assert np.max(np.abs(ext[80:, 0] - exact[80:])) < 5e-2
    assert np.allclose(ext[:80, 0], exact[:80])  # original data untouched


def test_process_thread_control():
    """Host BLAS thread control is real (OpenBLAS via ctypes), not a stub.

    Reference: tenpy/tools/process.py:99-184 (OMP/MKL setters).  This image
    ships OpenBLAS: set must succeed and get must report a positive count;
    MKL is absent, so the MKL setters must honestly return False/-1."""
    import numpy  # noqa: F401 — make sure BLAS is loaded
    import scipy.linalg  # noqa: F401
    from tenpy_tpu.tools import process
    if not process._blas_libs() and process.load_omp_library() is None:
        pytest.skip("no OpenBLAS/OMP runtime mapped in this environment")
    has_mkl = any(
        hasattr(lib, 'mkl_set_num_threads') for lib in process._blas_libs())
    assert process.omp_set_nthreads(1) is True
    assert process.omp_get_nthreads() >= 1
    if not has_mkl:   # honest negatives on a non-MKL image
        assert process.mkl_set_nthreads(2) is False
        assert process.mkl_get_nthreads() == -1
    else:
        assert process.mkl_set_nthreads(2) is True
        assert process.mkl_get_nthreads() >= 1
    assert process.memory_usage() > 0
