"""HDF5 + pickle export/import tests.

Mirrors the reference scheme (``tests/export_import_test/io_test.py:1-9``):
:func:`gen_example_data` builds canonical example data; files exported by
*older* versions accumulate in ``tests/export_import/data/`` and every test
run re-imports all of them — guarding backward compatibility of the format.
Additionally round-trips the full object stack (Array, legs, Site, MPS, MPO)
through the reference-format Hdf5Saver/Loader.
"""
import os

import numpy as np
import pytest

h5py = pytest.importorskip('h5py')

import tenpy_tpu
from tenpy_tpu.linalg import np_conserved as npc
from tenpy_tpu.linalg.charges import ChargeInfo, LegCharge, LegPipe
from tenpy_tpu.networks.site import SpinHalfSite, FermionSite
from tenpy_tpu.networks.mps import MPS
from tenpy_tpu.tools import io as hio

datadir = os.path.join(os.path.dirname(__file__), 'export_import', 'data')


def gen_example_data():
    """Canonical example data covering the format's type vocabulary."""
    s = SpinHalfSite('Sz')
    psi = MPS.from_product_state([s] * 4, ['up', 'down', 'up', 'down'])
    from tenpy_tpu.models.tf_ising import TFIChain
    M = TFIChain({'L': 4, 'J': 1., 'g': 0.5, 'bc_MPS': 'finite',
                  'sort_charge': True})
    shared = np.arange(20).reshape(4, 5)
    data = {
        'None': None,
        'scalars': [0, np.int64(1), 2., np.float64(0.5), 3. + 4.j, 'text',
                    True, False],
        'big_int': 2 ** 70,
        'bytes': b'\x00\x01binary',
        'range': range(2, 20, 3),
        'dtype': np.dtype([('a', np.int32), ('b', np.float64)]),
        'arrays': {'int': np.arange(12).reshape(3, 4),
                   'complex': np.exp(1.j * np.arange(4)),
                   'shared1': shared, 'shared2': shared},
        'iterables': {'list': [1, 'a', None],
                      'tuple': (2, [3, 4], 'b'),
                      'set': {1, 2, 'x'}},
        'nonsimple_keys': {(1, 2): 'tuple key', 3: 'int key',
                           'with/slash': 'bad path'},
        'npc': {'chinfo': psi.chinfo,
                'leg': psi._B[1].get_leg('vL'),
                'array': psi._B[1],
                'site': s},
        'mps': psi,
        'mpo': M.H_MPO,
    }
    return data


def assert_equal_data(loaded, expected, path='root'):
    """Recursive equality check over the example-data structure."""
    assert type(loaded) is type(expected) or \
        isinstance(loaded, type(expected)), f"type mismatch at {path}"
    if isinstance(expected, dict):
        assert set(loaded.keys()) == set(expected.keys()), f"keys at {path}"
        for k in expected:
            assert_equal_data(loaded[k], expected[k], f"{path}[{k!r}]")
    elif isinstance(expected, (list, tuple)):
        assert len(loaded) == len(expected)
        for i, (l, e) in enumerate(zip(loaded, expected)):
            assert_equal_data(l, e, f"{path}[{i}]")
    elif isinstance(expected, set):
        assert loaded == expected
    elif isinstance(expected, np.ndarray):
        np.testing.assert_array_equal(np.asarray(loaded), expected, err_msg=path)
    elif isinstance(expected, np.dtype):
        assert loaded == expected
    elif isinstance(expected, range):
        assert list(loaded) == list(expected)
    elif isinstance(expected, npc.Array):
        assert loaded.get_leg_labels() == expected.get_leg_labels()
        np.testing.assert_allclose(loaded.to_numpy(), expected.to_numpy(),
                                   atol=1e-14, err_msg=path)
    elif isinstance(expected, ChargeInfo):
        assert loaded == expected
    elif isinstance(expected, LegCharge):
        expected.test_equal(loaded) if hasattr(expected, 'test_equal') else \
            (np.testing.assert_array_equal(np.asarray(loaded.slices),
                                           np.asarray(expected.slices)),
             np.testing.assert_array_equal(np.asarray(loaded.charges),
                                           np.asarray(expected.charges)))
        assert loaded.qconj == expected.qconj
    elif isinstance(expected, MPS):
        assert loaded.L == expected.L and loaded.bc == expected.bc
        ov = loaded.overlap(expected)
        assert abs(abs(complex(ov)) - 1.) < 1e-12
        for b in range(*[expected.nontrivial_bonds.start,
                         expected.nontrivial_bonds.stop]):
            np.testing.assert_allclose(np.asarray(loaded.get_SL(b)),
                                       np.asarray(expected.get_SL(b)),
                                       atol=1e-14)
    elif hasattr(expected, 'opnames'):  # Site
        assert loaded.opnames == expected.opnames
        for opn in expected.opnames:
            np.testing.assert_allclose(
                getattr(loaded, opn).to_numpy(),
                getattr(expected, opn).to_numpy(), atol=1e-14)
    elif expected is None or np.isscalar(expected):
        assert loaded == expected, f"{path}: {loaded!r} != {expected!r}"
    else:  # MPO and other instances: compare via __dict__ leaves we know
        if hasattr(expected, '_W'):
            assert len(loaded._W) == len(expected._W)
            for wl, we in zip(loaded._W, expected._W):
                np.testing.assert_allclose(wl.to_numpy(), we.to_numpy(),
                                           atol=1e-14, err_msg=path)
            assert loaded.IdL == expected.IdL and loaded.IdR == expected.IdR
        else:
            raise AssertionError(f"don't know how to compare {type(expected)}")


def test_hdf5_roundtrip(tmp_path):
    data = gen_example_data()
    fn = str(tmp_path / 'example.h5')
    hio.save(data, fn)
    loaded = hio.load(fn)
    assert_equal_data(loaded, data)


def test_pickle_roundtrip(tmp_path):
    data = gen_example_data()
    for ext in ('.pkl', '.pkl.gz'):
        fn = str(tmp_path / ('example' + ext))
        hio.save(data, fn)
        assert_equal_data(hio.load(fn), data)


def test_hdf5_memoization_and_cycles(tmp_path):
    shared = [1, 2, 3]
    cyc = {'shared_a': shared, 'shared_b': shared}
    cyc['self'] = cyc  # cyclic reference
    fn = str(tmp_path / 'cyc.h5')
    hio.save(cyc, fn)
    loaded = hio.load(fn)
    assert loaded['self'] is loaded
    assert loaded['shared_a'] is loaded['shared_b']
    assert loaded['shared_a'] == shared


def test_hdf5_format_layout(tmp_path):
    """Spot-check the on-disk layout against the reference format spec."""
    fn = str(tmp_path / 'layout.h5')
    data = {'simple': {'a': 1}, 'general': {(1, 2): 'x'}, 'lst': [1, 2]}
    hio.save(data, fn)
    with h5py.File(fn, 'r') as f:
        assert f.attrs[hio.ATTR_TYPE] in (hio.REPR_DICT_SIMPLE,)
        assert f['simple'].attrs[hio.ATTR_TYPE] == hio.REPR_DICT_SIMPLE
        assert f['general'].attrs[hio.ATTR_TYPE] == hio.REPR_DICT_GENERAL
        assert set(f['general'].keys()) == {'keys', 'values'}
        assert f['lst'].attrs[hio.ATTR_TYPE] == hio.REPR_LIST
        assert f['lst'].attrs[hio.ATTR_LEN] == 2
        assert f['lst/0'].attrs[hio.ATTR_TYPE] == hio.REPR_INT
        arrgr = f['simple']
        assert arrgr['a'].attrs[hio.ATTR_TYPE] == hio.REPR_INT


def test_hdf5_npc_pipe_roundtrip(tmp_path):
    """LegPipe + combined-leg Array survive the roundtrip exactly."""
    s = FermionSite('N')
    a = npc.outer(s.N.replace_labels(['p', 'p*'], ['p0', 'p0*']),
                  s.Id.replace_labels(['p', 'p*'], ['p1', 'p1*']))
    a = a.combine_legs([['p0', 'p1'], ['p0*', 'p1*']], qconj=[+1, -1])
    fn = str(tmp_path / 'pipe.h5')
    hio.save(a, fn)
    b = hio.load(fn)
    assert isinstance(b.legs[0], LegPipe)
    np.testing.assert_allclose(b.to_numpy(), a.to_numpy(), atol=1e-14)
    # split_legs works on the loaded array (the pipe's q_map was rebuilt)
    np.testing.assert_allclose(b.split_legs().to_numpy(),
                               a.split_legs().to_numpy(), atol=1e-14)


def get_datadir_filename(template="exported_from_{0}.h5"):
    os.makedirs(datadir, exist_ok=True)
    return os.path.join(datadir, template.format(tenpy_tpu.__version__
                        if hasattr(tenpy_tpu, '__version__') else 'dev'))


def test_import_from_datadir():
    """Import every committed data file from older versions (backward compat).

    The corpus grows over time: run ``python test_hdf5_io.py`` manually to
    export the current version's example data into the data dir.
    """
    if not os.path.isdir(datadir):
        pytest.skip("no data dir yet")
    files = [f for f in os.listdir(datadir) if f.endswith(('.h5', '.pkl'))
             and not f.startswith('exported_from_ref')]
    if not files:
        pytest.skip("no exported data files yet")
    for f in files:
        loaded = hio.load(os.path.join(datadir, f))
        assert_equal_data(loaded, gen_example_data())


REFERENCE_PATH = '/root/reference'


def _ref_tenpy():
    """Import the reference tenpy library (None when unavailable)."""
    import sys
    if not os.path.isdir(os.path.join(REFERENCE_PATH, 'tenpy')):
        return None
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')  # no-cython warning
        import tenpy
    return tenpy


def gen_ref_example_data(tenpy):
    """The reference-library twin of (the npc/mps part of) gen_example_data."""
    from tenpy.networks.site import SpinHalfSite as RefSpinHalf
    from tenpy.networks.mps import MPS as RefMPS
    s = tenpy.networks.site.SpinHalfSite('Sz', sort_charge=True) \
        if False else RefSpinHalf('Sz', sort_charge=True)
    psi = RefMPS.from_product_state([s] * 4, ['up', 'down', 'up', 'down'])
    return {
        'npc': {'chinfo': psi.chinfo,
                'leg': psi._B[1].get_leg('vL'),
                'array': psi._B[1],
                'site': s},
        'mps': psi,
    }


def gen_tpu_example_data():
    """The tenpy_tpu twin of :func:`gen_ref_example_data`."""
    s = SpinHalfSite('Sz')
    psi = MPS.from_product_state([s] * 4, ['up', 'down', 'up', 'down'])
    return {
        'npc': {'chinfo': psi.chinfo,
                'leg': psi._B[1].get_leg('vL'),
                'array': psi._B[1],
                'site': s},
        'mps': psi,
    }


def test_cross_library_load_reference_file(tmp_path):
    """A file written by *actual* reference tenpy loads into tenpy_tpu objects.

    This is the real interchange guarantee behind
    ``tools/io.py``'s reference-format claim (reference scheme:
    ``/root/reference/tests/export_import_test/io_test.py:1-9``)."""
    tenpy = _ref_tenpy()
    if tenpy is None:
        pytest.skip("reference tenpy not available")
    from tenpy.tools import hdf5_io as ref_io
    fn = str(tmp_path / 'ref_written.h5')
    data = gen_ref_example_data(tenpy)
    with h5py.File(fn, 'w') as f:
        ref_io.save_to_hdf5(f, data)
    loaded = hio.load(fn)
    # loaded objects must be *tenpy_tpu* types with identical content
    assert type(loaded['mps']) is MPS
    assert isinstance(loaded['npc']['array'], npc.Array)
    expected = gen_tpu_example_data()
    assert_equal_data(loaded, expected)


def test_cross_library_save_for_reference(tmp_path):
    """A file written by tenpy_tpu loads with *actual* reference tenpy.

    The saver stamps format-verified classes with the reference module path
    (``tools/io.py COMPAT_MODULES``), so plain-tenpy users — without
    tenpy_tpu installed — can read our states."""
    tenpy = _ref_tenpy()
    if tenpy is None:
        pytest.skip("reference tenpy not available")
    from tenpy.tools import hdf5_io as ref_io
    fn = str(tmp_path / 'tpu_written.h5')
    hio.save(gen_tpu_example_data(), fn)
    # the module attrs on disk must be reference paths (no tenpy_tpu leak)
    with h5py.File(fn, 'r') as f:
        assert f['mps'].attrs[hio.ATTR_MODULE] == 'tenpy.networks.mps'
        assert f['npc/array'].attrs[hio.ATTR_MODULE] == \
            'tenpy.linalg.np_conserved'
        loaded = ref_io.load_from_hdf5(f)
    from tenpy.networks.mps import MPS as RefMPS
    from tenpy.linalg import np_conserved as ref_npc
    assert type(loaded['mps']) is RefMPS
    assert isinstance(loaded['npc']['array'], ref_npc.Array)
    loaded['mps'].test_sanity()
    ref = gen_ref_example_data(tenpy)
    np.testing.assert_allclose(loaded['npc']['array'].to_ndarray(),
                               ref['npc']['array'].to_ndarray(), atol=1e-14)
    assert abs(abs(loaded['mps'].overlap(ref['mps'])) - 1.) < 1e-12
    for b in range(1, 4):
        np.testing.assert_allclose(np.asarray(loaded['mps'].get_SL(b)),
                                   np.asarray(ref['mps'].get_SL(b)),
                                   atol=1e-14)


def test_import_reference_exported_datadir():
    """Import committed files exported by the reference library itself."""
    files = [] if not os.path.isdir(datadir) else \
        [f for f in os.listdir(datadir) if f.startswith('exported_from_ref')]
    if not files:
        pytest.skip("no reference-exported files committed yet")
    for f in files:
        loaded = hio.load(os.path.join(datadir, f))
        assert type(loaded['mps']) is MPS
        assert_equal_data(loaded, gen_tpu_example_data())


if __name__ == '__main__':
    # export the current version's example data into the compat corpus
    fn = get_datadir_filename()
    if os.path.exists(fn):
        print("keeping existing", fn, "(older-format coverage)")
    else:
        hio.save(gen_example_data(), fn)
        print("exported", fn)
    # and the reference library's own export (cross-library corpus)
    tenpy = _ref_tenpy()
    if tenpy is not None:
        from tenpy.tools import hdf5_io as ref_io
        os.makedirs(datadir, exist_ok=True)
        fn = os.path.join(
            datadir, f"exported_from_ref_tenpy_{tenpy.__version__}.h5")
        with h5py.File(fn, 'w') as f:
            ref_io.save_to_hdf5(f, gen_ref_example_data(tenpy))
        print("exported", fn)
