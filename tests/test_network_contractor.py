"""ncon/contract vs direct tensordot results."""
import numpy as np

from tenpy_tpu.linalg import np_conserved as npc
from tenpy_tpu.algorithms.network_contractor import ncon, contract
from tenpy_tpu.networks.site import SpinHalfSite


def _rand_mps_tensors():
    site = SpinHalfSite('Sz')
    from tenpy_tpu.networks.mps import MPS
    psi = MPS.from_singlets(site, 4, [(0, 1), (2, 3)], bc='finite')
    return psi


def test_ncon_overlap():
    psi = _rand_mps_tensors()
    Bs = [psi.get_B(i, 'B') for i in range(4)]
    th = psi.get_theta(0, 4)
    # <theta|theta> via ncon: ket legs 1..6, bra conjugate
    bra = th.conj()
    val = ncon([th, bra], [[1, 2, 3, 4, 5, 6], [1, 2, 3, 4, 5, 6]])
    assert abs(complex(val) - 1.) < 1e-12


def test_ncon_matches_tensordot():
    site = SpinHalfSite('Sz')
    Sp, Sm = site.Sp, site.Sm
    direct = npc.tensordot(Sp, Sm, axes=[['p*'], ['p']])
    via_ncon = ncon([Sp, Sm], [[-1, 1], [1, -2]])
    assert float(npc.norm(direct - via_ncon.iset_leg_labels(['p', 'p*']))) < 1e-14


def test_ncon_trace():
    site = SpinHalfSite('Sz')
    SzSz = npc.outer(site.Sz, site.Sz)  # legs p p* p1 p1*... labels p,p*,p,p*?
    SzSz.iset_leg_labels(['a', 'a*', 'b', 'b*'])
    val = ncon([SzSz], [[1, 1, 2, 2]])  # full trace
    expect = complex(npc.trace(site.Sz, 0, 1)) ** 2
    assert abs(complex(val) - expect) < 1e-14


def test_contract_labels():
    site = SpinHalfSite('Sz')
    res = contract([site.Sp, site.Sm], tensor_names=['up', 'down'],
                   leg_contractions=[['up', 'p*', 'down', 'p']],
                   open_legs=[['up', 'p', 'x'], ['down', 'p*', 'y']])
    direct = npc.tensordot(site.Sp, site.Sm, axes=[['p*'], ['p']])
    assert set(res.get_leg_labels()) == {'x', 'y'}
    assert float(npc.norm(res - direct.iset_leg_labels(['x', 'y']))) < 1e-14
