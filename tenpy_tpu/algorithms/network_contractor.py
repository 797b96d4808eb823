r"""General tensor-network contractor (``ncon`` style).

Rebuild of ``tenpy/algorithms/network_contractor.py`` (ncon :21, contract :60);
the interface follows 'NCON: A tensor network contractor for MATLAB'
(arXiv:1402.0939).

``ncon`` takes a list of charge-blocked Arrays and integer leg links: positive
integers label contracted leg pairs, negative integers the ordering of open legs
in the result.  ``contract`` is the label-based front end.

The actual pairwise contractions route through :func:`~...np_conserved.tensordot`
and therefore hit the same cached-plan batched-GEMM path as everything else.
"""

from __future__ import annotations

import numpy as np

from ..linalg import np_conserved as npc

__all__ = ['contract', 'ncon']


def ncon(tensor_list, leg_links, sequence=None):
    """Contract a tensor network specified in the ncon convention.

    Parameters
    ----------
    tensor_list : list of Array
    leg_links : list of list of int
        For each tensor, one integer per leg.  Positive labels appear exactly
        twice in the whole network and mark legs to contract; negative labels
        ``-1, -2, ...`` mark open legs of the result (``-1`` becomes axis 0).
    sequence : list of int | None
        Order in which the positive labels are contracted (ascending default).

    Returns
    -------
    Array | scalar
        The contracted network; a scalar if no open legs remain.

    Reference: ``tenpy/algorithms/network_contractor.py:21``.
    """
    tensors = [t.copy(deep=False) for t in tensor_list]
    links = [list(l) for l in leg_links]
    for t, l in zip(tensors, links):
        if t.rank != len(l):
            raise ValueError(f"tensor rank {t.rank} != len(leg_links) {len(l)}")
    all_pos = [x for l in links for x in l if x > 0]
    for x in set(all_pos):
        if all_pos.count(x) != 2:
            raise ValueError(f"contracted leg label {x} appears "
                             f"{all_pos.count(x)} times (need exactly 2)")
    if sequence is None:
        sequence = sorted(set(all_pos))
    sequence = list(sequence)

    # partial traces: a label appearing twice on the SAME tensor
    for i, l in enumerate(links):
        dup = [x for x in set(l) if x > 0 and l.count(x) == 2]
        for x in dup:
            a1 = l.index(x)
            a2 = l.index(x, a1 + 1)
            tensors[i] = npc.trace(tensors[i], a1, a2)
            links[i] = [y for k, y in enumerate(l) if k not in (a1, a2)]
            l = links[i]
            sequence = [s for s in sequence if s != x]

    # binary contractions in sequence order; batch all common labels of a pair
    scalar = 1.
    while sequence:
        x = sequence[0]
        owners = [i for i, l in enumerate(links) if x in l]
        if len(owners) != 2:
            raise ValueError(f"label {x} not found on two tensors")
        i, j = owners
        common = [y for y in links[i] if y > 0 and y in links[j]]
        axes_i = [links[i].index(y) for y in common]
        axes_j = [links[j].index(y) for y in common]
        res = npc.tensordot(tensors[i], tensors[j], axes=[axes_i, axes_j])
        new_links = [y for y in links[i] if y not in common] + \
            [y for y in links[j] if y not in common]
        if not isinstance(res, npc.Array):  # fully contracted pair -> scalar
            scalar = scalar * complex(res)
            del tensors[j], links[j]
            del tensors[i], links[i]
        else:
            tensors[i] = res
            links[i] = new_links
            del tensors[j]
            del links[j]
        sequence = [s for s in sequence if s not in common]

    # scalars from fully-traced single tensors
    keep_t, keep_l = [], []
    for t, l in zip(tensors, links):
        if not isinstance(t, npc.Array):
            scalar = scalar * complex(t)
        elif t.rank == 0:
            scalar = scalar * complex(t.to_ndarray())
        else:
            keep_t.append(t)
            keep_l.append(l)
    tensors, links = keep_t, keep_l
    if not tensors:
        return scalar

    # outer products of the remaining disconnected parts
    while len(tensors) > 1:
        a = tensors.pop()
        la = links.pop()
        tensors[0] = npc.outer(tensors[0], a)
        links[0] = links[0] + la
    result = tensors[0]
    if scalar != 1.:
        result = result * scalar
    if links[0]:
        perm = list(np.argsort([-x for x in links[0]]))
        result = result.transpose(perm)
    return result


def contract(tensor_list, tensor_names=None, leg_contractions=None,
             open_legs=None, sequence=None):
    """Label-based front end for :func:`ncon`.

    Parameters
    ----------
    tensor_list : list of Array
    tensor_names : list of str | None
        Names to refer to the tensors (default: indices ``0, 1, ...``).
    leg_contractions : list of ``[name1, label1, name2, label2]``
        Contract leg `label1` of tensor `name1` with leg `label2` of `name2`.
    open_legs : list of ``[name, label, result_label]``
        Uncontracted legs and their labels in the result.
    sequence : list of int | None
        Order (1-based indices into `leg_contractions`) of the contractions.

    Reference: ``tenpy/algorithms/network_contractor.py:60``.
    """
    if leg_contractions is None:
        leg_contractions = []
    if open_legs is None:
        open_legs = []
    if tensor_names is None:
        tensor_names = list(range(len(tensor_list)))
    tensor_names = list(tensor_names)
    if sequence is None:
        sequence = list(range(1, len(leg_contractions) + 1))

    links = [[None] * t.rank for t in tensor_list]
    counter = 1
    new_sequence = []
    for n in sequence:
        n1, l1, n2, l2 = leg_contractions[n - 1]
        i1 = tensor_names.index(n1)
        i2 = tensor_names.index(n2)
        a1 = tensor_list[i1].get_leg_index(l1)
        a2 = tensor_list[i2].get_leg_index(l2)
        if links[i1][a1] is not None or links[i2][a2] is not None:
            raise RuntimeError(
                f"multiple contradictory contractions for legs {l1}/{l2} "
                f"of tensors {n1}/{n2}")
        links[i1][a1] = counter
        links[i2][a2] = counter
        new_sequence.append(counter)
        counter += 1

    final_labels = []
    open_counter = -1
    for name, label, res_label in open_legs:
        i = tensor_names.index(name)
        a = tensor_list[i].get_leg_index(label)
        links[i][a] = open_counter
        open_counter -= 1
        final_labels.append(res_label)

    for i, l in enumerate(links):
        if any(x is None for x in l):
            missing = [k for k, x in enumerate(l) if x is None]
            raise ValueError(f"tensor {tensor_names[i]} has unassigned legs "
                             f"{missing}: every leg needs a contraction or an "
                             f"open_legs entry")

    res = ncon(tensor_list, links, new_sequence)
    if final_labels:
        res.iset_leg_labels(final_labels)
    return res
