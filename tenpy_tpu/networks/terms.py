r"""Intermediate representation of Hamiltonian terms.

Rebuild of ``tenpy/networks/terms.py`` (TermList :29, OnsiteTerms :307, CouplingTerms :500,
MultiCouplingTerms :857, ExponentiallyDecayingTerms :1359, order_combine_term :253).

These containers accumulate terms from the model DSL and compile either to an MPO (via
:class:`~tenpy_tpu.networks.mpo.MPOGraph`) or to nearest-neighbor bond operators.  All of
this is host-side metadata work happening once at model-construction time; nothing here
touches the device.

Conventions match the reference: couplings are stored with ``i < j``; for infinite systems
``j`` may exceed ``L`` (coupling across the unit-cell boundary); fermionic terms carry
explicit Jordan-Wigner strings determined by ``Site.op_needs_JW``.
"""

from __future__ import annotations

import warnings
import numpy as np

from ..linalg import np_conserved as npc

__all__ = ['TermList', 'OnsiteTerms', 'CouplingTerms', 'MultiCouplingTerms',
           'ExponentiallyDecayingTerms', 'order_combine_term']


class TermList:
    """A list of terms (each a list of ``(opname, site_index)``) with prefactors.

    Reference: ``tenpy/networks/terms.py:29``.
    """

    def __init__(self, terms, strength=1.):
        self.terms = [list(t) for t in terms]
        strength = np.asarray(strength)
        if strength.ndim == 0:
            strength = np.broadcast_to(strength, (len(self.terms),))
        self.strength = np.array(strength)
        if len(self.strength) != len(self.terms):
            raise ValueError("strength length mismatch")

    @classmethod
    def from_lattice_locations(cls, lattice, terms, strength=1., shift=None):
        """Terms given as ``(opname, lattice index tuple)`` -> MPS indices."""
        converted = []
        for term in terms:
            new_term = []
            for op, lat_idx in term:
                idx = np.array(lat_idx)
                if shift is not None:
                    idx = idx + np.array(shift + [0])
                new_term.append((op, int(lattice.lat2mps_idx(idx))))
            converted.append(new_term)
        return cls(converted, strength)

    def to_OnsiteTerms_CouplingTerms(self, sites):
        """Split into (OnsiteTerms, CouplingTerms | MultiCouplingTerms)."""
        L = len(sites)
        ot = OnsiteTerms(L)
        if any(len(t) > 2 for t in self.terms):
            ct = MultiCouplingTerms(L)
        else:
            ct = CouplingTerms(L)
        for term, strength in zip(self.terms, self.strength):
            term = list(term)
            if len(term) == 1:
                op, i = term[0]
                ot.add_onsite_term(strength, i % L, op)
            elif len(term) == 2:
                args = ct.coupling_term_handle_JW(strength, term, sites)
                ct.add_coupling_term(*args)
            else:
                term, sign = order_combine_term(term, sites)
                args = ct.multi_coupling_term_handle_JW(strength * sign, term, sites)
                ct.add_multi_coupling_term(*args)
        return ot, ct

    def order_combine(self, sites):
        """Sort operators in each term by site (tracking fermionic signs), combine onsite."""
        for idx, term in enumerate(self.terms):
            self.terms[idx], sign = order_combine_term(term, sites)
            self.strength[idx] *= sign
        return self

    def limits(self):
        mins = [min(i for _, i in t) for t in self.terms]
        maxs = [max(i for _, i in t) for t in self.terms]
        return np.array(mins), np.array(maxs)

    def shift(self, i0):
        return TermList([[(op, i + i0) for op, i in t] for t in self.terms],
                        self.strength)

    def max_range(self):
        mins, maxs = self.limits()
        return int(np.max(maxs - mins))

    def __iter__(self):
        return iter(zip(self.terms, self.strength))

    def __add__(self, other):
        if isinstance(other, TermList):
            return TermList(self.terms + other.terms,
                            np.concatenate([self.strength, other.strength]))
        return NotImplemented

    def __mul__(self, other):
        return TermList(self.terms, self.strength * other)

    def __str__(self):
        res = []
        for term, strength in self:
            term_str = ' '.join([f"{op}_{i}" for op, i in term])
            res.append(f"{strength:.5f} * {term_str}")
        return ' +\n'.join(res)


def order_combine_term(term, sites):
    """Sort a term by site index (stable), tracking fermionic anticommutation signs, and
    combine operators acting on the same site.  Returns ``(term, sign)``.

    Reference: ``tenpy/networks/terms.py:253``.
    """
    L = len(sites)
    ops = list(term)
    # selection sort with sign tracking: count transpositions of JW-needing ops
    sign = 1
    n = len(ops)
    needs_JW = [sites[i % L].op_needs_JW(op) for op, i in ops]
    # bubble sort (stable) counting anticommutations of fermionic pairs
    for a in range(n):
        for b in range(n - 1 - a):
            if ops[b][1] > ops[b + 1][1]:
                if needs_JW[b] and needs_JW[b + 1]:
                    sign = -sign
                ops[b], ops[b + 1] = ops[b + 1], ops[b]
                needs_JW[b], needs_JW[b + 1] = needs_JW[b + 1], needs_JW[b]
    # combine same-site ops
    combined = []
    for op, i in ops:
        if combined and combined[-1][1] == i:
            prev_op, _ = combined[-1]
            combined[-1] = (sites[i % L].multiply_op_names([prev_op, op]), i)
        else:
            combined.append((op, i))
    return combined, sign


class OnsiteTerms:
    """Sum of on-site terms: ``onsite_terms[i] = {opname: strength}``.

    Reference: ``tenpy/networks/terms.py:307``.
    """

    def __init__(self, L):
        assert L > 0
        self.L = L
        self.onsite_terms = [{} for _ in range(L)]

    def max_range(self):
        return 0

    def add_onsite_term(self, strength, i, op):
        d = self.onsite_terms[i]
        d[op] = d.get(op, 0) + strength

    def add_to_graph(self, graph):
        for i, d in enumerate(self.onsite_terms):
            for opname, strength in d.items():
                graph.add(i, 'IdL', 'IdR', opname, strength)

    def to_Arrays(self, sites):
        """Per-site operator sums as npc Arrays (None where no terms)."""
        res = []
        for i, d in enumerate(self.onsite_terms):
            if not d:
                res.append(None)
                continue
            H = None
            for opname, strength in d.items():
                term = sites[i].get_op(opname) * strength
                H = term if H is None else H + term
            res.append(H)
        return res

    def remove_zeros(self, tol_zero=1e-15):
        for d in self.onsite_terms:
            for op in [op for op, s in d.items() if abs(s) < tol_zero]:
                del d[op]

    def add_to_nn_bond_Arrays(self, H_bond, sites, finite, distribute=(0.5, 0.5)):
        """Distribute onsite terms onto the neighboring bonds of `H_bond`.

        ``H_bond[i]`` acts on sites ``(i-1, i)``.  Reference: ``terms.py:416``.
        """
        L = self.L
        for j, d in enumerate(self.onsite_terms):
            if not d:
                continue
            H = None
            for opname, strength in d.items():
                term = sites[j].get_op(opname) * strength
                H = term if H is None else H + term
            dl, dr = distribute
            if finite:
                if j == 0:
                    dl, dr = 0., 1.  # only bond (0,1) available -> H acts as left site
                elif j == L - 1:
                    dl, dr = 1., 0.
            if dl > 0.:
                # H on the right site of bond j: (j-1, j)
                b = j % L
                Hb = npc.outer(sites[(j - 1) % L].Id.replace_labels(['p', 'p*'],
                                                                    ['p0', 'p0*']),
                               (dl * H).replace_labels(['p', 'p*'], ['p1', 'p1*']))
                H_bond[b] = Hb if H_bond[b] is None else H_bond[b] + Hb
            if dr > 0.:
                # H on the left site of bond j+1: (j, j+1)
                b = (j + 1) % L
                Hb = npc.outer((dr * H).replace_labels(['p', 'p*'], ['p0', 'p0*']),
                               sites[(j + 1) % L].Id.replace_labels(['p', 'p*'],
                                                                    ['p1', 'p1*']))
                H_bond[b] = Hb if H_bond[b] is None else H_bond[b] + Hb
        return H_bond

    def to_TermList(self):
        terms = []
        strength = []
        for i, d in enumerate(self.onsite_terms):
            for op, s in d.items():
                terms.append([(op, i)])
                strength.append(s)
        return TermList(terms, strength)

    def __iadd__(self, other):
        if other.L != self.L:
            raise ValueError("different L")
        for i, d in enumerate(other.onsite_terms):
            for op, s in d.items():
                self.add_onsite_term(s, i, op)
        return self

    def _test_terms(self, sites):
        for i, d in enumerate(self.onsite_terms):
            for op in d:
                if not sites[i].valid_opname(op):
                    raise ValueError(f"unknown op {op!r} on site {i}")


class CouplingTerms:
    """Two-site coupling terms, stored as the nested FSM-prefix dict
    ``coupling_terms[i][(op_i, op_string)][j][op_j] = strength``.

    Reference: ``tenpy/networks/terms.py:500``.
    """

    def __init__(self, L):
        assert L > 0
        self.L = L
        self.coupling_terms = {}

    def max_range(self):
        mr = 0
        for i, d1 in self.coupling_terms.items():
            for key, d2 in d1.items():
                for j in d2:
                    mr = max(mr, j - i)
        return mr

    def add_coupling_term(self, strength, i, j, op_i, op_j, op_string='Id'):
        """Add ``strength * op_i_{i} op_string ... op_j_{j}`` with ``0 <= i < j``."""
        if not 0 <= i < self.L:
            raise ValueError(f"i={i} out of range")
        if not i < j:
            raise ValueError("need i < j")
        d1 = self.coupling_terms.setdefault(i, {})
        d2 = d1.setdefault((op_i, op_string), {})
        d3 = d2.setdefault(j, {})
        d3[op_j] = d3.get(op_j, 0) + strength

    def coupling_term_handle_JW(self, strength, term, sites, op_string=None):
        """Determine the JW string for a 2-site term; returns add_coupling_term args.

        Reference: ``terms.py:570``.
        """
        L = self.L
        (op_i, i), (op_j, j) = term
        site_i = sites[i % L]
        site_j = sites[j % L]
        need_i = site_i.op_needs_JW(op_i)
        need_j = site_j.op_needs_JW(op_j)
        if op_string is None:
            if need_i and need_j:
                op_string = 'JW'
            elif need_i or need_j:
                raise ValueError("only one operator needs a JW string?!")
            else:
                op_string = 'Id'
        if op_string == 'JW':
            op_i = site_i.multiply_op_names([op_i, op_string])
        return strength, i, j, op_i, op_j, op_string

    def add_to_graph(self, graph):
        """Insert all couplings into an MPOGraph (states keyed by (i, op_i, op_string))."""
        for i, d1 in self.coupling_terms.items():
            for (op_i, op_string), d2 in d1.items():
                label = (i, op_i, op_string)
                graph.add(i, 'IdL', label, op_i, 1., skip_existing=True)
                for j, d3 in d2.items():
                    label_j = graph.add_string_left_to_right(i, j, label, op_string)
                    for op_j, strength in d3.items():
                        graph.add(j, label_j, 'IdR', op_j, strength)

    def to_nn_bond_Arrays(self, sites):
        """Bond operators ``H_bond[j]`` acting on sites ``(j-1, j)``; requires range 1."""
        L = self.L
        H_bond = [None] * L
        for i, d1 in self.coupling_terms.items():
            for (op_i, op_string), d2 in d1.items():
                for j, d3 in d2.items():
                    if j != i + 1:
                        raise ValueError("not nearest neighbor")
                    H = None
                    for op_j, strength in d3.items():
                        term = npc.outer(
                            (strength * sites[i % L].get_op(op_i)).replace_labels(
                                ['p', 'p*'], ['p0', 'p0*']),
                            sites[j % L].get_op(op_j).replace_labels(
                                ['p', 'p*'], ['p1', 'p1*']))
                        H = term if H is None else H + term
                    b = j % L
                    H_bond[b] = H if H_bond[b] is None else H_bond[b] + H
        return H_bond

    def remove_zeros(self, tol_zero=1e-15):
        for i in list(self.coupling_terms):
            d1 = self.coupling_terms[i]
            for key in list(d1):
                d2 = d1[key]
                for j in list(d2):
                    d3 = d2[j]
                    for op in [op for op, s in d3.items() if abs(s) < tol_zero]:
                        del d3[op]
                    if not d3:
                        del d2[j]
                if not d2:
                    del d1[key]
            if not d1:
                del self.coupling_terms[i]

    def to_TermList(self):
        terms = []
        strength = []
        for i in sorted(self.coupling_terms):
            d1 = self.coupling_terms[i]
            for (op_i, op_string) in d1:
                for j in sorted(d1[(op_i, op_string)]):
                    for op_j, s in d1[(op_i, op_string)][j].items():
                        terms.append([(op_i, i), (op_j, j)])
                        strength.append(s)
        return TermList(terms, strength)

    def __iadd__(self, other):
        if other.L != self.L:
            raise ValueError("different L")
        if isinstance(other, MultiCouplingTerms) and not isinstance(self,
                                                                    MultiCouplingTerms):
            raise ValueError("can't add MultiCouplingTerms into CouplingTerms")
        for i, d1 in other.coupling_terms.items():
            for (op_i, op_string), d2 in d1.items():
                for j, d3 in d2.items():
                    for op_j, s in d3.items():
                        self.add_coupling_term(s, i, j, op_i, op_j, op_string)
        return self

    def _test_terms(self, sites):
        L = self.L
        for i, d1 in self.coupling_terms.items():
            for (op_i, op_string), d2 in d1.items():
                if not sites[i % L].valid_opname(op_i):
                    raise ValueError(f"unknown op {op_i!r} on site {i}")
                for j, d3 in d2.items():
                    for op_j in d3:
                        if not sites[j % L].valid_opname(op_j):
                            raise ValueError(f"unknown op {op_j!r} on site {j}")


class MultiCouplingTerms(CouplingTerms):
    """Coupling terms with more than two operators.

    Stored flat as ``multi_terms = [(strength, ijkl, ops, op_strings)]``; MPO compression
    of shared prefixes happens through the prefix-keyed graph states in
    :meth:`add_to_graph` (same dedup effect as the reference's explicit tree,
    ``terms.py:857``).
    Plain 2-operator couplings added via :meth:`add_coupling_term` are stored in the
    inherited nested-dict as well.
    """

    def __init__(self, L):
        super().__init__(L)
        self.multi_terms = []

    def max_range(self):
        mr = super().max_range()
        for strength, ijkl, ops, op_strings in self.multi_terms:
            mr = max(mr, ijkl[-1] - ijkl[0])
        return mr

    def add_multi_coupling_term(self, strength, ijkl, ops_ijkl, op_string='Id',
                                switchLR='middle_i'):
        """Add ``strength * prod_k ops[k]_{ijkl[k]}`` with strictly ascending ijkl."""
        if len(ijkl) < 2:
            raise ValueError("term with fewer than 2 operators: use add_onsite_term")
        if any(i >= j for i, j in zip(ijkl, ijkl[1:])):
            raise ValueError("ijkl must be strictly ascending")
        if not 0 <= ijkl[0] < self.L:
            raise ValueError("first operator outside unit cell")
        if isinstance(op_string, str):
            op_strings = [op_string] * (len(ijkl) - 1)
        else:
            op_strings = list(op_string)
        if len(ijkl) == 2:
            self.add_coupling_term(strength, ijkl[0], ijkl[1], ops_ijkl[0], ops_ijkl[1],
                                   op_strings[0])
            return
        self.multi_terms.append((strength, tuple(int(x) for x in ijkl),
                                 tuple(ops_ijkl), tuple(op_strings)))

    def multi_coupling_term_handle_JW(self, strength, term, sites, op_string=None):
        """Figure out JW strings for a multi-site term; returns add_multi args.

        Reference: ``terms.py:1053``.
        """
        L = self.L
        n = len(term)
        if n < 2:
            raise ValueError("got onsite term instead of coupling")
        if op_string == 'JW':
            warnings.warn("op_string='JW' is probably not what you want!")
        ops = [t[0] for t in term]
        ijkl = [t[1] for t in term]
        assert all(i < j for i, j in zip(ijkl, ijkl[1:]))
        needs = [sites[i % L].op_needs_JW(op) for op, i in term]
        if not any(needs):
            op_string = 'Id'
        i0 = ijkl[0]
        if not 0 <= i0 < L:
            shift = i0 % L - i0
            ijkl = [i + shift for i in ijkl]
        if op_string is not None:
            new_op_str = [op_string] * (n - 1)
        else:
            new_op_str = []
            JW_right = False
            for x in range(n):
                if needs[x]:
                    JW_right = not JW_right
                if JW_right:
                    new_op_str.append('JW')
                    ops[x] = sites[ijkl[x] % L].multiply_op_names([ops[x], 'JW'])
                else:
                    new_op_str.append('Id')
            if JW_right:
                raise ValueError("odd number of Jordan-Wigner strings")
            new_op_str.pop()
        return strength, ijkl, ops, new_op_str

    def add_to_graph(self, graph):
        super().add_to_graph(graph)
        for strength, ijkl, ops, op_strings in self.multi_terms:
            # state keys: growing prefix of ((site, op), string) pairs -> auto dedup
            prefix = ('multi', ijkl[0], ops[0], op_strings[0])
            graph.add(ijkl[0], 'IdL', prefix, ops[0], 1., skip_existing=True)
            key = prefix
            for k in range(1, len(ijkl)):
                i_prev, i_cur = ijkl[k - 1], ijkl[k]
                key = graph.add_string_left_to_right(i_prev, i_cur, key,
                                                     op_strings[k - 1])
                if k == len(ijkl) - 1:
                    graph.add(i_cur, key, 'IdR', ops[k], strength)
                else:
                    new_key = key + (i_cur, ops[k], op_strings[k])
                    graph.add(i_cur, key, new_key, ops[k], 1., skip_existing=True)
                    key = new_key

    def remove_zeros(self, tol_zero=1e-15):
        super().remove_zeros(tol_zero)
        self.multi_terms = [t for t in self.multi_terms if abs(t[0]) >= tol_zero]

    def to_TermList(self):
        tl = super().to_TermList()
        terms = list(tl.terms)
        strength = list(tl.strength)
        for s, ijkl, ops, op_strings in self.multi_terms:
            terms.append([(op, i) for op, i in zip(ops, ijkl)])
            strength.append(s)
        return TermList(terms, strength)

    def __iadd__(self, other):
        super().__iadd__(other)
        if isinstance(other, MultiCouplingTerms):
            self.multi_terms.extend(other.multi_terms)
        return self

    def _test_terms(self, sites):
        super()._test_terms(sites)
        L = self.L
        for s, ijkl, ops, op_strings in self.multi_terms:
            for op, i in zip(ops, ijkl):
                if not sites[i % L].valid_opname(op):
                    raise ValueError(f"unknown op {op!r} on site {i}")


class ExponentiallyDecayingTerms:
    r"""Exponentially decaying long-range couplings
    ``strength * sum_{i<j} lambda^{j-i} A_{subsites[i]} B_{subsites[j]}``.

    Representable with a single extra MPO bond state per term.
    Reference: ``tenpy/networks/terms.py:1359``.
    """

    def __init__(self, L):
        assert L > 0
        self.L = L
        self.exp_decaying_terms = []

    @property
    def is_empty(self):
        return len(self.exp_decaying_terms) == 0

    def add_exponentially_decaying_coupling(self, strength, lambda_, op_i, op_j,
                                            subsites=None, subsites_start=None,
                                            op_string='Id'):
        if subsites is None:
            subsites = np.arange(self.L)
        else:
            subsites = np.asarray(subsites)
            if len(subsites) > 1 and np.any(subsites[1:] < subsites[:-1]):
                raise ValueError("subsites must be sorted")
        if subsites_start is None:
            subsites_start = subsites
        else:
            subsites_start = np.asarray(subsites_start)
        self.exp_decaying_terms.append(
            (strength, lambda_, op_i, op_j, subsites, subsites_start, op_string))

    def add_to_graph(self, graph, key='exp-decay'):
        """One extra bond state per term carrying the decaying string."""
        finite = graph.bc == 'finite'
        L = self.L
        for t_idx, (strength, lambda_, op_i, op_j, subsites, subsites_start,
                    op_string) in enumerate(self.exp_decaying_terms):
            label = (key, t_idx)
            subset = set(int(x) for x in subsites)
            subset_start = set(int(x) for x in subsites_start)
            if finite:
                first = int(min(min(subsites), min(subsites_start)))
                last = int(max(subsites))
                for x in range(first, last + 1):
                    if x in subset_start and x < last:
                        graph.add(x, 'IdL', label, op_i, strength, skip_existing=False)
                    on_string = x in subset
                    if x > first:
                        if x in subset:
                            graph.add(x, label, 'IdR', op_j, lambda_)
                        if x < last:
                            graph.add(x, label, label,
                                      op_string if x in subset else 'Id',
                                      lambda_ if x in subset else 1.,
                                      skip_existing=True)
            else:
                for x in range(L):
                    if x in subset_start:
                        graph.add(x, 'IdL', label, op_i, strength, skip_existing=False)
                    if x in subset:
                        graph.add(x, label, 'IdR', op_j, lambda_)
                        graph.add(x, label, label, op_string, lambda_,
                                  skip_existing=True)
                    else:
                        graph.add(x, label, label, 'Id', 1., skip_existing=True)

    def to_TermList(self, cutoff=0.01, bc='finite'):
        """Expand into explicit terms with ``lambda^(j-i) > cutoff``."""
        terms = []
        strength = []
        L = self.L
        for (s, lambda_, op_i, op_j, subsites, subsites_start, op_string) in \
                self.exp_decaying_terms:
            max_d = int(np.ceil(np.log(cutoff) / np.log(abs(lambda_)))) \
                if abs(lambda_) < 1 else L
            sub = list(subsites)
            for a, i in enumerate(sub):
                for d in range(1, max_d + 1):
                    if a + d >= len(sub):
                        if bc == 'finite':
                            break
                        j = sub[(a + d) % len(sub)] + L * ((a + d) // len(sub))
                    else:
                        j = sub[a + d]
                    terms.append([(op_i, i), (op_j, j)])
                    strength.append(s * lambda_ ** d)
        return TermList(terms, strength)

    def max_range(self):
        return self.L if not self.is_empty else 0

    def __iadd__(self, other):
        if other.L != self.L:
            raise ValueError("different L")
        self.exp_decaying_terms.extend(other.exp_decaying_terms)
        return self

    def _test_terms(self, sites):
        for (s, lambda_, op_i, op_j, subsites, subsites_start, op_string) in \
                self.exp_decaying_terms:
            for u in subsites:
                if not sites[u % len(sites)].valid_opname(op_i) or \
                        not sites[u % len(sites)].valid_opname(op_j):
                    raise ValueError(f"unknown ops {op_i!r}/{op_j!r}")
