"""Math helpers (reference ``tenpy/tools/math.py``)."""

from __future__ import annotations

import numpy as np

__all__ = ['matvec_to_array', 'entropy', 'gcd', 'gcd_array', 'lcm', 'speigs', 'speigsh',
           'perm_sign', 'qr_li', 'rq_li']

LeviCivita3 = np.array([[[0, 0, 0], [0, 0, 1], [0, -1, 0]],
                        [[0, 0, -1], [0, 0, 0], [1, 0, 0]],
                        [[0, 1, 0], [-1, 0, 0], [0, 0, 0]]])


def matvec_to_array(H):
    """Build the dense matrix of a linear operator with `matvec` (reference math.py:36)."""
    dim = H.dim
    dtype = getattr(H, 'dtype', np.float64)
    X = np.eye(dim, dtype=dtype)
    out = np.empty((dim, dim), dtype=np.result_type(dtype, np.complex64)
                   if np.iscomplexobj(np.zeros(1, dtype)) else dtype)
    cols = [np.asarray(H.matvec(X[:, i])) for i in range(dim)]
    out = np.stack(cols, axis=1)
    return out


def entropy(p, n=1):
    """Renyi entropy of order `n` of a probability distribution (n=1 -> von Neumann)."""
    p = np.asarray(p)
    p = p[p > 1e-30]
    if n == 1:
        return -np.inner(p, np.log(p))
    elif n == np.inf:
        return -np.log(np.max(p))
    return np.log(np.sum(p ** n)) / (1. - n)


def gcd(a, b):
    a, b = abs(int(a)), abs(int(b))
    while b:
        a, b = b, a % b
    return a


def gcd_array(a):
    a = np.asarray(a).ravel()
    if len(a) == 0:
        raise ValueError("empty array")
    res = abs(int(a[0]))
    for x in a[1:]:
        res = gcd(res, x)
    return res


def lcm(a, b):
    g = gcd(a, b)
    return abs(int(a) * int(b)) // g if g else 0


def speigs(A, k, *args, **kwargs):
    """scipy.sparse.linalg.eigs with fallback to dense eig for small matrices."""
    import scipy.sparse.linalg
    d = A.shape[0]
    if k >= d - 1:
        from .misc import argsort
        if scipy.sparse.issparse(A):
            A = A.toarray()
        W, V = np.linalg.eig(A)
        keep = argsort(W, kwargs.get('which', 'LM'))[:k]
        return W[keep], V[:, keep]
    return scipy.sparse.linalg.eigs(A, k, *args, **kwargs)


def speigsh(A, k, *args, **kwargs):
    """scipy.sparse.linalg.eigsh with dense fallback."""
    import scipy.sparse.linalg
    d = A.shape[0]
    if k >= d - 1:
        from .misc import argsort
        if scipy.sparse.issparse(A):
            A = A.toarray()
        W, V = np.linalg.eigh(A)
        which = kwargs.get('which', 'LM')
        keep = argsort(W, {'LM': 'm>', 'SM': 'm<', 'LA': '>', 'SA': '<'}.get(which, which))[:k]
        return W[keep], V[:, keep]
    return scipy.sparse.linalg.eigsh(A, k, *args, **kwargs)


def perm_sign(p):
    """Sign (+-1) of a permutation."""
    p = list(p)
    sign = 1
    for i in range(len(p)):
        while p[i] != i:
            j = p[i]
            p[i], p[j] = p[j], p[i]
            sign = -sign
    return sign


def qr_li(A, cutoff=1e-15):
    """QR keeping only linearly independent columns of Q (rank-revealing via pivoting).

    Reference: ``tenpy/tools/math.py:255``.
    """
    import scipy.linalg
    A = np.asarray(A)
    q, r, piv = scipy.linalg.qr(A, mode='economic', pivoting=True)
    d = np.abs(np.diagonal(r))
    keep = d > cutoff * (d[0] if len(d) else 1.)
    q = q[:, keep]
    r = r[keep, :]
    # undo pivoting on r's columns
    inv = np.empty_like(piv)
    inv[piv] = np.arange(len(piv))
    return q, r[:, inv]


def rq_li(A, cutoff=1e-15):
    """RQ with linearly independent rows of Q (analogue of :func:`qr_li`)."""
    q, r = qr_li(A[::-1, ::-1].T.conj(), cutoff)
    return r[::-1, ::-1].T.conj(), q[::-1, ::-1].T.conj()
