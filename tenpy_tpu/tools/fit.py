"""Fitting helpers: algebraic decay, sum-of-exponentials, CFT central charge.

Reference: ``tenpy/tools/fit.py`` (alg_decay_fit :66, fit_with_sum_of_exp :232,
central_charge_from_S_profile :306).
"""

from __future__ import annotations

import numpy as np

__all__ = ['alg_decay', 'linear_fit', 'lin_fit_res', 'alg_decay_fit_res', 'alg_decay_fit',
           'alg_decay_fits', 'fit_with_sum_of_exp', 'sum_of_exp',
           'entropy_profile_from_CFT', 'central_charge_from_S_profile']


def alg_decay(x, a, b, c):
    """a * x^(-b) + c"""
    return a * x ** (-b) + c


def linear_fit(x, y):
    """Least-squares line fit; returns (slope, intercept, residual)."""
    assert x.ndim == 1 and y.ndim == 1
    m = np.vstack([x, np.ones(len(x))]).T
    fit, res, rank, sv = np.linalg.lstsq(m, y, rcond=None)
    return fit[0], fit[1], (res[0] if len(res) else 0.0)


def lin_fit_res(x, y):
    m = np.vstack([x, np.ones(len(x))]).T
    fit, res, rank, sv = np.linalg.lstsq(m, y, rcond=None)
    if len(res) < 1:
        res = [np.sum((y - np.mean(y)) ** 2)]
    return res[0]


def alg_decay_fit_res(log_b, x, y):
    return lin_fit_res(x ** (-np.exp(log_b)), y)


def alg_decay_fit(x, y, npts=5, power_range=(0.01, 4.), power_mesh=(60, 10)):
    """Fit y = a*x^(-b) + c over the last `npts` points; returns [a, b, c]."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    assert x.shape == y.shape and x.ndim == 1 and npts >= 3
    x = x[-npts:]
    y = y[-npts:]
    global_log_power_range = tuple(np.log(power_range))
    log_power_range = global_log_power_range
    for i, mesh in enumerate(power_mesh):
        brute_fac = np.arange(mesh + 1) / mesh
        trial_log_b = log_power_range[0] + \
            (log_power_range[1] - log_power_range[0]) * brute_fac
        res = [alg_decay_fit_res(lb, x, y) for lb in trial_log_b]
        best = np.argmin(res)
        best_log_b = trial_log_b[best]
        spacing = (log_power_range[1] - log_power_range[0]) / mesh
        log_power_range = (best_log_b - spacing, best_log_b + spacing)
    b = np.exp(best_log_b)
    m = np.vstack([x ** (-b), np.ones(len(x))]).T
    fit = np.linalg.lstsq(m, y, rcond=None)[0]
    return np.array([fit[0], b, fit[1]])


def alg_decay_fits(x, ys, npts=5, power_range=(0.01, 4.), power_mesh=(60, 10)):
    ys = np.asarray(ys)
    y_shape = ys.shape[:-1]
    fits = [alg_decay_fit(x, y, npts, power_range, power_mesh)
            for y in ys.reshape(-1, ys.shape[-1])]
    return np.array(fits).reshape(y_shape + (3,))


def fit_with_sum_of_exp(f, n, N=50):
    r"""Approximate a decaying function f on 1..N by ``sum_i prefactor_i lambda_i^x``.

    Uses the Prony/linear-prediction approach (Hankel matrix nullspace).  Used to encode
    long-range couplings as a constant number of extra MPO bond states.
    Reference: ``tenpy/tools/fit.py:232`` / arXiv:1407.1832 appendix.
    """
    assert n < N
    x = np.arange(1, N + 1)
    f_x = f(x)
    F = np.zeros([N - n + 1, n])
    for i in range(n):
        F[:, i] = f_x[i:i + N - n + 1]
    U, V = np.linalg.qr(F)
    U1 = U[:-1, :]
    U2 = U[1:, :]
    M = np.dot(np.linalg.pinv(U1), U2)
    lam = np.linalg.eigvals(M)
    lam = np.sort(lam)[::-1]
    # least-squares for prefactors
    W = np.power.outer(lam, x).T
    pref, res, rank, s = np.linalg.lstsq(W, f_x, rcond=None)
    return lam, pref


def sum_of_exp(lambdas, prefactors, x):
    return np.real_if_close(np.dot(np.power.outer(lambdas, x).T, prefactors))


def entropy_profile_from_CFT(size_A, L, central_charge, const):
    """Calabrese-Cardy entanglement profile S(l) = c/6 log(2L/pi sin(pi l/L)) + const."""
    return central_charge / 6. * np.log(2. * L / np.pi * np.sin(np.pi * size_A / L)) + const


def central_charge_from_S_profile(psi, exclude=None):
    """Fit the central charge from a finite MPS entanglement profile.

    Returns (central_charge, const). Reference: ``tenpy/tools/fit.py:306``.
    """
    if psi.bc != 'finite':
        raise ValueError("works only for finite MPS")
    S = np.asarray(psi.entanglement_entropy())
    L = psi.L
    size_A = np.arange(1, L)
    if exclude is None:
        exclude = L // 4
    if exclude > 0:
        S = S[exclude:-exclude]
        size_A = size_A[exclude:-exclude]
    x = np.log(2. * L / np.pi * np.sin(np.pi * size_A / L)) / 6.
    slope, intercept, res = linear_fit(x, S)
    return slope, intercept
