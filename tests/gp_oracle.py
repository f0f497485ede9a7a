"""Exact float64 numpy GP oracle for validating search/gp.py.

Mirrors the model definition (Matern-5/2 ARD + softplus-floored
hyperparameters + scaled jitter, gp.py:18-50) in float64 with exact
Cholesky algebra and the analytic EI formula — the same role botorch's
float64 stack plays for the reference
(alpha_learning/bayesian_optimization.py:62-116).  Test-only: framework
code must not import this.
"""

import numpy as np
from scipy.linalg import cho_factor, cho_solve, solve_triangular
from scipy.special import erf


def softplus(x):
    return np.logaddexp(0.0, x)


def unpack(params):
    """Float64 twin of gp._unpack (same 1e-4 floors)."""
    return (softplus(np.asarray(params["raw_ls"], np.float64)) + 1e-4,
            softplus(np.float64(params["raw_os"])) + 1e-4,
            softplus(np.float64(params["raw_noise"])) + 1e-4,
            np.float64(params["mean"]))


def matern52(x1, x2, ls, os_):
    d = (x1[:, None, :] - x2[None, :, :]) / ls
    r = np.sqrt(np.sum(d ** 2, axis=-1) + 1e-12)
    s = np.sqrt(5.0) * r
    return os_ * (1 + s + 5.0 / 3.0 * r ** 2) * np.exp(-s)


def kernel_with_jitter(x, ls, os_, noise):
    return matern52(x, x, ls, os_) + (noise + 1e-6 * os_) * np.eye(len(x))


def neg_mll(params, x, y):
    ls, os_, noise, mean = unpack(params)
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    k = kernel_with_jitter(x, ls, os_, noise)
    c, low = cho_factor(k, lower=True)
    resid = y - mean
    alpha = cho_solve((c, low), resid)
    return (0.5 * resid @ alpha + np.sum(np.log(np.diag(c)))
            + 0.5 * len(x) * np.log(2 * np.pi))


def posterior(params, x_train, y_train, x_test):
    ls, os_, noise, mean = unpack(params)
    x_train = np.asarray(x_train, np.float64)
    y_train = np.asarray(y_train, np.float64)
    x_test = np.asarray(x_test, np.float64)
    k = kernel_with_jitter(x_train, ls, os_, noise)
    c, low = cho_factor(k, lower=True)
    k_star = matern52(x_test, x_train, ls, os_)
    mu = mean + k_star @ cho_solve((c, low), y_train - mean)
    chol = np.linalg.cholesky(k)
    v = solve_triangular(chol, k_star.T, lower=True)
    var = np.clip(os_ - np.sum(v ** 2, axis=0), 1e-10, None)
    return mu, var


def expected_improvement(params, x_train, y_train, x_test, best_f):
    mu, var = posterior(params, x_train, y_train, x_test)
    sigma = np.sqrt(var)
    imp = best_f - mu  # minimization, like the search
    z = imp / sigma
    cdf = 0.5 * (1 + erf(z / np.sqrt(2.0)))
    pdf = np.exp(-0.5 * z ** 2) / np.sqrt(2 * np.pi)
    return imp * cdf + sigma * pdf
