"""High-precision CPU oracles used by the test-suite.

The reference tests only check cross-method agreement (prox_tv_test.py); we add
what it lacks: trusted golden solutions.  The TV-L1/L2/Lp prox duals are
box/ball-constrained quadratics; scipy's L-BFGS-B solves them to high precision
independently of any of our engines.
"""
import numpy as np
from scipy.optimize import minimize


def _adjoint_diff(w):
    n = w.size + 1
    x = np.zeros(n)
    x[:-1] += w
    x[1:] -= w
    return x


def _grad_dual(w, y):
    x = y + _adjoint_diff(w)
    return x[:-1] - x[1:]


def tv1w_oracle(y, lam_vec, tol=1e-14):
    """Exact weighted TV-L1 prox via L-BFGS-B on the box-constrained dual."""
    y = np.asarray(y, float)
    lam_vec = np.broadcast_to(np.asarray(lam_vec, float), (y.size - 1,))

    def fun(w):
        x = y + _adjoint_diff(w)
        return 0.5 * np.dot(x, x), _grad_dual(w, y)

    w0 = np.zeros(y.size - 1)
    res = minimize(fun, w0, jac=True, method="L-BFGS-B",
                   bounds=list(zip(-lam_vec, lam_vec)),
                   options={"maxiter": 20000, "ftol": tol, "gtol": 1e-12})
    return y + _adjoint_diff(res.x)


def tv1_oracle(y, lam, **kw):
    return tv1w_oracle(y, np.full(y.size - 1 if y.size > 1 else 1, lam)[: max(y.size - 1, 0)] if y.size > 1 else np.zeros(0), **kw) if y.size > 1 else np.asarray(y, float)


def tv2_oracle(y, lam, tol=1e-14):
    """Exact TV-L2 (grouped-norm) prox via L-BFGS-B on the ball-constrained dual,
    reformulated as an unconstrained problem through radial parameterization is
    messy; instead solve the primal directly (smooth away from Dx=0)."""
    y = np.asarray(y, float)
    n = y.size

    def fun(x):
        d = np.diff(x)
        nrm = np.sqrt(np.dot(d, d) + 1e-300)
        f = 0.5 * np.dot(x - y, x - y) + lam * nrm
        g = (x - y).copy()
        gd = lam * d / nrm
        g[:-1] -= gd
        g[1:] += gd
        return f, g

    res = minimize(fun, y.copy(), jac=True, method="L-BFGS-B",
                   options={"maxiter": 50000, "ftol": tol, "gtol": 1e-12})
    return res.x


def tvp_oracle(y, lam, p, tol=1e-14):
    """TV-Lp prox via smooth primal minimization (valid when solution has Dx != 0
    componentwise issues smoothed with tiny epsilon)."""
    y = np.asarray(y, float)
    eps = 1e-12

    def fun(x):
        d = np.diff(x)
        ad = np.sqrt(d * d + eps)
        s = np.sum(ad ** p)
        nrm = s ** (1.0 / p)
        f = 0.5 * np.dot(x - y, x - y) + lam * nrm
        g = (x - y).copy()
        if s > 0:
            gd = lam * nrm / s * ad ** (p - 1) * (d / ad)
            g[:-1] -= gd
            g[1:] += gd
        return f, g

    res = minimize(fun, y.copy(), jac=True, method="L-BFGS-B",
                   options={"maxiter": 50000, "ftol": tol, "gtol": 1e-12})
    return res.x


def tv1_objective(x, y, lam):
    return 0.5 * np.sum((x - y) ** 2) + lam * np.sum(np.abs(np.diff(x)))


def tv1w_objective(x, y, w):
    return 0.5 * np.sum((x - y) ** 2) + np.sum(w * np.abs(np.diff(x)))
