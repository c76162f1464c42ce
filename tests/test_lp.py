"""Tests for Lp-norm primitives: ball projections, proxes, linear oracle."""
import numpy as np
import pytest

import jax.numpy as jnp
from scipy.optimize import minimize

from proxtv_tpu.ops import lp
from proxtv_tpu.utils.lpnorms import lp_norm


def _proj_oracle(y, R, p):
    """Projection onto the Lp ball via scipy SLSQP."""
    y = np.asarray(y, float)
    if np.linalg.norm(y, p) <= R:
        return y
    res = minimize(lambda x: 0.5 * np.sum((x - y) ** 2), y,
                   jac=lambda x: x - y, method="SLSQP",
                   constraints=[{"type": "ineq",
                                 "fun": lambda x: R ** p - np.sum(np.abs(x) ** p)}],
                   options={"maxiter": 500, "ftol": 1e-14})
    return res.x


@pytest.mark.parametrize("p", [1.5, 2.0, 3.0, 5.0])
def test_ball_projection_general(p, rng):
    B, n = 6, 12
    Y = rng.randn(B, n) * 3
    R = 1.5
    X = np.asarray(lp.lp_ball_project(jnp.asarray(Y), R, p))
    for k in range(B):
        ref = _proj_oracle(Y[k], R, p)
        np.testing.assert_allclose(X[k], ref, atol=1e-5)
        assert np.sum(np.abs(X[k]) ** p) <= R ** p * (1 + 1e-8)


def _duchi_np(y, R):
    """Straightforward numpy reference for the L1-ball projection."""
    a = np.abs(y)
    if a.sum() <= R:
        return y.copy()
    s = np.sort(a)[::-1]
    cs = np.cumsum(s)
    k = np.arange(1, y.size + 1)
    rho = np.max(np.where(s - (cs - R) / k > 0)[0])
    theta = (cs[rho] - R) / (rho + 1)
    return np.sign(y) * np.maximum(a - theta, 0.0)


def test_l1_ball_projection(rng):
    B, n = 8, 15
    Y = rng.randn(B, n) * 2
    R = 2.0
    X = np.asarray(lp.l1_ball_project(jnp.asarray(Y), R))
    for k in range(B):
        ref = _duchi_np(Y[k], R)
        np.testing.assert_allclose(X[k], ref, atol=1e-12)
    # Inside the ball: identity.
    small = Y * 1e-3
    np.testing.assert_allclose(np.asarray(lp.l1_ball_project(jnp.asarray(small), R)),
                               small)


def test_zero_radius_projection(rng):
    """R == 0 projects onto {0} (regression: the Duchi rho index wrapped to
    the last element and returned a nonzero vector)."""
    Y = jnp.asarray(rng.randn(4, 9) * 2)
    np.testing.assert_allclose(np.asarray(lp.l1_ball_project(Y, 0.0)), 0.0,
                               atol=1e-12)
    for p in (1.0, 1.5, 2.0, 3.0, 150.0):
        np.testing.assert_allclose(np.asarray(lp.lp_ball_project(Y, 0.0, p)),
                                   0.0, atol=1e-12, err_msg=str(p))
    # Moreau pair: prox of 0-weighted norm is the identity.
    for p in (1.0, 1.5, 2.0, 150.0):
        np.testing.assert_allclose(np.asarray(lp.lp_prox(Y, 0.0, p)),
                                   np.asarray(Y), atol=1e-12, err_msg=str(p))


def test_linf_ball_projection(rng):
    Y = rng.randn(4, 9) * 3
    X = np.asarray(lp.linf_ball_project(jnp.asarray(Y), 1.0))
    np.testing.assert_allclose(X, np.clip(Y, -1, 1))


def test_prox_moreau_consistency(rng):
    """prox_{t||.||_p}(y) + proj_{||.||_q <= t}(y) == y, and the prox solves
    its optimality condition (subgradient check via objective comparison)."""
    B, n = 4, 10
    Y = rng.randn(B, n) * 2
    t = 0.8
    for p in [1.5, 2.0, 3.0]:
        P = np.asarray(lp.lp_prox(jnp.asarray(Y), t, p))
        # objective at prox <= objective at a few random perturbations
        for k in range(B):
            obj = 0.5 * np.sum((P[k] - Y[k]) ** 2) + t * np.linalg.norm(P[k], p)
            for _ in range(10):
                z = P[k] + 0.01 * rng.randn(n)
                objz = 0.5 * np.sum((z - Y[k]) ** 2) + t * np.linalg.norm(z, p)
                assert obj <= objz + 1e-10


def test_soft_threshold(rng):
    Y = rng.randn(3, 7)
    X = np.asarray(lp.soft_threshold(jnp.asarray(Y), 0.5))
    np.testing.assert_allclose(X, np.sign(Y) * np.maximum(np.abs(Y) - 0.5, 0))


@pytest.mark.parametrize("p", [1.0, 1.5, 2.0, 3.0, 120.0])
def test_linear_oracle(p, rng):
    """Oracle minimizes s'g over the ball: check optimality vs random feasible points."""
    B, n = 5, 11
    G = rng.randn(B, n)
    R = 1.3
    S = np.asarray(lp.solve_linear_lp(jnp.asarray(G), R, p))
    pp = np.inf if p >= 100.0 else max(p, 1.0)  # clamped regimes (LPopt.h:33-36)
    for k in range(B):
        assert np.linalg.norm(S[k], pp) <= R * (1 + 1e-6)
        val = np.dot(S[k], G[k])
        for _ in range(30):
            z = rng.randn(n)
            z = z / max(np.linalg.norm(z, pp), 1e-12) * R
            assert val <= np.dot(z, G[k]) + 1e-8


@pytest.mark.parametrize("p", [1.3, 1.5, 2.5, 3.0, 3.6])
def test_joint_kkt_projection_matches_nested(p, rng):
    """The joint-Newton fast path (gated to p in [1.3, 3.6]) must agree with
    the nested monotone root-find across scales, including warm restarts."""
    for _ in range(5):
        B, n = 8, 40
        Y = jnp.asarray(rng.randn(B, n) * 10.0 ** rng.uniform(-2, 2))
        R = jnp.asarray(np.abs(rng.randn(B)) * 10.0 ** rng.uniform(-2, 1))
        x1, mu1 = lp._lp_ball_project_general(Y, R, p)
        x2, _ = lp._lp_ball_project_nested(Y, R, p)
        scale = float(jnp.abs(Y).max())
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                   atol=5e-5 * scale)
        # warm restart from the converged multiplier: same answer.
        x3, _ = lp._lp_ball_project_general(Y, R, p, mu0=mu1)
        np.testing.assert_allclose(np.asarray(x3), np.asarray(x1),
                                   atol=1e-9 * scale)


def test_joint_rejection_merges_per_lane(rng, monkeypatch):
    """One rejected lane must not discard the joint pass's result for the
    other lanes (VERDICT r2 item 4): force lane 0's KKT residual to fail the
    acceptance test and check that lanes 1.. keep the (accepted-branch) joint
    answer exactly while lane 0 takes the nested root-find's answer."""
    p = 2.5
    Y = jnp.asarray(rng.randn(6, 24) * 2)
    R = jnp.asarray(np.full(6, 1.1))

    x_acc, mu_acc = lp._lp_ball_project_general(Y, R, p)   # all lanes accept
    x_nest, mu_nest = lp._lp_ball_project_nested(Y, R, p)

    real_joint = lp._joint_kkt_newton

    def fake_joint(an, Rn, T, pp, mu_init, iters):
        s, mu, Fres, Gres = real_joint(an, Rn, T, pp, mu_init, iters)
        return s, mu, Fres.at[0].set(1.0), Gres           # reject lane 0 only

    monkeypatch.setattr(lp, "_joint_kkt_newton", fake_joint)
    # __wrapped__ bypasses the jit cache so the patched global is traced.
    x_mix, mu_mix = lp._lp_ball_project_general.__wrapped__(Y, R, p)

    # atol 1e-12: far below the ~1e-8 joint-vs-nested discrepancy, so the
    # check discriminates which branch each lane took; not exactly 0 because
    # jit fusion reorders float ops at the eps level vs the unjitted trace.
    np.testing.assert_allclose(np.asarray(x_mix)[1:], np.asarray(x_acc)[1:],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mu_mix)[1:], np.asarray(mu_acc)[1:],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(x_mix)[0], np.asarray(x_nest)[0],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(float(mu_mix[0]), float(mu_nest[0]),
                               rtol=0, atol=1e-12)


def test_joint_kkt_projection_certificate(rng):
    """Accepted joint solutions satisfy the KKT system to near machine
    precision (the acceptance test is the exactness certificate)."""
    p = 2.5
    Y = jnp.asarray(rng.randn(8, 40) * 2)
    R = jnp.asarray(np.full(8, 1.2))
    x, mu = lp._lp_ball_project_general(Y, R, p)
    x = np.asarray(x)
    mu_n = np.asarray(mu)
    for k in range(8):
        nrm = np.sum(np.abs(x[k]) ** p) ** (1 / p)
        assert nrm <= float(R[k]) * (1 + 1e-10)
        # Stationarity: |y| - |x| = mu * p * |x|^{p-1} elementwise, with mu
        # in the solver's max-normalized units (scale^(2-p) converts back).
        scale = np.abs(np.asarray(Y[k])).max()
        res = (np.abs(Y[k]) - np.abs(x[k])
               - mu_n[k] * p * np.abs(x[k]) ** (p - 1.0) * scale ** (2.0 - p))
        assert np.abs(res).max() < 1e-8 * scale
