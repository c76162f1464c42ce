"""Tests for the 2D combiners: golden-oracle check + the reference's
cross-method agreement strategy (prox_tv_test.py:106-178)."""
import numpy as np
import pytest

import jax.numpy as jnp
from scipy.optimize import minimize

from proxtv_tpu.models import tv2d

METHODS = ["dr", "pd", "yang", "condat", "chambolle-pock", "chambolle-pock-acc",
           "kolmogorov"]


def _obj_2d(X, Y, w_col, w_row):
    fid = 0.5 * np.sum((X - Y) ** 2)
    col = np.sum(np.asarray(w_col) * np.abs(np.diff(X, axis=0)))
    row = np.sum(np.asarray(w_row) * np.abs(np.diff(X, axis=1)))
    return fid + col + row


def _oracle_2d(Y, w_col, w_row, eps=1e-9):
    """Smooth-approximation oracle via L-BFGS-B (|t| ~ sqrt(t^2+eps^2))."""
    M, N = Y.shape
    w_col = np.broadcast_to(w_col, (M - 1, N))
    w_row = np.broadcast_to(w_row, (M, N - 1))

    def fun(xf):
        X = xf.reshape(M, N)
        dc = np.diff(X, axis=0)
        dr = np.diff(X, axis=1)
        sc = np.sqrt(dc * dc + eps * eps)
        sr = np.sqrt(dr * dr + eps * eps)
        f = 0.5 * np.sum((X - Y) ** 2) + np.sum(w_col * sc) + np.sum(w_row * sr)
        g = (X - Y).copy()
        gc = w_col * dc / sc
        gr = w_row * dr / sr
        g[1:, :] += gc
        g[:-1, :] -= gc
        g[:, 1:] += gr
        g[:, :-1] -= gr
        return f, g.ravel()

    res = minimize(fun, Y.ravel(), jac=True, method="L-BFGS-B",
                   options={"maxiter": 20000, "ftol": 1e-16, "gtol": 1e-10})
    return res.x.reshape(M, N)


def test_dr_matches_oracle(rng):
    """DR beats the smooth L-BFGS oracle on objective and matches exact Dykstra
    elementwise (the oracle itself is only ~1e-2 accurate at the TV kinks)."""
    B, M, N = 2, 12, 10
    Y = rng.randn(B, M, N)
    lam = 0.4
    X, info = tv2d.tv1_2d_batched(jnp.asarray(Y), lam, method="dr", max_iters=500)
    Xpd, _ = tv2d.tv1_2d_batched(jnp.asarray(Y), lam, method="pd", max_iters=500)
    X = np.asarray(X)
    np.testing.assert_allclose(X, np.asarray(Xpd), atol=1e-4)
    for k in range(B):
        ref = _oracle_2d(Y[k], lam, lam)
        assert _obj_2d(X[k], Y[k], lam, lam) <= _obj_2d(ref, Y[k], lam, lam) + 1e-4


def test_all_methods_agree(rng):
    """Reference test_tv1_2d (prox_tv_test.py:106-116): all methods agree at
    high max_iters."""
    M, N = 9, 11
    Y = jnp.asarray(rng.randn(1, M, N))
    lam = 0.35
    sols = {}
    for m in METHODS:
        cap = 1000 if m in ("dr", "pd", "yang") else 2500
        X, _ = tv2d.tv1_2d_batched(Y, lam, method=m, max_iters=cap)
        sols[m] = np.asarray(X[0])
    base = sols["dr"]
    for m, s in sols.items():
        np.testing.assert_allclose(s, base, atol=1e-3, err_msg=m)


def test_weighted_uniform_equals_unweighted(rng):
    """Reference test_tv1_tv1w_2d (prox_tv_test.py:129-143)."""
    B, M, N = 2, 8, 7
    Y = jnp.asarray(rng.randn(B, M, N))
    lam = 0.6
    W_col = jnp.full((B, M - 1, N), lam)
    W_row = jnp.full((B, M, N - 1), lam)
    Xw, _ = tv2d.tv1w_2d_batched(Y, W_col, W_row, max_iters=300)
    Xu, _ = tv2d.tv1_2d_batched(Y, lam, method="dr", max_iters=300)
    np.testing.assert_allclose(np.asarray(Xw), np.asarray(Xu), atol=1e-6)


def test_weighted_small_inputs(rng):
    """Reference test_tv1w_2d_uniform_weights_small_input (prox_tv_test.py:146-166):
    tiny 2x2..4x4 problems, batched."""
    for (M, N) in [(2, 2), (2, 3), (3, 2), (3, 3), (4, 4)]:
        B = 32
        Y = jnp.asarray(100 * rng.randn(B, M, N))
        lam = rng.rand(B, 1, 1) * 2
        W_col = jnp.asarray(np.broadcast_to(lam, (B, M - 1, N)))
        W_row = jnp.asarray(np.broadcast_to(lam, (B, M, N - 1)))
        Xw, _ = tv2d.tv1w_2d_batched(Y, W_col, W_row, max_iters=300)
        # unweighted per-image lam: use weighted driver with uniform weights as
        # the cross-check against Dykstra
        Xp, _ = tv2d.tv1w_2d_batched(Y, W_col, W_row, max_iters=300, method="pd")
        np.testing.assert_allclose(np.asarray(Xw), np.asarray(Xp), atol=1e-4)


def test_tvp_2d_p1_equals_l1(rng):
    """Reference test_tv1_tvp_2d (prox_tv_test.py:119-126): p=1 == TV-L1."""
    Y = jnp.asarray(rng.randn(1, 8, 9))
    lam = 0.5
    Xp, _ = tv2d.tvp_2d_batched(Y, lam, lam, 1.0, 1.0, max_iters=300)
    X1, _ = tv2d.tv1_2d_batched(Y, lam, method="dr", max_iters=300)
    np.testing.assert_allclose(np.asarray(Xp), np.asarray(X1), atol=1e-6)


def test_zero_lam_identity(rng):
    Y = jnp.asarray(rng.randn(1, 6, 5))
    for m in ["dr", "pd", "yang"]:
        X, _ = tv2d.tv1_2d_batched(Y, 0.0, method=m)
        np.testing.assert_allclose(np.asarray(X), np.asarray(Y), atol=1e-10)


def test_info_reports_convergence(rng):
    Y = jnp.asarray(rng.randn(2, 10, 10))
    X, info = tv2d.tv1_2d_batched(Y, 0.3, method="dr", max_iters=200)
    assert np.all(np.asarray(info.rc) == 0)
    assert np.all(np.asarray(info.iters) <= 200)


def test_per_image_iters_differ(rng):
    """A batch with mixed convergence difficulty must report per-image
    iteration counts (reference per-solve info[], src/general.h:58-61)."""
    B, M, N = 2, 12, 11
    Y = np.zeros((B, M, N))
    Y[0] = 0.01 * rng.randn(M, N)          # converges almost immediately
    Y[1] = 5.0 * rng.randn(M, N)           # needs many sweeps
    X, info = tv2d.tv1_2d_batched(jnp.asarray(Y), 1.5, method="dr",
                                  max_iters=200)
    iters = np.asarray(info.iters)
    assert iters[0] < iters[1], iters


def test_unknown_method_errors(rng):
    Y = jnp.asarray(rng.randn(1, 6, 5))
    Wc = jnp.asarray(np.abs(rng.randn(1, 5, 5)))
    Wr = jnp.asarray(np.abs(rng.randn(1, 6, 4)))
    import pytest
    with pytest.raises(ValueError):
        tv2d.tv1w_2d_batched(Y, Wc, Wr, method="typo")
    with pytest.raises(ValueError):
        tv2d.tv1_2d_batched(Y, jnp.asarray([0.5]), method="typo")


def test_weighted_yang_uniform_equals_unweighted(rng):
    Y = jnp.asarray(rng.randn(2, 9, 8))
    lam = 0.6
    Wc = jnp.full((2, 8, 8), lam)
    Wr = jnp.full((2, 9, 7), lam)
    Xw, _ = tv2d.tv1w_2d_batched(Y, Wc, Wr, method="yang", max_iters=300)
    Xu, _ = tv2d.tv1_2d_batched(Y, lam, method="yang", max_iters=300)
    np.testing.assert_allclose(np.asarray(Xw), np.asarray(Xu), atol=1e-8)


def test_per_image_lambda_batch(rng):
    """(B,) per-image penalties route through the weighted drivers and match
    per-image scalar solves."""
    B, M, N = 3, 10, 9
    Y = rng.randn(B, M, N)
    lams = np.array([0.1, 0.5, 2.0])
    Xb, _ = tv2d.tv1_2d_batched(jnp.asarray(Y), jnp.asarray(lams),
                                method="dr", max_iters=300)
    for k in range(B):
        Xk, _ = tv2d.tv1_2d_batched(jnp.asarray(Y[k:k + 1]), float(lams[k]),
                                    method="dr", max_iters=300)
        np.testing.assert_allclose(np.asarray(Xb)[k], np.asarray(Xk)[0],
                                   atol=1e-4, err_msg=str(k))


def test_converged_images_frozen_batch_invariant(rng):
    """Converged images are frozen mid-batch (VERDICT r2 item 10), which
    makes each image's result *batch-invariant*: solving an easy image next
    to a hard one gives exactly the solo-solve answer, because the easy
    image's state stops updating at its own stopping test instead of riding
    the hard image's extra sweeps."""
    M, N = 12, 11
    Y = rng.randn(2, M, N)
    lams = np.array([0.05, 2.0])  # image 0 converges ~20x sooner
    Xb, infob = tv2d.tv1_2d_batched(jnp.asarray(Y), jnp.asarray(lams),
                                    method="dr", max_iters=300)
    for k in range(2):
        Xk, infok = tv2d.tv1_2d_batched(jnp.asarray(Y[k:k + 1]),
                                        jnp.asarray(lams[k:k + 1]),
                                        method="dr", max_iters=300)
        np.testing.assert_allclose(np.asarray(Xb)[k], np.asarray(Xk)[0],
                                   rtol=0, atol=1e-12, err_msg=str(k))
        assert int(infob.iters[k]) == int(infok.iters[0])
    assert int(infob.iters[0]) < int(infob.iters[1])


def test_weighted_kolmogorov_matches_pd(rng):
    """Weighted Kolmogorov (exact weighted column prox + per-edge dual clip
    — a weighted variant the reference lacks): agrees with weighted
    Proximal Dykstra at both engines' tolerances."""
    B, M, N = 1, 24, 20
    Y = jnp.asarray(rng.randn(B, M, N))
    Wc = jnp.asarray(0.3 + 0.4 * rng.rand(B, M - 1, N))
    Wr = jnp.asarray(0.3 + 0.4 * rng.rand(B, M, N - 1))
    xk, ik = tv2d.tv1w_2d_batched(Y, Wc, Wr, method="kolmogorov",
                                  max_iters=2000)
    xp, _ = tv2d.tv1w_2d_batched(Y, Wc, Wr, method="pd", max_iters=2000)
    np.testing.assert_allclose(np.asarray(xk), np.asarray(xp), atol=5e-3)
