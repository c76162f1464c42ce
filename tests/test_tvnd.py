"""Tests for the ND combiners and tvgen dispatch (reference
prox_tv_test.py:181-226)."""
import numpy as np
import pytest

import jax.numpy as jnp

from proxtv_tpu.models import tvnd, tv2d


def test_tvgen_1d_matches_specialized(rng):
    """Reference test_tvgen_1d (prox_tv_test.py:181-187)."""
    from proxtv_tpu.ops import tv1d_l1
    y = rng.randn(24)
    lam = 0.7
    x_gen, _ = tvnd.tvgen_dispatch(jnp.asarray(y), [lam], [1], [1.0])
    x_spec = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(y)[None], lam))[0]
    np.testing.assert_allclose(np.asarray(x_gen), x_spec, atol=1e-4)


def test_tvgen_2d_matches_specialized(rng):
    """Reference test_tvgen_2d (prox_tv_test.py:190-199)."""
    X = rng.randn(10, 9)
    lam = 0.4
    x_gen, _ = tvnd.tvgen_dispatch(jnp.asarray(X), [lam, lam], [1, 2], [1.0, 1.0],
                                   max_iters=500)
    x_2d, _ = tv2d.tv1_2d_batched(jnp.asarray(X)[None], lam, method="dr",
                                  max_iters=500)
    np.testing.assert_allclose(np.asarray(x_gen), np.asarray(x_2d)[0], atol=1e-3)


@pytest.mark.parametrize("method", ["pd", "pdr", "yang"])
def test_nd_methods_agree_2d(method, rng):
    """All ND engines agree with the 2D DR engine on a 2D problem."""
    X = jnp.asarray(rng.randn(1, 8, 7))
    lam = 0.5
    x_nd, _ = tvnd.tv_nd_batched(X, (lam, lam), (1, 2), (1.0, 1.0),
                                 max_iters=500, method=method)
    x_dr, _ = tv2d.tv1_2d_batched(X, lam, method="dr", max_iters=500)
    np.testing.assert_allclose(np.asarray(x_nd), np.asarray(x_dr), atol=2e-3,
                               err_msg=method)


def test_nd_smoke_3d_to_5d(rng):
    """Reference test_tvgen_nd (prox_tv_test.py:202-209): random ND tensors."""
    for dims in [(5, 4, 3), (4, 3, 3, 2), (3, 3, 2, 2, 2)]:
        X = jnp.asarray(rng.randn(1, *dims))
        k = len(dims)
        x, info = tvnd.tv_nd_batched(X, tuple([0.3] * k), tuple(range(1, k + 1)),
                                     tuple([1.0] * k), max_iters=50)
        assert np.isfinite(np.asarray(x)).all()
        # prox shrinks towards lower TV
        tv_in = tvnd.tv_value(np.asarray(X)[0], [1.0] * k, list(range(1, k + 1)),
                              [1.0] * k)
        tv_out = tvnd.tv_value(np.asarray(x)[0], [1.0] * k, list(range(1, k + 1)),
                               [1.0] * k)
        assert float(tv_out) <= float(tv_in)


def test_multireg_split_lambda(rng):
    """Reference test_tvgen_multireg (prox_tv_test.py:212-226): several
    penalties on the same dim with lambdas summing to a single-penalty lam."""
    X = jnp.asarray(rng.randn(1, 12, 8))
    x_multi, _ = tvnd.tv_nd_batched(
        X, (0.4, 0.3, 0.3, 0.7), (1, 1, 1, 2), (1.0, 1.0, 1.0, 1.0),
        max_iters=800)
    x_single, _ = tvnd.tv_nd_batched(X, (1.0, 0.7), (1, 2), (1.0, 1.0),
                                     max_iters=800)
    np.testing.assert_allclose(np.asarray(x_multi), np.asarray(x_single),
                               atol=1e-3)


def test_tv_value(rng):
    X = rng.randn(6, 5)
    v = tvnd.tv_value(X, [1.0, 2.0], [1, 2], [1.0, 2.0])
    expect = np.sum(np.abs(np.diff(X, axis=0))) + 2.0 * np.sum(
        np.sqrt(np.sum(np.diff(X, axis=1) ** 2, axis=1)))
    np.testing.assert_allclose(float(v), expect, rtol=1e-10)


def test_mixed_norm_penalties(rng):
    """Different p per dimension (the tvp 2D case) through the ND engine."""
    X = jnp.asarray(rng.randn(1, 9, 8))
    x_nd, _ = tvnd.tv_nd_batched(X, (0.5, 0.4), (1, 2), (2.0, 1.0), max_iters=400)
    x_2d, _ = tv2d.tvp_2d_batched(X, 0.5, 0.4, 2.0, 1.0, max_iters=400)
    np.testing.assert_allclose(np.asarray(x_nd), np.asarray(x_2d), atol=2e-3)


def test_tvgen_single_term_routes_direct(rng):
    """One penalty term short-circuits to the plain fiber prox."""
    from proxtv_tpu.ops import tv1d_l2
    X = rng.randn(5, 12)
    x, info = tvnd.tv_nd_batched(jnp.asarray(X)[None], (0.9,), (2,), (2.0,))
    ref, _ = tv1d_l2.tv2_ms(jnp.asarray(X), 0.9)
    np.testing.assert_allclose(np.asarray(x)[0], np.asarray(ref), atol=1e-8)


def test_tvgen_dispatch_2d_mixed_p(rng):
    """2D both-dims dispatch honors per-dim p (DR path)."""
    X = rng.randn(8, 9)
    x, _ = tvnd.tvgen_dispatch(jnp.asarray(X), [0.4, 0.3], [2, 1], [2.0, 1.0],
                               max_iters=300)
    from proxtv_tpu.models import tv2d
    ref, _ = tv2d.tvp_2d_batched(jnp.asarray(X)[None], 0.3, 0.4, 1.0, 2.0,
                                 max_iters=300)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref)[0], atol=1e-6)


def test_pd2_sequential_dykstra_3d(rng):
    """A 2-term 3D problem routed through sequential Dykstra (reference
    PD2_TV / solveTVgen.cpp:93-94) agrees with the parallel engines to the
    cross-method contract (VERDICT r2 item 6)."""
    Y = rng.randn(2, 6, 7, 8)
    ws, ds, ps = (0.35, 0.25), (1, 3), (1.0, 2.0)
    x_pd2, info2 = tvnd.tv_nd_batched(Y, ws, ds, ps, method="pd2")
    x_pd, _ = tvnd.tv_nd_batched(Y, ws, ds, ps, method="pd")
    x_pdr, _ = tvnd.tv_nd_batched(Y, ws, ds, ps, method="pdr")
    np.testing.assert_allclose(np.asarray(x_pd2), np.asarray(x_pd), atol=1e-3)
    np.testing.assert_allclose(np.asarray(x_pd2), np.asarray(x_pdr), atol=1e-3)
    assert np.asarray(info2.iters).shape == (2,)

    # tvgen_dispatch routes len(ws)==2 non-2D problems through pd2 (the
    # lock-step loop keeps improving converged batch elements, so a batch-1
    # solve differs from the same element inside a batch-2 solve by the
    # extra sweeps — compare at the convergence tolerance).
    x_gen, _ = tvnd.tvgen_dispatch(Y[0], ws, ds, ps)
    np.testing.assert_allclose(np.asarray(x_gen), np.asarray(x_pd2)[0],
                               atol=1e-4)

    # pd2 demands exactly two terms.
    import pytest
    with pytest.raises(ValueError):
        tvnd.tv_nd_batched(Y, (0.3, 0.3, 0.3), (1, 2, 3), (1.0, 1.0, 1.0),
                           method="pd2")
