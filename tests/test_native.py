"""Tests for the native host runtime (C++ taut string via ctypes)."""
import numpy as np
import pytest

from proxtv_tpu.runtime import native
import oracles

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native host lib unavailable")


def test_tv1_host_matches_oracle(rng):
    for n in [2, 3, 7, 50, 400]:
        y = rng.randn(n) * 2
        lam = float(rng.rand() + 0.2)
        x = native.tv1_host(y, lam)
        ref = oracles.tv1w_oracle(y, np.full(n - 1, lam))
        np.testing.assert_allclose(x, ref, atol=1e-6, err_msg=str(n))


def test_tv1w_host_matches_oracle(rng):
    for n in [2, 5, 31, 200]:
        y = rng.randn(n) * 2
        w = rng.rand(n - 1) * 1.5
        x = native.tv1w_host(y, w)
        ref = oracles.tv1w_oracle(y, w)
        np.testing.assert_allclose(x, ref, atol=1e-6, err_msg=str(n))


def test_tv1_host_edge_cases(rng):
    y = rng.randn(9)
    np.testing.assert_allclose(native.tv1_host(y, 0.0), y, atol=1e-12)
    np.testing.assert_allclose(native.tv1_host(y, 1e6), np.mean(y), atol=1e-8)
    np.testing.assert_allclose(native.tv1_host(y[:1], 1.0), y[:1])


def test_batch_host(rng):
    Y = rng.randn(16, 64)
    X = native.tv1_batch_host(Y, 0.5, n_threads=2)
    for k in range(16):
        np.testing.assert_allclose(X[k], native.tv1_host(Y[k], 0.5), atol=1e-12)


def test_host_equals_jax_engines(rng):
    """Cross-implementation agreement: native host vs the JAX lock-step scan."""
    import jax.numpy as jnp
    from proxtv_tpu.ops import tv1d_l1
    Y = rng.randn(8, 40)
    lam = 0.8
    Xj = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(Y), lam))
    for k in range(8):
        np.testing.assert_allclose(native.tv1_host(Y[k], lam), Xj[k], atol=1e-8)


def test_fuzz_native_vs_jax_engines(rng):
    """Cross-implementation fuzz: native C++ taut string vs all three JAX
    engines on many random instances (sizes fixed per batch to bound compiles)."""
    import jax.numpy as jnp
    from proxtv_tpu.ops import tv1d_l1
    for n in [2, 3, 5, 17, 64]:
        B = 48
        Y = rng.randn(B, n) * (10 ** rng.uniform(-1, 1))
        lam = float(10 ** rng.uniform(-2, 1))
        X_host = np.stack([native.tv1_host(Y[k], lam) for k in range(B)])
        X_ts = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(Y), lam))
        X_dp = np.asarray(tv1d_l1.tv1_dp(jnp.asarray(Y), lam))
        X_pn = np.asarray(tv1d_l1.tv1_pn(jnp.asarray(Y), lam)[0])
        np.testing.assert_allclose(X_ts, X_host, atol=1e-8, err_msg=f"ts n={n}")
        np.testing.assert_allclose(X_dp, X_host, atol=1e-8, err_msg=f"dp n={n}")
        np.testing.assert_allclose(X_pn, X_host, atol=1e-3, err_msg=f"pn n={n}")


def test_fuzz_weighted_native_vs_jax(rng):
    """Weighted cross-implementation fuzz: per-edge weights incl. zeros
    (jump-preserving edges)."""
    import jax.numpy as jnp
    from proxtv_tpu.ops import tv1d_l1
    for n in [3, 9, 33]:
        B = 32
        Y = rng.randn(B, n) * 3
        W = rng.rand(B, n - 1) * 2
        W[rng.rand(B, n - 1) < 0.2] = 0.0  # zero-weight (free) edges
        X_host = np.stack([native.tv1w_host(Y[k], W[k]) for k in range(B)])
        X_ts = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(Y), jnp.asarray(W)))
        X_dp = np.asarray(tv1d_l1.tv1_dp(jnp.asarray(Y), jnp.asarray(W)))
        np.testing.assert_allclose(X_ts, X_host, atol=1e-8, err_msg=f"ts n={n}")
        np.testing.assert_allclose(X_dp, X_host, atol=1e-8, err_msg=f"dp n={n}")


def test_native_large_magnitude_endpoint(rng):
    """Code-review regression: large-magnitude signals can re-trigger an
    endpoint break from rounding noise (absolute 1e-15 tie thresholds); the
    restart guard must terminate instead of reading y[n]/lam[n-1] out of
    bounds.  Values must still match the JAX scan engine."""
    import jax.numpy as jnp

    from proxtv_tpu.ops import tv1d_l1

    for trial in range(50):
        n = int(rng.randint(3, 40))
        scale = 10.0 ** rng.randint(4, 9)
        y = (rng.randn(n) * scale).astype(np.float64)
        lam = float(rng.rand() * scale * 0.1)
        x = native.tv1_host(y, lam)
        ref = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(y)[None],
                                                jnp.asarray(lam)))[0]
        np.testing.assert_allclose(x, ref, rtol=1e-10, atol=1e-8 * scale)
        w = (rng.rand(n - 1) * scale * 0.1).astype(np.float64)
        xw = native.tv1w_host(y, w)
        refw = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(y)[None],
                                                 jnp.asarray(w)[None]))[0]
        np.testing.assert_allclose(xw, refw, rtol=1e-10, atol=1e-8 * scale)


def test_host_workspace_pool(rng):
    """The host workspace pool (reference Workspace analog) reuses its
    buffer across calls and returns correct results."""
    y1 = rng.randn(64)
    y2 = rng.randn(64)
    with native.HostWorkspace() as ws:
        x1 = native.tv1_host(y1, 0.5, ws=ws)
        ref1 = native.tv1_host(y1, 0.5)
        np.testing.assert_allclose(x1, ref1, atol=0)
        p1 = x1.ctypes.data
        x2 = native.tv1_host(y2, 0.5, ws=ws)
        assert x2.ctypes.data == p1          # same pool memory reused
        np.testing.assert_allclose(x2, native.tv1_host(y2, 0.5), atol=0)
