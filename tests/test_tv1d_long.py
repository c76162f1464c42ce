"""Tests for the chunked long-signal TV-L1 path (ops/tv1d_long.py):
glue+polish must be *exact* (certified by the polish duality gap), matching
the sequential scan engine on signals much longer than one chunk."""
import numpy as np

import jax.numpy as jnp

from proxtv_tpu.ops import tv1d_l1, tv1d_long


def _check(y, lam, chunk, overlap, atol=1e-8):
    x, info = tv1d_long.tv1_long(jnp.asarray(y), lam, chunk=chunk,
                                 overlap=overlap)
    lam2 = lam[None] if np.ndim(lam) == 1 else lam
    ref = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(y)[None],
                                            jnp.asarray(lam2)))[0]
    np.testing.assert_allclose(np.asarray(x), ref, atol=atol)
    assert np.all(np.asarray(info.rc) == 0), np.asarray(info.gap)


def test_long_matches_scan(rng):
    n = 5000
    y = np.cumsum(rng.randn(n)) * 0.05 + rng.randn(n)
    _check(y, 0.7, chunk=512, overlap=128)


def test_long_weighted(rng):
    n = 3000
    y = np.cumsum(rng.randn(n)) * 0.05 + rng.randn(n)
    w = 0.5 + rng.rand(n - 1)
    _check(y, jnp.asarray(w), chunk=512, overlap=128)


def test_long_heavy_smoothing(rng):
    """Large lam -> segments span many chunks; the polish phase must still
    deliver the exact solution (the overlap heuristic only buys speed)."""
    n = 4000
    y = rng.randn(n)
    _check(y, 25.0, chunk=256, overlap=64, atol=1e-6)


def test_long_batched(rng):
    """(S, n) batch: every signal matches its own single-signal solve."""
    n, S = 3000, 3
    Y = np.cumsum(rng.randn(S, n), axis=1) * 0.05 + rng.randn(S, n)
    X, info = tv1d_long.tv1_long(jnp.asarray(Y), 0.7, chunk=512, overlap=128)
    assert X.shape == (S, n) and np.all(np.asarray(info.rc) == 0)
    for s in range(S):
        xs, _ = tv1d_long.tv1_long(jnp.asarray(Y[s]), 0.7, chunk=512,
                                   overlap=128)
        np.testing.assert_allclose(np.asarray(X[s]), np.asarray(xs),
                                   atol=1e-10)


def test_long_batched_per_edge_weights(rng):
    n, S = 2000, 2
    Y = np.cumsum(rng.randn(S, n), axis=1) * 0.05 + rng.randn(S, n)
    W = 0.5 + rng.rand(S, n - 1)
    X, info = tv1d_long.tv1_long(jnp.asarray(Y), jnp.asarray(W), chunk=512,
                                 overlap=128)
    for s in range(S):
        ref = np.asarray(tv1d_l1.tv1_tautstring(
            jnp.asarray(Y[s])[None], jnp.asarray(W[s])[None]))[0]
        np.testing.assert_allclose(np.asarray(X[s]), ref, atol=1e-8)


def test_long_short_input_passthrough(rng):
    y = rng.randn(100)
    x, info = tv1d_long.tv1_long(jnp.asarray(y), 0.5)
    ref = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(y)[None], 0.5))[0]
    np.testing.assert_allclose(np.asarray(x), ref, atol=1e-8)


def test_long_plateau_seams(rng):
    """Plateau-structured signal whose flats span window seams: the
    escalation ladder (stall-resume + seam-jitter stitch + PGD + snap, then
    polish if needed) must hit the scan engine's objective at the 1e-5
    relative contract WITH rc = 0 (VERDICT r2 item 2 — the round-2 build
    exited rc = 2 above the contract here)."""
    n = 20000
    y = (np.repeat(rng.randn(n // 200), 200)
         + 0.1 * rng.randn(n))
    lam = 5.0
    x, info = tv1d_long.tv1_long(jnp.asarray(y), lam, chunk=512, overlap=64)
    assert np.all(np.asarray(info.rc) == 0), np.asarray(info.gap)
    ref = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(y)[None],
                                            jnp.asarray(lam)))[0]
    def obj(z):
        return 0.5 * ((z - y) ** 2).sum() + lam * np.abs(np.diff(z)).sum()
    rel = (obj(np.asarray(x)) - obj(ref)) / obj(ref)
    assert rel <= 1e-8, rel


def test_long_plateau_every_seam_in_flat(rng):
    """Adversarial geometry from PARITY.md: every window seam lands inside a
    flat (flat length < chunk/2, seams at multiples of chunk).  The
    seam-jitter rung must certify rc = 0 at <= 1e-5 relative objective."""
    chunk, overlap = 512, 64
    n = 16 * chunk
    flat = 200  # < chunk/2, so every flat is interior to one of the 2 grids
    y = np.repeat(rng.randn(-(-n // flat)), flat)[:n] + 0.1 * rng.randn(n)
    lam = 5.0
    x, info = tv1d_long.tv1_long(jnp.asarray(y), lam, chunk=chunk,
                                 overlap=overlap)
    assert np.all(np.asarray(info.rc) == 0), np.asarray(info.gap)
    ref = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(y)[None],
                                            jnp.asarray(lam)))[0]
    def obj(z):
        return 0.5 * ((z - y) ** 2).sum() + lam * np.abs(np.diff(z)).sum()
    rel = (obj(np.asarray(x)) - obj(ref)) / obj(ref)
    assert rel <= 1e-5, rel


def test_long_batched_shared_weight_vector(rng):
    """Code-review regression: an (S, n) batch with one SHARED (n-1,)
    per-edge weight vector (documented input) crashed the window reshape
    for S > 1; it must solve and match per-signal solves."""
    S, n = 3, 4096
    Y = np.cumsum(rng.randn(S, n), axis=1) * 0.05 + rng.randn(S, n)
    w = 0.3 + rng.rand(n - 1)
    x, info = tv1d_long.tv1_long(jnp.asarray(Y), jnp.asarray(w),
                                 chunk=512, overlap=64)
    assert np.all(np.asarray(info.rc) == 0)
    for s in range(S):
        xs, _ = tv1d_long.tv1_long(jnp.asarray(Y[s]), jnp.asarray(w),
                                   chunk=512, overlap=64)
        np.testing.assert_allclose(np.asarray(x[s]), np.asarray(xs),
                                   atol=1e-10)
