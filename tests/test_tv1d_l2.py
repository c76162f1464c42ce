"""Tests for the 1D TV-L2 engines: golden-oracle checks plus the reference's
cross-method agreement strategy (prox_tv_test.py:87-96)."""
import numpy as np
import pytest

import jax.numpy as jnp

from proxtv_tpu.ops import tv1d_l2
import oracles

SIZES = [2, 3, 7, 24, 65]


def _obj(x, y, lam):
    return 0.5 * np.sum((x - y) ** 2) + lam * np.linalg.norm(np.diff(x))


@pytest.mark.parametrize("engine", ["ms", "pg", "mspg"])
def test_engines_match_oracle(engine, rng):
    for n in SIZES:
        B = 6
        Y = rng.randn(B, n) * 2
        lam = float(rng.rand() + 0.2)
        X, info = tv1d_l2.tv2_batched(jnp.asarray(Y), lam, method=engine)
        X = np.asarray(X)
        for k in range(B):
            ref = oracles.tv2_oracle(Y[k], lam)
            assert _obj(X[k], Y[k], lam) <= _obj(ref, Y[k], lam) + 1e-5, (engine, n, k)
            np.testing.assert_allclose(X[k], ref, atol=2e-3)


def test_methods_agree_batched(rng):
    """Reference test_tv2_1d (prox_tv_test.py:87-96): ms/pg/mspg agree."""
    B, n = 16, 32
    y = jnp.asarray(rng.randn(B, n) * 2)
    lam = 0.9
    sols = {m: np.asarray(tv1d_l2.tv2_batched(y, lam, method=m)[0])
            for m in ["ms", "pg", "mspg"]}
    np.testing.assert_allclose(sols["ms"], sols["mspg"], atol=1e-3)
    np.testing.assert_allclose(sols["pg"], sols["mspg"], atol=1e-3)


def test_interior_case_gives_mean(rng):
    """Huge lam: the dual ball contains the unconstrained optimum -> x = mean(y)."""
    y = jnp.asarray(rng.randn(3, 9))
    m = np.mean(np.asarray(y), axis=-1)
    for method in ["ms", "mspg"]:
        x, info = tv1d_l2.tv2_batched(y, 1e6, method=method)
        np.testing.assert_allclose(np.asarray(x), m[:, None] * np.ones((1, 9)), atol=1e-8)
        assert np.all(np.asarray(info.rc) == 0)


def test_zero_lam_identity(rng):
    y = jnp.asarray(rng.randn(2, 8))
    for method in ["ms", "pg", "mspg"]:
        x, _ = tv1d_l2.tv2_batched(y, 0.0, method=method)
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-12)


def test_per_batch_lambda(rng):
    B, n = 4, 16
    Y = rng.randn(B, n)
    lams = np.array([0.1, 0.7, 2.0, 30.0])
    X, _ = tv1d_l2.tv2_ms(jnp.asarray(Y), jnp.asarray(lams))
    for k in range(B):
        ref = oracles.tv2_oracle(Y[k], lams[k])
        np.testing.assert_allclose(np.asarray(X)[k], ref, atol=2e-3)


def test_l2_long_signal_kkt(rng):
    """n = 60000 (far beyond any window/VMEM regime): the MS engine must
    still solve exactly — verified by the sharp KKT certificate.  At the
    optimum x = y + D'w with w = -lam * Dx / ||Dx||_2 (boundary case), and
    w is recoverable from x alone as the running sum of (x - y).
    Reference solves the same unbounded-n problem (src/TVL2opt.cpp:190)."""
    n = 60000
    y = np.cumsum(rng.randn(n)) * 0.05 + rng.randn(n)
    lam = 20.0
    x, info = tv1d_l2.tv2_ms(jnp.asarray(y)[None], lam)
    assert np.all(np.asarray(info.rc) == 0)
    x = np.asarray(x)[0]
    g = x[:-1] - x[1:]                      # primal2grad
    w = np.cumsum(x - y)[:-1]               # dual implied by the primal
    np.testing.assert_allclose(w, -lam * g / np.linalg.norm(g), atol=1e-6)


def test_l2_long_signal_spectral_path(rng):
    """n = 16384 (2n = 2^15 is FFT-friendly, n > 8192): the direct DST-I
    spectral secular path engages; its solution must satisfy the same sharp
    KKT certificate, and must agree with the chirp-z spectral path at the
    adjacent FFT-unfriendly size (which uses the Bluestein DST + one exact
    PCR back-solve)."""
    from proxtv_tpu.ops.tv1d_l2 import _fft_friendly

    n = 16384
    assert _fft_friendly(2 * n) and not _fft_friendly(2 * (n + 1))
    y = np.cumsum(rng.randn(n + 1)) * 0.05 + rng.randn(n + 1)
    lam = 10.0
    x, info = tv1d_l2.tv2_ms(jnp.asarray(y[:n])[None], lam)    # direct DST
    assert np.all(np.asarray(info.rc) == 0)
    xs = np.asarray(x)[0]
    g = xs[:-1] - xs[1:]
    w = np.cumsum(xs - y[:n])[:-1]
    np.testing.assert_allclose(w, -lam * g / np.linalg.norm(g), atol=1e-6)
    x2, info2 = tv1d_l2.tv2_ms(jnp.asarray(y)[None], lam)      # chirp-z DST
    assert np.all(np.asarray(info2.rc) == 0)
    xs2 = np.asarray(x2)[0]
    g2 = xs2[:-1] - xs2[1:]
    w2 = np.cumsum(xs2 - y)[:-1]
    np.testing.assert_allclose(w2, -lam * g2 / np.linalg.norm(g2), atol=1e-6)


def test_dst1_chirp_matches_direct(rng):
    """The Bluestein/chirp-z DST-I equals the odd-extension-rfft DST-I at
    FFT-friendly lengths (where both are defined) and is an involution at
    arbitrary (prime) lengths."""
    from proxtv_tpu.ops.tv1d_l2 import _dst1, _dst1_chirp

    for m in [5, 64, 1000, 4095]:
        x = jnp.asarray(rng.randn(2, m))
        np.testing.assert_allclose(np.asarray(_dst1_chirp(x)),
                                   np.asarray(_dst1(x)), atol=1e-12)
    x = jnp.asarray(rng.randn(1, 10007))  # prime length
    np.testing.assert_allclose(np.asarray(_dst1_chirp(_dst1_chirp(x))),
                               np.asarray(x), atol=1e-12)


def test_l2_spectral_chirp_nonfriendly_prime(rng):
    """A prime-ish n > 8192 (no FFT-friendly structure at all) solves via
    the chirp-z spectral path with the sharp KKT certificate."""
    n = 10007
    y = np.cumsum(rng.randn(n)) * 0.05 + rng.randn(n)
    lam = 8.0
    x, info = tv1d_l2.tv2_ms(jnp.asarray(y)[None], lam)
    assert np.all(np.asarray(info.rc) == 0)
    xs = np.asarray(x)[0]
    g = xs[:-1] - xs[1:]
    w = np.cumsum(xs - y)[:-1]
    np.testing.assert_allclose(w, -lam * g / np.linalg.norm(g), atol=1e-6)


def test_spectral_mixed_zero_lam_budget(rng):
    """ADVICE r3 (medium): a lam = 0 row in a mixed per-row-lam batch at a
    spectral-path size must not iterate at all (iters == 0, x == y) and must
    not exhaust the shared budget of rows that still need the real-space
    fallback (they must exit converged, rc == 0)."""
    n = 16384  # 2n = 2^15: spectral path engages
    Y = np.cumsum(rng.randn(3, n), axis=1) * 0.05 + rng.randn(3, n)
    lams = jnp.asarray([0.0, 10.0, 25.0])
    x, info = tv1d_l2.tv2_ms(jnp.asarray(Y), lams)
    x = np.asarray(x)
    iters = np.asarray(info.iters)
    assert iters[0] == 0, iters
    # exact up to the center/uncenter roundtrip (y - mean + mean)
    np.testing.assert_allclose(x[0], Y[0], rtol=0, atol=1e-12)
    assert np.all(np.asarray(info.rc) == 0), (np.asarray(info.rc), iters)
    for k in (1, 2):
        lam = float(lams[k])
        g = x[k, :-1] - x[k, 1:]
        w = np.cumsum(x[k] - Y[k])[:-1]
        np.testing.assert_allclose(w, -lam * g / np.linalg.norm(g), atol=1e-6)


def test_spectral_warm_start_reduces_iters(rng):
    """ADVICE r3 (low): the spectral path must honor the alpha warm start —
    re-solving the same problem from its own converged alpha takes (near)
    zero iterations."""
    n = 16384
    y = jnp.asarray(np.cumsum(rng.randn(1, n), axis=1) * 0.05
                    + rng.randn(1, n))
    lam = 10.0
    x1, info1, alpha = tv1d_l2.tv2_ms(y, lam, return_alpha=True)
    assert int(np.asarray(info1.iters)[0]) > 0
    x2, info2 = tv1d_l2.tv2_ms(y, lam, alpha_init=alpha)
    assert np.all(np.asarray(info2.rc) == 0)
    assert int(np.asarray(info2.iters)[0]) <= 1, np.asarray(info2.iters)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=1e-8)


def test_dst1_chirp_f32_large_length(rng):
    """The chirp phase tables are reduced mod 4(m+1) in integer arithmetic,
    so the f32/complex64 path keeps full phase accuracy at j ~ 1e6 (a naive
    float phase j^2 * a would be garbage there).  Involution check at a
    large non-smooth length in f32."""
    from proxtv_tpu.ops.tv1d_l2 import _dst1_chirp

    m = 999_983  # prime
    x = jnp.asarray(rng.randn(1, m).astype(np.float32))
    xx = np.asarray(_dst1_chirp(_dst1_chirp(x)))
    err = np.abs(xx - np.asarray(x)).max()
    assert err < 5e-4, err  # c64 FFT rounding only — no phase blow-up
