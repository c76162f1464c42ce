"""Integration tests of the user-facing API surface (reference
prox_tv/__init__.py signatures and defaults)."""
import numpy as np

import proxtv_tpu as ptv
import oracles


def test_tv1_1d_all_methods(rng):
    x = rng.randn(40)
    ref = oracles.tv1w_oracle(x, np.full(39, 0.8))
    for m in ["classictautstring", "linearizedtautstring", "hybridtautstring",
              "pn", "condat", "dp", "condattautstring", "kolmogorov"]:
        out = ptv.tv1_1d(x, 0.8, method=m)
        np.testing.assert_allclose(out, ref, atol=1e-3, err_msg=m)


def test_tv1w_1d(rng):
    x = rng.randn(30)
    w = rng.rand(29)
    ref = oracles.tv1w_oracle(x, w)
    for m in ["tautstring", "pn", "dp"]:
        np.testing.assert_allclose(ptv.tv1w_1d(x, w, method=m), ref, atol=1e-3,
                                   err_msg=m)


def test_tv2_1d(rng):
    x = rng.randn(25)
    ref = oracles.tv2_oracle(x, 1.1)
    for m in ["ms", "pg", "mspg"]:
        np.testing.assert_allclose(ptv.tv2_1d(x, 1.1, method=m), ref, atol=2e-3,
                                   err_msg=m)


def test_tvp_1d(rng):
    x = rng.randn(20)
    ref = oracles.tvp_oracle(x, 0.7, 1.8)
    for m in ["gp", "fw", "gpfw", "ogp", "fista"]:
        np.testing.assert_allclose(ptv.tvp_1d(x, 0.7, 1.8, method=m), ref,
                                   atol=5e-3, err_msg=m)


def test_tv1_2d_methods(rng):
    X = rng.randn(10, 12)
    base = ptv.tv1_2d(X, 0.4, max_iters=800)
    for m in ["pd", "yang", "condat", "chambolle-pock", "kolmogorov"]:
        out = ptv.tv1_2d(X, 0.4, method=m, max_iters=2500)
        np.testing.assert_allclose(out, base, atol=2e-3, err_msg=m)


def test_tv1w_2d(rng):
    X = rng.randn(8, 9)
    lam = 0.5
    W_col = np.full((7, 9), lam)
    W_row = np.full((8, 8), lam)
    xw = ptv.tv1w_2d(X, W_col, W_row, max_iters=400)
    xu = ptv.tv1_2d(X, lam, max_iters=400)
    np.testing.assert_allclose(xw, xu, atol=1e-5)


def test_tvgen_and_value(rng):
    X = rng.randn(9, 8)
    out = ptv.tvgen(X, [0.4, 0.4], [1, 2], [1, 1], max_iters=400)
    base = ptv.tv1_2d(X, 0.4, max_iters=400)
    np.testing.assert_allclose(out, base, atol=2e-3)
    v = ptv.tv_value(X, [1.0], [1], [1.0])
    np.testing.assert_allclose(v, np.abs(np.diff(X, axis=0)).sum(), rtol=1e-10)


def test_return_info(rng):
    x = rng.randn(15)
    out, info = ptv.tv1_1d(x, 0.5, method="pn", return_info=True)
    assert hasattr(info, "iters") and hasattr(info, "gap") and hasattr(info, "rc")
    out2, info2 = ptv.tv1_2d(rng.randn(6, 7), 0.3, return_info=True)
    assert int(np.asarray(info2.iters)[0]) >= 1


def test_tvgen_nd_methods(rng):
    X = rng.randn(6, 5, 4)
    a = ptv.tvgen_nd(X, [0.3, 0.3, 0.3], [1, 2, 3], [1, 1, 1], max_iters=300,
                     method="pd")
    b = ptv.tvgen_nd(X, [0.3, 0.3, 0.3], [1, 2, 3], [1, 1, 1], max_iters=300,
                     method="pdr")
    c = ptv.tvgen_nd(X, [0.3, 0.3, 0.3], [1, 2, 3], [1, 1, 1], max_iters=300,
                     method="yang")
    np.testing.assert_allclose(a, b, atol=2e-3)
    np.testing.assert_allclose(a, c, atol=2e-3)


def test_tv1w_2d_int_weights(rng):
    """Reference test_tv1w_2d_emengd regression (prox_tv_test.py:169-178):
    integer weight matrices must be coerced, not crash."""
    X = rng.randn(6, 7)
    W_col = np.ones((5, 7), dtype=np.int64)
    W_row = np.ones((6, 6), dtype=np.int32)
    out = ptv.tv1w_2d(X, W_col, W_row, max_iters=50)
    assert np.isfinite(out).all()


def test_tv1_1d_int_weight_scalar():
    x = np.array([1.0, 5.0, 2.0, 4.0])
    out = ptv.tv1_1d(x, 1)  # int lam
    assert np.isfinite(out).all()


def test_tvgen_three_terms_mixed_norms(rng):
    """Three penalties with mixed norms through the generalized path."""
    X = rng.randn(7, 6, 5)
    out = ptv.tvgen(X, [0.2, 0.2, 0.1], [1, 2, 3], [1, 2, 1], max_iters=60)
    assert np.isfinite(out).all()
    v_in = ptv.tv_value(X, [1.0, 1.0, 1.0], [1, 2, 3], [1.0, 2.0, 1.0])
    v_out = ptv.tv_value(out, [1.0, 1.0, 1.0], [1, 2, 3], [1.0, 2.0, 1.0])
    assert v_out < v_in


def test_tv_polymorphic_weighted_2d(rng):
    """tv() with a pair of weight matrices -> weighted 2D (TV.m:30-48)."""
    Y = rng.randn(10, 12)
    Wc = rng.rand(9, 12) * 0.5
    Wr = rng.rand(10, 11) * 0.5
    out = ptv.tv(Y, [Wc, Wr])
    ref = ptv.tv1w_2d(Y, Wc, Wr)
    np.testing.assert_allclose(out, ref, atol=1e-10)
    # Dimensionality / p validation mirrors the reference's errors.
    import pytest
    with pytest.raises(ValueError):
        ptv.tv(rng.randn(8), [Wc, Wr])          # 1D signal, 2 weight arrays
    with pytest.raises(ValueError):
        ptv.tv(Y, [Wc, Wr, Wc])                  # 3 terms unsupported
    with pytest.raises(ValueError):
        ptv.tv(Y, [Wc, Wr], p=2)                 # weighted TV is L1-only


def test_tv_polymorphic_weighted_1d(rng):
    """tv() with a weight vector -> weighted 1D taut string (TV.m:51-68)."""
    y = rng.randn(25)
    w = rng.rand(24)
    np.testing.assert_allclose(ptv.tv(y, w), ptv.tv1w_1d(y, w), atol=1e-10)
    import pytest
    with pytest.raises(ValueError):
        ptv.tv(y, w[:-1])                        # wrong weight count
    with pytest.raises(ValueError):
        ptv.tv(rng.randn(5, 5), rng.rand(24))    # 2D signal, vector weights
    with pytest.raises(ValueError):
        ptv.tv(y, w, p=1.5)                      # weighted TV is L1-only


def test_tv_polymorphic_scalar_1d(rng):
    """tv() scalar branch: p-dispatch of the 1D solver (TVgenopt.cpp:30-57)."""
    y = rng.randn(30)
    np.testing.assert_allclose(ptv.tv(y, 0.7), ptv.tv1_1d(y, 0.7), atol=1e-6)
    np.testing.assert_allclose(ptv.tv(y, 0.7, p=2), ptv.tv2_1d(y, 0.7),
                               atol=1e-6)
    np.testing.assert_allclose(ptv.tv(y, 0.7, p=1.5), ptv.tvp_1d(y, 0.7, 1.5),
                               atol=1e-5)


def test_tv_polymorphic_scalar_nd(rng):
    """tv() scalar + ND branch: tvgen with lam/p per dimension (TV.m:79-80)."""
    Y = rng.randn(8, 9)
    out = ptv.tv(Y, 0.4)
    ref = ptv.tvgen(Y, [0.4, 0.4], [1, 2], [1.0, 1.0])
    np.testing.assert_allclose(out, ref, atol=1e-10)
    Z = rng.randn(4, 5, 6)
    out3, info3 = ptv.tv(Z, 0.3, return_info=True)
    ref3 = ptv.tvgen(Z, [0.3] * 3, [1, 2, 3], [1.0] * 3)
    np.testing.assert_allclose(out3, ref3, atol=1e-10)


def test_tv1_1d_explicit_method_honored_above_long_threshold(rng):
    """VERDICT r2 item 8: an explicit method must run the named engine even
    above the n > 16384 auto threshold (only method='auto' reroutes to the
    chunked certificate path), and both must agree."""
    n = 16500
    y = np.cumsum(rng.randn(n)) * 0.1
    x_auto, info = ptv.tv1_1d(y, 1.0, return_info=True, backend="tpu")
    x_dp = ptv.tv1_1d(y, 1.0, method="dp", backend="tpu")
    np.testing.assert_allclose(x_dp, x_auto, atol=1e-5)
    # maxbacktracks only reroutes under auto; an explicit taut method keeps
    # its engine (the batched scan never backtracks, so the bound is a no-op).
    x_t = ptv.tv1_1d(y[:200], 1.0, method="hybridtautstring", maxbacktracks=3,
                     backend="tpu")
    x_t2 = ptv.tv1_1d(y[:200], 1.0, method="hybridtautstring", backend="tpu")
    np.testing.assert_array_equal(x_t, x_t2)


def test_tv1_1d_auto_backend_routing(rng, monkeypatch):
    """backend='auto' policy: under method='auto' the native host engine
    serves only the short-signal latency tail — a long signal must reach the
    chunked certificate path (the documented n > 16384 auto route), while an
    *explicit* taut-string method keeps the host engine at any size."""
    from proxtv_tpu.ops import tv1d_long
    from proxtv_tpu.runtime import native

    if not native.available():
        import pytest

        pytest.skip("native host engine unavailable")

    calls = []
    real_long = tv1d_long.tv1_long
    real_host = native.tv1_host
    monkeypatch.setattr(tv1d_long, "tv1_long",
                        lambda *a, **k: calls.append("long") or real_long(*a, **k))
    monkeypatch.setattr(native, "tv1_host",
                        lambda *a, **k: calls.append("host") or real_host(*a, **k))

    n = 16500
    y = np.cumsum(rng.randn(n)) * 0.1
    ptv.tv1_1d(y, 1.0)                                  # auto, long -> chunked
    assert calls == ["long"], calls
    calls.clear()
    ptv.tv1_1d(y[:100], 1.0)                            # auto, short -> host
    assert calls == ["host"], calls
    calls.clear()
    ptv.tv1_1d(y, 1.0, method="hybridtautstring")       # explicit -> host
    assert calls == ["host"], calls


def test_tv1w_1d_explicit_method_honored_above_long_threshold(rng):
    n = 16500
    y = np.cumsum(rng.randn(n)) * 0.1
    w = np.full(n - 1, 1.0)
    x_auto = ptv.tv1w_1d(y, w, backend="tpu")
    x_ts = ptv.tv1w_1d(y, w, method="tautstring", backend="tpu")
    np.testing.assert_allclose(x_ts, x_auto, atol=1e-5)
