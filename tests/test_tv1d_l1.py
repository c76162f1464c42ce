"""Tests for the 1D TV-L1 engines: golden-oracle checks + the reference's
cross-method metamorphic strategy (prox_tv_test.py:37-62, :7-34).

Trials are batched at a few fixed shapes to keep XLA compile counts low.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from proxtv_tpu.ops import tv1d_l1, tridiag
import oracles

METHODS = ["classictautstring", "linearizedtautstring", "hybridtautstring",
           "pn", "condat", "dp", "condattautstring", "kolmogorov"]

SIZES = [2, 3, 7, 24]


def test_tridiag_solvers_match_dense(rng):
    n, B = 24, 4
    a = 2.0 + rng.rand(B, n)
    b = np.concatenate([np.zeros((B, 1)), -rng.rand(B, n - 1)], axis=1)
    c = np.concatenate([-rng.rand(B, n - 1), np.zeros((B, 1))], axis=1)
    d = rng.randn(B, n)
    x_pcr = np.asarray(tridiag.pcr_solve(jnp.array(a), jnp.array(b), jnp.array(c), jnp.array(d)))
    x_th = np.asarray(tridiag.thomas_solve(jnp.array(a), jnp.array(b), jnp.array(c), jnp.array(d)))
    for k in range(B):
        A = np.diag(a[k])
        for i in range(1, n):
            A[i, i - 1] = b[k, i]
            A[i - 1, i] = c[k, i - 1]
        x_ref = np.linalg.solve(A, d[k])
        np.testing.assert_allclose(x_pcr[k], x_ref, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(x_th[k], x_ref, rtol=1e-9, atol=1e-9)


def test_normalized_shifted_solve_matches_pcr(rng):
    """Normalized PCR (the long-signal TV-L2 solve engine) == general PCR
    on the shifted second-difference family, across sizes, per-row shifts,
    and the unshifted alpha = 0 edge."""
    for n in (1, 2, 3, 7, 8, 100, 1000, 4097):
        d = jnp.asarray(rng.randn(3, n))
        for alpha in (0.0, 0.013, 2.5):
            x1 = np.asarray(tridiag.spd_second_difference_solve(
                d, diag_shift=alpha))
            x2 = np.asarray(tridiag.spd_shifted_solve_normalized(d, alpha))
            np.testing.assert_allclose(x2, x1, rtol=1e-9, atol=1e-9)
    d = jnp.asarray(rng.randn(3, 257))
    alpha = jnp.asarray(rng.rand(3))[:, None]
    x1 = np.asarray(tridiag.spd_second_difference_solve(d, diag_shift=alpha))
    x2 = np.asarray(tridiag.spd_shifted_solve_normalized(d, alpha))
    np.testing.assert_allclose(x2, x1, rtol=1e-9, atol=1e-9)


def test_masked_second_difference_solve(rng):
    n, B = 12, 3
    rhs = rng.randn(B, n)
    mask = rng.rand(B, n) > 0.3
    mask[:, 0] = True
    out = np.asarray(tridiag.spd_second_difference_solve(jnp.array(rhs), mask=jnp.array(mask)))
    for k in range(B):
        A = np.eye(n)
        for i in range(n):
            if mask[k, i]:
                A[i, i] = 2.0
        for i in range(n - 1):
            if mask[k, i] and mask[k, i + 1]:
                A[i, i + 1] = A[i + 1, i] = -1.0
        ref = np.linalg.solve(A, np.where(mask[k], rhs[k], 0.0))
        np.testing.assert_allclose(out[k], np.where(mask[k], ref, 0.0), atol=1e-10)


def _run_engine(engine, y2, lam):
    if engine == "tautstring":
        return tv1d_l1.tv1_tautstring(y2, lam)
    if engine == "dp":
        return tv1d_l1.tv1_dp(y2, lam)
    return tv1d_l1.tv1_pn(y2, lam)[0]


@pytest.mark.parametrize("engine", ["tautstring", "dp", "pn"])
def test_engines_match_oracle(engine, rng):
    for n in SIZES:
        B = 8
        Y = rng.randn(B, n) * 2
        lam = float(rng.rand() + 0.3)
        X = np.asarray(_run_engine(engine, jnp.asarray(Y), lam))
        for k in range(B):
            ref = oracles.tv1w_oracle(Y[k], np.full(n - 1, lam))
            obj_x = oracles.tv1_objective(X[k], Y[k], lam)
            obj_ref = oracles.tv1_objective(ref, Y[k], lam)
            assert obj_x <= obj_ref + 1e-6, (engine, n, k, obj_x - obj_ref)
            np.testing.assert_allclose(X[k], ref, atol=5e-4)


@pytest.mark.parametrize("engine", ["tautstring", "dp", "pn"])
def test_weighted_engines_match_oracle(engine, rng):
    for n in SIZES:
        B = 8
        Y = rng.randn(B, n) * 2
        W = rng.rand(B, n - 1) * 1.5
        X = np.asarray(_run_engine(engine, jnp.asarray(Y), jnp.asarray(W)))
        for k in range(B):
            ref = oracles.tv1w_oracle(Y[k], W[k])
            obj_x = oracles.tv1w_objective(X[k], Y[k], W[k])
            obj_ref = oracles.tv1w_objective(ref, Y[k], W[k])
            assert obj_x <= obj_ref + 1e-6, (engine, n, k, obj_x - obj_ref)
            np.testing.assert_allclose(X[k], ref, atol=5e-4)


@pytest.mark.parametrize("engine", ["tautstring", "dp", "pn"])
def test_zero_weight_edges(engine, rng):
    """Edges with w_i == 0 decouple the signal; the PN active-set rule must
    keep them pinned (regression: treating them as inactive made the Newton
    step clip to zero and the solver exit stuck at a suboptimal point)."""
    B, n = 48, 24
    Y = rng.randn(B, n) * 2
    W = rng.rand(B, n - 1) * 1.5
    W[rng.rand(B, n - 1) < 0.3] = 0.0
    W[:8, :] = 0.0  # fully decoupled signals: prox must be the identity
    X = np.asarray(_run_engine(engine, jnp.asarray(Y), jnp.asarray(W)))
    np.testing.assert_allclose(X[:8], Y[:8], atol=1e-10)
    for k in range(B):
        ref = oracles.tv1w_oracle(Y[k], W[k])
        obj_x = oracles.tv1w_objective(X[k], Y[k], W[k])
        obj_ref = oracles.tv1w_objective(ref, Y[k], W[k])
        assert obj_x <= obj_ref + 1e-6, (engine, k, obj_x - obj_ref)
        np.testing.assert_allclose(X[k], ref, atol=5e-4)


def test_all_methods_agree_batched(rng):
    """Reference _test_tv1_methods: all methods agree within 1e-3 on random
    signals (prox_tv_test.py:55-62), here in one batched call.  strict=True
    guarantees each named engine actually runs (scan, classic hull-merge,
    Condat dual scan, DP, PN — five independent algorithm families)."""
    B, n = 20, 24
    y = jnp.asarray(rng.randn(B, n) * 2)
    lam = 0.75
    sols = {m: np.asarray(tv1d_l1.tv1_batched(y, lam, method=m, strict=True))
            for m in METHODS}
    base = sols["hybridtautstring"]
    for m, s in sols.items():
        np.testing.assert_allclose(s, base, atol=1e-3, err_msg=m)


def test_condat_engine_matches_oracle(rng):
    """The Condat dual-variable engine (independent algorithm family,
    src/condat_fast_tv.cpp:78) against the exact oracle, incl. tiny sizes."""
    for n in SIZES:
        B = 8
        Y = rng.randn(B, n) * 2
        lam = float(rng.rand() + 0.1)
        X = np.asarray(tv1d_l1.tv1_condat(jnp.asarray(Y), lam))
        for k in range(B):
            ref = oracles.tv1_oracle(Y[k], lam)
            np.testing.assert_allclose(X[k], ref, atol=1e-6, err_msg=f"n={n}")


def test_condat_engine_per_lane_lam_and_degenerate(rng):
    B, n = 6, 200
    Y = rng.randn(B, n)
    lams = jnp.asarray(np.concatenate([[0.0], 0.1 + rng.rand(B - 1) * 3]))
    X = np.asarray(tv1d_l1.tv1_condat(jnp.asarray(Y), lams))
    np.testing.assert_allclose(X[0], Y[0], atol=0)  # lam = 0: identity
    Xt = np.asarray(tv1d_l1.tv1_tautstring(
        jnp.asarray(Y), jnp.broadcast_to(lams[:, None], (B, n - 1))))
    np.testing.assert_allclose(X, Xt, atol=1e-10)
    with pytest.raises(ValueError):  # per-edge weights: unweighted algorithm
        tv1d_l1.tv1_condat(jnp.asarray(Y[:1]), jnp.ones((1, n - 1)))


def test_classic_tautstring_engine_matches_oracle(rng):
    """The classic hull-merge taut-string engine (fifth independent family,
    src/TVL1opt_tautstring.cpp:256) against the exact oracle, incl. tiny
    sizes."""
    for n in SIZES:
        B = 8
        Y = rng.randn(B, n) * 2
        lam = float(rng.rand() + 0.1)
        X = np.asarray(tv1d_l1.tv1_classic_ts(jnp.asarray(Y), lam))
        for k in range(B):
            ref = oracles.tv1_oracle(Y[k], lam)
            np.testing.assert_allclose(X[k], ref, atol=1e-6, err_msg=f"n={n}")


def test_classic_tautstring_per_lane_lam_and_degenerate(rng):
    B, n = 6, 200
    Y = rng.randn(B, n)
    lams = jnp.asarray(np.concatenate([[0.0], 0.1 + rng.rand(B - 1) * 3]))
    X = np.asarray(tv1d_l1.tv1_classic_ts(jnp.asarray(Y), lams))
    np.testing.assert_allclose(X[0], Y[0], atol=0)  # lam = 0: identity
    Xt = np.asarray(tv1d_l1.tv1_tautstring(
        jnp.asarray(Y), jnp.broadcast_to(lams[:, None], (B, n - 1))))
    np.testing.assert_allclose(X, Xt, atol=1e-10)
    with pytest.raises(ValueError):  # per-edge weights: unweighted algorithm
        tv1d_l1.tv1_classic_ts(jnp.asarray(Y[:1]), jnp.ones((1, n - 1)))


def test_classic_tautstring_plateaus_and_huge_lam(rng):
    """Hull merges degenerate hardest on plateaued signals (long pop runs);
    huge lam exercises the whole-signal collapse path."""
    plat = np.repeat(rng.randn(8), 25)[None, :] + 0.01 * rng.randn(1, 200)
    Y = jnp.asarray(plat)
    for lam in (0.05, 1.0, 1e4):
        x1 = np.asarray(tv1d_l1.tv1_classic_ts(Y, lam))
        x2 = np.asarray(tv1d_l1.tv1_tautstring(Y, lam))
        np.testing.assert_allclose(x1, x2, atol=1e-9, err_msg=f"lam={lam}")
    big = np.asarray(tv1d_l1.tv1_classic_ts(Y, 1e9))
    np.testing.assert_allclose(big, np.mean(plat), atol=1e-8)


def test_classic_tautstring_f32_tie_no_hang(rng):
    """Regression (round 5): at lam = 0 on plateau data in f32, the two
    hulls' merged sums round differently and a 1-ulp slope tie can fake a
    crossing between two SINGLE-segment hulls — geometrically impossible,
    and without the both-single guard the knot empties a deque and the
    lock-step loop spins until the TPU watchdog kills the worker."""
    truth = np.repeat(rng.randn(6), 30)
    noisy = (truth + 0.3 * rng.randn(truth.size)).astype(np.float32)
    y = jnp.asarray(noisy[None])
    for lam in (0.0, 1e-7, 0.5):
        x = np.asarray(tv1d_l1.tv1_classic_ts(y, lam))
        xs = np.asarray(tv1d_l1.tv1_tautstring(
            y, jnp.full((1, noisy.size - 1), lam, jnp.float32)))
        # 1e-4: f32 engines accumulating ~180-point cumsums in different
        # orders legitimately differ by a few ulp of the running sums.
        np.testing.assert_allclose(x, xs, atol=1e-4, err_msg=f"lam={lam}")
    np.testing.assert_allclose(
        np.asarray(tv1d_l1.tv1_classic_ts(y, 0.0)), noisy[None], atol=0)


def test_tv1_batched_routing_contract(rng, monkeypatch):
    """VERDICT r3 item 3: pin which engine runs for every (method, strict,
    gate) combination.  gating.gate is monkeypatched to simulate the
    single-device-TPU-f32 gate without hardware; the engines are stubbed
    with recorders."""
    from proxtv_tpu.ops.kernels import gating, pn_fused

    y = jnp.asarray(rng.randn(2, 16))
    calls = []

    def rec(name, ret):
        def f(*a, **k):
            calls.append(name)
            return ret
        return f

    monkeypatch.setattr(tv1d_l1, "tv1_tautstring", rec("scan", y))
    monkeypatch.setattr(tv1d_l1, "tv1_dp", rec("dp", y))
    monkeypatch.setattr(tv1d_l1, "tv1_condat", rec("condat", y))
    monkeypatch.setattr(tv1d_l1, "tv1_classic_ts", rec("classic", y))
    monkeypatch.setattr(tv1d_l1, "tv1_pn", rec("pn", (y, None)))
    monkeypatch.setattr(pn_fused, "pn_tv1_fused", rec("pn_fused", (y, None)))

    def run(method, strict, gate_open):
        calls.clear()
        monkeypatch.setattr(gating, "gate", lambda *a, **k: gate_open)
        tv1d_l1.tv1_batched(y, 0.5, method=method, strict=strict)
        assert len(calls) == 1, (method, strict, gate_open, calls)
        return calls[0]

    # Gate open (single-device TPU f32): auto policy coerces to the fused
    # PN kernel; strict honors the named engine.
    for m in ["hybridtautstring", "condattautstring",
              "linearizedtautstring", "tautstring"]:
        assert run(m, strict=False, gate_open=True) == "pn_fused"
        assert run(m, strict=True, gate_open=True) == "scan"
    for m in ["dp", "kolmogorov", "johnson"]:
        assert run(m, strict=False, gate_open=True) == "pn_fused"
        assert run(m, strict=True, gate_open=True) == "dp"
    assert run("condat", strict=False, gate_open=True) == "pn_fused"
    assert run("condat", strict=True, gate_open=True) == "condat"
    assert run("classictautstring", strict=False, gate_open=True) == "pn_fused"
    assert run("classictautstring", strict=True, gate_open=True) == "classic"
    # 'pn' IS the fused kernel's algorithm: fused either way when gated.
    assert run("pn", strict=False, gate_open=True) == "pn_fused"
    assert run("pn", strict=True, gate_open=True) == "pn_fused"

    # Gate closed (CPU / f64 / sharded / long fibers): the named engine
    # family runs regardless of strict.
    for strict in (False, True):
        assert run("hybridtautstring", strict, gate_open=False) == "scan"
        assert run("dp", strict, gate_open=False) == "dp"
        assert run("condat", strict, gate_open=False) == "condat"
        assert run("classictautstring", strict, gate_open=False) == "classic"
        assert run("pn", strict, gate_open=False) == "pn"


def test_uniform_weights_equals_unweighted(rng):
    """Reference test_tv1w_1d_uniform_weights incl. tiny edge sizes
    (prox_tv_test.py:18-34), batched per size."""
    for n in [2, 3, 4]:
        B = 64
        Y = jnp.asarray(100 * rng.randn(B, n))
        lam = 50 * rng.rand(B)
        W = jnp.asarray(np.repeat(lam[:, None], n - 1, axis=1))
        lamb = jnp.asarray(lam)
        a = np.asarray(tv1d_l1.tv1_tautstring(Y, W))
        b = np.asarray(tv1d_l1.tv1_tautstring(Y, lamb))
        np.testing.assert_allclose(a, b, atol=1e-10)
        c = np.asarray(tv1d_l1.tv1_dp(Y, W))
        d = np.asarray(tv1d_l1.tv1_dp(Y, lamb))
        np.testing.assert_allclose(c, d, atol=1e-10)
        np.testing.assert_allclose(a, c, atol=1e-8)


def test_edge_cases(rng):
    y = jnp.asarray(rng.randn(1, 7))
    # lam = 0 -> identity
    np.testing.assert_allclose(np.asarray(tv1d_l1.tv1_tautstring(y, 0.0)), np.asarray(y))
    np.testing.assert_allclose(np.asarray(tv1d_l1.tv1_dp(y, 0.0)), np.asarray(y), atol=1e-12)
    x, _ = tv1d_l1.tv1_pn(y, 0.0)
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-12)
    # huge lam -> mean
    m = float(np.mean(np.asarray(y)))
    for f in (lambda: tv1d_l1.tv1_tautstring(y, 1e6),
              lambda: tv1d_l1.tv1_dp(y, 1e6),
              lambda: tv1d_l1.tv1_pn(y, 1e6)[0]):
        np.testing.assert_allclose(np.asarray(f()), m, atol=1e-6)
    # n == 1
    y1 = jnp.asarray([[3.14]])
    np.testing.assert_allclose(np.asarray(tv1d_l1.tv1_tautstring(y1, 1.0)), 3.14)
    np.testing.assert_allclose(np.asarray(tv1d_l1.tv1_dp(y1, 1.0)), 3.14)


def test_int_input_coercion():
    """Reference test_tv1_1d_int (prox_tv_test.py:46-52): integer inputs work."""
    import proxtv_tpu

    x = np.array([1, 2, 3, 4, 5, 1, 2, 3], dtype=np.int64)
    out = proxtv_tpu.tv1_1d(x, 1)
    assert out.dtype.kind == "f"
    ref = oracles.tv1w_oracle(x.astype(float), np.full(7, 1.0))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_condat_per_edge_weight_policy(rng):
    """Code-review regression: method='condat' with per-edge weights —
    non-strict coerces to the taut-string engine (the alias policy);
    strict raises (the named algorithm is unweighted)."""
    B, n = 4, 64
    Y = jnp.asarray(rng.randn(B, n))
    W = jnp.asarray(0.5 + rng.rand(B, n - 1))
    x = tv1d_l1.tv1_batched(Y, W, method="condat")          # non-strict
    ref = tv1d_l1.tv1_tautstring(Y, W)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), atol=1e-12)
    with pytest.raises(ValueError):
        tv1d_l1.tv1_batched(Y, W, method="condat", strict=True)


def test_condat_engine_adversarial_patterns(rng):
    """Tie/plateau/monotone adversarial inputs for the Condat dual-variable
    engine vs the taut-string engine (both exact): constant signals,
    repeated values, alternating extremes, staircases, tie-at-lambda."""
    n = 120
    cases = [
        np.zeros(n),
        np.repeat(rng.randn(n // 8), 8),
        np.tile([1.0, -1.0], n // 2),
        np.arange(n, dtype=float),
        np.concatenate([np.full(n // 2, 1.0), np.full(n - n // 2, -1.0)]),
    ]
    # exact-tie construction: jump size exactly 2*lam between neighbors
    lam = 0.5
    cases.append(np.cumsum(np.tile([2 * lam, -2 * lam], n // 2))[:n])
    Y = jnp.asarray(np.stack(cases))
    xc = np.asarray(tv1d_l1.tv1_condat(Y, lam))
    xt = np.asarray(tv1d_l1.tv1_tautstring(Y, lam))
    np.testing.assert_allclose(xc, xt, atol=1e-12)
