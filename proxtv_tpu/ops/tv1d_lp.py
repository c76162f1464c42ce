"""Batched 1D TV-Lp proximity solvers for general p >= 1 (TPU-native).

Solves, for every signal in a batch,

    min_x 0.5 ||x - y||^2 + lam ||D x||_p

via the dual ball-constrained quadratic

    min_{||w||_q <= lam} 0.5 w' DD' w - w' dy,      q = p/(p-1),

(reference ``src/TVLPopt.cpp``).  Engines:

*   :func:`tvp_gp` — projected gradient with Lipschitz step 1/L, L = 4
    (reference ``GP_TVp`` :37, Lipschitz setup :45).
*   :func:`tvp_ogp` — optimized/strongly-convex momentum gradient using
    mu = 2 - 2 cos(pi/n) = lambda_min(DD') (reference ``OGP_TVp`` :295,
    mu at :436).
*   :func:`tvp_fista` — FISTA momentum over the projection (reference
    ``FISTA_TVp`` :583).
*   :func:`tvp_fw` — Frank-Wolfe with the closed-form Lp linear oracle and
    exact line search (reference ``FW_TVp`` :871, oracle ``solveLinearLP``).
*   :func:`tvp_gpfw` — the reference default hybrid: 1 GP step every
    ``cfg.fw_cycles`` FW steps; pure GP when p > ``cfg.p_gp_only``
    (reference ``GPFW_TVp`` :1111, fallback :1144-1145).

The q-ball projection is the monotone KKT root-find in
:mod:`proxtv_tpu.ops.lp` — unconditionally convergent, all full-width vector
ops — replacing the reference's inner projected-Newton prox (``PN_LPp``).

Closed-form exits mirror the reference (``src/TVLPopt.cpp:1193-1219``): the
unconstrained dual solution (tridiagonal solve) is used when it is inside the
ball (then x = mean(y)); p-degenerate regimes route to the exact TV-L1 / TV-L2
engines per the reference's p-clamping.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils import diffs
from ..utils.config import DEFAULT_TVP, TVpConfig
from ..utils.info import RC_ITERS, RC_OK, make_info
from ..utils.lpnorms import P_LARGE, P_SMALL, lp_norm
from . import lp, tridiag
from .kernels import gating

_L_LIPSCHITZ = 4.0  # lambda_max(DD') < 4 (reference src/TVLPopt.cpp:45)


def _lam_vec(lam, B, dtype):
    lam = jnp.asarray(lam, dtype)
    if lam.ndim == 0:
        return jnp.broadcast_to(lam, (B,))
    return lam.reshape(B)


def _gap_tvp(w, g, lam, p):
    """Duality gap lam * ||g||_p + w'g (Holder; == 0 at optimum), plus the
    magnitude of the two cancelling terms.  The gap's f32 measurement floor
    scales with that magnitude (~2x the TV term), NOT with 0.5||y||^2 — for
    large-scale data (e.g. a random walk at n = 1e6) the ||y||^2 floor
    overshoots by orders of magnitude and stops the solver ~500x early."""
    tv = lam * lp_norm(g, p)
    cross = jnp.sum(w * g, axis=-1)
    return jnp.abs(tv + cross), tv + jnp.abs(cross)


def _hess_mv(w):
    """DD' w as a stencil op (full-width, no matmul needed)."""
    return diffs.primal2grad(diffs.adjoint_diff(w))


def _tol_of(cfg, den, dtype):
    """Reference-parity stopping tolerance with a dtype-achievability floor
    scaled by the gap statistic's own cancellation magnitude ``den`` (see
    :func:`_gap_tvp`) — shared by the projected-gradient and Frank-Wolfe
    drivers so their stopping semantics cannot drift apart."""
    return jnp.maximum(jnp.asarray(cfg.stop, dtype),
                       10.0 * jnp.finfo(dtype).eps * jnp.maximum(1.0, den))


def _common_setup(y, lam, p):
    y = jnp.asarray(y)
    B, n = y.shape
    dtype = y.dtype
    lamv = _lam_vec(lam, B, dtype)
    # Center (translation equivariance; dual unchanged — see tv1d_l1.tv1_pn).
    ybar = jnp.mean(y, axis=-1, keepdims=True)
    y = y - ybar
    dy = diffs.forward_diff(y)
    q = lp.dual_p(p)
    if n == 1:
        # No edges: the engines' n == 1 guards return immediately; skip the
        # zero-width tridiagonal solve (it would build a (B, -1) operand).
        z0 = jnp.zeros((B, 0), dtype)
        return (y, ybar, B, n, dtype, lamv, z0, q, z0,
                jnp.zeros((B,), bool), lamv <= 0)
    # Closed-form exit: unconstrained solution inside the ball -> x = mean.
    w0 = tridiag.spd_second_difference_solve(dy)
    interior = (lp_norm(w0, q) <= lamv) & (lamv > 0)
    zero_pen = lamv <= 0
    return y, ybar, B, n, dtype, lamv, dy, q, w0, interior, zero_pen


def _finalize(y, ybar, w, lamv, p, interior, zero_pen, w0, iters, running):
    x = diffs.dual2primal(jnp.where(interior[:, None], w0, w), y)
    x = jnp.where(zero_pen[:, None], y, x)
    g = diffs.primal2grad(x)
    gap = jnp.where(interior | zero_pen, 0.0, _gap_tvp(w, g, lamv, p)[0])
    rc = jnp.where(running & ~interior & ~zero_pen, RC_ITERS, RC_OK).astype(jnp.int32)
    return x + ybar, make_info(iters, gap, rc)


def _run_projected(y, lam, p, cfg, max_iters, momentum, w_init=None,
                   mu_init=None, return_state=False):
    """Shared driver for GP / OGP / FISTA: projected (momentum) gradient
    with per-lane convergence masking under a single ``while_loop``.

    ``w_init`` / ``mu_init`` / ``return_state``: dual + KKT-multiplier warm
    start threading for combiners (see :func:`_run_fw`)."""
    (y, ybar, B, n, dtype, lamv, dy, q, w0, interior,
     zero_pen) = _common_setup(y, lam, p)
    if n == 1:
        info1 = make_info(jnp.zeros((B,), jnp.int32), jnp.zeros((B,), dtype),
                          jnp.zeros((B,), jnp.int32))
        if return_state:
            return y + ybar, info1, (jnp.zeros((B, 0), dtype),
                                     jnp.ones((B,), dtype))
        return y + ybar, info1
    cap = int(max_iters) if max_iters else cfg.max_iters
    step = jnp.asarray(1.0 / _L_LIPSCHITZ, dtype)

    def tol_of(den):
        return _tol_of(cfg, den, dtype)

    if momentum == "ogp":
        # mu-strongly-convex momentum (reference OGP_TVp :436: mu =
        # 2 - 2cos(pi/(nn+1)) with nn = n-1 the DUAL dimension, i.e.
        # lambda_min of the (n-1)-dim DD') — pi/n, not pi/(n+1).
        mu_sc = 2.0 - 2.0 * jnp.cos(jnp.pi / n)
        kappa = _L_LIPSCHITZ / mu_sc
        beta_const = (jnp.sqrt(kappa) - 1.0) / (jnp.sqrt(kappa) + 1.0)
    else:
        beta_const = None

    def body(state):
        w, z, t, mu, gap, iters, running = state
        grad = _hess_mv(z) - dy
        # Warm-started projection: the KKT multiplier barely moves between
        # gradient steps (reference Workspace warm restart analog).
        w_new, mu_new = lp.lp_ball_project_ws(z - step * grad, lamv, q, mu)
        if momentum == "gp":
            z_new, t_new = w_new, t
        elif momentum == "ogp":
            z_new = w_new + beta_const * (w_new - w)
            t_new = t
        else:  # fista
            t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            z_new = w_new + ((t - 1.0) / t_new)[:, None] * (w_new - w)
        x = diffs.dual2primal(w_new, y)
        g = diffs.primal2grad(x)
        gap_new, den = _gap_tvp(w_new, g, lamv, p)

        w = jnp.where(running[:, None], w_new, w)
        z = jnp.where(running[:, None], z_new, z)
        t = jnp.where(running, t_new, t)
        mu = jnp.where(running, mu_new, mu)
        gap = jnp.where(running, gap_new, gap)
        iters = iters + running.astype(jnp.int32)
        running = running & (gap > tol_of(den))
        return w, z, t, mu, gap, iters, running

    def cond(state):
        *_, iters, running = state
        return jnp.any(running) & (jnp.max(iters) < cap)

    if w_init is None:
        w_start, mu0 = lp.lp_ball_project_ws(w0, lamv, q, None)
    else:
        w_start, mu0 = lp.lp_ball_project_ws(jnp.asarray(w_init, dtype),
                                             lamv, q, mu_init)
    if mu0 is None:
        mu0 = jnp.ones((B,), dtype)
    x0 = diffs.dual2primal(w_start, y)
    gap0, den0 = _gap_tvp(w_start, diffs.primal2grad(x0), lamv, p)
    running0 = (gap0 > tol_of(den0)) & ~interior & ~zero_pen
    t0 = jnp.ones((B,), dtype)
    w, _, _, mu, gap, iters, running = jax.lax.while_loop(
        cond, body, (w_start, w_start, t0, mu0, gap0,
                     jnp.zeros((B,), jnp.int32), running0))
    out = _finalize(y, ybar, w, lamv, p, interior, zero_pen, w0, iters,
                    running)
    if return_state:
        return out + ((w, mu),)
    return out


@functools.partial(jax.jit, static_argnames=("p", "cfg", "max_iters",
                                              "return_state"))
def tvp_gp(y, lam, p: float, cfg: TVpConfig = DEFAULT_TVP, max_iters: int = 0,
           w_init=None, mu_init=None, return_state: bool = False):
    """Projected-gradient TV-Lp prox (reference GP_TVp)."""
    return _run_projected(y, lam, p, cfg, max_iters, "gp", w_init=w_init,
                          mu_init=mu_init, return_state=return_state)


@functools.partial(jax.jit, static_argnames=("p", "cfg", "max_iters"))
def tvp_ogp(y, lam, p: float, cfg: TVpConfig = DEFAULT_TVP, max_iters: int = 0):
    """Optimized (strongly-convex momentum) gradient TV-Lp prox (reference OGP_TVp)."""
    return _run_projected(y, lam, p, cfg, max_iters, "ogp")


@functools.partial(jax.jit, static_argnames=("p", "cfg", "max_iters"))
def tvp_fista(y, lam, p: float, cfg: TVpConfig = DEFAULT_TVP, max_iters: int = 0):
    """FISTA TV-Lp prox (reference FISTA_TVp)."""
    return _run_projected(y, lam, p, cfg, max_iters, "fista")


def _fw_direction(w, grad, lamv, q):
    """Frank-Wolfe atom + exact line search step for the dual quadratic."""
    s = lp.solve_linear_lp(grad, lamv, q)
    d = s - w
    num = -jnp.sum(grad * d, axis=-1)
    den = jnp.sum(d * _hess_mv(d), axis=-1)
    gamma = jnp.where(den > 0, jnp.clip(num / jnp.maximum(den, 1e-300), 0.0, 1.0),
                      jnp.where(num > 0, 1.0, 0.0))
    return d, gamma, num


@functools.partial(jax.jit, static_argnames=("p", "cfg", "max_iters",
                                              "gp_every", "return_state"))
def _run_fw(y, lam, p: float, cfg: TVpConfig, max_iters: int, gp_every: int,
            w_init=None, mu_init=None, return_state: bool = False):
    """Shared FW / GPFW driver.  ``gp_every == 0`` -> pure FW; otherwise one GP
    step every ``gp_every`` iterations (reference FW_CYCLES_TVLP = 10).

    ``w_init`` / ``mu_init``: optional dual vector and KKT-multiplier warm
    starts (the reference Workspace warm-restart analog); combiners thread
    them across outer sweeps.  With ``return_state`` the final ``(w, mu)``
    pair is appended to the return tuple."""
    (y, ybar, B, n, dtype, lamv, dy, q, w0, interior,
     zero_pen) = _common_setup(y, lam, p)
    if n == 1:
        info1 = make_info(jnp.zeros((B,), jnp.int32), jnp.zeros((B,), dtype),
                          jnp.zeros((B,), jnp.int32))
        if return_state:
            return y + ybar, info1, (jnp.zeros((B, 0), dtype),
                                     jnp.ones((B,), dtype))
        return y + ybar, info1
    cap = int(max_iters) if max_iters else cfg.max_iters_fw
    step = jnp.asarray(1.0 / _L_LIPSCHITZ, dtype)

    def tol_of(den):
        return _tol_of(cfg, den, dtype)

    def body(state):
        w, mu, gap, iters, k, running = state
        grad = _hess_mv(w) - dy
        d, gamma, fw_gap = _fw_direction(w, grad, lamv, q)
        w_fw = w + gamma[:, None] * d
        if gp_every:
            # The GP cycle index k is a *scalar*, so lax.cond skips the
            # expensive warm-started projection entirely on the FW cycles
            # (the reference similarly only projects every FW_CYCLES_TVLP-th
            # iteration, src/TVLPopt.cpp:1252).
            def gp_branch(_):
                return lp.lp_ball_project_ws(w - step * grad, lamv, q, mu)

            def fw_branch(_):
                return w_fw, mu

            w_new, mu_new = jax.lax.cond((k % gp_every) == 0,
                                         gp_branch, fw_branch, None)
        else:
            w_new, mu_new = w_fw, mu
        x = diffs.dual2primal(w_new, y)
        g = diffs.primal2grad(x)
        gap_new, den = _gap_tvp(w_new, g, lamv, p)

        w = jnp.where(running[:, None], w_new, w)
        mu = jnp.where(running, mu_new, mu)
        gap = jnp.where(running, gap_new, gap)
        iters = iters + running.astype(jnp.int32)
        # FW duality gap (-grad'd) is also a certificate; stop on either.
        tol_i = tol_of(den)
        running = running & (gap > tol_i) & (fw_gap > tol_i)
        return w, mu, gap, iters, k + 1, running

    def cond(state):
        *_, iters, _, running = state
        return jnp.any(running) & (jnp.max(iters) < cap)

    if w_init is None:
        w_start, mu0 = lp.lp_ball_project_ws(w0, lamv, q, None)
    else:
        w_start, mu0 = lp.lp_ball_project_ws(jnp.asarray(w_init, dtype),
                                             lamv, q, mu_init)
    if mu0 is None:
        mu0 = jnp.ones((B,), dtype)
    x0 = diffs.dual2primal(w_start, y)
    gap0, den0 = _gap_tvp(w_start, diffs.primal2grad(x0), lamv, p)
    running0 = (gap0 > tol_of(den0)) & ~interior & ~zero_pen
    w, mu, gap, iters, _, running = jax.lax.while_loop(
        cond, body,
        (w_start, mu0, gap0, jnp.zeros((B,), jnp.int32), jnp.int32(1),
         running0))
    out = _finalize(y, ybar, w, lamv, p, interior, zero_pen, w0, iters,
                    running)
    if return_state:
        return out + ((w, mu),)
    return out


def tvp_fw(y, lam, p: float, cfg: TVpConfig = DEFAULT_TVP, max_iters: int = 0):
    """Frank-Wolfe TV-Lp prox (reference FW_TVp)."""
    return _run_fw(y, lam, p, cfg, max_iters, 0)


def _fused_lp_ok(y, p: float) -> bool:
    """Route the GPFW driver to the fused Pallas kernel: TPU, f32, n within
    the VMEM window, and the dual exponent q = p/(p-1) inside the joint-KKT
    Newton's always-converges range ([1.12, 3.1] in f32, the same gate as
    ``lp._lp_ball_project_general``) — p in ~[1.47, 9.3]."""
    if p <= P_SMALL or p >= P_LARGE or p == 2.0:
        return False
    q = lp.dual_p(p)
    return 1.12 <= q <= 3.1 and y.shape[-1] >= 2 and gating.gate(y, "lp")


def _run_gpfw_fused(y, lam, p: float, cfg: TVpConfig, max_iters: int,
                    w_init=None, mu_init=None, return_state: bool = False):
    """GPFW driver with the iteration loop fused into one Pallas kernel
    (:mod:`proxtv_tpu.ops.kernels.lp_fused`): the exact setup/finalize
    (centering, unconstrained tridiagonal dual, interior / zero-penalty
    exits, primal reconstruction) stay in XLA; the many-iteration hybrid
    FW/GP loop runs VMEM-resident.  Same stopping contract (Holder duality
    gap <= cfg.stop relative tolerance) as :func:`_run_fw`; iteration counts
    are reported at fw-cycle granularity."""
    from .kernels import lp_fused

    (y, ybar, B, n, dtype, lamv, dy, q, w0, interior,
     zero_pen) = _common_setup(y, lam, p)
    cap = int(max_iters) if max_iters else cfg.max_iters_fw
    if w_init is None:
        w_start, mu0 = lp.lp_ball_project_ws(w0, lamv, q, None)
    else:
        w_start, mu0 = lp.lp_ball_project_ws(jnp.asarray(w_init, dtype),
                                             lamv, q, mu_init)
    if mu0 is None:
        mu0 = jnp.ones((B,), dtype)
    run_mask = (~interior & ~zero_pen).astype(dtype)
    w_pad = jnp.concatenate([w_start, jnp.zeros((B, 1), dtype)], axis=-1)
    w_k, mu, _gap, it_f = lp_fused.gpfw_fused(
        y, w_pad, lamv, mu0, run_mask, p=p, max_iters=cap,
        fw_cycles=cfg.fw_cycles, stop_rel=cfg.stop)
    w = w_k[:, : n - 1]
    iters = jnp.floor(it_f).astype(jnp.int32)
    running = (it_f - jnp.floor(it_f)) > 0.25  # kernel's still-running marker
    out = _finalize(y, ybar, w, lamv, p, interior, zero_pen, w0, iters,
                    running)
    if return_state:
        return out + ((w, mu),)
    return out


def tvp_gpfw(y, lam, p: float, cfg: TVpConfig = DEFAULT_TVP,
             max_iters: int = 0, w_init=None, mu_init=None,
             return_state: bool = False):
    """Hybrid GP+FW TV-Lp prox, the reference default (GPFW_TVp).

    Falls back to pure GP for p > cfg.p_gp_only (reference :1144-1145: the FW
    oracle's |g|^{p-1} powers are ill-conditioned at large p).  ``w_init`` /
    ``mu_init`` / ``return_state``: warm-start threading for combiners.

    On TPU/f32 with q = p/(p-1) in the joint-KKT range, the whole iteration
    loop runs as ONE fused Pallas kernel (ops/kernels/lp_fused.py)."""
    y = jnp.asarray(y)
    if _fused_lp_ok(y, p):
        return _run_gpfw_fused(y, lam, p, cfg, max_iters, w_init=w_init,
                               mu_init=mu_init, return_state=return_state)
    if p > cfg.p_gp_only:
        return tvp_gp(y, lam, p, cfg=cfg, max_iters=max_iters, w_init=w_init,
                      mu_init=mu_init, return_state=return_state)
    return _run_fw(y, lam, p, cfg, max_iters, cfg.fw_cycles, w_init=w_init,
                   mu_init=mu_init, return_state=return_state)


def tvp_batched(y, lam, p: float, method: str = "gpfw",
                cfg: TVpConfig = DEFAULT_TVP, max_iters: int = 0):
    """Method dispatch mirroring the reference (prox_tv/__init__.py:311-352),
    with the p-degenerate regimes routed to the exact specialized engines."""
    p = float(p)
    if p <= P_SMALL:
        # p ~ 1: exact TV-L1 (reference clamps p <= 1.002 to L1).
        from . import tv1d_l1
        x = tv1d_l1.tv1_tautstring(y, lam)
        B = x.shape[0]
        return x, make_info(jnp.zeros((B,), jnp.int32),
                            jnp.zeros((B,), x.dtype), jnp.zeros((B,), jnp.int32))
    if p == 2.0:
        from . import tv1d_l2
        return tv1d_l2.tv2_ms(y, lam)
    method = method.lower()
    if method == "gp":
        return tvp_gp(y, lam, p, cfg=cfg, max_iters=max_iters)
    if method == "ogp":
        return tvp_ogp(y, lam, p, cfg=cfg, max_iters=max_iters)
    if method == "fista":
        return tvp_fista(y, lam, p, cfg=cfg, max_iters=max_iters)
    if method == "fw":
        return tvp_fw(y, lam, p, cfg=cfg, max_iters=max_iters)
    if method == "gpfw":
        return tvp_gpfw(y, lam, p, cfg=cfg, max_iters=max_iters)
    raise ValueError(f"Unknown TV-Lp method: {method!r}")
