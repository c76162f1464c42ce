"""Batched 2D anisotropic-TV proximity combiners (TPU-native).

Solves, for every image in a batch,

    min_X 0.5 ||X - Y||_F^2 + w_col * colTV_p(X) + w_row * rowTV_p(X)

where colTV/rowTV are sums of 1D TV penalties over every column/row fiber.
The reference's multidimensional layer (``src/TV2Dopt.cpp``, ``TV2DWopt.cpp``)
runs OpenMP threads over fibers; here fibers are a *batch axis* — each
row/column pass is ONE batched 1D prox call on a (B*fibers, len) array, the
layout change handled by XLA transposes.

Engines (method-name strings match the reference Python layer,
prox_tv/__init__.py:355-443):

*   ``pd`` — Proximal Dykstra for two penalty terms (reference ``PD2_TV``,
    src/TV2Dopt.cpp:59).  Converges to the exact prox of the sum.
*   ``dr`` — the default splitting (reference ``DR2_TV``, src/TV2Dopt.cpp:352).
    TPU redesign: Davis-Yin three-operator splitting with the quadratic term
    kept as the smooth operator — same fixed point, no final correction
    projection needed (the reference needs one because its DR iterate is
    infeasible, src/TV2Dopt.cpp:425-430).
*   ``yang`` — consensus ADMM with rho = 10 (reference ``Yang2_TV``,
    src/TV2Dopt.cpp:787).
*   ``condat`` / ``chambolle-pock`` / ``chambolle-pock-acc`` — primal-dual
    with both difference operators dualized (reference
    ``CondatChambollePock2_TV``, src/TV2Dopt.cpp:587): sigma = 10,
    tau = 0.9/(8 sigma), theta = 1; Condat takes a gradient step on the
    smooth term, CP a resolvent step, the accelerated variant updates
    theta/tau/sigma using the 1-strong convexity of the quadratic.
*   ``kolmogorov`` — primal-dual with *exact column prox* (our batched 1D
    solver) and dualized rows, with accelerated steps (reference
    ``Kolmogorov2_TV``, src/TV2Dopt.cpp:907, which similarly keeps the column
    subproblems exact via Moreau and adapts theta/tau/sigma :997-1000).

Weighted 2D (reference ``DR2L1W_TV``, src/TV2DWopt.cpp:46) and general-norm 2D
(reference DR2_TV with p arguments) use the same drivers with per-edge-weight /
Lp 1D proxes.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import tv1d_l1, tv1d_l2, tv1d_lp
from ..utils.config import DEFAULT_COMBINER, CombinerConfig
from ..utils.info import RC_ITERS, RC_OK, make_info

# ---------------------------------------------------------------------------
# Fiber passes: batched 1D prox along rows / columns of (B, M, N) stacks
# ---------------------------------------------------------------------------


def _prox1d(Y2, lam, p: float, method: str):
    """Batched 1D prox on (K, n) with penalty lam (scalar or (K, n-1)) and norm p."""
    if p == 1.0:
        if method == "pn":
            return tv1d_l1.tv1_pn(Y2, lam)[0]
        return tv1d_l1.tv1_batched(Y2, lam, method=method)
    if p == 2.0:
        return tv1d_l2.tv2_ms(Y2, lam)[0]
    return tv1d_lp.tvp_batched(Y2, lam, p, method="gpfw")[0]


def prox_rows(X, lam, p: float = 1.0, method: str = "pn", w_edges=None):
    """Apply the 1D prox along the last axis of (B, M, N): M*B independent rows.

    ``w_edges``: optional per-edge weights of shape (B, M, N-1) (weighted TV).
    """
    B, M, N = X.shape
    Y2 = X.reshape(B * M, N)
    lam2 = w_edges.reshape(B * M, N - 1) if w_edges is not None else lam
    return _prox1d(Y2, lam2, p, method).reshape(B, M, N)


def prox_cols(X, lam, p: float = 1.0, method: str = "pn", w_edges=None):
    """Apply the 1D prox along the middle axis of (B, M, N): N*B column fibers.

    ``w_edges``: optional per-edge weights of shape (B, M-1, N).
    """
    B, M, N = X.shape
    Xt = jnp.swapaxes(X, 1, 2).reshape(B * N, M)
    lam2 = (jnp.swapaxes(w_edges, 1, 2).reshape(B * N, M - 1)
            if w_edges is not None else lam)
    out = _prox1d(Xt, lam2, p, method)
    return jnp.swapaxes(out.reshape(B, N, M), 1, 2)


# ---------------------------------------------------------------------------
# Difference stencils along rows / cols (for the primal-dual engines)
# ---------------------------------------------------------------------------


def _drow(X):
    """(B, M, N) -> (B, M, N-1): x[..., i] - x[..., i+1]."""
    return X[..., :-1] - X[..., 1:]


def _drow_t(U):
    """Adjoint of _drow: (B, M, N-1) -> (B, M, N)."""
    z = jnp.zeros_like(U[..., :1])
    return jnp.concatenate([U, z], axis=-1) - jnp.concatenate([z, U], axis=-1)


def _dcol(X):
    return X[:, :-1, :] - X[:, 1:, :]


def _dcol_t(U):
    z = jnp.zeros_like(U[:, :1, :])
    return jnp.concatenate([U, z], axis=1) - jnp.concatenate([z, U], axis=1)


def _mean_abs_change(x, x_last):
    return jnp.mean(jnp.abs(x - x_last), axis=(1, 2))


# ---------------------------------------------------------------------------
# Engine drivers.  All share the loop shape: while_loop with per-image
# mean-change stopping (reference STOP_PD 1e-6) and an iteration cap.
# ---------------------------------------------------------------------------


def _make_info(iters, delta, cap, tol):
    rc = jnp.where((iters >= cap) & (delta > tol), RC_ITERS, RC_OK).astype(jnp.int32)
    return make_info(iters, delta, rc)


def _loop(body, init_state, x_of, cap, tol):
    """Generic combiner loop: body maps state->state; x_of extracts the primal
    iterate; runs until mean |x - x_last| < tol for all images or cap iters."""

    def full_body(carry):
        state, x_last, delta, iters = carry
        state = body(state)
        x = x_of(state)
        delta = _mean_abs_change(x, x_last)
        return state, x, delta, iters + 1

    def cond(carry):
        _, _, delta, iters = carry
        return (iters < cap) & (jnp.max(delta) > tol)

    x0 = x_of(init_state)
    big = jnp.full((x0.shape[0],), jnp.inf, x0.dtype)
    state, x, delta, iters = jax.lax.while_loop(
        cond, full_body, (init_state, x0, big, jnp.int32(0)))
    iters_b = jnp.broadcast_to(iters, delta.shape)
    return x_of(state), _make_info(iters_b, delta, cap, tol)


# -- Proximal Dykstra (reference PD2_TV) ------------------------------------


def _run_pd(Y, prox1, prox2, cap, tol):
    def body(state):
        x, p, q = state
        xp = prox1(x + p)
        p = x + p - xp
        x = prox2(xp + q)
        q = xp + q - x
        return x, p, q

    z = jnp.zeros_like(Y)
    return _loop(body, (Y, z, z), lambda s: s[0], cap, tol)


# -- Davis-Yin three-operator splitting (reference DR2_TV role) -------------


def _run_dr(Y, prox1, prox2, cap, tol, gamma=1.0):
    """Fixed point: x* = prox of (f1 + f2 + 0.5||.-Y||^2); smooth term handled
    by its gradient (x - Y), proxes of f1/f2 scaled by gamma."""

    def body(state):
        z, _ = state
        xb = prox1(z)
        zh = 2.0 * xb - z - gamma * (xb - Y)
        xa = prox2(zh)
        z = z + xa - xb
        return z, xb

    # Report the constraint-feasible iterate prox1(z) (carried in state to
    # avoid recomputing the column pass for the stopping check).
    return _loop(body, (Y, Y), lambda s: s[1], cap, tol)


# -- Consensus ADMM (reference Yang2_TV) ------------------------------------


def _run_yang(Y, prox1, prox2, cap, tol, rho):
    def body(state):
        x, z1, z2, u1, u2 = state
        # Rotated ADMM sweep (z,u first): starting at the z-step makes the
        # first iterate move, so the mean-change stopping test is meaningful.
        z1 = prox1(x + u1)
        z2 = prox2(x + u2)
        u1 = u1 + x - z1
        u2 = u2 + x - z2
        x = (Y + rho * (z1 - u1) + rho * (z2 - u2)) / (1.0 + 2.0 * rho)
        return x, z1, z2, u1, u2

    return _loop(body, (Y, Y, Y, jnp.zeros_like(Y), jnp.zeros_like(Y)),
                 lambda s: s[0], cap, tol)


# -- Primal-dual (reference CondatChambollePock2_TV) ------------------------


def _run_pdhg(Y, w_row, w_col, cap, tol, cfg, variant: str):
    # Reference constants sigma = 10, tau = 0.9/(8 sigma) (src/TV2Dopt.cpp:609-618).
    # For the accelerated variant, balanced steps (sigma0 = 1) converge orders of
    # magnitude faster: growing sigma saturates the clipped duals.
    sigma0 = 1.0 if variant == "cp-acc" else cfg.cp_sigma
    tau0 = 0.9 / (8.0 * sigma0)

    def clip_dual(u, lam):
        return jnp.clip(u, -lam, lam)

    def body(state):
        x, xbar, u1, u2, tau, sigma, theta = state
        u1 = clip_dual(u1 + sigma * _drow(xbar), w_row)
        u2 = clip_dual(u2 + sigma * _dcol(xbar), w_col)
        div = _drow_t(u1) + _dcol_t(u2)
        if variant == "condat":
            x_new = x - tau * ((x - Y) + div)
        else:  # cp / cp-acc: resolvent of 0.5||.-Y||^2
            x_new = (x - tau * div + tau * Y) / (1.0 + tau)
        if variant == "cp-acc":
            # Accelerated steps (Chambolle-Pock Alg. 2, gamma = 1), with sigma
            # capped at 5*sigma0: unbounded sigma drives the clipped duals
            # bang-bang and stalls practical convergence.
            theta = jnp.where(sigma < 5.0 * sigma0,
                              1.0 / jnp.sqrt(1.0 + 2.0 * tau), 1.0)
            tau_n = tau * theta
            sigma_n = sigma / theta
        else:
            theta = jnp.asarray(1.0, Y.dtype)
            tau_n, sigma_n = tau, sigma
        xbar = x_new + theta * (x_new - x)
        return x_new, xbar, u1, u2, tau_n, sigma_n, theta

    z1 = jnp.zeros(Y.shape[:-1] + (Y.shape[-1] - 1,), Y.dtype)
    z2 = jnp.zeros((Y.shape[0], Y.shape[1] - 1, Y.shape[2]), Y.dtype)
    init = (Y, Y, z1, z2, jnp.asarray(tau0, Y.dtype), jnp.asarray(sigma0, Y.dtype),
            jnp.asarray(1.0, Y.dtype))
    return _loop(body, init, lambda s: s[0], cap, tol)


# -- Column-exact primal-dual (reference Kolmogorov2_TV) --------------------


def _run_kolmogorov(Y, w_row, w_col, cap, tol, inner_method: str):
    """PDHG with G(x) = 0.5||x-Y||^2 + w_col*colTV (proximable exactly via the
    batched 1D solver + Moreau scaling) and the row term dualized."""
    sigma0, tau0 = 1.0, 0.9 / (4.0 * 1.0)  # ||D_row||^2 <= 4

    def prox_G(v, tau):
        # prox_{tau G}(v) = prox_{(tau w_col/(1+tau)) colTV}((v + tau Y)/(1+tau))
        t = (v + tau * Y) / (1.0 + tau)
        return prox_cols(t, tau * w_col / (1.0 + tau), 1.0, inner_method)

    def body(state):
        x, xbar, u, tau, sigma = state
        u = jnp.clip(u + sigma * _drow(xbar), -w_row, w_row)
        x_new = prox_G(x - tau * _drow_t(u), tau)
        # Fixed steps, theta = 1: with the exact column prox inside G this
        # converges in a few dozen sweeps; the accelerated schedule's growing
        # sigma slows the clipped row duals instead (see _run_pdhg cp-acc).
        xbar = 2.0 * x_new - x
        return x_new, xbar, u, tau, sigma

    z = jnp.zeros(Y.shape[:-1] + (Y.shape[-1] - 1,), Y.dtype)
    init = (Y, Y, z, jnp.asarray(tau0, Y.dtype), jnp.asarray(sigma0, Y.dtype))
    return _loop(body, init, lambda s: s[0], cap, tol)


# ---------------------------------------------------------------------------
# Public batched entry points
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("method", "max_iters", "inner_method", "cfg"))
def tv1_2d_batched(Y, lam, method: str = "dr", max_iters: int = 0,
                   inner_method: str = "pn", cfg: CombinerConfig = DEFAULT_COMBINER):
    """Batched 2D anisotropic TV-L1 prox on (B, M, N) image stacks.

    Methods: dr (default), pd, yang, condat, chambolle-pock,
    chambolle-pock-acc, kolmogorov (reference prox_tv/__init__.py:355-443).
    """
    Y = jnp.asarray(Y)
    lam = jnp.asarray(lam, Y.dtype)
    tol = cfg.stop

    def pcol(V):
        return prox_cols(V, lam, 1.0, inner_method)

    def prow(V):
        return prox_rows(V, lam, 1.0, inner_method)

    method = method.lower()
    if method == "pd":
        cap = max_iters or cfg.max_iters_pd
        return _run_pd(Y, pcol, prow, cap, tol)
    if method == "dr":
        cap = max_iters or cfg.max_iters_dr
        return _run_dr(Y, pcol, prow, cap, tol)
    if method == "yang":
        cap = max_iters or cfg.max_iters_yang
        rho = cfg.yang_rho

        def pcol_r(V):
            return prox_cols(V, lam / rho, 1.0, inner_method)

        def prow_r(V):
            return prox_rows(V, lam / rho, 1.0, inner_method)

        return _run_yang(Y, pcol_r, prow_r, cap, tol, rho)
    if method in ("condat", "chambolle-pock", "chambolle-pock-acc"):
        cap = max_iters or cfg.max_iters_condat
        variant = {"condat": "condat", "chambolle-pock": "cp",
                   "chambolle-pock-acc": "cp-acc"}[method]
        return _run_pdhg(Y, lam, lam, cap, tol, cfg, variant)
    if method == "kolmogorov":
        cap = max_iters or cfg.max_iters_kolmogorov
        return _run_kolmogorov(Y, lam, lam, cap, tol, inner_method)
    raise ValueError(f"Unknown 2D method: {method!r}")


@functools.partial(jax.jit, static_argnames=("max_iters", "method", "inner_method", "cfg"))
def tv1w_2d_batched(Y, W_col, W_row, max_iters: int = 0, method: str = "dr",
                    inner_method: str = "pn",
                    cfg: CombinerConfig = DEFAULT_COMBINER):
    """Batched weighted 2D TV-L1 prox (reference DR2L1W_TV, src/TV2DWopt.cpp:46).

    Args:
        Y: (B, M, N) images.
        W_col: (B, M-1, N) per-edge weights along columns.
        W_row: (B, M, N-1) per-edge weights along rows.
    """
    Y = jnp.asarray(Y)

    def pcol(V):
        return prox_cols(V, None, 1.0, inner_method, w_edges=W_col)

    def prow(V):
        return prox_rows(V, None, 1.0, inner_method, w_edges=W_row)

    tol = cfg.stop
    method = method.lower()
    if method == "pd":
        cap = max_iters or cfg.max_iters_pd
        return _run_pd(Y, pcol, prow, cap, tol)
    cap = max_iters or cfg.max_iters_dr
    return _run_dr(Y, pcol, prow, cap, tol)


@functools.partial(jax.jit, static_argnames=("p_col", "p_row", "max_iters", "cfg"))
def tvp_2d_batched(Y, w_col, w_row, p_col: float, p_row: float,
                   max_iters: int = 0, cfg: CombinerConfig = DEFAULT_COMBINER):
    """Batched general-norm 2D TV prox (reference DR2_TV with p args)."""
    Y = jnp.asarray(Y)
    w_col = jnp.asarray(w_col, Y.dtype)
    w_row = jnp.asarray(w_row, Y.dtype)

    def pcol(V):
        return prox_cols(V, w_col, p_col, "pn")

    def prow(V):
        return prox_rows(V, w_row, p_row, "pn")

    cap = max_iters or cfg.max_iters_dr
    return _run_dr(Y, pcol, prow, cap, cfg.stop)
