"""Batched 2D anisotropic-TV proximity combiners (TPU-native).

Solves, for every image in a batch,

    min_X 0.5 ||X - Y||_F^2 + w_col * colTV_p(X) + w_row * rowTV_p(X)

where colTV/rowTV are sums of 1D TV penalties over every column/row fiber.
The reference's multidimensional layer (``src/TV2Dopt.cpp``, ``TV2DWopt.cpp``)
runs OpenMP threads over fibers; here fibers are a *batch axis* — each
row/column pass is ONE batched 1D prox call on a (B*fibers, len) array, the
layout change handled by XLA transposes.

All splitting engines carry the **dual warm-start state** of every fiber
across outer iterations (the TPU analog of the reference's Workspace warm
restart, src/utils.h:30-33): each row/col pass resumes its projected-Newton
dual from the previous sweep, collapsing the inner iteration count after the
first few sweeps.

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
    smooth term, CP a resolvent step, the accelerated variant uses capped
    Chambolle-Pock Alg.-2 steps (gamma = 1).
*   ``kolmogorov`` — primal-dual with *exact column prox* (our batched 1D
    solver) and dualized rows (reference ``Kolmogorov2_TV``,
    src/TV2Dopt.cpp:907, which similarly keeps column subproblems exact).

Weighted 2D (reference ``DR2L1W_TV``, src/TV2DWopt.cpp:46) and general-norm 2D
(reference DR2_TV with p arguments) use the same drivers with per-edge-weight /
Lp 1D proxes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import tv1d_l1, tv1d_l2, tv1d_lp
from ..ops.kernels import gating
from ..utils import debug
from ..utils.config import DEFAULT_COMBINER, CombinerConfig
from ..utils.info import RC_ITERS, RC_OK, make_info

# ---------------------------------------------------------------------------
# Fiber passes: batched 1D prox along rows / columns of (B, M, N) stacks
# ---------------------------------------------------------------------------

# Shared trace-time kernel switch + sharding probe (ops/kernels/gating.py).
# The switch is a contextvars.ContextVar scoped per thread/trace, so
# concurrent traces cannot race on it.
_fused_ctx = gating.fused_ctx
_concrete_multidevice = gating.multidevice


def _fused_ok(Y2, p, method):
    """Route to the fused Pallas PN kernel on TPU (f32, moderate n)."""
    return p == 1.0 and method == "pn" and gating.gate(Y2, "pn")


def _fused_tb(n):
    return gating.pn_tile_rows(n, cap=64)


def _lam_padded(lam, K, n, dtype):
    """Penalty as a (K, n) array with a zero final column (fused-kernel layout)."""
    lam = jnp.asarray(lam, dtype)
    if lam.ndim == 2:  # (K, n-1) per-edge weights
        return jnp.concatenate([lam, jnp.zeros((K, 1), dtype)], axis=-1)
    body = jnp.broadcast_to(lam.reshape(-1, 1) if lam.ndim else lam, (K, n - 1))
    return jnp.concatenate([body, jnp.zeros((K, 1), dtype)], axis=-1)


def _prox1d(Y2, lam, p: float, method: str):
    """Batched 1D prox on (K, n) with penalty lam (scalar or (K, n-1)), norm p."""
    if p == 1.0:
        if method == "pn":
            if _fused_ok(Y2, p, method):
                from ..ops.kernels import pn_fused
                K, n = Y2.shape
                if jnp.ndim(lam) == 0:
                    # Uniform penalty rides as an SMEM scalar and the dual
                    # stays in VMEM: two fewer (K, n) HBM streams per sweep.
                    x, _ = pn_fused.pn_tv1_fused(Y2, lam_scalar=lam,
                                                 tb=_fused_tb(n),
                                                 return_dual=False)
                    return x
                lam_full = _lam_padded(lam, K, n, Y2.dtype)
                x, _ = pn_fused.pn_tv1_fused(Y2, lam_full, tb=_fused_tb(n),
                                             return_dual=False)
                return x
            return tv1d_l1.tv1_pn(Y2, lam)[0]
        return tv1d_l1.tv1_batched(Y2, lam, method=method)
    if p == 2.0:
        return tv1d_l2.tv2_ms(Y2, lam)[0]
    return tv1d_lp.tvp_batched(Y2, lam, p, method="gpfw")[0]


def _prox_state_init(K, n, p: float, dtype):
    """Warm-start state pytree per fiber-prox engine: PN dual (p=1),
    More-Sorensen secular multiplier (p=2), or (dual, KKT-multiplier) for
    general p — the TPU analog of the reference Workspace warm restart
    (src/utils.h:30-33, src/TVL2opt.cpp:255-257,414-419)."""
    if p == 1.0:
        return jnp.zeros((K, n - 1), dtype)
    if p == 2.0:
        return jnp.zeros((K,), dtype)
    return (jnp.zeros((K, n - 1), dtype), jnp.ones((K,), dtype))


def _prox1d_ws(Y2, lam, p: float, method: str, state):
    """Stateful variant: returns (x, state).  Every iterative engine is
    warm-started: PN L1 from its dual, TV-L2 More-Sorensen from its secular
    alpha, TV-Lp from its dual + projection KKT multiplier.  Direct (scan/DP)
    engines pass the state through."""
    if p == 1.0 and method == "pn":
        if _fused_ok(Y2, p, method):
            from ..ops.kernels import pn_fused
            K, n = Y2.shape
            w0p = jnp.concatenate([state, jnp.zeros((K, 1), Y2.dtype)],
                                  axis=-1)
            if jnp.ndim(lam) == 0:
                # Uniform penalty as an SMEM scalar (no (K, n) field stream;
                # the dual must still round-trip for the warm start).
                x, w = pn_fused.pn_tv1_fused(Y2, lam_scalar=lam, w_init=w0p,
                                             tb=_fused_tb(n))
                return x, w[:, :-1]
            lam_full = _lam_padded(lam, K, n, Y2.dtype)
            x, w = pn_fused.pn_tv1_fused(Y2, lam_full, w_init=w0p,
                                         tb=_fused_tb(n))
            return x, w[:, :-1]
        x, _, w = tv1d_l1.tv1_pn(Y2, lam, w_init=state, return_dual=True)
        return x, w
    if p == 2.0:
        x, _, alpha = tv1d_l2.tv2_ms(Y2, lam, alpha_init=state,
                                     return_alpha=True)
        return x, alpha
    if p != 1.0:
        w0, mu0 = state
        x, _, st = tv1d_lp.tvp_gpfw(Y2, lam, p, w_init=w0, mu_init=mu0,
                                    return_state=True)
        return x, st
    return _prox1d(Y2, lam, p, method), state


def prox_rows(X, lam, p: float = 1.0, method: str = "pn", w_edges=None):
    """1D prox along the last axis of (B, M, N): B*M independent rows.

    ``w_edges``: optional per-edge weights of shape (B, M, N-1) (weighted TV).
    """
    B, M, N = X.shape
    lam2 = w_edges.reshape(B * M, N - 1) if w_edges is not None else lam
    return _prox1d(X.reshape(B * M, N), lam2, p, method).reshape(B, M, N)


def prox_cols(X, lam, p: float = 1.0, method: str = "pn", w_edges=None):
    """1D prox along the middle axis of (B, M, N): B*N column fibers.

    ``w_edges``: optional per-edge weights of shape (B, M-1, N).
    """
    B, M, N = X.shape
    Xt = jnp.swapaxes(X, 1, 2).reshape(B * N, M)
    lam2 = (jnp.swapaxes(w_edges, 1, 2).reshape(B * N, M - 1)
            if w_edges is not None else lam)
    out = _prox1d(Xt, lam2, p, method)
    return jnp.swapaxes(out.reshape(B, N, M), 1, 2)


def _make_row_prox(B, M, N, lam, p, method, w_edges, dtype):
    """Stateful row-pass closure: (V, state) -> (X, state)."""
    lam2 = w_edges.reshape(B * M, N - 1) if w_edges is not None else lam

    def prox(V, s):
        out, s2 = _prox1d_ws(V.reshape(B * M, N), lam2, p, method, s)
        return out.reshape(B, M, N), s2

    return prox, _prox_state_init(B * M, N, p, dtype)


def _make_col_prox(B, M, N, lam, p, method, w_edges, dtype):
    """Stateful column-pass closure: (V, state) -> (X, state)."""
    lam2 = (jnp.swapaxes(w_edges, 1, 2).reshape(B * N, M - 1)
            if w_edges is not None else lam)

    def prox(V, s):
        Vt = jnp.swapaxes(V, 1, 2).reshape(B * N, M)
        out, s2 = _prox1d_ws(Vt, lam2, p, method, s)
        return jnp.swapaxes(out.reshape(B, N, M), 1, 2), s2

    return prox, _prox_state_init(B * N, M, p, dtype)


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


def _freeze_tree(new, old, running, B):
    """Per-image select between the post-sweep state ``new`` and the
    pre-sweep state ``old``: images with ``running[b] == False`` keep their
    old state.

    State-layout CONTRACT (enforced): every non-scalar leaf in a combiner
    driver's loop state is image-major with leading dim an exact multiple of
    B ((B, M, N) primal/dual fields, (B*M, n) / (B*N, m) fiber warm-start
    states); shared values (schedule tau/sigma) must be 0-d scalars, which
    pass through unfrozen — harmless, since the per-image fields they feed
    are frozen.  A non-scalar leaf whose leading dim is NOT a multiple of B
    raises at trace time rather than silently escaping the freeze; a shared
    array leaf must be kept out of the state (close over it) or carried 0-d.
    """

    def sel(n, o):
        if n.ndim == 0:
            return n
        if n.shape[0] % B != 0:
            raise ValueError(
                f"combiner state leaf of shape {n.shape} violates the "
                f"image-major contract (leading dim must be a multiple of "
                f"B={B}, or the leaf must be a 0-d shared scalar)")
        m = jnp.repeat(running, n.shape[0] // B)
        return jnp.where(m.reshape((-1,) + (1,) * (n.ndim - 1)), n, o)

    return jax.tree_util.tree_map(sel, new, old)


def _loop(body, init_state, x_of, cap, tol):
    """Generic combiner loop: body maps state->state; x_of extracts the primal
    iterate; runs until mean |x - x_last| < tol for all images or cap iters.

    Diagnostics are per image (the reference's per-solve ``info[]``,
    src/general.h:58-61): ``iters`` counts the sweeps each image ran before
    its own mean change dropped below tol.

    Converged images are **frozen** (their whole state, including the fiber
    warm-start duals, stops updating): their prox subproblems then see
    unchanged inputs with already-converged warm starts, so the inner
    projected-Newton / More-Sorensen while_loops converge for those lanes at
    iteration 0 and the inner iteration count — the max over lanes — is
    governed by the still-running images only.  A heterogeneous-lam batch no
    longer pays the drifting-iterate inner sweeps of its easy images
    (VERDICT r2 item 10)."""

    def full_body(carry):
        state, x_last, delta, iters_img, running, iters = carry
        state = _freeze_tree(body(state), state, running,
                             x_last.shape[0])
        x = x_of(state)
        delta_new = _mean_abs_change(x, x_last)
        delta = jnp.where(running, delta_new, delta)
        iters_img = iters_img + running.astype(jnp.int32)
        running = running & (delta > tol)
        debug.dprint("combiner iter {i}: max mean-change {d}",
                     i=iters + 1, d=jnp.max(delta))
        return state, x, delta, iters_img, running, iters + 1

    def cond(carry):
        *_, running, iters = carry
        return (iters < cap) & jnp.any(running)

    x0 = x_of(init_state)
    B = x0.shape[0]
    big = jnp.full((B,), jnp.inf, x0.dtype)
    state, x, delta, iters_img, running, iters = jax.lax.while_loop(
        cond, full_body, (init_state, x0, big, jnp.zeros((B,), jnp.int32),
                          jnp.ones((B,), bool), jnp.int32(0)))
    return x_of(state), _make_info(iters_img, delta, cap, tol)


# -- Proximal Dykstra (reference PD2_TV) ------------------------------------


def _run_pd(Y, prox1, s1_0, prox2, s2_0, cap, tol):
    def body(state):
        x, p, q, s1, s2 = state
        xp, s1 = prox1(x + p, s1)
        p = x + p - xp
        x, s2 = prox2(xp + q, s2)
        q = xp + q - x
        return x, p, q, s1, s2

    z = jnp.zeros_like(Y)
    return _loop(body, (Y, z, z, s1_0, s2_0), lambda s: s[0], cap, tol)


# -- Davis-Yin three-operator splitting (reference DR2_TV role) -------------


def _run_dr(Y, prox1, s1_0, prox2, s2_0, cap, tol, gamma=1.0):
    """Fixed point: x* = prox of (f1 + f2 + 0.5||.-Y||^2); smooth term handled
    by its gradient (x - Y), proxes of f1/f2 scaled by gamma (= 1 here)."""

    def body(state):
        z, _, s1, s2 = state
        xb, s1 = prox1(z, s1)
        zh = 2.0 * xb - z - gamma * (xb - Y)
        xa, s2 = prox2(zh, s2)
        z = z + xa - xb
        return z, xb, s1, s2

    return _loop(body, (Y, Y, s1_0, s2_0), lambda s: s[1], cap, tol)


# -- Consensus ADMM (reference Yang2_TV) ------------------------------------


def _run_yang(Y, prox1, s1_0, prox2, s2_0, cap, tol, rho):
    def body(state):
        x, z1, z2, u1, u2, s1, s2 = state
        # Rotated ADMM sweep (z,u first): starting at the z-step makes the
        # first iterate move, so the mean-change stopping test is meaningful.
        z1, s1 = prox1(x + u1, s1)
        z2, s2 = prox2(x + u2, s2)
        u1 = u1 + x - z1
        u2 = u2 + x - z2
        x = (Y + rho * (z1 - u1) + rho * (z2 - u2)) / (1.0 + 2.0 * rho)
        return x, z1, z2, u1, u2, s1, s2

    zero = jnp.zeros_like(Y)
    return _loop(body, (Y, Y, Y, zero, zero, s1_0, s2_0), lambda s: s[0], cap, tol)


# -- Primal-dual (reference CondatChambollePock2_TV) ------------------------


def _run_pdhg(Y, w_row, w_col, cap, tol, cfg, variant: str):
    # Reference constants sigma = 10, tau = 0.9/(8 sigma) (src/TV2Dopt.cpp:609-618).
    # For the accelerated variant, balanced steps converge orders of magnitude
    # faster: growing sigma saturates the clipped duals (schedule shared with
    # the fused kernel — see _pdhg_sigma_schedule).
    if variant == "cp-acc":
        sigma0, cap_mult = _pdhg_sigma_schedule(
            Y, jnp.mean(jnp.asarray(w_row, Y.dtype)), Y.dtype)
    else:
        sigma0 = jnp.asarray(cfg.cp_sigma, Y.dtype)
        cap_mult = 2.0
    tau0 = 0.9 / (8.0 * sigma0)

    def body(state):
        x, xbar, u1, u2, tau, sigma = state
        u1 = jnp.clip(u1 + sigma * _drow(xbar), -w_row, w_row)
        u2 = jnp.clip(u2 + sigma * _dcol(xbar), -w_col, w_col)
        div = _drow_t(u1) + _dcol_t(u2)
        if variant == "condat":
            x_new = x - tau * ((x - Y) + div)
        else:  # cp / cp-acc: resolvent of 0.5||.-Y||^2
            x_new = (x - tau * div + tau * Y) / (1.0 + tau)
        if variant == "cp-acc":
            # Accelerated steps (Chambolle-Pock Alg. 2, gamma = 1), with
            # sigma capped at cap_mult*sigma0: unbounded sigma drives the
            # clipped duals bang-bang and stalls practical convergence.
            theta = jnp.where(sigma < cap_mult * sigma0,
                              1.0 / jnp.sqrt(1.0 + 2.0 * tau), 1.0)
            tau_n = tau * theta
            sigma_n = sigma / theta
        else:
            theta = jnp.asarray(1.0, Y.dtype)
            tau_n, sigma_n = tau, sigma
        xbar = x_new + theta * (x_new - x)
        return x_new, xbar, u1, u2, tau_n, sigma_n

    z1 = jnp.zeros(Y.shape[:-1] + (Y.shape[-1] - 1,), Y.dtype)
    z2 = jnp.zeros((Y.shape[0], Y.shape[1] - 1, Y.shape[2]), Y.dtype)
    init = (Y, Y, z1, z2, jnp.asarray(tau0, Y.dtype), jnp.asarray(sigma0, Y.dtype))
    return _loop(body, init, lambda s: s[0], cap, tol)


# -- Temporally-blocked fused PDHG (Pallas) ---------------------------------


_pdhg_fused_params = gating.pdhg2d_params


def _pdhg_lane_eff(N: int, weighted: bool) -> float:
    """Effective PDHG iterations per HBM pass when the lane axis has length
    N: k * tm / (tm + 4k) for the VMEM-budgeted (k, tm) window — the
    figure of merit for choosing the image orientation."""
    Np = -(-max(int(N), 128) // 128) * 128
    k, tm = _pdhg_fused_params(Np, weighted=weighted)
    return k * tm / float(tm + 4 * k)


def _pdhg_fused_ok(Y, variant):
    return Y.shape[1] >= 16 and gating.gate(Y, "pdhg2d")


def _pdhg_sigma_schedule(Y, lam_eff, dtype):
    """(sigma0, cap_mult) for the accelerated PDHG schedule, scale-invariant.

    PDHG's (sigma, tau, theta) are dimensionless under joint scaling of Y and
    lam, so the optimum depends only on lam relative to the data's noise
    scale (estimated from first differences; white noise of std s has
    mean(dY^2) = 2 s^2).  A 1024^2 sweep at lam_rel in {0.3, 1, 3} found the
    best terminal sigma_max follows (lam_rel/0.3)^1.5 within ~20% (96 / 700 /
    4000 iterations to the 1e-5 gap certificate), while an unbounded sigma
    drives the clipped duals bang-bang and stalls at any lam."""
    dY = Y[..., 1:] - Y[..., :-1]
    noise = jnp.sqrt(jnp.maximum(jnp.mean(dY * dY) * 0.5, 1e-12))
    lam_rel = jnp.asarray(lam_eff, dtype) / noise
    sigma0 = 0.5 * jnp.maximum(1.0, lam_rel)
    sigma_max = jnp.maximum(1.0, (lam_rel / 0.3) ** 1.5)
    return sigma0, sigma_max / sigma0


def _run_pdhg_fused(Y, lam, cap, tol, cfg, variant: str,
                    W_col=None, W_row=None, x0=None, gap_tol=None,
                    sigma0=None, sigma_cap_mult=None, obj_target=None,
                    u0=None, return_duals: bool = False):
    """Driver for the temporally-blocked PDHG kernel: stacks the image batch
    vertically with decoupled (lam = 0) gap rows and runs K-iteration chunks.

    Stopping is a *per-image duality-gap certificate* evaluated between
    chunks: from the dual fields (u1, u2) the dual-feasible primal
    xhat = Y - D'u gives gap(xhat, u) = sum lam|D xhat| - u . D xhat >= 0,
    which upper-bounds the objective suboptimality of xhat.  Each image stops
    when its gap falls below ``cfg.pdhg_gap_tol`` relative to its objective
    (the reference's CP methods run open-loop to an iteration cap instead —
    src/TVopt.h:75-81 stop tol 0).  The returned iterate is xhat, so the
    certificate applies to the output itself.

    ``W_col`` (B, M-1, N) / ``W_row`` (B, M, N-1): optional per-edge weight
    fields (weighted anisotropic TV).  ``x0``: optional primal warm start.
    ``u0``: optional (u_row (B, M, N-1), u_col (B, M-1, N)) DUAL warm start
    (box-clipped on entry) — the PDHG analog of the Workspace warm restart;
    with ``return_duals`` the final dual pair is appended to the return so
    callers can thread it across outer loops (re-solving from converged
    duals certifies within one certificate period).  Measured dead end, do
    not re-try: lambda-CONTINUATION (solve at scaled-down weights, feed
    scaled duals forward — with or without a terminal-sigma schedule
    override) does NOT cut the big-lam iteration count (stage 2 still pays
    ~the full cold count; 1024^2 weighted probe: cold 624 vs 720-912
    two-stage totals) — the count is governed by the sigma ramp + the
    (lam_rel)^1.5 law, not the starting point, consistent with the
    multigrid-x0 note above."""
    from ..ops.kernels import pdhg_fused as PK

    B, M, N = Y.shape
    # Orientation: the lane (last-axis) length sets the VMEM window budget,
    # so a WIDER-than-tall image wastes HBM passes — at 4K (N = 3840) the
    # window shrinks to (k=4, tm=40) = 2.9 effective iterations per pass,
    # while the transposed problem (N' = 2160) gets (8, 64) = 5.3.
    # Anisotropic TV is symmetric under transposition (the weight fields
    # swap roles), so solve the better orientation and transpose back.
    if M < N and _pdhg_lane_eff(M, W_row is not None) > 1.05 * _pdhg_lane_eff(
            N, W_row is not None):
        res = _run_pdhg_fused(
            jnp.swapaxes(Y, 1, 2), lam, cap, tol, cfg, variant,
            W_col=None if W_row is None else jnp.swapaxes(W_row, 1, 2),
            W_row=None if W_col is None else jnp.swapaxes(W_col, 1, 2),
            x0=None if x0 is None else jnp.swapaxes(x0, 1, 2),
            gap_tol=gap_tol, sigma0=sigma0, sigma_cap_mult=sigma_cap_mult,
            obj_target=obj_target,
            u0=None if u0 is None else (jnp.swapaxes(u0[1], 1, 2),
                                        jnp.swapaxes(u0[0], 1, 2)),
            return_duals=return_duals)
        if return_duals:
            x_t, info, (u1_t, u2_t) = res
            return (jnp.swapaxes(x_t, 1, 2), info,
                    (jnp.swapaxes(u2_t, 1, 2), jnp.swapaxes(u1_t, 1, 2)))
        x_t, info = res
        return jnp.swapaxes(x_t, 1, 2), info
    # (A multigrid primal warm start was tried here and reverted: PDHG's
    # convergence is governed by the dual build-up, so a good x0 alone does
    # not reduce the iteration count.)
    k_steps, tm = _pdhg_fused_params(N, weighted=W_row is not None)
    halo = 2 * k_steps
    gap_rows = 8
    S = M + gap_rows
    Np = -(-N // 128) * 128
    tiles = max(1, -(-(B * S) // tm))
    Mp = tiles * tm + 2 * halo

    if sigma0 is None:
        if variant in ("cp-acc", "cp-adapt"):
            lam_eff = (jnp.mean(jnp.asarray(W_row, Y.dtype))
                       if W_row is not None else jnp.asarray(lam, Y.dtype))
            sigma0, auto_cap = _pdhg_sigma_schedule(Y, lam_eff, Y.dtype)
            if sigma_cap_mult is None:
                sigma_cap_mult = auto_cap
        else:
            sigma0 = jnp.asarray(cfg.cp_sigma, Y.dtype)
    if sigma_cap_mult is None:
        sigma_cap_mult = 2.0
    sigma0 = jnp.asarray(sigma0, Y.dtype)
    tau0 = 0.9 / (8.0 * sigma0)

    def canvas(A):
        """(B, rows<=M, cols<=N) field -> tall padded (Mp, Np) canvas."""
        b, rows, cols = A.shape
        A = jnp.pad(A, ((0, 0), (0, S - rows), (0, Np - cols)))
        return jnp.pad(A.reshape(B * S, Np), ((halo, Mp - halo - B * S), (0, 0)))

    Ypad = canvas(Y)
    weighted = W_row is not None
    # Validity masks on the canvas (same rules as the kernel's vr/vc).
    r = jnp.arange(Mp)[:, None] - halo
    q = r % S
    col = jnp.arange(Np)[None, :]
    in_img = (r >= 0) & (r < B * S)
    vr = ((col < N - 1) & in_img & (q <= M - 1)).astype(Y.dtype)
    vc = ((col < N) & in_img & (q <= M - 2)).astype(Y.dtype)
    if weighted:
        lamr = canvas(jnp.asarray(W_row, Y.dtype)) * vr
        lamc = canvas(jnp.asarray(W_col, Y.dtype)) * vc
        wr, wc = lamr, lamc
        lam = jnp.asarray(1.0, Y.dtype)  # schedule lam column unused
    else:
        lamr = jnp.asarray(lam, Y.dtype) * vr
        lamc = jnp.asarray(lam, Y.dtype) * vc
        wr = wc = None

    # Certificate cadence.  With the in-kernel certificate (count == 1: the
    # kernel reduces per-band gap/objective partials from VMEM at ~half an
    # iteration's cost) every chunk is checked — finer stopping granularity
    # at negligible price.  The multi-image canvas needs the XLA per-image
    # certificate, which costs ~8 canvas passes — check every ~24 iterations.
    use_kcert = B == 1
    cpc = 1 if use_kcert else max(1, 24 // k_steps)
    cap_pad = -(-cap // (cpc * k_steps)) * (cpc * k_steps)
    # Schedule rows are generated incrementally inside the loop body (see
    # PK.sched_chunk) from this carried (sigma, tau) pair.
    sig0f = jnp.asarray(sigma0, jnp.float32)
    sched0 = (sig0f, jnp.asarray(tau0, jnp.float32))
    lam_f = (jnp.asarray(1.0, jnp.float32) if weighted
             else jnp.asarray(lam, jnp.float32))

    def next_sched(carry):
        return PK.sched_chunk(carry, k_steps, lam_f, sig0f,
                              sigma_cap_mult, variant)

    # Same-size difference stencils on the (Mp, Np) canvas (kernel convention).
    def dr_(X):
        return X - jnp.concatenate([X[:, 1:], jnp.zeros_like(X[:, :1])], axis=1)

    def drT_(U):
        return U - jnp.concatenate([jnp.zeros_like(U[:, :1]), U[:, :-1]], axis=1)

    def dc_(X):
        return X - jnp.concatenate([X[1:, :], jnp.zeros_like(X[:1, :])], axis=0)

    def dcT_(U):
        return U - jnp.concatenate([jnp.zeros_like(U[:1, :]), U[:-1, :]], axis=0)

    def per_image(E):
        """Sum an (Mp, Np) field per stacked image -> (B,)."""
        return jnp.sum(E[halo:halo + B * S].reshape(B, S, Np), axis=(1, 2))

    def gap_and_primal(u1, u2):
        """Duality-gap certificate: xhat = Y - D'u is dual-feasible-primal;
        gap_b = sum lam|D xhat| - u . D xhat per image (>= 0 since |u|<=lam).
        where(), not *mask: the kernel's never-written padding rows hold NaN
        garbage and 0 * NaN = NaN."""
        u1 = jnp.where(vr > 0, u1, 0.0)
        u2 = jnp.where(vc > 0, u2, 0.0)
        xhat = Ypad - (drT_(u1) + dcT_(u2))
        gr = dr_(xhat) * vr
        gc = dc_(xhat) * vc
        e = lamr * jnp.abs(gr) - u1 * gr + lamc * jnp.abs(gc) - u2 * gc
        gap_b = per_image(e)
        obj_b = (0.5 * per_image((xhat - Ypad) ** 2)
                 + per_image(lamr * jnp.abs(gr) + lamc * jnp.abs(gc)))
        return gap_b, obj_b, xhat

    feps = jnp.finfo(Y.dtype).eps
    if gap_tol is None:
        # Relative gap tolerance with a dtype-achievability floor: the gap is
        # a sum of ~4*M*N f32 terms whose rounding noise scales with obj.
        gtol = jnp.maximum(jnp.asarray(cfg.pdhg_gap_tol, Y.dtype), 64.0 * feps)
    else:
        gtol = jnp.asarray(gap_tol, Y.dtype)  # explicit override (0 = run to cap)

    def tol_of(obj_b):
        return gtol * jnp.maximum(1.0, obj_b)

    # Equal-quality mode: stop an image as soon as its certified iterate's
    # objective reaches the per-image target (e.g. a reference solver's
    # achieved objective), even if the duality gap is still above tol.
    if obj_target is None:
        obj_tgt = jnp.full((B,), -jnp.inf, Y.dtype)
    else:
        obj_tgt = jnp.broadcast_to(jnp.asarray(obj_target, Y.dtype), (B,))

    def still_running(gap_b, obj_b):
        return (gap_b > tol_of(obj_b)) & (obj_b > obj_tgt)

    def chunk_call(sd, x, xb, u1, u2):
        return PK.pdhg_chunk(sd, x, xb, u1, u2, Ypad, k_steps=k_steps, tm=tm,
                             n_valid=N, m_valid=M, stride=S, count=B,
                             pad_top=halo, grad_step=(variant == "condat"),
                             wr=wr, wc=wc, cert=use_kcert)

    # Gap-stall restarted acceleration (VERDICT r4 item 2).  With the
    # in-kernel certificate giving the duality gap EVERY chunk, the cp-acc
    # schedule gains a classic accelerated-method adaptive restart: when the
    # gap fails to decay 0.7x over the last 4 chunks, rewind (sigma, tau) to
    # (sigma0, tau0) and re-run the Alg.-2 ramp with the sigma cap raised 4x.
    # Controller-lab measurements (48², interpret, certificate stop) that
    # picked this rule — and the dead ends, do not re-try:
    #   lam_rel 0.3 / 1 / 3: law 96 / 660 / 3372 iters; stall-restart
    #   96 / 588 / 864 (the law's (lam_rel/0.3)^1.5 cap stays as the
    #   INITIAL cap, so low-lam behavior is unchanged).
    #   Dead ends: extending the cap WITHOUT rewinding sigma diverges (the
    #   saturated-sigma stall the cap exists to prevent); plain-CP
    #   residual-balancing (Goldstein) diverges at lam_rel >= 1; periodic
    #   restarts lose to stall-triggered at every period tried.
    restart = variant == "cp-acc"
    # hist holds the last LOOK gaps; the stall compare is against the gap
    # LOOK chunks before the current one (the lab's g[-1] > 0.7 g[-4]).
    # NOTE the window deliberately KEEPS sliding through restarts — while
    # the re-ramped gap stays above the pre-restart level the controller
    # keeps the sigma rewound and escalates the cap each chunk, which is
    # the behavior the lab measured; resetting the window after a restart
    # softens it and measured 672/2904 iters at lam_rel 1/3 vs 588/864.
    LOOK, DECAY, GROW = 3, 0.7, 4.0

    def body(state):
        x, xb, u1, u2, sc, cap_mult_d, hist, t, gap_b, iters_img, running = \
            state

        if use_kcert:
            if restart:
                sd, sc = PK.sched_chunk(sc, k_steps, lam_f, sig0f,
                                        cap_mult_d, variant)
            else:
                sd, sc = next_sched(sc)
            x2, xb2, u12, u22, gp, op = chunk_call(sd, x, xb, u1, u2)
            t = t + k_steps
            gap_new = jnp.sum(gp).reshape(1)
            obj_b = jnp.sum(op).reshape(1)
            if restart:
                stall = gap_new[0] > DECAY * hist[0]
                sc = (jnp.where(stall, sig0f, sc[0]),
                      jnp.where(stall, jnp.asarray(tau0, jnp.float32),
                                sc[1]))
                cap_mult_d = jnp.where(stall, cap_mult_d * GROW, cap_mult_d)
                hist = jnp.concatenate([hist[1:],
                                        gap_new.astype(jnp.float32)])
        else:
            def one(_, st):
                x, xb, u1, u2, sc, t = st
                if restart:
                    sd, sc = PK.sched_chunk(sc, k_steps, lam_f, sig0f,
                                            cap_mult_d, variant)
                else:
                    sd, sc = next_sched(sc)
                x, xb, u1, u2 = chunk_call(sd, x, xb, u1, u2)
                return x, xb, u1, u2, sc, t + k_steps

            x2, xb2, u12, u22, sc, t = jax.lax.fori_loop(
                0, cpc, one, (x, xb, u1, u2, sc, t))
            gap_new, obj_b, _ = gap_and_primal(u12, u22)
            if restart:
                # Multi-image canvas: one global (sigma, tau) — the stall
                # statistic is the gap summed over still-running images
                # (reduces to the per-image gap at B = 1).
                gsum = jnp.sum(jnp.where(running, gap_new, 0.0)
                               ).astype(jnp.float32)
                stall = gsum > DECAY * hist[0]
                sc = (jnp.where(stall, sig0f, sc[0]),
                      jnp.where(stall, jnp.asarray(tau0, jnp.float32),
                                sc[1]))
                cap_mult_d = jnp.where(stall, cap_mult_d * GROW, cap_mult_d)
                hist = jnp.concatenate([hist[1:], gsum.reshape(1)])
        iters_img = iters_img + cpc * k_steps * running.astype(jnp.int32)
        gap_b = jnp.where(running, gap_new, gap_b)
        running = running & still_running(gap_b, obj_b)
        return (x2, xb2, u12, u22, sc, cap_mult_d, hist, t, gap_b, iters_img,
                running)

    def cond(state):
        *_, t, gap_b, iters_img, running = state
        return (t < cap_pad) & jnp.any(running)

    zeros = jnp.zeros_like(Ypad)
    X0 = canvas(x0) if x0 is not None else Ypad
    if u0 is not None:
        u1_init = jnp.clip(canvas(u0[0]), -lamr, lamr)
        u2_init = jnp.clip(canvas(u0[1]), -lamc, lamc)
        if x0 is None:
            # Consistent primal for a dual start: xhat = Y - D'u.
            X0 = Ypad - (drT_(u1_init) + dcT_(u2_init))
    else:
        u1_init = u2_init = zeros
    init = (X0, X0, u1_init, u2_init, sched0,
            jnp.asarray(sigma_cap_mult, jnp.float32),
            jnp.full((LOOK,), jnp.inf, jnp.float32), jnp.int32(0),
            jnp.full((B,), jnp.inf, Y.dtype), jnp.zeros((B,), jnp.int32),
            jnp.ones((B,), bool))
    (x, xb, u1, u2, _sc, _cm, _h, t, gap_b, iters_img,
     running) = jax.lax.while_loop(cond, body, init)

    gap_b, obj_b, xhat = gap_and_primal(u1, u2)
    out = xhat[halo:halo + B * S].reshape(B, S, Np)[:, :M, :N]
    rc = jnp.where(still_running(gap_b, obj_b), RC_ITERS, RC_OK).astype(jnp.int32)
    info = make_info(iters_img, gap_b, rc)
    if return_duals:
        u1_img = u1[halo:halo + B * S].reshape(B, S, Np)[:, :M, :N - 1]
        u2_img = u2[halo:halo + B * S].reshape(B, S, Np)[:, :M - 1, :N]
        return out, info, (u1_img, u2_img)
    return out, info


def _run_pdhg_fused_banded(Yl, lam, Wr=None, Wc=None, *, cap, cfg,
                           variant: str, axis_name: str,
                           M: int, N: int, n_dev: int, gap_tol=None,
                           k_steps: int = None, tm: int = None):
    """Cross-chip fused PDHG: ONE image row-banded over a device mesh
    (SURVEY §5.8's open item — the fused kernel itself spans chips).

    Runs INSIDE ``shard_map`` over a 1D mesh axis ``axis_name``: each device
    holds ``Yl`` = its (local_rows, Np) slab of the row-padded global image
    and a private canvas with 2*k_steps halo rows on each side.  Every
    K-step kernel chunk is preceded by a ``jax.lax.ppermute`` halo exchange
    of the four state fields (x, xbar, u1, u2) with the row neighbors —
    information travels <= 2 rows per PDHG iteration, so a fresh 2K-row halo
    makes each device's core rows EXACT for K steps (the same trapezoidal
    blocking argument as the single-device kernel, now with ICI neighbors
    instead of HBM bands).  The per-image duality-gap certificate is a
    ``jax.lax.psum`` of per-device partial sums, evaluated every ~24
    iterations exactly like the single-device driver.

    Geometry contract (arranged by the public wrapper): the global padded
    canvas has n_dev * local_rows rows; image rows [0, M) are valid, the
    padding lives entirely after row M (validity masks pin its duals to 0).
    ``local_rows`` must be a multiple of ``tm``.

    ``Wr``/``Wc``: optional (local_rows, Np) slabs of row-/col-edge weight
    canvases (weighted anisotropic TV, reference DR2L1W_TV
    src/TV2DWopt.cpp:46) banded exactly like ``Yl``; they are static over the
    solve, so their halos are exchanged once at setup.

    Reference: the dual-update stencil of CondatChambollePock2_TV
    (src/TV2Dopt.cpp:656-745), executed as one mesh-spanning fused solve.
    """
    from ..ops.kernels import pdhg_fused as PK

    weighted = Wr is not None
    local_rows, Np = Yl.shape
    if k_steps is None or tm is None:
        k_auto, tm_auto = _pdhg_fused_params(N, weighted=weighted)
        k_steps = k_steps or k_auto
        tm = tm or tm_auto
    halo = 2 * k_steps
    assert local_rows % tm == 0, (local_rows, tm)
    dtype = Yl.dtype
    d = jax.lax.axis_index(axis_name)
    # Global row of local canvas row 0 is d*local_rows - halo; the kernel's
    # validity masks receive it as pad_top = halo - d*local_rows.
    roff = (halo - d * local_rows).astype(jnp.int32)

    if variant == "cp-acc":
        # Scale-invariant schedule from *global* statistics (psum'd so every
        # device runs the identical schedule).
        dY = Yl[:, 1:N] - Yl[:, : N - 1]
        gr = jnp.arange(local_rows) + d * local_rows
        vrow = (gr < M).astype(dtype)[:, None]
        ssum = jax.lax.psum(jnp.sum(dY * dY * vrow), axis_name)
        cnt = jax.lax.psum(jnp.sum(jnp.broadcast_to(vrow, dY.shape)),
                           axis_name)
        noise = jnp.sqrt(jnp.maximum(ssum / jnp.maximum(cnt, 1.0) * 0.5,
                                     1e-12))
        if weighted:
            # Effective penalty scale = global mean row-edge weight (same
            # statistic the single-device weighted driver uses).
            wsum = jax.lax.psum(jnp.sum(Wr[:, : N - 1] * vrow), axis_name)
            lam_eff = wsum / jnp.maximum(cnt, 1.0)
        else:
            lam_eff = jnp.asarray(lam, dtype)
        lam_rel = lam_eff / noise
        sigma0 = 0.5 * jnp.maximum(1.0, lam_rel)
        cap_mult = jnp.maximum(1.0, (lam_rel / 0.3) ** 1.5) / sigma0
    else:
        sigma0 = jnp.asarray(cfg.cp_sigma, dtype)
        cap_mult = 2.0
    tau0 = 0.9 / (8.0 * sigma0)

    cpc = max(1, 24 // k_steps)
    cap_pad = -(-cap // (cpc * k_steps)) * (cpc * k_steps)
    # Schedule rows are generated incrementally from a carried (sigma, tau)
    # (PK.sched_chunk), enabling the same gap-stall restart as the
    # single-device driver.  Every restart predicate is derived from the
    # PSUM'D gap, so all devices branch identically.
    sig0_f = jnp.asarray(sigma0, jnp.float32)
    tau0_f = jnp.asarray(tau0, jnp.float32)
    lam_f = jnp.asarray(lam, jnp.float32)

    up = [(i, i - 1) for i in range(1, n_dev)]      # send to device above
    down = [(i, i + 1) for i in range(n_dev - 1)]   # send to device below

    def exchange(A):
        """Refresh A's halo rows from the neighbors' core rows.  Edge
        devices receive zeros (ppermute semantics) — their halo rows are
        globally out of range, which the kernel's masks pin to zero."""
        top_core = jax.lax.dynamic_slice_in_dim(A, halo, halo, 0)
        bot_core = jax.lax.dynamic_slice_in_dim(A, local_rows, halo, 0)
        from_below = jax.lax.ppermute(top_core, axis_name, up)
        from_above = jax.lax.ppermute(bot_core, axis_name, down)
        A = jax.lax.dynamic_update_slice_in_dim(A, from_above, 0, 0)
        return jax.lax.dynamic_update_slice_in_dim(
            A, from_below, halo + local_rows, 0)

    # The kernel's in-chunk primal updates at halo rows read Y there, so the
    # DATA canvas needs real neighbor rows in its halo too — zero-filled
    # halos silently shift the boundary rows' fixed point (the dual update
    # one row inside the core reads a step-1 xbar computed against y = 0).
    Ypad = exchange(jnp.pad(Yl, ((halo, halo), (0, 0))))

    # Validity masks for the certificate, in global coordinates.
    r = jnp.arange(2 * halo + local_rows)[:, None] - halo + d * local_rows
    col = jnp.arange(Np)[None, :]
    in_img = (r >= 0) & (r < M)
    vr = ((col < N - 1) & in_img).astype(dtype)
    vc = ((col < N) & in_img & (r < M - 1)).astype(dtype)
    if weighted:
        # Weight canvases are static: halo-exchange once (the kernel updates
        # halo-row duals during a chunk, so halos need the true weights).
        Wrpad = exchange(jnp.pad(Wr, ((halo, halo), (0, 0))))
        Wcpad = exchange(jnp.pad(Wc, ((halo, halo), (0, 0))))
        lamr = Wrpad * vr
        lamc = Wcpad * vc
    else:
        Wrpad = Wcpad = None
        lamr = jnp.asarray(lam, dtype) * vr
        lamc = jnp.asarray(lam, dtype) * vc
    core = ((jnp.arange(2 * halo + local_rows) >= halo)
            & (jnp.arange(2 * halo + local_rows) < halo + local_rows)
            ).astype(dtype)[:, None]

    def dr_(X):
        return X - jnp.concatenate([X[:, 1:], jnp.zeros_like(X[:, :1])],
                                   axis=1)

    def drT_(U):
        return U - jnp.concatenate([jnp.zeros_like(U[:, :1]), U[:, :-1]],
                                   axis=1)

    def dc_(X):
        return X - jnp.concatenate([X[1:, :], jnp.zeros_like(X[:1, :])],
                                   axis=0)

    def dcT_(U):
        return U - jnp.concatenate([jnp.zeros_like(U[:1, :]), U[:-1, :]],
                                   axis=0)

    def gap_and_primal(u1, u2):
        """Certificate with fresh halos: per-device partial sums over OWN
        core rows, psum'd to the global per-image gap/objective."""
        u1 = jnp.where(vr > 0, u1, 0.0)
        u2 = jnp.where(vc > 0, u2, 0.0)
        xhat = Ypad - (drT_(u1) + dcT_(u2))
        gr_ = dr_(xhat) * vr
        gc_ = dc_(xhat) * vc
        e = lamr * jnp.abs(gr_) - u1 * gr_ + lamc * jnp.abs(gc_) - u2 * gc_
        gap = jax.lax.psum(jnp.sum(e * core), axis_name)
        obj = jax.lax.psum(
            jnp.sum((0.5 * (xhat - Ypad) ** 2 * in_img
                     + lamr * jnp.abs(gr_) + lamc * jnp.abs(gc_)) * core),
            axis_name)
        return gap, obj, xhat

    feps = jnp.finfo(dtype).eps
    if gap_tol is None:
        gtol = jnp.maximum(jnp.asarray(cfg.pdhg_gap_tol, dtype), 64.0 * feps)
    else:
        gtol = jnp.asarray(gap_tol, dtype)

    def chunk_call(sd, x, xb, u1, u2):
        return PK.pdhg_chunk(sd, x, xb, u1, u2, Ypad, k_steps=k_steps, tm=tm,
                             n_valid=N, m_valid=M, stride=M, count=1,
                             pad_top=roff, grad_step=(variant == "condat"),
                             wr=Wrpad, wc=Wcpad)

    # Gap-stall restart (same controller as the single-device driver, at
    # the banded certificate cadence: the stall window spans LOOK gap
    # checks = LOOK * cpc chunks).
    LOOK, DECAY, GROW = 3, 0.7, 4.0
    restart = variant == "cp-acc"

    def body(state):
        x, xb, u1, u2, sc, cap_mult_d, hist, t, gap_b, iters, running = state

        def one(_, st):
            x, xb, u1, u2, sc, t = st
            x, xb = exchange(x), exchange(xb)
            u1, u2 = exchange(u1), exchange(u2)
            sd, sc = PK.sched_chunk(sc, k_steps, lam_f, sig0_f,
                                    cap_mult_d, variant)
            x, xb, u1, u2 = chunk_call(sd, x, xb, u1, u2)
            return x, xb, u1, u2, sc, t + k_steps

        x, xb, u1, u2, sc, t = jax.lax.fori_loop(
            0, cpc, one, (x, xb, u1, u2, sc, t))
        iters = iters + cpc * k_steps * running.astype(jnp.int32)
        u1e, u2e = exchange(u1), exchange(u2)
        gap_new, obj, _ = gap_and_primal(u1e, u2e)
        if restart:
            stall = gap_new > DECAY * hist[0]
            sc = (jnp.where(stall, sig0_f, sc[0]),
                  jnp.where(stall, tau0_f, sc[1]))
            cap_mult_d = jnp.where(stall, cap_mult_d * GROW, cap_mult_d)
            hist = jnp.concatenate(
                [hist[1:], gap_new.reshape(1).astype(jnp.float32)])
        gap_b = jnp.where(running, gap_new, gap_b)
        running = running & (gap_b > gtol * jnp.maximum(1.0, obj))
        return (x, xb, u1, u2, sc, cap_mult_d, hist, t, gap_b, iters,
                running)

    def cond(state):
        *_, t, gap_b, iters, running = state
        return (t < cap_pad) & running

    zeros = jnp.zeros_like(Ypad)
    init = (Ypad, Ypad, zeros, zeros, (sig0_f, tau0_f),
            jnp.asarray(cap_mult, jnp.float32),
            jnp.full((LOOK,), jnp.inf, jnp.float32), jnp.int32(0),
            jnp.asarray(jnp.inf, dtype), jnp.int32(0), jnp.asarray(True))
    (x, xb, u1, u2, _sc, _cm, _h, t, gap_b, iters,
     running) = jax.lax.while_loop(cond, body, init)

    u1e, u2e = exchange(u1), exchange(u2)
    gap_b, obj, xhat = gap_and_primal(u1e, u2e)
    rc = jnp.where(gap_b > gtol * jnp.maximum(1.0, obj), RC_ITERS,
                   RC_OK).astype(jnp.int32)
    out = xhat[halo: halo + local_rows]
    return out, make_info(iters[None], gap_b[None], rc[None])


# -- Column-exact primal-dual (reference Kolmogorov2_TV) --------------------


def _run_kolmogorov(Y, w_row, w_col, cap, tol, inner_method: str):
    """PDHG with G(x) = 0.5||x-Y||^2 + w_col*colTV (proximable exactly via the
    batched 1D solver + Moreau scaling) and the row term dualized.

    ``w_row`` may be a scalar or a (B, M, N-1) per-edge field (it only enters
    the dual clip); ``w_col`` a scalar or a (B, M-1, N) per-edge field
    (reshaped to per-column-fiber weights for the exact 1D prox) — the
    weighted variant the reference lacks (its weighted 2D ships DR only,
    src/TV2DWopt.cpp:46)."""
    B, M, N = Y.shape
    sigma0, tau0 = 1.0, 0.9 / (4.0 * 1.0)  # ||D_row||^2 <= 4
    pcol, s0 = _make_col_prox(B, M, N, None, 1.0, inner_method, None, Y.dtype)
    wc_fiber = (jnp.swapaxes(w_col, 1, 2).reshape(B * N, M - 1)
                if jnp.ndim(w_col) == 3 else w_col)

    def prox_G(v, tau, s):
        # prox_{tau G}(v) = prox_{(tau w_col/(1+tau)) colTV}((v + tau Y)/(1+tau))
        t = (v + tau * Y) / (1.0 + tau)
        Vt = jnp.swapaxes(t, 1, 2).reshape(B * N, M)
        out, s = _prox1d_ws(Vt, tau * wc_fiber / (1.0 + tau), 1.0,
                            inner_method, s)
        return jnp.swapaxes(out.reshape(B, N, M), 1, 2), s

    def body(state):
        x, xbar, u, s = state
        u = jnp.clip(u + sigma0 * _drow(xbar), -w_row, w_row)
        x_new, s = prox_G(x - tau0 * _drow_t(u), tau0, s)
        # Fixed steps, theta = 1: with the exact column prox inside G this
        # converges in a few dozen sweeps.
        xbar = 2.0 * x_new - x
        return x_new, xbar, u, s

    z = jnp.zeros((B, M, N - 1), Y.dtype)
    return _loop(body, (Y, Y, z, s0), lambda s: s[0], cap, tol)


# ---------------------------------------------------------------------------
# Public batched entry points
# ---------------------------------------------------------------------------


def _dispatch(Y, cfgs, method, max_iters, cfg):
    """Shared splitting-method dispatch over stateful prox factories."""
    (pcol, s1_0), (prow, s2_0) = cfgs
    tol = cfg.stop
    method = method.lower()
    if method == "pd":
        return _run_pd(Y, pcol, s1_0, prow, s2_0,
                       max_iters or cfg.max_iters_pd, tol)
    if method == "dr":
        return _run_dr(Y, pcol, s1_0, prow, s2_0,
                       max_iters or cfg.max_iters_dr, tol)
    if method == "yang":
        raise AssertionError("yang handled by caller (needs rho-scaled proxes)")
    raise ValueError(f"Unknown 2D method: {method!r}")


def tv1_2d_batched(Y, lam, method: str = "dr", max_iters: int = 0,
                   inner_method: str = "pn",
                   cfg: CombinerConfig = DEFAULT_COMBINER, use_fused=None):
    """Batched 2D anisotropic TV-L1 prox on (B, M, N) image stacks.

    Methods: dr (default), pd, yang, condat, chambolle-pock,
    chambolle-pock-acc, kolmogorov (reference prox_tv/__init__.py:355-443).

    ``use_fused``: force the single-device Pallas kernels on/off; by default
    they are disabled automatically when Y is concretely sharded over more
    than one device (the XLA paths shard under GSPMD instead).  Pass
    ``use_fused=False`` explicitly when calling from inside your own jit
    with sharded operands.
    """
    if use_fused is None:
        use_fused = not _concrete_multidevice(Y)
    with _fused_ctx(bool(use_fused)):
        return _tv1_2d_batched(Y, lam, method=method, max_iters=max_iters,
                               inner_method=inner_method, cfg=cfg,
                               use_fused=bool(use_fused))


@functools.partial(jax.jit, static_argnames=("method", "max_iters",
                                             "inner_method", "cfg",
                                             "use_fused"))
def _tv1_2d_batched(Y, lam, method, max_iters, inner_method, cfg, use_fused):
    Y = jnp.asarray(Y)
    B, M, N = Y.shape
    lam = jnp.asarray(lam, Y.dtype)
    tol = cfg.stop
    method = method.lower()

    if lam.ndim == 1:
        # Per-image penalties: express as uniform per-edge weight fields and
        # reuse the weighted drivers (incl. the weighted fused PDHG on TPU).
        if method not in ("pd", "dr", "yang", "condat", "chambolle-pock",
                          "chambolle-pock-acc"):
            raise ValueError(
                f"method {method!r} does not support per-image penalties; "
                "use a scalar lam or one of pd/dr/yang/condat/chambolle-pock/"
                "chambolle-pock-acc")
        Wc = jnp.broadcast_to(lam[:, None, None], (B, M - 1, N))
        Wr = jnp.broadcast_to(lam[:, None, None], (B, M, N - 1))
        return _tv1w_2d_batched(Y, Wc, Wr, max_iters=max_iters,
                                method=method, inner_method=inner_method,
                                cfg=cfg, use_fused=use_fused)

    if method in ("pd", "dr"):
        cfgs = (_make_col_prox(B, M, N, lam, 1.0, inner_method, None, Y.dtype),
                _make_row_prox(B, M, N, lam, 1.0, inner_method, None, Y.dtype))
        return _dispatch(Y, cfgs, method, max_iters, cfg)
    if method == "yang":
        rho = cfg.yang_rho
        pcol, s1 = _make_col_prox(B, M, N, lam / rho, 1.0, inner_method, None, Y.dtype)
        prow, s2 = _make_row_prox(B, M, N, lam / rho, 1.0, inner_method, None, Y.dtype)
        return _run_yang(Y, pcol, s1, prow, s2,
                         max_iters or cfg.max_iters_yang, tol, rho)
    if method in ("condat", "chambolle-pock", "chambolle-pock-acc"):
        cap = max_iters or cfg.max_iters_condat
        variant = {"condat": "condat", "chambolle-pock": "cp",
                   "chambolle-pock-acc": "cp-acc"}[method]
        if _pdhg_fused_ok(Y, variant):
            return _run_pdhg_fused(Y, lam, cap, tol, cfg, variant)
        return _run_pdhg(Y, lam, lam, cap, tol, cfg, variant)
    if method == "kolmogorov":
        cap = max_iters or cfg.max_iters_kolmogorov
        return _run_kolmogorov(Y, lam, lam, cap, tol, inner_method)
    raise ValueError(f"Unknown 2D method: {method!r}")


def tv1w_2d_batched(Y, W_col, W_row, max_iters: int = 0, method: str = "dr",
                    inner_method: str = "pn",
                    cfg: CombinerConfig = DEFAULT_COMBINER, use_fused=None):
    """Batched weighted 2D TV-L1 prox (reference DR2L1W_TV, src/TV2DWopt.cpp:46).

    Args:
        Y: (B, M, N) images.
        W_col: (B, M-1, N) per-edge weights along columns.
        W_row: (B, M, N-1) per-edge weights along rows.
        use_fused: see :func:`tv1_2d_batched`.
    """
    if use_fused is None:
        use_fused = not _concrete_multidevice(Y)
    with _fused_ctx(bool(use_fused)):
        return _tv1w_2d_batched(Y, W_col, W_row, max_iters=max_iters,
                                method=method, inner_method=inner_method,
                                cfg=cfg, use_fused=bool(use_fused))


@functools.partial(jax.jit, static_argnames=("max_iters", "method",
                                             "inner_method", "cfg",
                                             "use_fused"))
def _tv1w_2d_batched(Y, W_col, W_row, max_iters, method, inner_method, cfg,
                     use_fused):
    Y = jnp.asarray(Y)
    B, M, N = Y.shape
    method = method.lower()
    if method in ("condat", "chambolle-pock", "chambolle-pock-acc"):
        variant = {"condat": "condat", "chambolle-pock": "cp",
                   "chambolle-pock-acc": "cp-acc"}[method]
        if _pdhg_fused_ok(Y, variant):
            cap = max_iters or cfg.max_iters_condat
            return _run_pdhg_fused(Y, 0.0, cap, cfg.stop, cfg, variant,
                                   W_col=W_col, W_row=W_row)
        raise ValueError("weighted primal-dual requires the TPU fused path; "
                         "use method='dr' or 'pd'")
    if method == "yang":
        rho = cfg.yang_rho
        W_col = jnp.asarray(W_col, Y.dtype)
        W_row = jnp.asarray(W_row, Y.dtype)
        pcol, s1 = _make_col_prox(B, M, N, None, 1.0, inner_method,
                                  W_col / rho, Y.dtype)
        prow, s2 = _make_row_prox(B, M, N, None, 1.0, inner_method,
                                  W_row / rho, Y.dtype)
        return _run_yang(Y, pcol, s1, prow, s2,
                         max_iters or cfg.max_iters_yang, cfg.stop, rho)
    if method == "kolmogorov":
        return _run_kolmogorov(Y, jnp.asarray(W_row, Y.dtype),
                               jnp.asarray(W_col, Y.dtype),
                               max_iters or cfg.max_iters_kolmogorov,
                               cfg.stop, inner_method)
    if method not in ("pd", "dr"):
        raise ValueError(f"Unknown weighted 2D method: {method!r}")
    cfgs = (_make_col_prox(B, M, N, None, 1.0, inner_method, W_col, Y.dtype),
            _make_row_prox(B, M, N, None, 1.0, inner_method, W_row, Y.dtype))
    return _dispatch(Y, cfgs, method, max_iters, cfg)


def tvp_2d_batched(Y, w_col, w_row, p_col: float, p_row: float,
                   max_iters: int = 0, cfg: CombinerConfig = DEFAULT_COMBINER,
                   use_fused=None):
    """Batched general-norm 2D TV prox (reference DR2_TV with p args)."""
    if use_fused is None:
        use_fused = not _concrete_multidevice(Y)
    with _fused_ctx(bool(use_fused)):
        return _tvp_2d_batched(Y, w_col, w_row, p_col=p_col, p_row=p_row,
                               max_iters=max_iters, cfg=cfg,
                               use_fused=bool(use_fused))


@functools.partial(jax.jit, static_argnames=("p_col", "p_row", "max_iters",
                                             "cfg", "use_fused"))
def _tvp_2d_batched(Y, w_col, w_row, p_col, p_row, max_iters, cfg, use_fused):
    Y = jnp.asarray(Y)
    B, M, N = Y.shape
    w_col = jnp.asarray(w_col, Y.dtype)
    w_row = jnp.asarray(w_row, Y.dtype)
    cfgs = (_make_col_prox(B, M, N, w_col, p_col, "pn", None, Y.dtype),
            _make_row_prox(B, M, N, w_row, p_row, "pn", None, Y.dtype))
    return _dispatch(Y, cfgs, "dr", max_iters, cfg)
