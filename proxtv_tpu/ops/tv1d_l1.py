"""Batched 1D TV-L1 proximity solvers (TPU-native).

Solves, for every signal in a batch,

    min_x 0.5 ||x - y||^2 + sum_i w_i |x_{i+1} - x_i|

with scalar or per-edge weights.  Five independent engines are provided, each a
TPU-first redesign of a reference algorithm family:

*   :func:`tv1_pn` — projected Newton on the dual box-constrained QP
    (reference ``src/TVL1opt.cpp:37`` ``PN_TV1`` and ``src/TVL1Wopt.cpp:37``
    ``PN_TV1_Weighted``).  Instead of gathering the inactive set into a reduced
    LAPACK tridiagonal system, the full-size system is solved with *masked*
    parallel cyclic reduction: active rows become identity rows, decoupled
    off-diagonals are zeroed.  Every step is a full-width vector op — no
    gather/scatter, fully batched over signals AND parallel in n (O(log n) depth).

*   :func:`tv1_tautstring` — the linearized taut-string scan (reference
    ``src/TVL1opt.cpp:359`` ``linearizedTautString_TV1`` /
    ``src/TVL1Wopt.cpp:364`` ``tautString_TV1_Weighted``; equivalent to Condat's
    direct method).  Reformulated as a lock-step ``while_loop`` state machine —
    one event (point advance or segment break) per step across all lanes — with
    segment records scattered to an (end,value) buffer and the solution
    reconstructed by a reverse cumulative-min fill, avoiding the reference's
    variable-length in-loop writes.

*   :func:`tv1_dp` — the Kolmogorov/Pock/Rolinek message-passing dynamic program
    (reference ``src/TVL1opt_kolmogorov.cpp:38``; Johnson's DP
    ``src/johnsonRyanTV.cpp:9`` is the same clipped-message recursion).  O(n)
    worst-case.  The breakpoint deque lives in a per-lane arena; each lock-step
    iteration performs one deque operation; the backward clamping pass is a
    vectorized reverse scan.

*   :func:`tv1_condat` — Condat's direct dual-variable segment scan (reference
    ``src/condat_fast_tv.cpp:78`` ``TV1D_denoise``, SPL 2013): a genuinely
    distinct published algorithm that tracks the running dual variable's
    min/max excursions (umin/umax) and candidate segment values (vmin/vmax)
    instead of a taut-string tube or DP messages.  Lock-step, one reference
    loop event per ``while_loop`` iteration, segment records scattered at
    their start index and materialized by a forward fill.

*   :func:`tv1_classic_ts` — the CLASSIC taut-string method (reference
    ``src/TVL1opt_tautstring.cpp:256`` ``classicTautString_TV1``): concave-
    majorant / convex-minorant hulls of the cumsum tube maintained as
    segment deques with O(1)-amortized hull merges, knots emitted when the
    leftmost slopes cross.  Lock-step, one deque event per iteration, hull
    arenas per lane.

All engines accept signals of shape (B, n) and weights either scalar, (B,), or
per-edge (B, n-1).  Exactness contract: engines agree with each other and with a
high-precision oracle to solver tolerance (the reference's cross-method test
strategy, ``prox_tv/prox_tv_test.py:37-62``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils import diffs
from ..utils.config import DEFAULT_TV1, EPSILON, TV1Config
from ..utils.info import RC_ITERS, RC_OK, RC_STUCK, SolverInfo, make_info
from . import tridiag

# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------


def _edge_weights(lam, B, n, dtype):
    """Broadcast lam (scalar, (B,), or (B, n-1)) to a (B, n-1) edge-weight array."""
    lam = jnp.asarray(lam, dtype)
    if lam.ndim == 0:
        return jnp.broadcast_to(lam, (B, n - 1))
    if lam.ndim == 1:
        if lam.shape[0] == B:
            return jnp.broadcast_to(lam[:, None], (B, n - 1))
        if lam.shape[0] == n - 1:
            return jnp.broadcast_to(lam[None, :], (B, n - 1))
        raise ValueError(f"Cannot interpret weight shape {lam.shape} for batch {B}, n {n}")
    return jnp.broadcast_to(lam, (B, n - 1))


def _gap_tv1w(w, g, lam):
    """Duality gap, reference GRAD2GAP (src/TVL1opt.cpp:46-49):
    gap = sum_i |g_i| lam_i + w_i g_i."""
    return jnp.abs(jnp.sum(jnp.abs(g) * lam + w * g, axis=-1))


def _apply_degenerate_guards(x, y, lamv):
    """Handle the two degenerate penalty regimes exactly, protecting low-precision
    dtypes from catastrophic cancellation in ``y +/- lam``:

    * all-zero weights -> prox is the identity;
    * weights so large the solution is provably constant -> prox is the mean.
      (Sufficient condition: min_i lam_i >= n^2 * max|dy|, which dominates the
      exact threshold ||(DD')^{-1} Dy||_inf used by the reference PN solver,
      src/TVL1opt.cpp:120-133.)
    """
    n = y.shape[-1]
    dy_max = jnp.max(jnp.abs(diffs.forward_diff(y)), axis=-1)
    all_zero = jnp.all(lamv <= 0, axis=-1)
    huge = jnp.min(lamv, axis=-1) >= (float(n) * float(n)) * dy_max
    mean = jnp.mean(y, axis=-1, keepdims=True)
    x = jnp.where(huge[:, None], mean, x)
    return jnp.where(all_zero[:, None], y, x)


# ---------------------------------------------------------------------------
# Engine 1: projected Newton on the dual (batched, masked cyclic reduction)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "tridiag_method", "return_dual"))
def tv1_pn(y, lam, cfg: TV1Config = DEFAULT_TV1, tridiag_method: str = "pcr",
           w_init=None, return_dual: bool = False):
    """Batched projected-Newton TV-L1 prox (weighted-capable).

    Args:
        y: (B, n) batch of signals.
        lam: scalar, (B,), or (B, n-1) nonnegative penalty weights.
        cfg: solver tolerances (defaults mirror the reference).
        w_init: optional (B, n-1) dual warm start — the TPU analog of the
            reference Workspace warm restart (src/utils.h:30-33,
            src/TVL1opt.cpp:148-149); combiners carry each fiber's dual
            across outer iterations.
        return_dual: also return the final dual vector.

    Returns:
        (x, info) or (x, info, w): (B, n) solution, per-signal
        :class:`SolverInfo`, and optionally the (B, n-1) dual.
    """
    y = jnp.asarray(y)
    B, n = y.shape
    dtype = y.dtype
    eps = jnp.asarray(EPSILON, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    if n == 1:
        info1 = make_info(jnp.zeros((B,), jnp.int32), jnp.zeros((B,), dtype),
                          jnp.zeros((B,), jnp.int32))
        if return_dual:
            return y, info1, jnp.zeros((B, 0), dtype)
        return y, info1

    lamv = _edge_weights(lam, B, n, dtype)

    # Center each signal: the prox is translation-equivariant and the dual
    # depends only on Dy, so solving on y - mean(y) leaves the dual unchanged
    # while making every internal magnitude (fval, duality gap, and therefore
    # the dtype-relative stopping scale below) invariant to DC offsets — in
    # f32 this is worth several orders of magnitude of accuracy for signals
    # far from zero (e.g. random-walk data, image fibers).
    ybar = jnp.mean(y, axis=-1, keepdims=True)
    y = y - ybar

    dy = diffs.forward_diff(y)  # (B, n-1)
    if w_init is None:
        # Unconstrained dual solution: DD' w = Dy (reference src/TVL1opt.cpp:110-117).
        w0 = tridiag.spd_second_difference_solve(dy, method=tridiag_method)
        # If |w0| <= lam everywhere the unconstrained solution is feasible: x = mean(y)
        # follows automatically since D(y + D'w0) = 0 (no special case needed).
        w = jnp.clip(w0, -lamv, lamv)
    else:
        w = jnp.clip(jnp.asarray(w_init, dtype), -lamv, lamv)

    x = diffs.dual2primal(w, y)
    g = diffs.primal2grad(x)
    fval = 0.5 * jnp.sum(x * x, axis=-1)

    sigma = jnp.asarray(cfg.sigma, dtype)

    def inactive_mask(w, g):
        # Reference CHECK_INACTIVE (src/TVL1opt.cpp:62-65), restricted to
        # lam_i > 0: a zero-weight edge has both box bounds at 0, so its dual
        # is permanently pinned — treating it as inactive (movable) makes the
        # Newton step clip back to 0 and the solver exit via the stuck-gap
        # test at a suboptimal point.
        return (lamv > 0) & (
            ((w > -lamv) & (w < lamv)) | ((w == -lamv) & (g < -eps))
            | ((w == lamv) & (g > eps)))

    def armijo(w, g, d, mI, x, fval):
        """Bounded Armijo + quadratic-interpolation stepsize search
        (reference src/TVL1opt.cpp:203-276), batched with per-lane masks.
        ``x`` must be the current primal ``y + D'w`` for this ``w``."""
        gRd = jnp.sum(jnp.where(mI, g * d, 0.0), axis=-1)

        # grad0: directional derivative used for interpolation.  Vectorized over all
        # inactive entries not pinned at +lam (the reference skips w == +lam entries,
        # src/TVL1opt.cpp:245-255).
        hw = 2.0 * w - jnp.pad(w[:, :-1], ((0, 0), (1, 0))) - jnp.pad(w[:, 1:], ((0, 0), (0, 1)))
        dy_edges = diffs.forward_diff(y)
        use = mI & ~(w == lamv)
        # grad0 depends on d, which is fixed during the search: compute lazily below.

        def maxstep_fn(d):
            t_neg = jnp.where(mI & (d < 0), (w - lamv) / d, -big)
            t_pos = jnp.where(mI & (d > 0), (w + lamv) / d, -big)
            return jnp.maximum(jnp.max(t_neg, axis=-1), jnp.max(t_pos, axis=-1))

        grad0 = jnp.sum(jnp.where(use, -d * (hw - dy_edges), 0.0), axis=-1)
        maxstep0 = maxstep_fn(d)

        def body(state):
            k, delta, maxstep, found, stop_flag, best_aux, best_x, best_f, recomp = state
            aux = jnp.where(mI, jnp.clip(w - delta[:, None] * d, -lamv, lamv), w)
            # Cancellation-free objective change: with x = y + D'w fixed during
            # the search, f(aux) - f(w) = sum x.(D'dw) + 0.5 ||D'dw||^2 where
            # dw = aux - w.  Differencing two O(||y||^2) objective values
            # instead quantizes the improvement to ulp(fval) — in f32 at
            # n ~ 1e6 that is ~0.1 absolute, which stalls the line search and
            # with it the outer Newton loop long before the gap tolerance.
            dx = diffs.adjoint_diff(aux - w)
            x_new = x + dx
            improve = -(jnp.sum(x * dx, axis=-1) + 0.5 * jnp.sum(dx * dx, axis=-1))
            f_new = fval - improve
            # Zero improvement: direction not useful -> accept and stop searching
            # (the reference breaks out of the search, src/TVL1opt.cpp:223-224).
            # Threshold scaled to the dtype's resolution of fval.
            no_improve = improve <= eps_f
            rhs = sigma * delta * gRd
            ok = improve >= rhs

            newly_done = (~found) & (~stop_flag) & (ok | no_improve)
            best_aux = jnp.where(newly_done[:, None], aux, best_aux)
            best_x = jnp.where(newly_done[:, None], x_new, best_x)
            best_f = jnp.where(newly_done, f_new, best_f)
            found = found | newly_done

            # Interpolated next stepsize for lanes still searching.
            searching = ~found & ~stop_flag
            tmp = grad0 * delta
            denom = 2.0 * (-improve - tmp)
            delta_interp = jnp.where(denom != 0, -(tmp * delta) / denom, delta * 0.5)
            ms = jnp.where(recomp, maxstep, maxstep0)
            delta_new = jnp.minimum(delta_interp, ms)
            delta_new = jnp.where(delta_new - delta >= -eps, delta * 0.5, delta_new)
            # Negative/zero step: accept current candidate and stop (reference
            # sets found=true with the *projected current* point).
            dead = searching & (delta_new < eps)
            best_aux = jnp.where(dead[:, None], aux, best_aux)
            best_x = jnp.where(dead[:, None], x_new, best_x)
            best_f = jnp.where(dead, f_new, best_f)
            found = found | dead

            delta = jnp.where(searching, delta_new, delta)
            maxstep = jnp.where(searching, delta_new, maxstep)
            return (k + 1, delta, maxstep, found, stop_flag, best_aux, best_x, best_f,
                    jnp.ones_like(recomp))

        def cond(state):
            k, _, _, found, stop_flag, *_ = state
            return (k < cfg.max_armijo) & jnp.any(~(found | stop_flag))

        init = (jnp.int32(0), jnp.ones((B,), dtype), maxstep0,
                jnp.zeros((B,), bool), jnp.zeros((B,), bool),
                w, x, fval, jnp.zeros((B,), bool))
        _, _, _, _, _, aux, x_new, f_new, _ = jax.lax.while_loop(cond, body, init)
        return aux, x_new, f_new

    def outer_body(state):
        w, g, x, fval, stop, best, stall, iters, running = state
        mI = inactive_mask(w, g)
        any_inactive = jnp.any(mI, axis=-1)

        # Masked Newton direction: solve the full tridiagonal system with active
        # rows as identity / decoupled (equivalent to the reference reduced system).
        d = tridiag.spd_second_difference_solve(
            jnp.where(mI, g, 0.0), mask=mI, method=tridiag_method)
        d = jnp.where(mI, d, 0.0)

        aux, x_new, f_new = armijo(w, g, d, mI, x, fval)

        g_new = diffs.primal2grad(x_new)
        stop_new = _gap_tv1w(aux, g_new, lamv)

        act = running & any_inactive
        w = jnp.where(act[:, None], aux, w)
        x = jnp.where(act[:, None], x_new, x)
        g = jnp.where(act[:, None], g_new, g)
        fval = jnp.where(act, f_new, fval)
        stop = jnp.where(act, stop_new, stop)
        # Stuck detection: count consecutive iterations without a material
        # best-gap improvement (the reference's single-step |delta gap| <=
        # EPSILON test, src/TVL1opt.cpp:286-290, made robust to the slow
        # tail steps and f32 gap-evaluation noise of very long signals).
        improved = (stop < best - eps_gap) | (stop < 0.875 * best)
        best = jnp.minimum(best, stop)
        stall = jnp.where(act, jnp.where(improved, 0, stall + 1), stall)
        iters = iters + act.astype(jnp.int32)
        # Lanes with no inactive constraints are finished (reference returns).
        running = running & any_inactive & (stop > tol) & (stall < MAX_STALL)
        return w, g, x, fval, stop, best, stall, iters, running

    def outer_cond(state):
        *_, iters, running = state
        return jnp.any(running) & (jnp.max(iters) < cfg.max_iters)

    # Dtype-aware relative stopping: the reference's absolute gap 1e-6 assumes
    # f64; in f32 it is unreachable and every solve would run to max_iters.
    # Scale by the problem magnitude (0.5||y||^2 dominates the dual objective),
    # floored at 1 so tiny problems keep the absolute contract.
    scale = jnp.maximum(1.0, 0.5 * jnp.sum(y * y, axis=-1))
    tol = jnp.maximum(cfg.stop, 2.0 * jnp.finfo(dtype).eps * scale)
    eps_gap = jnp.maximum(eps, 2.0 * jnp.finfo(dtype).eps * scale)
    eps_f = jnp.maximum(eps, 10.0 * jnp.finfo(dtype).eps * scale)
    MAX_STALL = 5

    stop0 = _gap_tv1w(w, g, lamv)
    running0 = stop0 > tol
    init = (w, g, x, fval, stop0, stop0, jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32), running0)
    w, g, x, fval, stop, best, stall, iters, running = jax.lax.while_loop(
        outer_cond, outer_body, init)

    rc = jnp.where(iters >= cfg.max_iters, RC_ITERS,
                   jnp.where((stop > tol) & (stall >= MAX_STALL),
                             RC_STUCK, RC_OK)).astype(jnp.int32)
    info = make_info(iters, jnp.abs(stop), rc)
    x = x + ybar
    if return_dual:
        return x, info, w
    return x, info


# ---------------------------------------------------------------------------
# Engine 2: linearized taut-string scan (lock-step state machine)
# ---------------------------------------------------------------------------


@jax.jit
def tv1_tautstring(y, lam):
    """Batched linearized taut-string TV-L1 prox (weighted-capable, exact).

    Lock-step reformulation of the reference scan
    (``src/TVL1Wopt.cpp:364`` ``tautString_TV1_Weighted``; the unweighted
    ``linearizedTautString_TV1`` is the constant-weight special case — the
    reference's own uniform-weight tests assert this equivalence).  Each
    ``while_loop`` iteration processes one event per lane: a point advance, a
    segment break (with backtrack), or termination.  Completed segments are
    recorded as (end-index, value) pairs; the solution is materialized afterwards
    with a reverse cumulative-min fill.
    """
    y = jnp.asarray(y)
    B, n = y.shape
    dtype = y.dtype
    eps = jnp.asarray(EPSILON, dtype)

    if n == 1:
        return y

    lamv = _edge_weights(lam, B, n, dtype)
    rows = jnp.arange(B)

    def gy(idx):
        return jnp.take_along_axis(y, jnp.clip(idx, 0, n - 1)[:, None], axis=1)[:, 0]

    def glam(idx):
        return jnp.take_along_axis(lamv, jnp.clip(idx, 0, n - 2)[:, None], axis=1)[:, 0]

    def body(state):
        (i, mn, mx, mnH, mxH, mnBreak, mxBreak, lastBreak,
         seg_val, seg_end_mark) = state
        done = i >= n
        yi = gy(i)
        lam_i = glam(i)          # lambda[i], valid for i < n-1
        is_last = i == (n - 1)

        mnH1 = mnH + mn - yi
        ceil_viol = jnp.where(is_last, mnH1 > eps, lam_i < mnH1)
        mxH1 = mxH + mx - yi
        floor_viol = ~ceil_viol & jnp.where(is_last, mxH1 < -eps, -lam_i > mxH1)
        brk = (ceil_viol | floor_viol) & ~done

        # ----- break transition -----
        b_end = jnp.where(ceil_viol, mnBreak, mxBreak)
        b_val = jnp.where(ceil_viol, mn, mx)
        i_new = b_end + 1
        y_new = gy(i_new)
        lam_nm1 = glam(i_new - 1)                      # lambda[i_new - 1]
        new_is_last = i_new == (n - 1)
        lam_n = jnp.where(is_last & new_is_last, 0.0, glam(i_new))
        # General-case break sets the tube radius at the new point; the ending-case
        # break zeroes it at n-1 (reference src/TVL1Wopt.cpp:420-423,510-513).
        sgn = jnp.where(ceil_viol, 1.0, -1.0)          # +: pinned at floor; -: ceiling
        mn_b = y_new + sgn * lam_nm1 - lam_n
        mx_b = y_new + sgn * lam_nm1 + lam_n
        mnH_b = jnp.where(is_last, -sgn * lam_nm1, -lam_n)
        mxH_b = jnp.where(is_last, -sgn * lam_nm1, lam_n)
        i_b = jnp.where(is_last, i_new, i_new + 1)

        # ----- no-violation transition -----
        step_gen = ~brk & ~done & ~is_last
        denom = (i - lastBreak).astype(dtype)
        touch_hi = mxH1 >= lam_i
        mx_g = jnp.where(touch_hi, mx + (lam_i - mxH1) / denom, mx)
        mxH_g = jnp.where(touch_hi, lam_i, mxH1)
        mxBreak_g = jnp.where(touch_hi, i, mxBreak)
        touch_lo = mnH1 <= -lam_i
        mn_g = jnp.where(touch_lo, mn + (-lam_i - mnH1) / denom, mn)
        mnH_g = jnp.where(touch_lo, -lam_i, mnH1)
        mnBreak_g = jnp.where(touch_lo, i, mnBreak)

        step_last = ~brk & ~done & is_last
        mn_l = jnp.where(mnH1 <= 0, mn + (-mnH1) / denom, mn)

        finish = step_last  # i becomes n next

        # ----- merge -----
        i_next = jnp.where(done, i, jnp.where(brk, i_b, i + 1))
        mn_next = jnp.where(brk, mn_b, jnp.where(step_last, mn_l, jnp.where(step_gen, mn_g, mn)))
        mx_next = jnp.where(brk, mx_b, jnp.where(step_gen, mx_g, mx))
        mnH_next = jnp.where(brk, mnH_b, jnp.where(step_gen, mnH_g, mnH1))
        mxH_next = jnp.where(brk, mxH_b, jnp.where(step_gen, mxH_g, jnp.where(step_last, mxH1, mxH)))
        mnH_next = jnp.where(done, mnH, mnH_next)
        mxH_next = jnp.where(done, mxH, mxH_next)
        mn_next = jnp.where(done, mn, mn_next)
        mx_next = jnp.where(done, mx, mx_next)
        mnBreak_next = jnp.where(brk, i_new, jnp.where(step_gen, mnBreak_g, mnBreak))
        mxBreak_next = jnp.where(brk, i_new, jnp.where(step_gen, mxBreak_g, mxBreak))
        lastBreak_next = jnp.where(brk, b_end, lastBreak)

        # ----- segment record (one scatter; garbage-bin column n for no-ops) -----
        rec = brk | finish
        rec_end = jnp.where(brk, b_end, n - 1)
        rec_val = jnp.where(brk, b_val, mn_l)
        col = jnp.where(rec, rec_end, n)
        seg_val = seg_val.at[rows, col].set(rec_val)
        seg_end_mark = seg_end_mark.at[rows, col].set(True)

        return (i_next, mn_next, mx_next, mnH_next, mxH_next,
                mnBreak_next, mxBreak_next, lastBreak_next, seg_val, seg_end_mark)

    def cond(state):
        i = state[0]
        return jnp.any(i < n)

    lam0 = lamv[:, 0]
    init = (
        jnp.zeros((B,), jnp.int32),
        y[:, 0] - lam0,                 # mn
        y[:, 0] + lam0,                 # mx
        jnp.zeros((B,), dtype),         # mnHeight
        jnp.zeros((B,), dtype),         # mxHeight
        jnp.zeros((B,), jnp.int32),     # mnBreak
        jnp.zeros((B,), jnp.int32),     # mxBreak
        jnp.full((B,), -1, jnp.int32),  # lastBreak
        jnp.zeros((B, n + 1), dtype),
        jnp.zeros((B, n + 1), bool),
    )
    *_, seg_val, seg_mark = jax.lax.while_loop(cond, body, init)

    # Reconstruct: x[j] = value of the nearest recorded segment end >= j.
    idx = jnp.where(seg_mark[:, :n], jnp.arange(n)[None, :], n - 1)
    nxt = jax.lax.associative_scan(jnp.minimum, idx, reverse=True, axis=1)
    x = jnp.take_along_axis(seg_val[:, :n], nxt, axis=-1)
    return _apply_degenerate_guards(x, y, lamv)


# ---------------------------------------------------------------------------
# Engine 2b: Condat's direct dual-variable segment scan (lock-step)
# ---------------------------------------------------------------------------


@jax.jit
def tv1_condat(y, lam):
    """Batched Condat direct TV-L1 prox (unweighted; exact).

    Lock-step reformulation of Condat's dual-variable algorithm (reference
    ``src/condat_fast_tv.cpp:78`` ``TV1D_denoise``; L. Condat, "A Direct
    Algorithm for 1-D Total Variation Denoising", IEEE SPL 2013).  The state
    per lane is the running dual excursions ``umin``/``umax`` (the dual
    variable's distance from its +-lam bounds accumulated since the current
    segment start ``k0``), the candidate segment values ``vmin``/``vmax``,
    and the last positions ``kminus``/``kplus`` where each bound was hit —
    an INDEPENDENT algorithm family from the taut-string tube scan and the
    DP message recursion (it reasons about the dual u, not the primal tube),
    giving the cross-method metamorphic tests a fourth engine.

    Each ``while_loop`` iteration executes exactly one event of the
    reference's loop: a sample accumulation (possibly updating vmin/vmax), a
    negative/positive jump (segment emission + state reset), or a boundary
    event at k = n-1.  Emitted segments are scattered as (start-index,
    value) records; the solution is materialized afterwards by a forward
    fill.  Work is O(n) amortized per lane, exactly like the reference.

    ``lam``: scalar or (B,) per-signal penalties (the reference algorithm is
    unweighted; per-edge weights raise — use the taut-string/PN/DP engines).
    """
    y = jnp.asarray(y)
    B, n = y.shape
    dtype = y.dtype

    if n == 1:
        return y

    lam = jnp.asarray(lam, dtype)
    if lam.ndim >= 2 or (lam.ndim == 1 and lam.shape[0] == n - 1 and B != n - 1):
        raise ValueError("tv1_condat is unweighted: lam must be scalar or "
                         "(B,) per-signal (reference TV1D_denoise takes one "
                         "lambda, src/condat_fast_tv.cpp:78)")
    # A negative penalty would let k run past n-1 (the k==n-1 termination
    # event can then never fire — the reference guards with `if (lambda>=0)`,
    # src/condat_fast_tv.cpp:84); clamp so a bad penalty degrades to identity
    # instead of a non-terminating device loop.
    lamv = jnp.maximum(jnp.broadcast_to(lam, (B,)), jnp.zeros((), dtype))
    rows = jnp.arange(B)

    def gy(idx):
        return jnp.take_along_axis(y, jnp.clip(idx, 0, n - 1)[:, None],
                                   axis=1)[:, 0]

    def body(state):
        (k, k0, kminus, kplus, vmin, vmax, umin, umax,
         done, seg_val, seg_mark) = state
        boundary = (k == n - 1) & ~done
        main = ~boundary & ~done

        # ----- main-loop events (reference :100-118) -----
        ynext = gy(k + 1)
        umin1 = umin + ynext - vmin   # accumulated first, as in the reference
        umax1 = umax + ynext - vmax
        neg = main & (umin1 < -lamv)
        pos = main & ~neg & (umax1 > lamv)
        nojump = main & ~neg & ~pos

        # negative jump: emit [k0, kminus] = vmin, restart after kminus.
        k0_n = kminus + 1
        y_n = gy(k0_n)
        # positive jump: emit [k0, kplus] = vmax, restart after kplus.
        k0_p = kplus + 1
        y_p = gy(k0_p)

        # no jump: advance k, then bound updates (reference :110-118).
        k_adv = k + 1
        denom = (k_adv - k0 + 1).astype(dtype)
        hit_lo = nojump & (umin1 >= lamv)
        vmin_adv = jnp.where(hit_lo, vmin + (umin1 - lamv) / denom, vmin)
        umin_adv = jnp.where(hit_lo, lamv, umin1)
        kminus_adv = jnp.where(hit_lo, k_adv, kminus)
        hit_hi = nojump & (umax1 <= -lamv)
        vmax_adv = jnp.where(hit_hi, vmax + (umax1 + lamv) / denom, vmax)
        umax_adv = jnp.where(hit_hi, -lamv, umax1)
        kplus_adv = jnp.where(hit_hi, k_adv, kplus)

        # ----- boundary events at k = n-1 (reference :88-99) -----
        b_neg = boundary & (umin < 0)
        b_pos = boundary & ~b_neg & (umax > 0)
        b_term = boundary & ~b_neg & ~b_pos
        # b_neg: emit [k0, kminus] = vmin; k = k0 = kminus+1; vmin = y[k];
        # umin = lam; umax = y[k] + lam - vmax (vmax/kplus carry over).
        ub_neg = y_n + lamv - vmax
        # b_pos: emit [k0, kplus] = vmax; symmetric carry-over of vmin/kminus.
        ub_pos = y_p - lamv - vmin
        # b_term: emit [k0, n-1] = vmin + umin/(k - k0 + 1); done.
        v_term = vmin + umin / (k - k0 + 1).astype(dtype)

        # ----- merge -----
        k_next = jnp.where(neg, k0_n, jnp.where(pos, k0_p,
                  jnp.where(nojump, k_adv,
                  jnp.where(b_neg, k0_n, jnp.where(b_pos, k0_p, k)))))
        k0_next = jnp.where(neg | b_neg, k0_n,
                   jnp.where(pos | b_pos, k0_p, k0))
        kminus_next = jnp.where(neg | b_neg, k0_n,
                       jnp.where(pos, k0_p, kminus_adv))
        kplus_next = jnp.where(neg, k0_n,
                      jnp.where(pos | b_pos, k0_p, kplus_adv))
        vmin_next = jnp.where(neg | b_neg, y_n,
                     jnp.where(pos, y_p - 2.0 * lamv, vmin_adv))
        vmax_next = jnp.where(neg, y_n + 2.0 * lamv,
                     jnp.where(pos | b_pos, y_p, vmax_adv))
        umin_next = jnp.where(neg | pos | b_neg, lamv,
                     jnp.where(b_pos, ub_pos, umin_adv))
        umax_next = jnp.where(neg | pos, -lamv,
                     jnp.where(b_neg, ub_neg,
                     jnp.where(b_pos, -lamv, umax_adv)))
        done_next = done | b_term

        # ----- segment record (one scatter at the segment START k0) -----
        emit = neg | pos | b_neg | b_pos | b_term
        rec_val = jnp.where(neg | b_neg, vmin,
                   jnp.where(pos | b_pos, vmax, v_term))
        col = jnp.where(emit, k0, n)  # garbage column n for no-ops
        seg_val = seg_val.at[rows, col].set(rec_val)
        seg_mark = seg_mark.at[rows, col].set(True)

        return (k_next, k0_next, kminus_next, kplus_next, vmin_next,
                vmax_next, umin_next, umax_next, done_next, seg_val, seg_mark)

    def cond(state):
        done = state[8]
        return jnp.any(~done)

    init = (
        jnp.zeros((B,), jnp.int32),       # k
        jnp.zeros((B,), jnp.int32),       # k0
        jnp.zeros((B,), jnp.int32),       # kminus
        jnp.zeros((B,), jnp.int32),       # kplus
        y[:, 0] - lamv,                   # vmin
        y[:, 0] + lamv,                   # vmax
        lamv,                             # umin
        -lamv,                            # umax
        jnp.zeros((B,), bool),            # done
        jnp.zeros((B, n + 1), dtype),     # seg_val (garbage col n)
        jnp.zeros((B, n + 1), bool),      # seg_mark
    )
    *_, seg_val, seg_mark = jax.lax.while_loop(cond, body, init)

    # Reconstruct: x[j] = value of the nearest recorded segment START <= j.
    idx = jnp.where(seg_mark[:, :n], jnp.arange(n)[None, :], 0)
    prev = jax.lax.associative_scan(jnp.maximum, idx, axis=1)
    x = jnp.take_along_axis(seg_val[:, :n], prev, axis=-1)
    lam_e = jnp.broadcast_to(lamv[:, None], (B, n - 1))
    return _apply_degenerate_guards(x, y, lam_e)


# ---------------------------------------------------------------------------
# Engine 3: Kolmogorov/Johnson message-passing DP (lock-step, O(n) worst case)
# ---------------------------------------------------------------------------

_PH_INIT = 0
_PH_LOWER = 1
_PH_LOWER_EXIT = 2
_PH_UPPER = 3
_PH_UPPER_EXIT = 4
_PH_DONE = 5


@jax.jit
def tv1_dp(y, lam):
    """Batched message-passing DP TV-L1 prox (weighted-capable, exact, O(n)).

    Lock-step port of the clipped-message dynamic program of Kolmogorov, Pock &
    Rolinek (reference ``src/TVL1opt_kolmogorov.cpp:38-130``); Johnson's DP
    (``src/johnsonRyanTV.cpp:9``) computes the same forward clamp bounds.  The
    derivative-breakpoint deque lives in a per-lane arena; one deque operation is
    performed per ``while_loop`` iteration; the backward pass is a vectorized
    reverse scan ``x[i] = clip(x[i+1], lo[i], hi[i])``.
    """
    y = jnp.asarray(y)
    B, n = y.shape
    dtype = y.dtype

    if n == 1:
        return y

    lamv = _edge_weights(lam, B, n, dtype)
    rows = jnp.arange(B)
    arena = 2 * n  # 2n-1 valid slots (0..2n-2) + garbage bin at 2n-1

    def g_arena(a, idx):
        return jnp.take_along_axis(a, jnp.clip(idx, 0, arena - 1)[:, None], axis=1)[:, 0]

    def s_arena(a, idx, val, do):
        # Masked scatter: inactive lanes write to the never-read garbage column.
        col = jnp.where(do, jnp.clip(idx, 0, arena - 2), arena - 1)
        return a.at[rows, col].set(val)

    def s_bounds(a, idx, val, do):
        # lo/hi are (B, n+1); column n is the garbage bin.
        col = jnp.where(do, jnp.clip(idx, 0, n - 1), n)
        return a.at[rows, col].set(val)

    def gw(i):
        return jnp.take_along_axis(lamv, jnp.clip(i, 0, n - 2)[:, None], axis=1)[:, 0]

    def gy(i):
        return jnp.take_along_axis(y, jnp.clip(i, 0, n - 1)[:, None], axis=1)[:, 0]

    # --- initialization: message at node 0 (reference :152-156) ---
    w0 = lamv[:, 0]
    L0 = jnp.full((B,), n - 1, jnp.int32)
    R0 = jnp.full((B,), n, jnp.int32)
    P_lam = jnp.zeros((B, arena), dtype)
    P_slope = jnp.zeros((B, arena), jnp.int32)
    lo = jnp.zeros((B, n + 1), dtype)
    hi = jnp.zeros((B, n + 1), dtype)

    P_slope = P_slope.at[rows, L0 - 1].set(-1)
    lo0 = -w0 + y[:, 0]
    hi0 = w0 + y[:, 0]
    P_lam = P_lam.at[rows, L0].set(lo0)
    P_slope = P_slope.at[rows, L0].set(0)
    P_lam = P_lam.at[rows, R0].set(hi0)
    P_slope = P_slope.at[rows, R0].set(-1)
    lo = lo.at[:, 0].set(lo0)
    hi = hi.at[:, 0].set(hi0)

    def body(state):
        (phase, i, A, L, R, msg_min, msg_max, slope, last_val,
         P_lam, P_slope, lo, hi) = state

        W_prev = gw(i - 1)
        W = jnp.where(i < n - 1, gw(i), 0.0)
        bi = gy(i)
        is_last = i == n - 1

        # ---------- INIT ----------
        ph_init = phase == _PH_INIT
        A_i = A + 1
        mmin_i = -W_prev + g_arena(P_lam, L) - bi
        mmax_i = W_prev + g_arena(P_lam, R) - bi

        # ---------- LOWER ----------
        ph_lower = phase == _PH_LOWER
        pop_l = msg_min < -W
        slope_l = g_arena(P_slope, L) + A
        L_l = L + 1
        l_overrun = L_l > R
        mmin_l = msg_min + (g_arena(P_lam, L_l) - g_arena(P_lam, L_l - 1)) * slope_l.astype(dtype)

        # ---------- LOWER_EXIT ----------
        ph_lexit = phase == _PH_LOWER_EXIT
        over = L > R
        L_le_last = jnp.where(over, L - 1, L)
        last_val_new = g_arena(P_lam, L_le_last) - msg_min / slope.astype(dtype)
        # non-last branch:
        L_le = L - 1
        # write P_slope[L_le - 1] = -A
        meet = L_le == R
        # meet branch:
        R_meet = R + 1
        pl_L_old = g_arena(P_lam, L_le)
        hi_meet = pl_L_old - (msg_max - W)
        lo_meet = pl_L_old - (msg_max + W)
        # no-meet branch:
        lo_nom = g_arena(P_lam, L_le + 1) - (W + msg_min) / slope.astype(dtype)

        # ---------- UPPER ----------
        ph_upper = phase == _PH_UPPER
        pop_u = msg_max > W
        R_u = R - 1
        slope_u = g_arena(P_slope, R_u) + A
        mmax_u = msg_max - (g_arena(P_lam, R_u + 1) - g_arena(P_lam, R_u)) * slope_u.astype(dtype)
        u_meet = R_u == L

        # ---------- UPPER_EXIT ----------
        ph_uexit = phase == _PH_UPPER_EXIT
        R_ue = R + 1
        hi_ue = g_arena(P_lam, R_ue - 1) + (W - msg_max) / slope.astype(dtype)

        # ============ merge updates ============
        new_phase = phase
        new_i = i
        new_A = A
        new_L = L
        new_R = R
        new_mmin = msg_min
        new_mmax = msg_max
        new_slope = slope
        new_last = last_val

        # INIT
        new_A = jnp.where(ph_init, A_i, new_A)
        new_mmin = jnp.where(ph_init, mmin_i, new_mmin)
        new_mmax = jnp.where(ph_init, mmax_i, new_mmax)
        new_slope = jnp.where(ph_init, 1, new_slope)
        new_phase = jnp.where(ph_init, _PH_LOWER, new_phase)

        # LOWER (note: uses pre-INIT values of msg/slope via ph gating)
        lower_pop = ph_lower & pop_l
        lower_stay = lower_pop & ~l_overrun
        lower_exit = ph_lower & (~pop_l | l_overrun)
        new_slope = jnp.where(lower_pop, slope_l, new_slope)
        new_L = jnp.where(lower_pop, L_l, new_L)
        new_mmin = jnp.where(lower_stay, mmin_l, new_mmin)
        new_phase = jnp.where(lower_exit, _PH_LOWER_EXIT, jnp.where(lower_stay, _PH_LOWER, new_phase))

        # LOWER_EXIT
        le_done = ph_lexit & is_last
        new_last = jnp.where(le_done, last_val_new, new_last)
        new_phase = jnp.where(le_done, _PH_DONE, new_phase)
        new_L = jnp.where(le_done, L_le_last, new_L)

        le_go = ph_lexit & ~is_last
        new_L = jnp.where(le_go, L_le, new_L)
        P_slope = s_arena(P_slope, L_le - 1, -A, le_go)
        le_meet = le_go & meet
        new_R = jnp.where(le_meet, R_meet, new_R)
        P_slope = s_arena(P_slope, R_meet, -A, le_meet)
        P_lam = s_arena(P_lam, R_meet, hi_meet, le_meet)
        P_lam = s_arena(P_lam, L_le, jnp.where(le_meet, lo_meet, lo_nom), le_go)
        hi = s_bounds(hi, i, hi_meet, le_meet)
        lo = s_bounds(lo, i, jnp.where(le_meet, lo_meet, lo_nom), le_go)
        new_i = jnp.where(le_meet, i + 1, new_i)
        new_phase = jnp.where(le_meet, _PH_INIT, new_phase)
        le_nomeet = le_go & ~meet
        new_slope = jnp.where(le_nomeet, 1, new_slope)
        new_phase = jnp.where(le_nomeet, _PH_UPPER, new_phase)

        # UPPER
        upper_pop = ph_upper & pop_u
        new_R = jnp.where(upper_pop, R_u, new_R)
        new_slope = jnp.where(upper_pop, slope_u, new_slope)
        new_mmax = jnp.where(upper_pop, mmax_u, new_mmax)
        upper_exit = ph_upper & (~pop_u | (pop_u & u_meet))
        new_phase = jnp.where(upper_exit, _PH_UPPER_EXIT,
                              jnp.where(upper_pop & ~u_meet, _PH_UPPER, new_phase))

        # UPPER_EXIT (uses post-UPPER R, msg_max, slope — they are pre-step values
        # here because UPPER_EXIT runs on a later lock-step iteration)
        new_R = jnp.where(ph_uexit, R_ue, new_R)
        P_slope = s_arena(P_slope, R_ue, -A, ph_uexit)
        P_lam = s_arena(P_lam, R_ue, hi_ue, ph_uexit)
        hi = s_bounds(hi, i, hi_ue, ph_uexit)
        new_i = jnp.where(ph_uexit, i + 1, new_i)
        new_phase = jnp.where(ph_uexit, _PH_INIT, new_phase)

        return (new_phase, new_i, new_A, new_L, new_R, new_mmin, new_mmax,
                new_slope, new_last, P_lam, P_slope, lo, hi)

    def cond(state):
        phase = state[0]
        return jnp.any(phase != _PH_DONE)

    init = (jnp.zeros((B,), jnp.int32),            # phase = INIT
            jnp.ones((B,), jnp.int32),             # i = 1
            jnp.ones((B,), jnp.int32),             # A = 1
            L0, R0,
            jnp.zeros((B,), dtype), jnp.zeros((B,), dtype),
            jnp.ones((B,), jnp.int32),
            jnp.zeros((B,), dtype),
            P_lam, P_slope, lo, hi)
    (_, _, _, _, _, _, _, _, last_val, _, _, lo, hi) = jax.lax.while_loop(cond, body, init)

    # Backward clamping pass (reference :216-221), vectorized reverse scan.
    loT = jnp.moveaxis(lo[:, : n - 1], -1, 0)  # bounds for i = 0..n-2
    hiT = jnp.moveaxis(hi[:, : n - 1], -1, 0)

    def bwd(x_next, bounds):
        lo_i, hi_i = bounds
        x_i = jnp.clip(x_next, lo_i, hi_i)
        return x_i, x_i

    _, xs = jax.lax.scan(bwd, last_val, (loT, hiT), reverse=True)
    x = jnp.concatenate([jnp.moveaxis(xs, 0, -1), last_val[:, None]], axis=-1)
    return _apply_degenerate_guards(x, y, lamv)


# ---------------------------------------------------------------------------
# Engine 5: classic taut string (hull-merge deques on the cumsum polyline)
# ---------------------------------------------------------------------------

_CT_MAJ = 0      # merging the pending segment into the concave majorant
_CT_MIN = 1      # merging the pending segment into the convex minorant
_CT_CROSS = 2    # emitting taut-string knots while the leftmost slopes cross
_CT_FLUSH = 3    # emitting the larger hull's remaining segments
_CT_DONE = 4


@jax.jit
def tv1_classic_ts(y, lam):
    """Batched classic taut-string TV-L1 prox (unweighted; exact).

    The CLASSIC taut-string method (reference ``classicTautString_TV1``,
    ``src/TVL1opt_tautstring.cpp:256``): walk the cumulative-sum polyline
    maintaining two piecewise-linear hulls as segment deques — the concave
    majorant of the lower tube boundary (cumsum - lam) and the convex
    minorant of the upper boundary (cumsum + lam).  Each new point is merged
    into both hulls (pop trailing segments while the hull property is
    violated, accumulating their (incx, incy) spans — the reference's
    ``concavemajorantadd``/``convexminorantadd`` macros, :149-182); whenever
    the hulls' LEFTMOST slopes cross, the taut string is pinned: the shorter
    first segment becomes an output run at its slope, the other hull
    collapses to a single segment from the new knot to the last explored
    point (``newknot``, :187-223).  A FIFTH independent engine family: it
    reasons about global hull geometry with O(1)-amortized deque merges,
    where the linearized scan (:func:`tv1_tautstring`) tracks only the
    current segment's slope bounds and backtracks.

    TPU-native form: a lock-step ``while_loop`` — each iteration performs
    exactly one deque event (one hull-merge pop, one push, one knot
    emission, or one flush emission) on every lane.  Hull deques live in
    per-lane (B, n+2) arenas of (incx, incy) pairs with first/last cursors;
    slopes are recomputed as incy/incx where the reference reads its stored
    division (same operands, same result).  Output runs are scattered as
    (start, value) records and materialized by a forward fill, as in
    :func:`tv1_condat`.  O(n) amortized events per lane.

    ``lam``: scalar or (B,) per-signal penalties (the reference classic
    engine is unweighted).
    """
    y = jnp.asarray(y)
    B, n = y.shape
    dtype = y.dtype
    if n == 1:
        return y

    lam = jnp.asarray(lam, dtype)
    if lam.ndim >= 2 or (lam.ndim == 1 and lam.shape[0] == n - 1 and B != n - 1):
        raise ValueError("tv1_classic_ts is unweighted: lam must be scalar "
                         "or (B,) per-signal (reference classicTautString_TV1"
                         " takes one lambda, src/TVL1opt_tautstring.cpp:256)")
    lamv = jnp.maximum(jnp.broadcast_to(lam, (B,)), jnp.zeros((), dtype))
    rows = jnp.arange(B)
    A = n + 2  # arena capacity: <= n+1 live segments + garbage slot A-1

    def gy(idx):
        return jnp.take_along_axis(y, jnp.clip(idx, 0, n - 1)[:, None],
                                   axis=1)[:, 0]

    def g_arena(a, idx):
        return jnp.take_along_axis(a, jnp.clip(idx, 0, A - 1)[:, None],
                                   axis=1)[:, 0]

    def s_arena(a, idx, val, do):
        col = jnp.where(do, jnp.clip(idx, 0, A - 2), A - 1)
        return a.at[rows, col].set(val)

    def fresh(i, sign):
        """Pending unit segment for point i: the final point enters the
        majorant at y+lam and the minorant at y-lam (tube endpoints are
        exact — reference :317-323); interior points enter plain."""
        return jnp.where(i == n - 1, gy(i) + sign * lamv, gy(i))

    def body(state):
        (it, phase, i, s_incx, s_incy, maj_ix, maj_iy, maj_f, maj_l,
         min_ix, min_iy, min_f, min_l, org_x, org_y, le_x, le_y,
         opos, flush_maj, out_val, out_mark) = state

        dct = lambda v: v.astype(dtype)  # noqa: E731

        # ---------- hull merges (P_MAJ / P_MIN share structure) ----------
        in_maj = phase == _CT_MAJ
        in_min = phase == _CT_MIN
        # majorant: pop while s.incy > s.incx * slope(last)
        mj_last_ix = g_arena(maj_ix, maj_l)
        mj_last_iy = g_arena(maj_iy, maj_l)
        mj_size = maj_l - maj_f + 1
        mj_pop = in_maj & (mj_size >= 1) & (
            s_incy > dct(s_incx) * (mj_last_iy / dct(mj_last_ix)))
        mj_push = in_maj & ~mj_pop
        # minorant: pop while s.incy < s.incx * slope(last)
        mn_last_ix = g_arena(min_ix, min_l)
        mn_last_iy = g_arena(min_iy, min_l)
        mn_size = min_l - min_f + 1
        mn_pop = in_min & (mn_size >= 1) & (
            s_incy < dct(s_incx) * (mn_last_iy / dct(mn_last_ix)))
        mn_push = in_min & ~mn_pop

        # ---------- crossing check / knot emission ----------
        in_cross = phase == _CT_CROSS
        mj_first_ix = g_arena(maj_ix, maj_f)
        mj_first_iy = g_arena(maj_iy, maj_f)
        mn_first_ix = g_arena(min_ix, min_f)
        mn_first_iy = g_arena(min_iy, min_f)
        # Both-hulls-single guard: in exact arithmetic two single-segment
        # hulls cannot cross (the minorant's endpoint sits 2*lam ABOVE the
        # majorant's), but the two hulls' merged incy sums round differently
        # in f32 (different pop orders), and at lam = 0 a 1-ulp tie can fake
        # a crossing whose knot would EMPTY a deque (the reference reads
        # freed memory in the same case) and hang the lock-step loop.
        both_single = (mj_size == 1) & (mn_size == 1)
        crossing = in_cross & ~both_single & (
            (mn_first_iy / dct(mn_first_ix))
            < (mj_first_iy / dct(mj_first_ix)))
        take_min = crossing & (mn_first_ix < mj_first_ix)
        take_maj = crossing & ~take_min
        no_cross = in_cross & ~crossing

        # knot via the minorant's first segment: the majorant collapses to
        # one segment ending at (lastexplored - lam) (reference :194-207).
        rep_maj_ix = le_x - org_x - mn_first_ix
        rep_maj_iy = le_y - lamv - org_y - mn_first_iy
        # knot via the majorant's first segment (reference :209-222).
        rep_min_ix = le_x - org_x - mj_first_ix
        rep_min_iy = le_y + lamv - org_y - mj_first_iy

        # ---------- flush ----------
        in_flush = phase == _CT_FLUSH
        fl_is_maj = flush_maj > 0
        fl_f = jnp.where(fl_is_maj, maj_f, min_f)
        fl_l = jnp.where(fl_is_maj, maj_l, min_l)
        fl_ix = jnp.where(fl_is_maj, g_arena(maj_ix, fl_f),
                          g_arena(min_ix, fl_f))
        fl_iy = jnp.where(fl_is_maj, g_arena(maj_iy, fl_f),
                          g_arena(min_iy, fl_f))
        fl_emit = in_flush & (fl_f <= fl_l)
        fl_done = in_flush & ~fl_emit

        # ---------- merge next state ----------
        # pending segment: pops accumulate; entering P_MIN / next P_MAJ resets.
        i_next = jnp.where(no_cross, i + 1, i)
        to_min = mj_push
        to_cross = mn_push & (i < n - 1)
        to_flush = mn_push & (i == n - 1)
        to_maj = no_cross  # next point (i can reach n-1: final-point entry)

        s_incx_next = jnp.where(mj_pop, s_incx + mj_last_ix,
                       jnp.where(mn_pop, s_incx + mn_last_ix,
                       jnp.where(to_min | to_maj, 1, s_incx)))
        s_incy_next = jnp.where(mj_pop, s_incy + mj_last_iy,
                       jnp.where(mn_pop, s_incy + mn_last_iy,
                       jnp.where(to_min, fresh(i, -1.0),
                       jnp.where(to_maj, fresh(i_next, 1.0), s_incy))))

        # majorant arena: push on mj_push (at maj_l+1); replace on take_min
        # (cleared to the single segment at slot 0).
        mj_store = mj_push | take_min
        mj_col = jnp.where(take_min, 0, maj_l + 1)
        maj_ix = s_arena(maj_ix, mj_col,
                         jnp.where(take_min, rep_maj_ix, s_incx), mj_store)
        maj_iy = s_arena(maj_iy, mj_col,
                         jnp.where(take_min, rep_maj_iy, s_incy), mj_store)
        maj_l_next = jnp.where(mj_pop, maj_l - 1,
                      jnp.where(mj_push, maj_l + 1,
                      jnp.where(take_min, 0,
                      jnp.where(fl_emit & fl_is_maj, maj_l, maj_l))))
        maj_f_next = jnp.where(take_min, 0,
                      jnp.where(take_maj, maj_f + 1,
                      jnp.where(fl_emit & fl_is_maj, maj_f + 1, maj_f)))

        # minorant arena
        mn_store = mn_push | take_maj
        mn_col = jnp.where(take_maj, 0, min_l + 1)
        min_ix = s_arena(min_ix, mn_col,
                         jnp.where(take_maj, rep_min_ix, s_incx), mn_store)
        min_iy = s_arena(min_iy, mn_col,
                         jnp.where(take_maj, rep_min_iy, s_incy), mn_store)
        min_l_next = jnp.where(mn_pop, min_l - 1,
                      jnp.where(mn_push, min_l + 1,
                      jnp.where(take_maj, 0, min_l)))
        min_f_next = jnp.where(take_maj, 0,
                      jnp.where(take_min, min_f + 1,
                      jnp.where(fl_emit & ~fl_is_maj, min_f + 1, min_f)))

        # origin / lastexplored
        knot_ix = jnp.where(take_min, mn_first_ix, mj_first_ix)
        knot_iy = jnp.where(take_min, mn_first_iy, mj_first_iy)
        org_x = jnp.where(crossing, org_x + knot_ix, org_x)
        org_y = jnp.where(crossing, org_y + knot_iy, org_y)
        le_x = jnp.where(to_cross, le_x + 1, le_x)
        le_y = jnp.where(to_cross, le_y + gy(i), le_y)

        # output records: knots and flush segments, scattered at run start.
        emit = crossing | fl_emit
        emit_ix = jnp.where(crossing, knot_ix, fl_ix)
        emit_val = jnp.where(crossing, knot_iy / dct(knot_ix),
                             fl_iy / dct(jnp.maximum(fl_ix, 1)))
        col = jnp.where(emit, jnp.clip(opos, 0, n - 1), n)
        out_val = out_val.at[rows, col].set(emit_val)
        out_mark = out_mark.at[rows, col].set(True)
        opos = jnp.where(emit, opos + emit_ix, opos)

        # flush-side selection happens at the transition into P_FLUSH
        flush_maj = jnp.where(
            to_flush,
            ((maj_l_next - maj_f_next) > (min_l_next - min_f_next)).astype(
                jnp.int32),
            flush_maj)

        phase_next = jnp.where(mj_push, _CT_MIN,
                      jnp.where(to_cross, _CT_CROSS,
                      jnp.where(to_flush, _CT_FLUSH,
                      jnp.where(no_cross, _CT_MAJ,
                      jnp.where(fl_done, _CT_DONE, phase)))))

        return (it + 1, phase_next, i_next, s_incx_next, s_incy_next,
                maj_ix, maj_iy, maj_f_next, maj_l_next,
                min_ix, min_iy, min_f_next, min_l_next,
                org_x, org_y, le_x, le_y, opos, flush_maj, out_val, out_mark)

    def cond(state):
        # Event budget: each point costs <= 2 pushes + amortized pops +
        # crossing/flush emissions — 8n + 64 bounds every lane.  The cap is
        # a hardware watchdog guard only (an unbounded device while_loop
        # kills the TPU worker); it is unreachable for well-formed runs.
        return jnp.any(state[1] != _CT_DONE) & (state[0] < 8 * n + 64)

    # init: both hulls seeded with the unit segment to the first tube point
    # (reference :271-288); pending segment loaded for i = 1.
    maj_ix0 = jnp.zeros((B, A), jnp.int32).at[:, 0].set(1)
    maj_iy0 = jnp.zeros((B, A), dtype).at[:, 0].set(y[:, 0] - lamv)
    min_ix0 = jnp.zeros((B, A), jnp.int32).at[:, 0].set(1)
    min_iy0 = jnp.zeros((B, A), dtype).at[:, 0].set(y[:, 0] + lamv)
    i0 = jnp.ones((B,), jnp.int32)
    init = (
        jnp.int32(0),
        jnp.full((B,), _CT_MAJ, jnp.int32), i0,
        jnp.ones((B,), jnp.int32),                     # s_incx
        jnp.where(i0 == n - 1, y[:, -1] + lamv, gy(i0)),  # s_incy = fresh(1,+)
        maj_ix0, maj_iy0,
        jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),  # maj f/l
        min_ix0, min_iy0,
        jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),  # min f/l
        jnp.zeros((B,), jnp.int32), jnp.zeros((B,), dtype),      # origin
        jnp.ones((B,), jnp.int32), y[:, 0],                      # lastexplored
        jnp.zeros((B,), jnp.int32),                              # opos
        jnp.zeros((B,), jnp.int32),                              # flush_maj
        jnp.zeros((B, n + 1), dtype),
        jnp.zeros((B, n + 1), bool),
    )
    *_, out_val, out_mark = jax.lax.while_loop(cond, body, init)

    # x[j] = value of the nearest recorded run START <= j (forward fill).
    idx = jnp.where(out_mark[:, :n], jnp.arange(n)[None, :], 0)
    prev = jax.lax.associative_scan(jnp.maximum, idx, axis=1)
    x = jnp.take_along_axis(out_val[:, :n], prev, axis=-1)
    lam_e = jnp.broadcast_to(lamv[:, None], (B, n - 1))
    return _apply_degenerate_guards(x, y, lam_e)


# ---------------------------------------------------------------------------
# Method dispatch (mirrors the reference Python method table,
# prox_tv/__init__.py:163-172)
# ---------------------------------------------------------------------------


def tv1_batched(y, lam, method: str = "hybridtautstring",
                cfg: TV1Config = DEFAULT_TV1, strict: bool = False):
    """Batched 1D TV-L1 prox with reference-compatible method names.

    ``classictautstring`` maps to the lock-step classic hull-merge engine
    (:func:`tv1_classic_ts` — reference ``src/TVL1opt_tautstring.cpp:256``);
    ``condattautstring``/``tautstring``/``linearizedtautstring``/
    ``hybridtautstring`` to the exact lock-step taut-string scan engine
    (the linearized taut string is the same fixed point and scan
    structure); ``condat`` to the lock-step Condat dual-variable engine
    (:func:`tv1_condat` — an independent algorithm, reference
    ``src/condat_fast_tv.cpp:78``); ``dp``/``kolmogorov``/``johnson`` to
    the message-passing engine; ``pn`` to the batched projected Newton.
    All are exact to solver tolerance.

    **Routing policy** (``strict``): with ``strict=False`` (the default used
    by the auto policy and the 2D/ND combiners) every method routes to the
    fused PN kernel on single-device TPU f32 — all engines share one exact
    fixed point (the reference's tests assert cross-method equality,
    prox_tv_test.py:37-62), and the event-driven scan/DP engines pay one
    sequential lock-step per sample on an accelerator, orders of magnitude
    slower than the VMEM-resident Newton (their (B, n) while_loops also
    compile pathologically on the TPU backend at bench sizes).  This is the
    TPU analog of the reference's own hybrid method switching.  With
    ``strict=True`` (set by :func:`proxtv_tpu.api.tv1_1d` for an *explicit*
    method string) the NAMED engine always runs, at its documented cost —
    the scan/DP engines are the exact implementations on every backend.
    """
    from .kernels import gating

    method = method.lower()
    y = jnp.asarray(y)
    B, n = y.shape
    fused_ok = gating.gate(y, "pn")
    scan_methods = {"classictautstring", "linearizedtautstring",
                    "hybridtautstring", "condattautstring", "tautstring"}
    if method == "classictautstring":
        # The CLASSIC hull-merge taut string (reference
        # src/TVL1opt_tautstring.cpp:256) is its own engine family; like
        # Condat's it is unweighted (one lambda per signal).
        lam_a = jnp.asarray(lam)
        per_edge_w = lam_a.ndim >= 2 or (lam_a.ndim == 1
                                         and lam_a.shape[0] == n - 1
                                         and B != n - 1)
        if per_edge_w:
            if strict:
                raise ValueError(
                    "method='classictautstring' is unweighted (reference "
                    "classicTautString_TV1 takes one lambda); use "
                    "'tautstring'/'pn'/'dp' for per-edge weights")
            method = "hybridtautstring"
        elif strict or not fused_ok:
            return tv1_classic_ts(y, lam)
        else:
            method = "pn"
    if method == "condat":
        # Condat's algorithm is unweighted (one lambda per signal,
        # src/condat_fast_tv.cpp:78).  Per-edge weights: strict raises (the
        # NAMED algorithm cannot run them); the non-strict policy coerces to
        # an equivalent engine, exactly as for the other method aliases.
        lam_a = jnp.asarray(lam)
        per_edge_w = lam_a.ndim >= 2 or (lam_a.ndim == 1
                                         and lam_a.shape[0] == n - 1
                                         and B != n - 1)
        if per_edge_w:
            if strict:
                raise ValueError(
                    "method='condat' is unweighted (reference TV1D_denoise "
                    "takes one lambda); use 'tautstring'/'pn'/'dp' for "
                    "per-edge weights")
            method = "hybridtautstring"
        elif strict or not fused_ok:
            return tv1_condat(y, lam)
        else:
            method = "pn"
    if method in scan_methods or method in ("dp", "kolmogorov", "johnson"):
        if strict or not fused_ok:
            if method in scan_methods:
                return tv1_tautstring(y, lam)
            return tv1_dp(y, lam)
        method = "pn"
    if method == "pn":
        if fused_ok:
            # Fused VMEM-resident Pallas solver (one HBM read/write).
            from .kernels import pn_fused
            # tb=48 measured best at bench shapes (r3 sweep over tb x
            # head_steps: 8/16/24/32/48/64/80/96 rows — 48 wins by ~2% over
            # 32, larger tiles lose to straggler lanes); cap by VMEM budget.
            tb = gating.pn_tile_rows(n, cap=48)
            if jnp.ndim(lam) == 0:
                # Uniform penalty rides to the kernel as an SMEM scalar —
                # no (B, n) penalty field ever touches HBM.
                x, _ = pn_fused.pn_tv1_fused(y, lam_scalar=lam, tb=tb,
                                             return_dual=False)
                return x
            lamv = _edge_weights(lam, B, n, y.dtype)
            lam_full = jnp.concatenate(
                [lamv, jnp.zeros((B, 1), y.dtype)], axis=-1)
            x, _ = pn_fused.pn_tv1_fused(y, lam_full, tb=tb,
                                         return_dual=False)
            return x
        x, _ = tv1_pn(y, lam, cfg=cfg)
        return x
    raise ValueError(f"Unknown TV-L1 method: {method!r}")
