"""Pallas TPU kernel: fully-fused batched projected-Newton TV-L1 prox.

One kernel call = the ENTIRE weighted TV-L1 prox solve for a (TB, n) tile of
fibers: unconstrained-dual init (or warm start), the Newton/active-set loop
with masked parallel cyclic reduction, the projected line search, and the
duality-gap stopping test — all on VMEM-resident values.  HBM traffic is one
read of (y, lam, w_init) and one write of (x, w), ~50x less than the XLA
composition in :func:`proxtv_tpu.ops.tv1d_l1.tv1_pn` (whose every sub-step
round-trips HBM).  Each tile also stops as soon as *its own* lanes converge,
instead of the global worst lane.

Numerics mirror ``tv1_pn`` (reference ``PN_TV1`` / ``PN_TV1_Weighted``,
src/TVL1opt.cpp:37, src/TVL1Wopt.cpp:37): same inactive-set rule, the same
relative duality-gap stopping contract, a halving projected line search (the
reference's interpolation rarely saves more than one trial), and the
degenerate-regime guards.  The edge column n-1 is carried as a masked-out
identity row so all arrays share the (TB, n) tile shape.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEF_TB = 64
_EPS = 1e-10


from . import common  # noqa: E402
from .common import (  # noqa: E402 — shared kernel helpers
    shift_left as _shift_left,
    shift_right as _shift_right,
)


def _pcr_masked(m, d, n, head_steps=32, tail_live=None):
    """Solve the m-masked second-difference system (identity on masked-out
    rows, zero RHS there); m is a float 0/1 mask of active rows.

    Normalized parallel cyclic reduction: the diagonal is renormalized to 1
    after every step, so each step needs 6 lane-shifts and ONE divide (the
    textbook form needs 8 shifts and two) and the final solve is ``d`` itself.
    The system is diagonally dominant, so the normalized off-diagonals stay
    bounded by 1/2 and the renormalizing pivot by [1/2, 3/2] — stable in f32.

    ``head_steps`` bounds the unconditionally-unrolled depth: after the
    active-set mask decouples the system into short inactive runs (the typical
    Newton-phase state: solution segments are a few samples long), runs of
    length < 2**head are solved EXACTLY; longer runs get a truncated
    (inexact-Newton) direction that the projected line search still turns
    into monotone descent.  ``tail_live`` (traced scalar bool) runs the
    remaining full-depth tail behind a single branch point — the caller
    raises it when progress stalls, which certifies exact directions without
    paying full depth on every iteration (a per-step liveness reduction
    would stall the vector pipeline ~20x)."""
    b = -(m * _shift_right(m, 1, 0.0))
    c = _shift_left(b, 1, 0.0)
    r = 1.0 / (1.0 + m)
    b = b * r
    c = c * r
    d = (m * d) * r
    steps = max(1, math.ceil(math.log2(n)))

    def pcr_step(stride, b, c, d, last=False):
        bm = _shift_right(b, stride, 0.0)
        bp = _shift_left(b, stride, 0.0)
        cm = _shift_right(c, stride, 0.0)
        cp = _shift_left(c, stride, 0.0)
        dm = _shift_right(d, stride, 0.0)
        dp = _shift_left(d, stride, 0.0)
        r = 1.0 / (1.0 - b * cm - c * bp)
        d2 = (d - b * dm - c * dp) * r
        if last:  # b, c dead after the final step
            return b, c, d2
        return (-b * bm) * r, (-c * cp) * r, d2

    head = min(head_steps, steps)
    has_tail = tail_live is not None and (1 << head) < n
    for k in range(head):
        stride = 1 << k
        if stride >= n:
            return d
        last = (k == head - 1) and not has_tail
        b, c, d = pcr_step(stride, b, c, d, last=last)

    if has_tail:
        def tail(ops):
            b, c, d = ops
            for k in range(head, steps):
                stride = 1 << k
                if stride >= n:
                    break
                b, c, d = pcr_step(stride, b, c, d, last=(stride * 2 >= n))
            return b, c, d

        b, c, d = jax.lax.cond(tail_live, tail, lambda ops: ops, (b, c, d))
    return d


def _rowsum(x):
    # Row scalars are kept broadcast at full (TB, n) width: narrow (TB, 1)
    # vregs inside while_loop bodies crash the Mosaic layout pass.
    return jnp.broadcast_to(jnp.sum(x, axis=-1, keepdims=True), x.shape)


def _prefix_sum(x, n):
    """Inclusive prefix sum along lanes (log-shift form, unrolled)."""
    k = 1
    while k < n:
        x = x + _shift_right(x, k, 0.0)
        k <<= 1
    return x


def _poisson_solve(v, b, n):
    """Closed-form solve of the unconstrained dual system (DD') w = b on the
    v-masked edge set (b pre-masked): the second-difference (path-Laplacian)
    system has the double-prefix-sum solution

        w_j = S_m (j+1)/n - S_{j-1},   S = prefix(prefix(b)),  m = n-1,

    replacing a full-depth PCR (~4x fewer vector ops).  f32 cancellation in
    the two ~n^1.5-magnitude terms costs ~1e-3 relative — irrelevant for a
    Newton warm start that is immediately box-clipped."""
    T = _prefix_sum(b, n) * v
    S = _prefix_sum(T, n)
    Sm = _rowsum(T)
    col = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    idx = (col + 1).astype(b.dtype) + 0.0 * b  # dense layout (Mosaic)
    return (Sm * idx * (1.0 / float(n)) - _shift_right(S, 1, 0.0)) * v


def _make_kernel(n, n_pad, max_iters, max_armijo, sigma, stop_rel, warm,
                 head_steps=4, lam_scalar=False):
    """n = true signal length; n_pad = lane-aligned tile width (mult. of 128).
    Padded columns are carried as masked-out identity rows.  With
    ``lam_scalar`` the penalty arrives as a single SMEM scalar instead of a
    (TB, n) HBM field (saves one full-batch HBM stream for the common
    uniform-penalty case)."""

    def kernel(*refs):
        w_ref = None
        if warm:
            y_ref, lam_ref, w0_ref, x_ref, *rest = refs
        else:
            y_ref, lam_ref, x_ref, *rest = refs
        if rest:
            (w_ref,) = rest
        y = y_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        # valid-edge mask; the + 0*y forces a dense vreg layout — shifting an
        # iota-derived (replicated-layout) vector crashes Mosaic.
        v = (col < n - 1).astype(y.dtype) + 0.0 * y
        # Center each lane (translation equivariance — see tv1d_l1.tv1_pn):
        # dual and Dy are unchanged, but fval/gap magnitudes and the relative
        # stopping scale become DC-offset invariant (crucial in f32).  The
        # lane-padding columns (zero before centering) must be re-zeroed
        # AFTER it: left at -ybar they inflate fval and the tolerance scale
        # by (n_pad - n) * ybar^2, silently loosening the stop for
        # DC-offset signals whenever n is not a multiple of 128.
        vs = (col < n).astype(y.dtype) + 0.0 * y
        ybar = _rowsum(y) / float(n)
        y = (y - ybar) * vs
        lam = (lam_ref[0, 0] if lam_scalar else lam_ref[:]) * v
        dy = (_shift_left(y, 1, 0.0) - y) * v

        if warm:
            w = jnp.clip(w0_ref[:] * v, -lam, lam)
        else:
            w = jnp.clip(_poisson_solve(v, dy, n), -lam, lam)

        def primal(w):
            return y + (w - _shift_right(w, 1, 0.0))

        def grad(x):
            return (x - _shift_left(x, 1, 0.0)) * v

        x = primal(w)
        g = grad(x)
        fval = _rowsum(x * x) * 0.5
        scale = jnp.maximum(1.0, _rowsum(y * y) * 0.5)
        tol = jnp.maximum(stop_rel, 10.0 * jnp.finfo(y.dtype).eps * scale)
        eps_f = jnp.maximum(_EPS, 10.0 * jnp.finfo(y.dtype).eps * scale)
        eps_gap = jnp.maximum(_EPS, 50.0 * jnp.finfo(y.dtype).eps * scale)

        def gap_of(w, g):
            return jnp.abs(_rowsum(jnp.abs(g) * lam + w * g))

        # NOTE: all row flags (running/found/mode) are float 0/1 (TB, 1)-
        # broadcast arrays — boolean (TB, 1) while_loop state crashes the
        # Mosaic layout pass.  ``exact_any`` is a scalar mirror of ``mode``
        # computed one iteration behind, so the PCR tail branch predicate
        # never depends on a same-iteration vector reduction.
        def newton_iter(state):
            w, g, x, fval, gap, gap_prev, it, running, mode, exact_any = state
            # Zero-weight (and padded) edges have both box bounds at 0: they
            # are permanently pinned and must stay out of the inactive set
            # (see tv1d_l1.tv1_pn inactive_mask).
            mI = ((lam > 0)
                  & (((w > -lam) & (w < lam))
                     | ((w == -lam) & (g < -_EPS))
                     | ((w == lam) & (g > _EPS))))
            m = mI.astype(y.dtype) * v
            any_inact = (_rowsum(m) > 0).astype(y.dtype)
            d = _pcr_masked(m, g * m, n_pad, head_steps=head_steps,
                            tail_live=exact_any > 0) * m
            gRd = _rowsum(g * d * m)

            # Projected line search.  delta = 1 is the EXACT minimizer of the
            # reduced quadratic (d solves the inactive-set Newton system), so
            # absent box clipping the Armijo test passes immediately:
            # improve(1) = 0.5 g'd >= sigma g'd.  Trial it for all lanes and
            # enter the unrolled halving fallback behind ONE branch point only
            # if clipping broke some lane (a per-trial while_loop whose cond
            # reduces found every step stalls the vector pipeline ~20x).
            # Objective change evaluated cancellation-free from the dual step
            # (see tv1d_l1.tv1_pn.armijo): improve = -(x.D'dw + 0.5||D'dw||^2)
            # resolves improvements far below ulp(fval), which differencing
            # two O(||y||^2) totals cannot.
            def trial(delta):
                aux = jnp.where(m > 0, jnp.clip(w - delta * d, -lam, lam), w)
                dw = aux - w
                dx = dw - _shift_right(dw, 1, 0.0)
                xn = x + dx
                improve = -_rowsum(x * dx + 0.5 * dx * dx)
                return aux, xn, fval - improve, improve

            aux1, x1, f1, imp1 = trial(1.0)
            ok1 = ((imp1 >= sigma * gRd)
                   | (imp1 <= eps_f)).astype(y.dtype)
            best0 = (jnp.where(ok1 > 0, aux1, w),
                     jnp.where(ok1 > 0, x1, x),
                     jnp.where(ok1 > 0, f1, fval), ok1)

            def ls_trials(best, delta0, ntrials):
                best_w, best_x, best_f, found = best
                delta = delta0
                for _ in range(ntrials):
                    aux, xn, fn, improve = trial(delta)
                    ok = ((improve >= sigma * delta * gRd)
                          | (improve <= eps_f)).astype(y.dtype)
                    newly = ok * (1.0 - found)
                    best_w = jnp.where(newly > 0, aux, best_w)
                    best_x = jnp.where(newly > 0, xn, best_x)
                    best_f = jnp.where(newly > 0, fn, best_f)
                    found = jnp.maximum(found, ok)
                    delta *= 0.5
                return best_w, best_x, best_f, found

            # Two-stage fallback: clipped steps almost always accept within
            # the first few halvings, so only 3 trials run on the common
            # path; the deep tail (8 more halvings) sits behind a second
            # branch point that fires ~never.  Numerics identical to one
            # flat unrolled search.
            def ls_fallback(best):
                best = ls_trials(best, 0.5, 3)
                def deep(b):
                    return ls_trials(b, 0.5 ** 4, max_armijo - 4)
                return jax.lax.cond(jnp.min(best[3]) < 1.0, deep,
                                    lambda b: b, best)

            need_ls = jnp.min(ok1) < 1.0
            w_new, x_new, f_new, _ = jax.lax.cond(
                need_ls, ls_fallback, lambda b: b, best0)

            g_new = grad(x_new)
            gap_new = gap_of(w_new, g_new)
            act = running * any_inact
            w = jnp.where(act > 0, w_new, w)
            x = jnp.where(act > 0, x_new, x)
            g = jnp.where(act > 0, g_new, g)
            fval = jnp.where(act > 0, f_new, fval)
            gap_prev_out = jnp.where(act > 0, gap, gap_prev)
            gap = jnp.where(act > 0, gap_new, gap)
            it = it + 1
            # Stalled lanes (gap no longer moving but above tol): promote the
            # tile to exact-direction mode and keep iterating; only a lane
            # that stalls WHILE ALREADY exact stops (true RC_STUCK).  Lanes
            # whose truncated direction was exact never pay the tail.
            stuck = ((gap > tol)
                     & (jnp.abs(gap - gap_prev_out) <= eps_gap)).astype(y.dtype)
            running = (running * any_inact
                       * (gap > tol).astype(y.dtype)
                       * (1.0 - stuck * mode))
            mode = jnp.maximum(mode, stuck * running)
            return (w, g, x, fval, gap, gap_prev_out, it, running, mode,
                    jnp.max(mode))

        def outer_cond(state):
            *_, it, running, _mode, _exact_any = state
            return (jnp.max(running) > 0) & (it < max_iters)

        gap0 = gap_of(w, g)
        running0 = (gap0 > tol).astype(y.dtype)
        state = (w, g, x, fval, gap0, jnp.full_like(gap0, -jnp.inf),
                 jnp.int32(0), running0, jnp.zeros_like(gap0),
                 jnp.float32(0.0))
        w, g, x, *_ = jax.lax.while_loop(outer_cond, newton_iter, state)

        # Degenerate guards (see tv1d_l1._apply_degenerate_guards): zero
        # penalty -> identity; enormous penalty -> mean (= 0 after centering).
        lam_min = jnp.broadcast_to(
            jnp.min(jnp.where(v > 0, lam, jnp.inf), axis=-1, keepdims=True),
            y.shape)
        dy_max = jnp.broadcast_to(
            jnp.max(jnp.abs(dy), axis=-1, keepdims=True), y.shape)
        allz = _rowsum(lam) <= 0
        huge = lam_min >= (float(n) * float(n)) * dy_max
        x = jnp.where(huge, 0.0, x)
        x = jnp.where(allz, y, x)
        x_ref[:] = x + ybar
        if w_ref is not None:
            w_ref[:] = w * v

    return kernel


_pad_rows = common.pad_rows


@functools.partial(jax.jit,
                   static_argnames=("max_iters", "max_armijo", "sigma",
                                    "stop_rel", "tb", "head_steps",
                                    "return_dual"))
def pn_tv1_fused(y, lam_full=None, w_init=None, max_iters: int = 100,
                 max_armijo: int = 12, sigma: float = 0.05,
                 stop_rel: float = 1e-6, tb: int = _DEF_TB,
                 head_steps: int = 4, lam_scalar=None,
                 return_dual: bool = True):
    """Fused batched TV-L1 projected-Newton prox.

    Args:
        y: (B, n) signals, float32.
        lam_full: (B, n) per-edge weights padded with a zero final column
            (column j weights edge (j, j+1); column n-1 is ignored).
        w_init: optional (B, n) dual warm start (same padding).
        lam_scalar: alternative to ``lam_full`` for a uniform penalty — a
            traced scalar shipped to the kernel through SMEM, skipping a
            full (B, n) HBM stream.
        return_dual: with False, the final dual is neither written to HBM
            nor sliced back — one less (B, n) output stream when the caller
            only wants ``x``.

    Returns:
        (x, w): solution and final dual, both (B, n); ``w`` is None when
        ``return_dual=False``.
    """
    B, n = y.shape
    dtype = y.dtype
    tb = max(8, (min(tb, max(8, B)) // 8) * 8)
    grid = (-(-_pad_rows(y, tb).shape[0] // tb),)
    n_pad = -(-n // 128) * 128  # lane-aligned width (partial vregs break Mosaic)

    def pad2(a):
        a = _pad_rows(a, tb)
        if n_pad != n:
            a = jnp.pad(a, ((0, 0), (0, n_pad - n)))
        return a

    y_p = pad2(y)
    scalar_mode = lam_scalar is not None
    if scalar_mode:
        lam_in = jnp.asarray(lam_scalar, dtype).reshape(1, 1)
        lam_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
    else:
        lam_in = pad2(lam_full)
        lam_spec = None
    spec = pl.BlockSpec((tb, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if lam_spec is None:
        lam_spec = spec
    n_out = 2 if return_dual else 1
    out_shape = tuple(jax.ShapeDtypeStruct(y_p.shape, dtype)
                      for _ in range(n_out))
    out_specs = tuple(spec for _ in range(n_out))
    kernel = _make_kernel(n, n_pad, max_iters, max_armijo, sigma, stop_rel,
                          warm=w_init is not None, head_steps=head_steps,
                          lam_scalar=scalar_mode)
    if w_init is not None:
        w_p = pad2(w_init)
        out = pl.pallas_call(kernel, grid=grid,
                             in_specs=[spec, lam_spec, spec],
                             out_specs=out_specs, out_shape=out_shape)(
            y_p, lam_in, w_p)
    else:
        out = pl.pallas_call(kernel, grid=grid, in_specs=[spec, lam_spec],
                             out_specs=out_specs, out_shape=out_shape)(
            y_p, lam_in)
    if return_dual:
        x, w = out
        return x[:B, :n], w[:B, :n]
    (x,) = out
    return x[:B, :n], None
