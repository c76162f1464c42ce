"""TPU-resident single-huge-signal 1D TV-L1 prox.

The reference's headline 1D case is one very long signal (n ~ 1e6) solved by a
sequential O(n) scan (``src/condat_fast_tv.cpp:78-131``,
``src/TVL1opt_hybridtautstring.cpp:56``) — inherently serial, ~12 ms on a CPU
core, and impossible to map onto a SIMD core directly.  This module is the
TPU-native redesign:

1.  **Overlapped chunk solve (parallel).**  The signal is cut into K windows
    of ``win = chunk + 2*overlap`` samples and ALL windows are solved at once
    as one batched projected-Newton call (the fused Pallas kernel on TPU —
    each window's entire solve lives in VMEM).  TV is a local operator: the
    influence of a window boundary decays with distance, so each window's
    *interior* chunk is near-exact.  The windows are materialized with pure
    pad/reshape/concat ops (gathers cost more than the solves at n = 1e6);
    out-of-range window cells are zero-filled and *exactly decoupled* by
    zero edge weights, which also gives boundary windows the correct free
    boundary condition.

2.  **Dual glue.**  The per-window dual vectors are stitched into a global
    dual estimate — with uniform window geometry this is a plain slice +
    reshape (each edge is owned by the window whose interior contains it).

3.  **Certified polish (exact).**  A single warm-started global projected
    Newton run (:func:`proxtv_tpu.ops.tv1d_l1.tv1_pn` with ``w_init``)
    finishes the solve to the duality-gap tolerance.  When the glued dual is
    already optimal (the measured common case: 0 Newton iterations at the
    default geometry) the loop exits on its initial gap check and the polish
    is just the certificate; pathological couplings (e.g. near-constant
    solutions spanning many chunks) cost extra Newton steps — correctness
    never depends on the overlap heuristic, only speed.

A batch of long signals may be passed as ``(S, n)``: all S*K windows run as
ONE fused kernel call and the polish runs batched, so streaming throughput
scales with the batch (the sustained-throughput analog of running the
reference scan on several cores).

The returned ``SolverInfo`` is the polish certificate (per-signal duality
gap + rc).  Unlike the reference scan (which "suffers numerical blow-up for
float at n >= 1e6" from its running sums, src/condat_fast_tv.cpp:129-131),
the dual formulation never forms long running sums, so f32 stays usable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils import diffs
from ..utils.config import DEFAULT_TV1, TV1Config
from ..utils.info import RC_OK, make_info
from . import tv1d_l1


def _segment_mean_scan(x, seg_start):
    """Per-element mean of the segment each element belongs to, gather-free.

    Two segmented inclusive scans (forward from segment heads, reverse from
    segment tails) give at every element the sum/count from head..i and
    i..tail; ``total = fwd + rev - x``.  TPU gathers at n ~ 1e6 cost more
    than the whole window solve, so this replaces the gather-based
    ``diffprox._segment_mean`` on the long-signal path."""
    n = x.shape[1]
    ones = jnp.ones_like(x)
    seg_end = jnp.concatenate([seg_start[:, 1:], jnp.ones_like(seg_start[:, :1])],
                              axis=1)

    def _sr(a, k):  # shift right by k (zero fill)
        return jnp.pad(a, ((0, 0), (k, 0)))[:, :-k]

    def _sl(a, k):  # shift left by k (zero fill)
        return jnp.pad(a, ((0, 0), (0, k)))[:, k:]

    def seg_scan(v, c, s, shift):
        """Unrolled Hillis-Steele segmented inclusive sum: v_i += v_{i-k}
        unless a segment head lies in between (s = blocked flag).  A manual
        log-shift loop — ``lax.associative_scan`` with a tuple operator
        compiles pathologically on the TPU backend at n ~ 1e6 (>>10 min),
        while this form compiles like the PCR kernels (seconds)."""
        k = 1
        while k < n:
            vs, cs, ss = shift(v, k), shift(c, k), shift(s, k)
            keep = 1.0 - s
            v = v + keep * vs
            c = c + keep * cs
            s = jnp.maximum(s, ss)
            k <<= 1
        return v, c

    f = seg_start.astype(x.dtype)
    fwd_v, fwd_c = seg_scan(x, ones, f, _sr)
    fe = seg_end.astype(x.dtype)
    rev_v, rev_c = seg_scan(x, ones, fe, _sl)
    tot = fwd_v + rev_v - x
    cnt = fwd_c + rev_c - 1.0
    return tot / cnt


def _plateau_snap(x, Y, lam_b):
    """Replace ulp-level-flat runs of ``x`` by their exact segment mean.

    The primal is reconstructed elementwise as ``x_i = y_i + w_i - w_{i-1}``,
    so a plateau of the true solution comes back with ~1-ulp ripple between
    neighbours; over n ~ 1e6 samples the TV term then pays
    ``sum lam*|ripple|`` — an O(1e-4)-relative objective excess that pure
    f64 solvers (and the reference) do not incur.  Snapping each near-flat
    run to its mean removes it.  Safety is exact, not heuristic: the
    objective change of the snap is computed per signal in cancellation-free
    form (fidelity via the zero-mean deviations, TV via its nonnegative
    sums) and the snap is kept only where it strictly improves.
    """
    B, n = x.shape
    dtype = x.dtype
    eps = jnp.finfo(dtype).eps
    scale_x = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-30)

    d = diffs.forward_diff(x)  # (B, n-1)
    flat = jnp.abs(d) <= 32.0 * eps * scale_x
    seg_start = jnp.concatenate([jnp.ones((B, 1), bool), ~flat], axis=1)
    m = _segment_mean_scan(x, seg_start)

    # Exact objective change of x -> m (per signal), evaluated without
    # differencing two O(||y||^2) totals:
    #   fid:  sum_i e_i (x_i - y_i) + 0.5 sum_i e_i^2   with e = m - x
    #   tv:   sum_i lam_i (|Dm|_i - |Dx|_i)
    e = m - x
    d_fid = jnp.sum(e * (x - Y), axis=-1) + 0.5 * jnp.sum(e * e, axis=-1)
    dm = diffs.forward_diff(m)
    d_tv = jnp.sum(lam_b * (jnp.abs(dm) - jnp.abs(d)), axis=-1)
    keep = (d_fid + d_tv) < 0.0
    return jnp.where(keep[:, None], m, x)


def _windows(a, K: int, chunk: int, overlap: int):
    """(K, chunk + 2*overlap) overlapped windows of the 1D array ``a`` with
    zero fill outside [0, len(a)), built from pads/reshapes only (no gather):
    window k covers global positions [k*chunk - overlap, (k+1)*chunk + overlap)."""
    total = K * chunk
    ap = jnp.pad(a, (0, max(0, total + chunk - a.shape[0])))
    body = ap[:total].reshape(K, chunk)
    left = jnp.pad(ap, (overlap, 0))[:total].reshape(K, chunk)[:, :overlap]
    suffix = ap[chunk: total + chunk].reshape(K, chunk)[:, :overlap]
    return jnp.concatenate([left, body, suffix], axis=1)


def _fused_win_ok(Yw):
    # The window arrays are built inside this module's jit (never concretely
    # sharded), so the gate reduces to backend/dtype/shape + the trace-time
    # kernel flag.
    from .kernels import gating
    return gating.gate(Yw, "pn_window")


def _win_tb(win):
    from .kernels import gating
    return gating.pn_tile_rows(win, cap=64)


def _solve_windows(Yw, lam_w):
    """Batched exact TV-L1 solve of all (K, win) windows, returning the
    per-window duals; fused Pallas kernel on TPU f32."""
    K, win = Yw.shape
    if _fused_win_ok(Yw):
        from .kernels import pn_fused
        lam_full = jnp.concatenate(
            [lam_w, jnp.zeros((K, 1), Yw.dtype)], axis=-1)
        x, w = pn_fused.pn_tv1_fused(Yw, lam_full, tb=_win_tb(win))
        return x, w
    x, _, w = tv1d_l1.tv1_pn(Yw, lam_w, return_dual=True)
    return x, w


@functools.partial(jax.jit, static_argnames=("chunk", "overlap", "cfg"))
def tv1_long(y, lam, chunk: int = 5120, overlap: int = 640,
             cfg: TV1Config = DEFAULT_TV1):
    """TV-L1 prox for very long signals, TPU-resident.

    Args:
        y: (n,) signal, or (S, n) batch of long signals solved together (the
            chunked path engages above one window length).
        lam: scalar penalty or (n-1,) / (S, n-1) per-edge weights.
        chunk: interior samples owned by each window.
        overlap: boundary margin solved but discarded on each side; larger =
            better glue (fewer polish iterations), more redundant compute.
            The default (5120, 640) measured fastest end-to-end at n = 1e6
            on v5e (single and streaming), with the glued dual already
            optimal (0-iteration polish).

    Returns:
        (x, info): solution matching ``y``'s shape and the per-signal polish
        :class:`SolverInfo` certificate (duality gap, rc) — per the
        reference per-solve info[].
    """
    y = jnp.asarray(y)
    single = y.ndim == 1
    Y = y[None] if single else y
    S, n = Y.shape
    dtype = Y.dtype
    lam = jnp.asarray(lam, dtype)
    per_edge = lam.ndim >= 1
    lam_b = (lam[None] if lam.ndim == 1 else lam) if per_edge else lam

    if n <= chunk + 2 * overlap:
        x, info = tv1d_l1.tv1_pn(Y, lam_b, cfg=cfg)
        return (x[0] if single else x), info

    K = -(-n // chunk)
    win = chunk + 2 * overlap
    Yw = jax.vmap(lambda a: _windows(a, K, chunk, overlap))(Y)
    Yw = Yw.reshape(S * K, win)

    # Per-window edge weights with out-of-range edges zeroed: a zero weight
    # decouples the zero-filled padding exactly and gives boundary windows
    # the true free boundary (relies on the PN zero-weight active-set rule).
    eg = ((jnp.arange(K, dtype=jnp.int32) * chunk)[:, None]
          + jnp.arange(win - 1, dtype=jnp.int32)[None, :] - overlap)
    valid = (eg >= 0) & (eg < n - 1)
    if per_edge:
        lw = jax.vmap(lambda a: _windows(a, K, chunk, overlap))(
            lam_b)[:, :, : win - 1]
        lam_w = jnp.where(valid[None], lw, 0.0).reshape(S * K, win - 1)
    else:
        lam_w = jnp.broadcast_to(jnp.where(valid, lam, 0.0)[None],
                                 (S, K, win - 1)).reshape(S * K, win - 1)

    _, Ww = _solve_windows(Yw, lam_w)

    # Glue: global edge i is owned by window i // chunk at local index
    # i - (i//chunk)*chunk + overlap — a plain slice + reshape.
    # (the dual is (win,)-wide from the Pallas kernel, (win-1,) from the XLA
    # fallback; the glued slice lies inside both)
    w_glued = (Ww.reshape(S, K, Ww.shape[-1])[:, :, overlap: overlap + chunk]
               .reshape(S, -1)[:, : n - 1])

    # Certificate of the pass-1 glue: duality gap at the glued dual, against
    # the same dtype-aware tolerance the polish PN uses.  The common case
    # (window couplings local, glue already optimal) stops HERE — the
    # escalation below (Schwarz sweep + global polish + plateau snap) runs
    # only when some signal's certificate fails, behind one lax.cond.
    yc = Y - jnp.mean(Y, axis=-1, keepdims=True)
    scale = jnp.maximum(1.0, 0.5 * jnp.sum(yc * yc, axis=-1))
    tol = jnp.maximum(cfg.stop, 2.0 * jnp.finfo(dtype).eps * scale)
    x1 = diffs.dual2primal(w_glued, Y)
    gap1 = jnp.abs(jnp.sum(
        jnp.abs(diffs.primal2grad(x1)) * lam_b
        + w_glued * diffs.primal2grad(x1), axis=-1))
    info1 = make_info(jnp.zeros((S,), jnp.int32), gap1,
                      jnp.full((S,), RC_OK, jnp.int32))

    def _escalate(ops):
        w_glued, = ops
        x, info = tv1d_l1.tv1_pn(Y, lam_b, cfg=cfg, w_init=w_glued)
        x = _plateau_snap(x, Y, lam_b)
        return x, (info.iters, info.gap, info.rc)

    def _done(ops):
        w_glued, = ops
        return x1, (info1.iters, info1.gap, info1.rc)

    x, (it_, gap_, rc_) = jax.lax.cond(jnp.any(gap1 > tol), _escalate, _done,
                                       (w_glued,))
    info = make_info(it_, gap_, rc_)
    return (x[0] if single else x), info
