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


def _segment_min_scan(v, seg_start):
    """Per-element minimum over the segment each element belongs to,
    gather-free (same unrolled log-shift structure as
    :func:`_segment_mean_scan`, with min in place of sum; blocked shifts
    contribute +inf)."""
    n = v.shape[1]
    big = jnp.asarray(jnp.finfo(v.dtype).max, v.dtype)
    seg_end = jnp.concatenate(
        [seg_start[:, 1:], jnp.ones_like(seg_start[:, :1])], axis=1)

    def _sr(a, k):
        return jnp.pad(a, ((0, 0), (k, 0)), constant_values=big)[:, :-k]

    def _sl(a, k):
        return jnp.pad(a, ((0, 0), (0, k)), constant_values=big)[:, k:]

    def seg_scan(v, s, shift):
        k = 1
        while k < n:
            vs, ss = shift(v, k), shift(s, k)
            v = jnp.minimum(v, jnp.where(s > 0, big, vs))
            s = jnp.maximum(s, ss)
            k <<= 1
        return v

    fwd = seg_scan(v, seg_start.astype(v.dtype), _sr)
    rev = seg_scan(v, seg_end.astype(v.dtype), _sl)
    return jnp.minimum(fwd, rev)


def _plateau_snap(x, Y, lam_b, return_delta: bool = False):
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

    With ``return_delta`` the per-signal objective change ``P(x_snap) -
    P(x)`` (<= 0, exactly 0 where the snap was rejected) is also returned —
    it converts a duality gap certified at ``x`` into one certified at the
    snapped point without differencing two O(||y||^2) objective totals.
    """
    B, n = x.shape
    dtype = x.dtype
    eps = jnp.finfo(dtype).eps
    scale_x = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-30)

    d = diffs.forward_diff(x)  # (B, n-1)
    # 256 eps: wide enough to catch the few-ulp wiggles left by the PGD
    # refinement and stall-resumed window solves, not just 1-ulp ripple
    # (measured on the adversarial all-plateau case: 32 eps leaves 1.02e-5
    # relative excess, 256 eps reaches 9.2e-6; the exact improvement test
    # below keeps any threshold safe, and past ~4096 eps the merge starts
    # helping nothing).
    flat = jnp.abs(d) <= 256.0 * eps * scale_x
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
    dobj = d_fid + d_tv
    keep = dobj < 0.0
    xs = jnp.where(keep[:, None], m, x)
    if return_delta:
        return xs, jnp.where(keep, dobj, 0.0)
    return xs


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
    # sharded), so the gate reduces to backend/dtype/shape.  respect_flag is
    # OFF: tv1_long's jit cache is keyed on shapes only, so a trace-time
    # fused-flag read here could be baked in under a combiner's
    # _fused_ctx(False) and silently served for all later calls.
    from .kernels import gating
    return gating.gate(Yw, "pn_window", respect_flag=False)


def _win_tb(win):
    from .kernels import gating
    return gating.pn_tile_rows(win, cap=64)


def _solve_windows(Yw, lam_w, w_init=None):
    """Batched exact TV-L1 solve of all (K, win) windows, returning the
    per-window duals; fused Pallas kernel on TPU f32.

    ``w_init``: optional dual warm start in this function's own output
    layout (pass a previous call's ``w`` back verbatim to RESUME a solve —
    each resume re-arms the stall detector and Armijo budget, which clears
    the f32 plateau stalls measured at ~0.05 max deviation per window)."""
    K, win = Yw.shape
    if _fused_win_ok(Yw):
        from .kernels import pn_fused
        lam_full = jnp.concatenate(
            [lam_w, jnp.zeros((K, 1), Yw.dtype)], axis=-1)
        if w_init is not None and w_init.shape[-1] == win - 1:
            w_init = jnp.pad(w_init, ((0, 0), (0, 1)))
        x, w = pn_fused.pn_tv1_fused(Yw, lam_full, w_init=w_init,
                                     tb=_win_tb(win))
        return x, w
    if w_init is not None and w_init.shape[-1] == win:
        w_init = w_init[:, : win - 1]
    x, _, w = tv1d_l1.tv1_pn(Yw, lam_w, w_init=w_init, return_dual=True)
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
    # A shared (n-1,) weight vector broadcasts across the batch up front:
    # the window construction below vmaps over the batch axis, so a leading
    # dim of 1 would make the (S*K, win-1) reshape size-mismatch for S > 1.
    lam_b = (jnp.broadcast_to(lam[None] if lam.ndim == 1 else lam,
                              (S, n - 1)) if per_edge else lam)

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
    # escalation ladder below runs only when some signal's certificate
    # fails, each rung behind a lax.cond:
    #   rung 1: seam jitter — re-run the window pass on a grid shifted by
    #           chunk/2 and stitch the two glued duals per edge, taking each
    #           edge from the grid whose seam is farther.  TV-L1 duals pin
    #           at +-lam at every genuine jump, so the stitched dual is
    #           exact whenever every flat of the solution is shorter than
    #           ~chunk/2 — this certifies the adversarial every-seam-in-a-
    #           flat signals (PARITY.md) at rc = 0 for ~2x the fast-path
    #           cost instead of the ~100 ms global polish.
    #   rung 2: global warm-started polish + plateau snap (unchanged).
    yc = Y - jnp.mean(Y, axis=-1, keepdims=True)
    scale = jnp.maximum(1.0, 0.5 * jnp.sum(yc * yc, axis=-1))
    tol = jnp.maximum(cfg.stop, 2.0 * jnp.finfo(dtype).eps * scale)

    def _gap_at(x, w):
        # Reference GRAD2GAP, shared with the batched engines so the two
        # certificates cannot drift apart.
        return tv1d_l1._gap_tv1w(w, diffs.primal2grad(x), lam_b)

    x1 = diffs.dual2primal(w_glued, Y)
    gap1 = _gap_at(x1, w_glued)
    info1 = make_info(jnp.zeros((S,), jnp.int32), gap1,
                      jnp.full((S,), RC_OK, jnp.int32))

    offset = chunk // 2

    def _jitter_dual(w1):
        """Glued dual from a half-chunk-shifted window grid, stitched with
        ``w1`` per edge by seam distance.  The shift is realized by
        left-padding the signal with ``offset`` zeros decoupled by
        zero-weight edges (the same exact-decoupling rule the window
        padding uses), so the shifted problem has the original solution."""
        n_pad = n + offset
        Kb = -(-n_pad // chunk)
        Yp = jnp.pad(Y, ((0, 0), (offset, 0)))
        Yw2 = jax.vmap(lambda a: _windows(a, Kb, chunk, overlap))(Yp)
        Yw2 = Yw2.reshape(S * Kb, win)
        eg2 = ((jnp.arange(Kb, dtype=jnp.int32) * chunk)[:, None]
               + jnp.arange(win - 1, dtype=jnp.int32)[None, :] - overlap)
        valid2 = (eg2 >= offset) & (eg2 < n_pad - 1)
        if per_edge:
            lam_pe = jnp.pad(lam_b, ((0, 0), (offset, 0)))
            lw2 = jax.vmap(lambda a: _windows(a, Kb, chunk, overlap))(
                lam_pe)[:, :, : win - 1]
            lam_w2 = jnp.where(valid2[None], lw2, 0.0).reshape(
                S * Kb, win - 1)
        else:
            lam_w2 = jnp.broadcast_to(jnp.where(valid2, lam, 0.0)[None],
                                      (S, Kb, win - 1)).reshape(
                                          S * Kb, win - 1)
        # Warm-start the shifted grid from the (resumed) pass-1 glued dual,
        # windowed into the B layout: the A-glue is already correct away
        # from its own seams, so B's Newton only has localized corrections
        # to make — a cold B pass costs ~9.7 ms on adversarial plateau data
        # (stall cycles), the warm pass ~1.5 ms at the same final quality.
        w_pad = jnp.pad(w1, ((0, 0), (offset, 0)))  # (S, n_pad - 1)
        w_pad = jnp.pad(w_pad, ((0, 0), (0, 1)))    # edge j of sample j
        Wi = jax.vmap(lambda a: _windows(a, Kb, chunk, overlap))(
            w_pad).reshape(S * Kb, win)
        lam_box = jnp.concatenate(
            [lam_w2, jnp.zeros((S * Kb, 1), dtype)], axis=-1)
        Wi = jnp.clip(Wi, -lam_box, lam_box)  # box-feasible (0 at 0-weight)
        _, Ww2 = _solve_windows(Yw2, lam_w2, w_init=Wi)
        w2 = (Ww2.reshape(S, Kb, Ww2.shape[-1])[:, :, overlap: overlap + chunk]
              .reshape(S, -1)[:, offset: n_pad - 1])
        # Stitch at PINNED edges.  Where |w| = lam the dual problem
        # decouples (complementary slackness pins every genuine jump), so a
        # dual assembled region-by-region between edges where BOTH grids
        # agree at a bound is globally consistent.  Each pinned-bounded
        # region is then taken wholesale from the grid whose cuts are
        # farther from it (segment-min of the cut distances): a flat
        # spanning a grid-A seam — the failure mode of pass 1 — forms one
        # unpinned region containing that seam and is replaced by grid B's
        # exact solve of it.
        eps = jnp.finfo(dtype).eps
        lam_e = lam_b if per_edge else jnp.broadcast_to(
            jnp.asarray(lam, dtype), (1, n - 1))
        wmag = jnp.maximum(jnp.max(jnp.abs(w1), axis=-1, keepdims=True),
                           1.0)
        tiny = 32.0 * eps * wmag
        pinned = ((jnp.abs(w1 - w2) <= tiny)
                  & (lam_e - jnp.abs(w1) <= tiny))
        seg_start = jnp.concatenate(
            [jnp.ones((S, 1), bool), pinned[:, :-1]], axis=1)
        i = jnp.arange(n - 1)
        mA = (i + 1) % chunk
        dA = jnp.minimum(mA, chunk - mA).astype(dtype)
        mB = (i + 1 + offset) % chunk
        dB = jnp.minimum(mB, chunk - mB).astype(dtype)
        minA = _segment_min_scan(jnp.broadcast_to(dA[None], (S, n - 1)),
                                 seg_start)
        minB = _segment_min_scan(jnp.broadcast_to(dB[None], (S, n - 1)),
                                 seg_start)
        return jnp.where(minA < minB, w2, w1)

    # Contract tolerance for the escalation rungs: BASELINE.md's metric is
    # "equal solution at 1e-5 *relative objective* gap", i.e. gap <= 1e-5 *
    # P(x).  The strict pass-1 tolerance (2 eps * scale) cannot be met by
    # plateau-heavy f32 signals even at the exact dual — the reconstructed
    # primal's ulp ripple alone costs ~lam * n * eps * |x| of TV, which the
    # snap removes; the honest gap of the snapped point is gap(x~, w) +
    # [P(x_snap) - P(x~)], both terms cancellation-free.
    def _tol_contract(xs):
        P = (0.5 * jnp.sum((xs - Y) ** 2, axis=-1)
             + jnp.sum(lam_b * jnp.abs(diffs.forward_diff(xs)), axis=-1))
        return jnp.maximum(tol, 1e-5 * P)

    lam_hi = lam_b if per_edge else jnp.asarray(lam, dtype)

    def _dual_pgd(w, iters=12):
        """Fixed projected-gradient refinement of the dual (reference
        PG_TV2-style step, tau = 1/L with L = ||DD'|| = 4).  The stitched
        dual's only defects are single-edge splice mismatches, whose primal
        spikes are near-Nyquist modes of DD' — tau = 1/L annihilates the top
        mode per step, so a dozen unrolled steps erase them for ~3 passes
        over the signal each, no while_loop."""

        def body(_, w):
            g = diffs.primal2grad(diffs.dual2primal(w, Y))
            return jnp.clip(w - 0.25 * g, -lam_hi, lam_hi)

        return jax.lax.fori_loop(0, iters, body, w)

    def _escalate(w1):
        # Resume the pass-1 window solves twice (warm-started — re-arms the
        # stall/Armijo budget) to clear f32 plateau stalls: measured 178 ->
        # 0.91 total objective excess over the windows of the adversarial
        # all-plateau signal; with only one resume the rung fails its
        # certificate and falls through to the 60 ms polish, so the second
        # pass pays for itself.
        _, Wr = _solve_windows(Yw, lam_w, w_init=Ww)
        _, Wr = _solve_windows(Yw, lam_w, w_init=Wr)
        w1r = (Wr.reshape(S, K, Wr.shape[-1])[:, :, overlap: overlap + chunk]
               .reshape(S, -1)[:, : n - 1])
        x1r = diffs.dual2primal(w1r, Y)
        gap1r = _gap_at(x1r, w1r)
        wj = _dual_pgd(_jitter_dual(w1r))
        xj = diffs.dual2primal(wj, Y)
        gapj = _gap_at(xj, wj)
        better = gapj < gap1r
        wb = jnp.where(better[:, None], wj, w1r)
        xb = jnp.where(better[:, None], xj, x1r)
        gapb = jnp.minimum(gapj, gap1r)
        # Cascaded snap: the first pass flattens few-ulp wiggles into exact
        # runs, which lets the second pass merge across them (measured
        # 1.01e-5 -> 9.2e-6 relative on the adversarial plateau case).
        xs, dobj = _plateau_snap(xb, Y, lam_b, return_delta=True)
        xs, dobj2 = _plateau_snap(xs, Y, lam_b, return_delta=True)
        dobj = dobj + dobj2
        gap_s = jnp.maximum(gapb + dobj, 0.0)
        tol_c = _tol_contract(xs)

        def _polish(wb):
            x, info = tv1d_l1.tv1_pn(Y, lam_b, cfg=cfg, w_init=wb)
            xp, dobj_p = _plateau_snap(x, Y, lam_b, return_delta=True)
            xp, dobj_p2 = _plateau_snap(xp, Y, lam_b, return_delta=True)
            dobj_p = dobj_p + dobj_p2
            gap_p = jnp.maximum(info.gap + dobj_p, 0.0)
            rc_p = jnp.where(gap_p <= _tol_contract(xp), RC_OK,
                             info.rc).astype(jnp.int32)
            return xp, (info.iters, gap_p, rc_p)

        def _certified(_):
            return xs, (jnp.zeros((S,), jnp.int32), gap_s,
                        jnp.full((S,), RC_OK, jnp.int32))

        return jax.lax.cond(jnp.any(gap_s > tol_c), _polish,
                            _certified, wb)

    def _done(w1):
        return x1, (info1.iters, info1.gap, info1.rc)

    x, (it_, gap_, rc_) = jax.lax.cond(jnp.any(gap1 > tol), _escalate, _done,
                                       w_glued)
    info = make_info(it_, gap_, rc_)
    return (x[0] if single else x), info
