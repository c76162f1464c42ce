"""ONE huge 1D TV-L1 signal SPANNING the device mesh (shard_map-resident).

The single-device long-signal path (:mod:`proxtv_tpu.ops.tv1d_long`) solves
one n ~ 1e6 signal by batching overlapped windows through the fused VMEM
Newton kernel, gluing the per-window duals, and certifying with the global
duality gap.  This module is its cross-chip redesign (SURVEY §5.8's last
corner; reference headline case ``src/condat_fast_tv.cpp:129-131`` — one
arbitrarily long sequential scan): the signal is CONTIGUOUSLY BANDED over a
1D mesh, each device solves its own window sub-batch with the fused kernel,
and every global ingredient becomes a collective:

*   window construction — ``overlap``-sample halos ``ppermute`` between band
    neighbors (the windows themselves never cross more than one boundary);
*   the duality-gap certificate — a ``psum`` of per-device edge sums;
*   the escalation ladder (same rungs as tv1d_long, shard-resident):
    warm window resumes (local), a half-chunk-shifted second window grid
    (``offset + overlap``-sample halos) stitched at pinned edges via
    DISTRIBUTED segmented min scans (:mod:`proxtv_tpu.parallel.segscan`),
    dual projected-gradient refinement (1-sample halos per step), and the
    cascaded plateau snap via distributed segmented mean scans with the
    exact psum'd objective-delta certificate.

Even the final global projected-Newton polish runs shard-resident: the
masked Newton system is solved by DISTRIBUTED parallel cyclic reduction
(:func:`_pcr_masked_banded` — each ±stride shift is 1-2 whole/partial-block
``ppermute``s, ~log2(n) levels), the Armijo search and stopping logic carry
global scalars derived from ``psum``/``pmax`` reductions, so the banded path
certifies wherever the single-device path does — no rung ever gathers the
signal to one device.  A certificate that still fails reports RC_ITERS
honestly.

Entry point: :func:`proxtv_tpu.parallel.tv1_1d_banded`.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..utils.config import DEFAULT_TV1
from ..utils.info import RC_ITERS, RC_OK
from . import tv1d_long


def _halo_left(a, h: int, axis_name, n_dev: int):
    """The left neighbor's last h elements (zeros on device 0)."""
    if h == 0 or n_dev == 1:
        return jnp.zeros(a.shape[:-1] + (h,), a.dtype)
    return lax.ppermute(a[..., -h:], axis_name,
                        [(i, i + 1) for i in range(n_dev - 1)])


def _halo_right(a, h: int, axis_name, n_dev: int):
    """The right neighbor's first h elements (zeros on the last device)."""
    if h == 0 or n_dev == 1:
        return jnp.zeros(a.shape[:-1] + (h,), a.dtype)
    return lax.ppermute(a[..., :h], axis_name,
                        [(i + 1, i) for i in range(n_dev - 1)])


def _gshift_right(a, s: int, fill, axis_name, n_dev: int):
    """Banded global shift: result[i] = a_global[i - s] with ``fill`` beyond
    the global left end.  s spans at most two source devices: whole-block
    ppermutes by q = s // B_l and q + 1 hops plus a local splice."""
    B_l = a.shape[-1]
    if s >= n_dev * B_l:
        return jnp.full_like(a, fill)
    q, r = divmod(s, B_l)

    def hop(x, h):
        if h == 0:
            return x
        if h >= n_dev:
            return jnp.zeros_like(x)
        return lax.ppermute(x, axis_name,
                            [(i, i + h) for i in range(n_dev - h)])

    if r == 0:
        out = hop(a, q)
    else:
        out = jnp.concatenate([hop(a, q + 1)[B_l - r:], hop(a, q)[:B_l - r]])
    gidx = lax.axis_index(axis_name) * B_l + jnp.arange(B_l)
    return jnp.where(gidx >= s, out, fill)


def _gshift_left(a, s: int, fill, axis_name, n_dev: int):
    """Banded global shift: result[i] = a_global[i + s] with ``fill`` beyond
    the global right end."""
    B_l = a.shape[-1]
    Ng = n_dev * B_l
    if s >= Ng:
        return jnp.full_like(a, fill)
    q, r = divmod(s, B_l)

    def hop(x, h):
        if h == 0:
            return x
        if h >= n_dev:
            return jnp.zeros_like(x)
        return lax.ppermute(x, axis_name,
                            [(i + h, i) for i in range(n_dev - h)])

    if r == 0:
        out = hop(a, q)
    else:
        out = jnp.concatenate([hop(a, q)[r:], hop(a, q + 1)[:r]])
    gidx = lax.axis_index(axis_name) * B_l + jnp.arange(B_l)
    return jnp.where(gidx <= Ng - 1 - s, out, fill)


def _pcr_masked_banded(rhs, mask, axis_name, n_dev: int):
    """Distributed masked second-difference solve: the banded counterpart of
    ``tridiag.spd_second_difference_solve(rhs, mask=mask)`` (the PN Newton
    system).  Plain parallel cyclic reduction whose per-level ±stride shifts
    become banded global shifts (1-2 ppermutes each); active rows are
    identity rows, couplings exist only between adjacent inactive rows."""
    import math

    B_l = rhs.shape[-1]
    Ng = n_dev * B_l
    dtype = rhs.dtype
    mf = mask.astype(dtype)
    mprev = jnp.concatenate([_halo_left(mf, 1, axis_name, n_dev), mf[:-1]])
    mnext = jnp.concatenate([mf[1:], _halo_right(mf, 1, axis_name, n_dev)])
    a = jnp.where(mask, 2.0, 1.0).astype(dtype)
    b = jnp.where(mask & (mprev > 0), -1.0, 0.0).astype(dtype)
    c = jnp.where(mask & (mnext > 0), -1.0, 0.0).astype(dtype)
    d = jnp.where(mask, rhs, 0.0)
    for k in range(max(1, math.ceil(math.log2(Ng)))):
        stride = 1 << k
        if stride >= Ng:
            break
        am = _gshift_right(a, stride, 1.0, axis_name, n_dev)
        ap = _gshift_left(a, stride, 1.0, axis_name, n_dev)
        bm = _gshift_right(b, stride, 0.0, axis_name, n_dev)
        bp = _gshift_left(b, stride, 0.0, axis_name, n_dev)
        cm = _gshift_right(c, stride, 0.0, axis_name, n_dev)
        cp = _gshift_left(c, stride, 0.0, axis_name, n_dev)
        dm = _gshift_right(d, stride, 0.0, axis_name, n_dev)
        dp = _gshift_left(d, stride, 0.0, axis_name, n_dev)
        alpha = -b / am
        beta = -c / ap
        a = a + alpha * cm + beta * bp
        d = d + alpha * dm + beta * dp
        b = alpha * bm
        c = beta * cp
    return jnp.where(mask, d / a, 0.0)


def _windows_ext(ext, Kl: int, chunk: int, overlap: int):
    """(Kl, chunk + 2*overlap) windows of the halo-extended local block:
    window k covers ext[k*chunk : k*chunk + win] — pads/reshapes only."""
    win = chunk + 2 * overlap
    nl = Kl * chunk
    body = ext[overlap: overlap + nl].reshape(Kl, chunk)
    left = ext[:nl].reshape(Kl, chunk)[:, :overlap]
    tail = ext[overlap + chunk:]
    tail = jnp.pad(tail, (0, nl - tail.shape[0]))
    right = tail.reshape(Kl, chunk)[:, :overlap]
    return jnp.concatenate([left, body, right], axis=1)[:, :win]


def run_banded(yl, lam_arr, *, axis_name: str, n_dev: int, n: int,
               chunk: int, overlap: int, cfg=DEFAULT_TV1):
    """shard_map body: solve the banded long signal on this device's block.

    Args:
        yl: (B_l,) local contiguous block of the zero-padded global signal
            (global length n_dev * B_l >= n; padding is exactly decoupled by
            zero edge weights).
        lam_arr: () scalar penalty, or (B_l,) local block of the zero-padded
            per-edge weight vector (edge i stored at global index i).
        n: true signal length.  chunk/overlap: window geometry (as
            tv1d_long).

    Returns:
        (x_local, gap, iters, rc): the (B_l,) local solution slice and the
        global (1,)-shaped certificate fields.
    """
    B_l = yl.shape[0]
    dtype = yl.dtype
    Kl = B_l // chunk
    win = chunk + 2 * overlap
    offset = chunk // 2
    d_idx = lax.axis_index(axis_name)
    base = d_idx * B_l
    per_edge = lam_arr.ndim >= 1
    idx = jnp.arange(B_l, dtype=jnp.int32)
    eg_local = base + idx                       # global edge index per slot
    edge_valid = eg_local < n - 1
    lam_local = jnp.where(
        edge_valid, lam_arr if per_edge else lam_arr.astype(dtype), 0.0)

    # ---- pass-1 windows (overlap halos) ----
    hmax = offset + overlap
    yext_full = jnp.concatenate([
        _halo_left(yl, hmax, axis_name, n_dev), yl,
        _halo_right(yl, hmax, axis_name, n_dev)])
    ext1 = yext_full[hmax - overlap: hmax + B_l + overlap]
    Yw = _windows_ext(ext1, Kl, chunk, overlap)
    eg_w = (base + (jnp.arange(Kl, dtype=jnp.int32) * chunk)[:, None]
            + jnp.arange(win - 1, dtype=jnp.int32)[None, :] - overlap)
    valid_w = (eg_w >= 0) & (eg_w < n - 1)
    if per_edge:
        lext_full = jnp.concatenate([
            _halo_left(lam_arr, hmax, axis_name, n_dev), lam_arr,
            _halo_right(lam_arr, hmax, axis_name, n_dev)])
        lw = _windows_ext(lext_full[hmax - overlap: hmax + B_l + overlap],
                          Kl, chunk, overlap)[:, :win - 1]
        lam_w = jnp.where(valid_w, lw, 0.0)
    else:
        lam_w = jnp.where(valid_w, lam_arr, 0.0).astype(dtype)
    _, Ww = tv1d_long._solve_windows(Yw, lam_w)

    def glue(W):
        return W[:, overlap: overlap + chunk].reshape(B_l)

    w1 = glue(Ww)

    # ---- local primal / gradient / global gap ----
    def primal_of(w):
        wprev = jnp.concatenate([_halo_left(w, 1, axis_name, n_dev),
                                 w[:-1]])
        return yl + w - wprev

    def grad_of(x):
        xnext = jnp.concatenate([x[1:], _halo_right(x, 1, axis_name, n_dev)])
        return x - xnext                       # g_i = x_i - x_{i+1}

    def gap_of(w):
        x = primal_of(w)
        g = grad_of(x)
        contrib = jnp.sum(jnp.where(edge_valid,
                                    lam_local * jnp.abs(g) + w * g, 0.0))
        return jnp.abs(lax.psum(contrib, axis_name)), x

    # Global dtype-relative tolerance (as tv1d_long: 0.5||y - mean||^2).
    sample_valid = (base + idx) < n
    ysum = lax.psum(jnp.sum(yl), axis_name)
    ymean = ysum / n
    yc2 = lax.psum(jnp.sum(jnp.where(sample_valid, (yl - ymean) ** 2, 0.0)),
                   axis_name)
    scale = jnp.maximum(1.0, 0.5 * yc2)
    tol = jnp.maximum(cfg.stop, 2.0 * jnp.finfo(dtype).eps * scale)

    gap1, x1 = gap_of(w1)

    def objective_of(x):
        g = grad_of(x)
        fid = jnp.sum(jnp.where(sample_valid, (x - yl) ** 2, 0.0))
        tv = jnp.sum(jnp.where(edge_valid, lam_local * jnp.abs(g), 0.0))
        return lax.psum(0.5 * fid + tv, axis_name)

    def tol_contract(x):
        # BASELINE contract: duality gap <= 1e-5 * objective (see tv1d_long).
        return jnp.maximum(tol, 1e-5 * objective_of(x))

    # ---- distributed plateau snap (tv1d_long._plateau_snap, banded) ----
    def plateau_snap(x):
        eps = jnp.finfo(dtype).eps
        scale_x = jnp.maximum(
            lax.pmax(jnp.max(jnp.abs(jnp.where(sample_valid, x, 0.0))),
                     axis_name), 1e-30)
        xprev = jnp.concatenate([_halo_left(x, 1, axis_name, n_dev), x[:-1]])
        d_in = x - xprev                       # x_i - x_{i-1}
        flat_prev = jnp.abs(d_in) <= 256.0 * eps * scale_x
        seg_start = jnp.where((base + idx) == 0, True, ~flat_prev)
        # Padding samples (>= n) must not merge with real ones: force a
        # segment break at the first padding slot.
        seg_start = seg_start | ((base + idx) == n)
        ss = seg_start.astype(dtype)
        nxt = _halo_right(ss, 1, axis_name, n_dev)
        is_last_dev = d_idx == n_dev - 1
        tail = jnp.where(is_last_dev, 1.0, nxt[0])
        se = jnp.concatenate([ss[1:], tail[None]])
        from ..parallel import segscan
        m = segscan.segment_mean(x, ss, axis_name, n_dev, seg_end=se)
        e = jnp.where(sample_valid, m - x, 0.0)
        d_fid = jnp.sum(e * (x - yl)) + 0.5 * jnp.sum(e * e)
        gm = grad_of(m)
        gx = grad_of(x)
        d_tv = jnp.sum(jnp.where(edge_valid,
                                 lam_local * (jnp.abs(gm) - jnp.abs(gx)),
                                 0.0))
        dobj = lax.psum(d_fid + d_tv, axis_name)
        keep = dobj < 0.0
        xs = jnp.where(keep & sample_valid, m, x)
        return xs, jnp.where(keep, dobj, 0.0)

    # ---- dual PGD refinement (reference PG step, tau = 1/L = 0.25) ----
    def dual_pgd(w, iters):
        def body(_, w):
            g = grad_of(primal_of(w))
            return jnp.clip(w - 0.25 * g, -lam_local, lam_local)
        return lax.fori_loop(0, iters, body, w)

    # ---- shard-resident projected-Newton polish (the tv1_pn port) ----
    # The final ladder rung: warm-started global projected Newton with the
    # masked Newton system solved by DISTRIBUTED cyclic reduction
    # (_pcr_masked_banded) — exactly tv1d_l1.tv1_pn's algorithm, with every
    # batch reduction a psum and every ±1 stencil a 1-sample halo.  This is
    # what makes the banded path certify wherever the single-device path
    # does (the jitter/PGD/snap rungs alone leave O(1) gaps on adversarial
    # plateau data in f64, where the single-device path also polishes).
    from ..utils.config import EPSILON

    ylc = jnp.where(sample_valid, yl - ymean, 0.0)
    feps = jnp.finfo(dtype).eps
    epsd = jnp.asarray(EPSILON, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    eps_gap = jnp.maximum(epsd, 2.0 * feps * scale)
    eps_f = jnp.maximum(epsd, 10.0 * feps * scale)
    sigma = jnp.asarray(cfg.sigma, dtype)

    def psum_(v):
        return lax.psum(v, axis_name)

    def primal_c(w):
        wprev = jnp.concatenate([_halo_left(w, 1, axis_name, n_dev), w[:-1]])
        return ylc + w - wprev

    def gap_c(w, g):
        return jnp.abs(psum_(jnp.sum(jnp.where(
            edge_valid, lam_local * jnp.abs(g) + w * g, 0.0))))

    def pn_polish(w0, max_iters: int):
        def inactive_mask(w, g):
            return (lam_local > 0) & (
                ((w > -lam_local) & (w < lam_local))
                | ((w == -lam_local) & (g < -epsd))
                | ((w == lam_local) & (g > epsd)))

        ynext = jnp.concatenate([ylc[1:],
                                 _halo_right(ylc, 1, axis_name, n_dev)])
        dy_edges = ynext - ylc                  # y[i+1] - y[i] at edge i

        def armijo(w, g, d, mI, x, fval):
            gRd = psum_(jnp.sum(jnp.where(mI, g * d, 0.0)))
            wm = jnp.concatenate([_halo_left(w, 1, axis_name, n_dev),
                                  w[:-1]])
            wp = jnp.concatenate([w[1:],
                                  _halo_right(w, 1, axis_name, n_dev)])
            hw = 2.0 * w - wm - wp
            use = mI & ~(w == lam_local)
            grad0 = psum_(jnp.sum(jnp.where(use, -d * (hw - dy_edges), 0.0)))

            def maxstep_fn(dd):
                t_neg = jnp.where(mI & (dd < 0), (w - lam_local) / dd, -big)
                t_pos = jnp.where(mI & (dd > 0), (w + lam_local) / dd, -big)
                loc = jnp.maximum(jnp.max(t_neg), jnp.max(t_pos))
                return lax.pmax(loc, axis_name)

            maxstep0 = maxstep_fn(d)

            def body(state):
                (k, delta, maxstep, found, best_aux, best_x, best_f,
                 recomp) = state
                aux = jnp.where(mI, jnp.clip(w - delta * d,
                                             -lam_local, lam_local), w)
                dwv = aux - w
                dwm = jnp.concatenate([
                    _halo_left(dwv, 1, axis_name, n_dev), dwv[:-1]])
                dx = dwv - dwm
                x_new = x + dx
                improve = -(psum_(jnp.sum(x * dx))
                            + 0.5 * psum_(jnp.sum(dx * dx)))
                f_new = fval - improve
                no_improve = improve <= eps_f
                ok = improve >= sigma * delta * gRd
                newly = ~found & (ok | no_improve)
                best_aux = jnp.where(newly, aux, best_aux)
                best_x = jnp.where(newly, x_new, best_x)
                best_f = jnp.where(newly, f_new, best_f)
                found = found | newly
                searching = ~found
                tmp = grad0 * delta
                denom = 2.0 * (-improve - tmp)
                delta_interp = jnp.where(denom != 0, -(tmp * delta) / denom,
                                         delta * 0.5)
                ms = jnp.where(recomp, maxstep, maxstep0)
                delta_new = jnp.minimum(delta_interp, ms)
                delta_new = jnp.where(delta_new - delta >= -epsd,
                                      delta * 0.5, delta_new)
                dead = searching & (delta_new < epsd)
                best_aux = jnp.where(dead, aux, best_aux)
                best_x = jnp.where(dead, x_new, best_x)
                best_f = jnp.where(dead, f_new, best_f)
                found = found | dead
                delta = jnp.where(searching, delta_new, delta)
                maxstep = jnp.where(searching, delta_new, maxstep)
                return (k + 1, delta, maxstep, found, best_aux, best_x,
                        best_f, jnp.asarray(True))

            def cond(state):
                k, _, _, found, *_ = state
                return (k < cfg.max_armijo) & ~found

            init = (jnp.int32(0), jnp.ones((), dtype), maxstep0,
                    jnp.asarray(False), w, x, fval, jnp.asarray(False))
            _, _, _, _, aux, x_new, f_new, _ = lax.while_loop(cond, body,
                                                              init)
            return aux, x_new, f_new

        MAX_STALL = 5

        def outer_body(state):
            w, g, x, fval, stop, best, stall, iters, running = state
            mI = inactive_mask(w, g)
            any_inactive = lax.pmax(jnp.any(mI).astype(jnp.int32),
                                    axis_name) > 0
            dN = _pcr_masked_banded(jnp.where(mI, g, 0.0), mI, axis_name,
                                    n_dev)
            dN = jnp.where(mI, dN, 0.0)
            aux, x_new, f_new = armijo(w, g, dN, mI, x, fval)
            g_new = grad_of(x_new)
            stop_new = gap_c(aux, g_new)
            act = running & any_inactive
            w = jnp.where(act, aux, w)
            x = jnp.where(act, x_new, x)
            g = jnp.where(act, g_new, g)
            fval = jnp.where(act, f_new, fval)
            stop = jnp.where(act, stop_new, stop)
            improved = (stop < best - eps_gap) | (stop < 0.875 * best)
            best = jnp.minimum(best, stop)
            stall = jnp.where(act, jnp.where(improved, 0, stall + 1), stall)
            iters = iters + act.astype(jnp.int32)
            running = (running & any_inactive & (stop > tol)
                       & (stall < MAX_STALL))
            return w, g, x, fval, stop, best, stall, iters, running

        def outer_cond(state):
            *_, iters, running = state
            return running & (iters < max_iters)

        w = jnp.clip(w0, -lam_local, lam_local)
        x = primal_c(w)
        g = grad_of(x)
        fval = 0.5 * psum_(jnp.sum(x * x))
        stop0 = gap_c(w, g)
        init = (w, g, x, fval, stop0, stop0, jnp.int32(0), jnp.int32(0),
                stop0 > tol)
        w, g, x, fval, stop, best, stall, iters, running = lax.while_loop(
            outer_cond, outer_body, init)
        x_unc = jnp.where(sample_valid, x + ymean, 0.0)
        return w, x_unc, jnp.abs(stop), iters

    # ---- escalation ladder ----
    def escalate(_):
        # rung 0: warm window resumes (clear f32 plateau stalls; local).
        _, Wr = tv1d_long._solve_windows(Yw, lam_w, w_init=Ww)
        _, Wr = tv1d_long._solve_windows(Yw, lam_w, w_init=Wr)
        w1r = glue(Wr)
        gap1r, x1r = gap_of(w1r)

        # rung 1: half-chunk-shifted window grid, stitched at pinned edges.
        # Shifted window k owns global edges [base + offset + k*chunk, ...).
        ext2 = yext_full[hmax + offset - overlap:
                         hmax + offset - overlap + B_l + 2 * overlap]
        Yw2 = _windows_ext(ext2, Kl, chunk, overlap)
        eg_w2 = eg_w + offset
        valid_w2 = (eg_w2 >= 0) & (eg_w2 < n - 1)
        if per_edge:
            lw2 = _windows_ext(
                lext_full[hmax + offset - overlap:
                          hmax + offset - overlap + B_l + 2 * overlap],
                Kl, chunk, overlap)[:, :win - 1]
            lam_w2 = jnp.where(valid_w2, lw2, 0.0)
        else:
            lam_w2 = jnp.where(valid_w2, lam_arr, 0.0).astype(dtype)
        # Warm-start grid B from the resumed pass-1 glue (tv1d_long: a cold
        # B pass costs ~6x on plateau data): window the w1r edge vector with
        # the same shifted geometry.
        w1r_full = jnp.concatenate([
            _halo_left(w1r, hmax, axis_name, n_dev), w1r,
            _halo_right(w1r, hmax, axis_name, n_dev)])
        Wi = _windows_ext(
            w1r_full[hmax + offset - overlap:
                     hmax + offset - overlap + B_l + 2 * overlap],
            Kl, chunk, overlap)[:, :win - 1]
        Wi = jnp.clip(Wi, -lam_w2, lam_w2)
        _, Ww2 = tv1d_long._solve_windows(Yw2, lam_w2, w_init=Wi)
        w2_seg = glue(Ww2)                     # edges [base+offset, ...)
        # Align to the band layout (edges [base, base+B_l)): the first
        # `offset` slots come from the LEFT neighbor's segment tail.
        w2 = jnp.concatenate([
            _halo_left(w2_seg, offset, axis_name, n_dev),
            w2_seg[:B_l - offset]])
        # Edges below `offset` are not covered by grid B: take grid A there
        # (and force the stitch to prefer A for any region touching them).
        uncovered = eg_local < offset
        w2 = jnp.where(uncovered, w1r, w2)

        # Pinned-edge stitch (see tv1d_long._jitter_dual): regions between
        # edges where BOTH grids agree at a bound are taken wholesale from
        # the grid whose cuts are farther (distributed segment-min).
        eps = jnp.finfo(dtype).eps
        wmag = jnp.maximum(lax.pmax(jnp.max(jnp.abs(w1r)), axis_name), 1.0)
        tiny = 32.0 * eps * wmag
        pinned = ((jnp.abs(w1r - w2) <= tiny)
                  & (lam_local - jnp.abs(w1r) <= tiny))
        pf = pinned.astype(dtype)
        prev_pin = jnp.concatenate([_halo_left(pf, 1, axis_name, n_dev),
                                    pf[:-1]])
        seg_start = jnp.where(eg_local == 0, 1.0, prev_pin)
        nxt = _halo_right(seg_start, 1, axis_name, n_dev)
        tail = jnp.where(d_idx == n_dev - 1, 1.0, nxt[0])
        se = jnp.concatenate([seg_start[1:], tail[None]])
        # Seam distances in int32 (exact at any n; f32 would lose integer
        # exactness past 2^24), cast only for the segment-min scan.
        mA = jnp.mod(eg_local + 1, chunk)
        dA = jnp.minimum(mA, chunk - mA).astype(dtype)
        mB = jnp.mod(eg_local + 1 - offset + chunk, chunk)
        dB = jnp.where(uncovered, -1.0,
                       jnp.minimum(mB, chunk - mB).astype(dtype))
        from ..parallel import segscan
        minA = segscan.segment_min(dA, seg_start, axis_name, n_dev,
                                   seg_end=se)
        minB = segscan.segment_min(dB, seg_start, axis_name, n_dev,
                                   seg_end=se)
        wj = jnp.where(minA < minB, w2, w1r)

        # rung 2: dual PGD + cascaded snap, certified.
        wj = dual_pgd(wj, 12)
        gapj, xj = gap_of(wj)
        better = gapj < gap1r
        wb = jnp.where(better, wj, w1r)
        xb = jnp.where(better, xj, x1r)
        gapb = jnp.minimum(gapj, gap1r)
        xs, dobj = plateau_snap(xb)
        xs, dobj2 = plateau_snap(xs)
        gap_s = jnp.maximum(gapb + dobj + dobj2, 0.0)
        tol_c = tol_contract(xs)

        # rung 3: warm-started distributed projected-Newton polish + snap,
        # with the gap transported to the snapped point (as tv1d_long).
        def polish(args):
            wb, xs, gap_s = args
            wp, xp, gap_p, it_p = pn_polish(wb, cfg.max_iters)
            xps, dp1 = plateau_snap(xp)
            xps, dp2 = plateau_snap(xps)
            gps = jnp.maximum(gap_p + dp1 + dp2, 0.0)
            use = gps < gap_s
            return (jnp.where(use, xps, xs), jnp.minimum(gps, gap_s), it_p)

        xs, gap_s, it_p = lax.cond(
            gap_s > tol_c, polish,
            lambda a: (a[1], a[2], jnp.int32(0)), (wb, xs, gap_s))
        tol_c = tol_contract(xs)
        rc = jnp.where(gap_s <= tol_c, RC_OK, RC_ITERS).astype(jnp.int32)
        return xs, gap_s, it_p, rc

    def done(_):
        return (x1, gap1, jnp.asarray(0, jnp.int32),
                jnp.asarray(RC_OK, jnp.int32))

    x, gap, iters, rc = lax.cond(gap1 > tol, escalate, done, 0)
    return x, gap[None], iters[None], rc[None]
