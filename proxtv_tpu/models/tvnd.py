"""Batched ND generalized-TV proximity combiners (TPU-native).

Solves, for a batch of K-dimensional tensors,

    min_X 0.5 ||X - Y||^2 + sum_i w_i * TV_{p_i}(X along dim d_i)

for an arbitrary list of penalty terms (w_i, d_i, p_i) — the reference's
generalized-TV problem (``src/TVNDopt.cpp``, ``TVgenopt.cpp:25-34``).  Each
term's prox is a batched 1D prox over every fiber along its dimension: the
fibers become a batch axis (one reshape/transpose), not an OpenMP loop.

Engines:

*   :func:`tv_nd_batched` with ``method='pd'`` — Parallel Proximal Dykstra
    (reference ``PD_TV``, src/TVNDopt.cpp:48): product-space Dykstra with the
    lambda_i * npen rescale (reference :100-101) and mean recombination.
*   ``method='pdr'`` — Parallel Douglas-Rachford (reference ``PDR_TV``,
    src/TVNDopt.cpp:280): product-space DR where each component prox carries
    its share of the quadratic term.
*   ``method='yang'`` — consensus ADMM with rho = 10, the ND generalization of
    the reference's ``Yang2_TV``/``Yang3_TV`` (src/TV2Dopt.cpp:787,
    src/TVNDopt.cpp:678).
*   :func:`tv_value` — the generalized TV penalty value (reference ``TVval``,
    src/TVNDopt.cpp:524).
*   :func:`tvgen_dispatch` — the intended dispatch rule (MATLAB
    ``matlab/solveTVgen.cpp:90-97``): 2D signal penalized on both dims ->
    2D Douglas-Rachford; two terms -> Dykstra; more -> Parallel Dykstra.
    (The reference *Python* layer's operator-precedence bug sends everything
    to PD, prox_tv/__init__.py:585 — fixed here.)

Dimension indices ``ds`` are 1-based over the signal dimensions (matching the
reference convention), i.e. ``d=1`` penalizes fibers along the first signal
axis.  All entry points take (B, *signal_dims) stacks.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops import tv1d_l1, tv1d_l2, tv1d_lp
from ..utils.config import DEFAULT_COMBINER, CombinerConfig
from ..utils.info import RC_ITERS, RC_OK, make_info
from ..utils.lpnorms import lp_norm
from . import tv2d


def _prox_along(X, dim: int, lam, p: float, method: str = "pn"):
    """Batched 1D prox along signal dim ``dim`` (1-based) of (B, *dims) X."""
    axis = dim  # axis in the batched array (axis 0 is batch)
    Xm = jnp.moveaxis(X, axis, -1)
    lead = Xm.shape[:-1]
    n = Xm.shape[-1]
    Y2 = Xm.reshape(-1, n)
    out = tv2d._prox1d(Y2, lam, p, method)
    return jnp.moveaxis(out.reshape(lead + (n,)), -1, axis)


def _prox_along_ws(X, dim: int, lam, p: float, method: str, state):
    """Stateful (dual warm-started) fiber prox along ``dim``; state is the
    (fibers, len-1) dual array carried across combiner iterations."""
    axis = dim
    Xm = jnp.moveaxis(X, axis, -1)
    lead = Xm.shape[:-1]
    n = Xm.shape[-1]
    Y2 = Xm.reshape(-1, n)
    out, state = tv2d._prox1d_ws(Y2, lam, p, method, state)
    return jnp.moveaxis(out.reshape(lead + (n,)), -1, axis), state


def _state_init(X, dim: int, p: float = 1.0):
    n = X.shape[dim]
    fibers = X.size // n
    return tv2d._prox_state_init(fibers, n, p, X.dtype)


def _norm_along(X, dim: int, p: float):
    """sum over fibers of ||D fiber||_p along signal dim ``dim`` (per batch)."""
    Xm = jnp.moveaxis(X, dim, -1)
    d = Xm[..., 1:] - Xm[..., :-1]
    nrm = lp_norm(d, p)  # (..., fibers)
    return jnp.sum(nrm.reshape(X.shape[0], -1), axis=-1)


def tv_value(X, ws, ds: Sequence[int], ps):
    """Generalized TV penalty value of a single (unbatched) tensor
    (reference TVval, src/TVNDopt.cpp:524)."""
    X = jnp.asarray(X)[None]
    tot = 0.0
    for w, d, p in zip(ws, ds, ps):
        tot = tot + w * _norm_along(X, int(d), float(p))[0]
    return tot


def _mean_abs_change(x, x_last):
    B = x.shape[0]
    return jnp.mean(jnp.abs(x - x_last).reshape(B, -1), axis=-1)


def _loop(body, init_state, x_of, cap, tol):
    """Per-tensor diagnostics (reference per-solve info[], src/general.h:58-61):
    ``iters`` counts the sweeps each batch element ran before its own mean
    change dropped below tol (see tv2d._loop)."""

    def full_body(carry):
        state, x_last, delta, iters_img, running, iters = carry
        state = body(state)
        x = x_of(state)
        delta_new = _mean_abs_change(x, x_last)
        delta = jnp.where(running, delta_new, delta)
        iters_img = iters_img + running.astype(jnp.int32)
        running = running & (delta > tol)
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
    rc = jnp.where((iters_img >= cap) & (delta > tol), RC_ITERS, RC_OK).astype(jnp.int32)
    return x_of(state), make_info(iters_img, delta, rc)


# ---------------------------------------------------------------------------
# Fused 3D primal-dual engine (Pallas)
# ---------------------------------------------------------------------------


def _pdhg3d_fused_ok(Y, ds, ps):
    """Fused 3D PDHG requires: (B, L, M, N) volumes penalized on all three
    signal dims with p = 1, f32 on TPU, and a line that fits VMEM."""
    from ..ops.kernels import gating
    return (Y.ndim == 4 and tuple(sorted(ds)) == (1, 2, 3)
            and all(p == 1.0 for p in ps) and gating.gate(Y, "pdhg3d"))


def _run_pdhg3d_fused(Y, lams_by_dim, cap, cfg, variant: str, gap_tol=None,
                      obj_target=None, schedule_override=None):
    """Driver for the temporally-blocked 3D PDHG kernel: volumes stacked
    along L with decoupled gap layers; stops on the per-volume duality-gap
    certificate (see tv2d._run_pdhg_fused — same contract, three dual fields).

    ``lams_by_dim``: (lam_L, lam_M, lam_N) scalar penalties per signal dim.
    ``schedule_override``: optional (sigma0, cap_mult) traced scalars that
    replace the auto-tuned cp-acc step schedule (sweepable without recompile).
    ``cap_mult`` caps the accelerated sigma growth, so it only takes effect
    with ``variant='cp-acc'``; for the constant-step variants (cp / condat,
    theta = 1) the override's sigma0 applies and cap_mult is ignored.
    Reference algorithm covered: Yang3_TV (src/TVNDopt.cpp:678-781), re-posed
    primal-dual and fused.
    """
    from ..ops.kernels import pdhg3d_fused as PK3

    B, L, M, N = Y.shape
    # Orientation: the lane (last) axis sets the VMEM window budget (and
    # lanes pad to a multiple of 128), so rotate the axis with the best
    # effective-iterations-per-useful-cell score into the lane position —
    # the 3D analog of tv2d's wide-image transpose.  Anisotropic TV is
    # permutation-symmetric with the per-axis penalties permuted along.
    def _lane_eff3(n_lane: int) -> float:
        if n_lane < 2:
            return 0.0
        Np_ = max(128, -(-n_lane // 128) * 128)
        k_, tl_, tm_ = PK3.best_params(Np_)
        wl_ = tl_ + 2 * PK3._halo_l(k_)
        wm_ = tm_ + 2 * PK3._halo_m(k_)
        return k_ * tl_ * tm_ / float(wl_ * wm_) * (n_lane / float(Np_))

    scores = [_lane_eff3(d) for d in (L, M, N)]
    best_ax = int(max(range(3), key=lambda a: scores[a]))
    if best_ax != 2 and scores[best_ax] > 1.05 * scores[2]:
        perm = {0: (0, 3, 2, 1), 1: (0, 1, 3, 2)}[best_ax]
        lams_p = [lams_by_dim[perm[i + 1] - 1] for i in range(3)]
        x_t, info = _run_pdhg3d_fused(
            jnp.transpose(Y, perm), tuple(lams_p), cap, cfg, variant,
            gap_tol=gap_tol, obj_target=obj_target,
            schedule_override=schedule_override)
        return jnp.transpose(x_t, perm), info  # both perms are involutions

    lam_L, lam_M, lam_N = [jnp.asarray(l, Y.dtype) for l in lams_by_dim]
    k_steps, tl, tm = PK3.best_params(-(-N // 128) * 128)
    hl, hm = PK3._halo_l(k_steps), PK3._halo_m(k_steps)
    gap_layers = 2
    S = L + gap_layers
    Np = -(-N // 128) * 128
    ltiles = max(1, -(-(B * S) // tl))
    mtiles = max(1, -(-M // tm))
    Lp = ltiles * tl + 2 * hl
    Mp = mtiles * tm + 2 * hm

    if schedule_override is not None:
        sigma0, cap_mult = [jnp.asarray(v, Y.dtype) for v in schedule_override]
    elif variant == "cp-acc":
        from .tv2d import _pdhg_sigma_schedule
        lam_eff = jnp.maximum(jnp.maximum(lam_L, lam_M), lam_N)
        sigma0, cap_mult = _pdhg_sigma_schedule(Y, lam_eff, Y.dtype)
    else:
        sigma0 = jnp.asarray(cfg.cp_sigma, Y.dtype)
        cap_mult = 2.0
    tau0 = 0.9 / (12.0 * sigma0)  # ||D||^2 <= 12 for three dualized axes

    def canvas(A):
        b, l, m, n = A.shape
        A = jnp.pad(A, ((0, 0), (0, S - l), (0, 0), (0, 0)))
        A = A.reshape(B * S, m, n)
        return jnp.pad(A, ((hl, Lp - hl - B * S), (hm, Mp - hm - m),
                           (0, Np - n)))

    Ypad = canvas(Y)
    # Validity masks on the canvas (kernel rules).
    r = jnp.arange(Lp)[:, None, None] - hl
    q = r % S
    rm = jnp.arange(Mp)[None, :, None] - hm
    col = jnp.arange(Np)[None, None, :]
    in_img = ((r >= 0) & (r < B * S) & (q <= L - 1)
              & (rm >= 0) & (rm < M) & (col < N))
    v1 = (in_img & (col < N - 1)).astype(Y.dtype)
    v2 = (in_img & (rm < M - 1)).astype(Y.dtype)
    v3 = (in_img & (q <= L - 2)).astype(Y.dtype)
    lam1, lam2, lam3 = lam_N * v1, lam_M * v2, lam_L * v3

    # Certificate cadence (see tv2d._run_pdhg_fused): check every ~24 iters.
    cpc = max(1, 24 // k_steps)
    cap_pad = -(-cap // (cpc * k_steps)) * (cpc * k_steps)
    # Incremental schedule from a carried (sigma, tau) + the same gap-stall
    # restart controller as the 2D driver (stall window spans LOOK
    # certificate checks; the stall statistic is the gap summed over
    # still-running volumes, which reduces to the per-image gap at B = 1).
    sig0_f = jnp.asarray(sigma0, jnp.float32)
    tau0_f = jnp.asarray(tau0, jnp.float32)
    LOOK, DECAY, GROW = 3, 0.7, 4.0
    restart = variant == "cp-acc"

    def dT(U, axis):
        z = jnp.zeros_like(jnp.take(U, jnp.arange(1), axis=axis))
        first = jnp.concatenate([z, jnp.moveaxis(
            jnp.moveaxis(U, axis, 0)[:-1], 0, axis)], axis=axis)
        return U - first

    def d_(X, axis):
        z = jnp.zeros_like(jnp.take(X, jnp.arange(1), axis=axis))
        nxt = jnp.concatenate([jnp.moveaxis(
            jnp.moveaxis(X, axis, 0)[1:], 0, axis), z], axis=axis)
        return X - nxt

    def per_vol(E):
        return jnp.sum(E[hl:hl + B * S].reshape(B, S, Mp, Np), axis=(1, 2, 3))

    def gap_and_primal(u1, u2, u3):
        u1 = jnp.where(v1 > 0, u1, 0.0)
        u2 = jnp.where(v2 > 0, u2, 0.0)
        u3 = jnp.where(v3 > 0, u3, 0.0)
        xhat = Ypad - (dT(u1, 2) + dT(u2, 1) + dT(u3, 0))
        g1 = d_(xhat, 2) * v1
        g2 = d_(xhat, 1) * v2
        g3 = d_(xhat, 0) * v3
        e = (lam1 * jnp.abs(g1) - u1 * g1 + lam2 * jnp.abs(g2) - u2 * g2
             + lam3 * jnp.abs(g3) - u3 * g3)
        gap_b = per_vol(e)
        obj_b = (0.5 * per_vol((xhat - Ypad) ** 2)
                 + per_vol(lam1 * jnp.abs(g1) + lam2 * jnp.abs(g2)
                           + lam3 * jnp.abs(g3)))
        return gap_b, obj_b, xhat

    if gap_tol is None:
        gtol = jnp.maximum(jnp.asarray(cfg.pdhg_gap_tol, Y.dtype),
                           64.0 * jnp.finfo(Y.dtype).eps)
    else:
        gtol = jnp.asarray(gap_tol, Y.dtype)  # explicit (0 = run to cap)

    # Equal-quality mode (see tv2d._run_pdhg_fused): per-volume objective
    # target stops an image once its certified iterate reaches it.
    if obj_target is None:
        obj_tgt = jnp.full((B,), -jnp.inf, Y.dtype)
    else:
        obj_tgt = jnp.broadcast_to(jnp.asarray(obj_target, Y.dtype), (B,))

    def still_running(gap_b, obj_b):
        return (gap_b > gtol * jnp.maximum(1.0, obj_b)) & (obj_b > obj_tgt)

    def chunk_call(sd, x, xb, u1, u2, u3):
        return PK3.pdhg3d_chunk(sd, x, xb, u1, u2, u3, Ypad, k_steps=k_steps,
                                tl=tl, tm=tm, n_valid=N, m_valid=M, l_valid=L,
                                stride=S, count=B, pad_top=hl, pad_m=hm,
                                grad_step=(variant == "condat"))

    def body(state):
        (x, xb, u1, u2, u3, sc, cap_mult_d, hist, t, gap_b, iters_img,
         running) = state

        def one(_, st):
            x, xb, u1, u2, u3, sc, t = st
            sd, sc = PK3.sched_chunk3(sc, k_steps, (lam_N, lam_M, lam_L),
                                      sig0_f, cap_mult_d, variant)
            x, xb, u1, u2, u3 = chunk_call(sd, x, xb, u1, u2, u3)
            return x, xb, u1, u2, u3, sc, t + k_steps

        x2, xb2, u12, u22, u32, sc, t = jax.lax.fori_loop(
            0, cpc, one, (x, xb, u1, u2, u3, sc, t))
        iters_img = iters_img + cpc * k_steps * running.astype(jnp.int32)
        gap_new, obj_b, _ = gap_and_primal(u12, u22, u32)
        if restart:
            gsum = jnp.sum(jnp.where(running, gap_new, 0.0)
                           ).astype(jnp.float32)
            stall = gsum > DECAY * hist[0]
            sc = (jnp.where(stall, sig0_f, sc[0]),
                  jnp.where(stall, tau0_f, sc[1]))
            cap_mult_d = jnp.where(stall, cap_mult_d * GROW, cap_mult_d)
            hist = jnp.concatenate([hist[1:], gsum.reshape(1)])
        gap_b = jnp.where(running, gap_new, gap_b)
        running = running & still_running(gap_b, obj_b)
        return (x2, xb2, u12, u22, u32, sc, cap_mult_d, hist, t, gap_b,
                iters_img, running)

    def cond(state):
        *_, t, gap_b, iters_img, running = state
        return (t < cap_pad) & jnp.any(running)

    zeros = jnp.zeros_like(Ypad)
    init = (Ypad, Ypad, zeros, zeros, zeros, (sig0_f, tau0_f),
            jnp.asarray(cap_mult, jnp.float32),
            jnp.full((LOOK,), jnp.inf, jnp.float32), jnp.int32(0),
            jnp.full((B,), jnp.inf, Y.dtype), jnp.zeros((B,), jnp.int32),
            jnp.ones((B,), bool))
    (x, xb, u1, u2, u3, _sc, _cm, _h, t, gap_b, iters_img,
     running) = jax.lax.while_loop(cond, body, init)

    gap_b, obj_b, xhat = gap_and_primal(u1, u2, u3)
    out = xhat[hl:hl + B * S].reshape(B, S, Mp, Np)[:, :L, hm:hm + M, :N]
    rc = jnp.where(still_running(gap_b, obj_b), RC_ITERS,
                   RC_OK).astype(jnp.int32)
    return out, make_info(iters_img, gap_b, rc)


def _run_pdhg3d_fused_banded(Yl, lam, cap, cfg, variant: str, axis_name: str,
                             L: int, M: int, N: int, n_dev: int,
                             gap_tol=None, k_steps: int = 2, tl: int = 2,
                             tm: int = 8):
    """Cross-chip fused 3D PDHG: ONE volume layer-banded over a device mesh
    (the 3D counterpart of tv2d._run_pdhg_fused_banded; see its docstring
    for the halo-exchange exactness argument).  Runs INSIDE ``shard_map``:
    ``Yl`` is the device's (local_layers, Mp, Np) slab of the padded volume
    (M already placed at canvas offset hm, N zero-padded); halos of
    2*k_steps layers are ppermuted along L before every K-step chunk, and
    the per-volume duality-gap certificate is psum-reduced.

    Reference: Yang3_TV's problem (src/TVNDopt.cpp:678-781), solved as one
    mesh-spanning fused primal-dual program."""
    from ..ops.kernels import pdhg3d_fused as PK3

    local_layers, Mp, Np = Yl.shape
    hl = PK3._halo_l(k_steps)
    hm = PK3._halo_m(k_steps)
    assert local_layers % tl == 0, (local_layers, tl)
    dtype = Yl.dtype
    d = jax.lax.axis_index(axis_name)
    loff = (hl - d * local_layers).astype(jnp.int32)
    lam = jnp.asarray(lam, dtype)

    if variant == "cp-acc":
        # Scale-invariant schedule from global psum'd statistics (same
        # calculation as tv2d._pdhg_sigma_schedule, inlined for the mesh).
        gl = jnp.arange(local_layers) + d * local_layers
        vlay = (gl < L).astype(dtype)[:, None, None]
        dY = Yl[:, hm:hm + M, 1:N] - Yl[:, hm:hm + M, :N - 1]
        ssum = jax.lax.psum(jnp.sum(dY * dY * vlay), axis_name)
        cnt = jax.lax.psum(jnp.sum(jnp.broadcast_to(vlay, dY.shape)),
                           axis_name)
        noise = jnp.sqrt(jnp.maximum(ssum / jnp.maximum(cnt, 1.0) * 0.5,
                                     1e-12))
        lam_rel = lam / noise
        sigma0 = 0.5 * jnp.maximum(1.0, lam_rel)
        cap_mult = jnp.maximum(1.0, (lam_rel / 0.3) ** 1.5) / sigma0
    else:
        sigma0 = jnp.asarray(cfg.cp_sigma, dtype)
        cap_mult = 2.0
    tau0 = 0.9 / (12.0 * sigma0)

    cpc = max(1, 24 // k_steps)
    cap_pad = -(-cap // (cpc * k_steps)) * (cpc * k_steps)
    sched = PK3.make_schedule3(cap_pad, (lam, lam, lam), sigma0, tau0,
                               variant, cap_mult=cap_mult)

    up = [(i, i - 1) for i in range(1, n_dev)]
    down = [(i, i + 1) for i in range(n_dev - 1)]

    def exchange(A):
        top_core = jax.lax.dynamic_slice_in_dim(A, hl, hl, 0)
        bot_core = jax.lax.dynamic_slice_in_dim(A, local_layers, hl, 0)
        from_below = jax.lax.ppermute(top_core, axis_name, up)
        from_above = jax.lax.ppermute(bot_core, axis_name, down)
        A = jax.lax.dynamic_update_slice_in_dim(A, from_above, 0, 0)
        return jax.lax.dynamic_update_slice_in_dim(
            A, from_below, hl + local_layers, 0)

    # Data canvas with REAL neighbor layers in its L halo (see the 2D banded
    # driver: a zero-filled y halo shifts the boundary fixed point).
    Ypad = exchange(jnp.pad(Yl, ((hl, hl), (0, 0), (0, 0))))

    # Validity masks in global coordinates (kernel conventions).
    gl = (jnp.arange(2 * hl + local_layers)[:, None, None] - hl
          + d * local_layers)
    rm = jnp.arange(Mp)[None, :, None] - hm
    col = jnp.arange(Np)[None, None, :]
    in_vol = ((gl >= 0) & (gl < L) & (rm >= 0) & (rm < M) & (col < N))
    v1 = (in_vol & (col < N - 1)).astype(dtype)
    v2 = (in_vol & (rm < M - 1)).astype(dtype)
    v3 = (in_vol & (gl < L - 1)).astype(dtype)
    lam1, lam2, lam3 = lam * v1, lam * v2, lam * v3
    core = ((jnp.arange(2 * hl + local_layers) >= hl)
            & (jnp.arange(2 * hl + local_layers) < hl + local_layers)
            ).astype(dtype)[:, None, None]

    def dT(U, axis):
        z = jnp.zeros_like(jnp.take(U, jnp.arange(1), axis=axis))
        first = jnp.concatenate([z, jnp.moveaxis(
            jnp.moveaxis(U, axis, 0)[:-1], 0, axis)], axis=axis)
        return U - first

    def d_(X, axis):
        z = jnp.zeros_like(jnp.take(X, jnp.arange(1), axis=axis))
        nxt = jnp.concatenate([jnp.moveaxis(
            jnp.moveaxis(X, axis, 0)[1:], 0, axis), z], axis=axis)
        return X - nxt

    def gap_and_primal(u1, u2, u3):
        u1 = jnp.where(v1 > 0, u1, 0.0)
        u2 = jnp.where(v2 > 0, u2, 0.0)
        u3 = jnp.where(v3 > 0, u3, 0.0)
        xhat = Ypad - (dT(u1, 2) + dT(u2, 1) + dT(u3, 0))
        g1 = d_(xhat, 2) * v1
        g2 = d_(xhat, 1) * v2
        g3 = d_(xhat, 0) * v3
        e = (lam1 * jnp.abs(g1) - u1 * g1 + lam2 * jnp.abs(g2) - u2 * g2
             + lam3 * jnp.abs(g3) - u3 * g3)
        gap = jax.lax.psum(jnp.sum(e * core), axis_name)
        obj = jax.lax.psum(
            jnp.sum((0.5 * (xhat - Ypad) ** 2 * in_vol
                     + lam1 * jnp.abs(g1) + lam2 * jnp.abs(g2)
                     + lam3 * jnp.abs(g3)) * core), axis_name)
        return gap, obj, xhat

    if gap_tol is None:
        gtol = jnp.maximum(jnp.asarray(cfg.pdhg_gap_tol, dtype),
                           64.0 * jnp.finfo(dtype).eps)
    else:
        gtol = jnp.asarray(gap_tol, dtype)

    def chunk_call(sd, x, xb, u1, u2, u3):
        return PK3.pdhg3d_chunk(sd, x, xb, u1, u2, u3, Ypad, k_steps=k_steps,
                                tl=tl, tm=tm, n_valid=N, m_valid=M,
                                l_valid=L, stride=L, count=1, pad_top=loff,
                                pad_m=hm, grad_step=(variant == "condat"))

    def body(state):
        x, xb, u1, u2, u3, t, gap_b, iters, running = state

        def one(_, st):
            x, xb, u1, u2, u3, t = st
            x, xb = exchange(x), exchange(xb)
            u1, u2, u3 = exchange(u1), exchange(u2), exchange(u3)
            sd = jax.lax.dynamic_slice(sched, (t, jnp.int32(0)), (k_steps, 6))
            x, xb, u1, u2, u3 = chunk_call(sd, x, xb, u1, u2, u3)
            return x, xb, u1, u2, u3, t + k_steps

        x, xb, u1, u2, u3, t = jax.lax.fori_loop(
            0, cpc, one, (x, xb, u1, u2, u3, t))
        iters = iters + cpc * k_steps * running.astype(jnp.int32)
        u1e, u2e, u3e = exchange(u1), exchange(u2), exchange(u3)
        gap_new, obj, _ = gap_and_primal(u1e, u2e, u3e)
        gap_b = jnp.where(running, gap_new, gap_b)
        running = running & (gap_b > gtol * jnp.maximum(1.0, obj))
        return x, xb, u1, u2, u3, t, gap_b, iters, running

    def cond(state):
        *_, t, gap_b, iters, running = state
        return (t < cap_pad) & running

    zeros = jnp.zeros_like(Ypad)
    init = (Ypad, Ypad, zeros, zeros, zeros, jnp.int32(0),
            jnp.asarray(jnp.inf, dtype), jnp.int32(0), jnp.asarray(True))
    x, xb, u1, u2, u3, t, gap_b, iters, running = jax.lax.while_loop(
        cond, body, init)

    u1e, u2e, u3e = exchange(u1), exchange(u2), exchange(u3)
    gap_b, obj, xhat = gap_and_primal(u1e, u2e, u3e)
    rc = jnp.where(gap_b > gtol * jnp.maximum(1.0, obj), RC_ITERS,
                   RC_OK).astype(jnp.int32)
    out = xhat[hl: hl + local_layers]
    return out, make_info(iters[None], gap_b[None], rc[None])


def tv_nd_batched(Y, ws, ds, ps, max_iters: int = 0, method: str = "pd",
                  inner_method: str = "pn",
                  cfg: CombinerConfig = DEFAULT_COMBINER, use_fused=None):
    """Batched generalized ND TV prox on (B, *signal_dims) stacks.

    Args:
        Y: (B, *dims) tensor stack.
        ws: tuple of penalty weights.
        ds: tuple of 1-based penalized dimensions.
        ps: tuple of norm degrees.
        method: 'pd' (Parallel Proximal Dykstra, default), 'pdr' (Parallel
            Douglas-Rachford), 'yang' (consensus ADMM), or — for 3D volumes
            penalized on all dims with p = 1 on TPU — the fused primal-dual
            engines 'condat' / 'chambolle-pock' / 'chambolle-pock-acc'.
        use_fused: see :func:`proxtv_tpu.models.tv2d.tv1_2d_batched`.
    """
    if use_fused is None:
        use_fused = not tv2d._concrete_multidevice(Y)
    with tv2d._fused_ctx(bool(use_fused)):
        return _tv_nd_batched(Y, tuple(ws), tuple(ds), tuple(ps),
                              max_iters=max_iters, method=method,
                              inner_method=inner_method, cfg=cfg,
                              use_fused=bool(use_fused))


@functools.partial(jax.jit,
                   static_argnames=("ws", "ds", "ps", "max_iters", "method",
                                    "inner_method", "cfg", "use_fused"))
def _tv_nd_batched(Y, ws, ds, ps, max_iters, method, inner_method, cfg,
                   use_fused):
    Y = jnp.asarray(Y)
    ws = tuple(float(w) for w in ws)
    ds = tuple(int(d) for d in ds)
    ps = tuple(float(p) for p in ps)
    npen = len(ws)
    tol = cfg.stop

    def prox_i(i, V, scale, st):
        return _prox_along_ws(V, ds[i], ws[i] * scale, ps[i], inner_method, st)

    if npen == 1:
        x, _ = prox_i(0, Y, 1.0, _state_init(Y, ds[0], ps[0]))
        B = Y.shape[0]
        return x, make_info(jnp.zeros((B,), jnp.int32),
                            jnp.zeros((B,), Y.dtype), jnp.zeros((B,), jnp.int32))

    method = method.lower()
    if method in ("condat", "chambolle-pock", "chambolle-pock-acc"):
        if not _pdhg3d_fused_ok(Y, ds, ps):
            raise ValueError(
                "primal-dual ND methods need (B, L, M, N) f32 volumes "
                "penalized on dims (1, 2, 3) with p = 1 on TPU; use "
                "method='pd', 'pdr' or 'yang'")
        lam_by = {d: w for w, d in zip(ws, ds)}
        variant = {"condat": "condat", "chambolle-pock": "cp",
                   "chambolle-pock-acc": "cp-acc"}[method]
        cap = max_iters or cfg.max_iters_condat
        return _run_pdhg3d_fused(Y, (lam_by[1], lam_by[2], lam_by[3]), cap,
                                 cfg, variant)

    states0 = tuple(_state_init(Y, ds[i], ps[i]) for i in range(npen))
    if method == "pd2":
        # Sequential Proximal Dykstra for exactly two terms (reference
        # PD2_TV, src/TV2Dopt.cpp:59, the solveTVgen.cpp:90-97 route for
        # 2-term problems): alternating proxes with p/q correction terms,
        # no lambda rescale and no averaging — same fixed point as the
        # parallel engine but the reference's iteration behavior for the
        # 2-term case.
        if npen != 2:
            raise ValueError("method 'pd2' (sequential Dykstra) requires "
                             "exactly 2 penalty terms")
        cap = max_iters or cfg.max_iters_pd

        def body(state):
            x, p, q, s1, s2 = state
            xp, s1 = prox_i(0, x + p, 1.0, s1)
            p = x + p - xp
            x2, s2 = prox_i(1, xp + q, 1.0, s2)
            q = xp + q - x2
            return x2, p, q, s1, s2

        z = jnp.zeros_like(Y)
        init = (Y, z, z, states0[0], states0[1])
        return _loop(body, init, lambda s: s[0], cap, tol)

    if method == "pd":
        # Parallel Dykstra: z_i staging, lambda_i * npen rescale, mean combine
        # (reference src/TVNDopt.cpp:100-101, 212-214).
        cap = max_iters or cfg.max_iters_pd

        def body(state):
            x, zs, sts = state
            outs = [prox_i(i, zs[i], float(npen), sts[i]) for i in range(npen)]
            prox_out = [o[0] for o in outs]
            x_new = sum(prox_out) / npen
            zs_new = tuple(x_new + zs[i] - prox_out[i] for i in range(npen))
            return x_new, zs_new, tuple(o[1] for o in outs)

        init = (Y, tuple(Y for _ in range(npen)), states0)
        return _loop(body, init, lambda s: s[0], cap, tol)

    if method == "pdr":
        # Product-space Douglas-Rachford: each component prox carries 1/npen of
        # the quadratic term (reference PDR_TV combination, src/TVNDopt.cpp:465-468).
        cap = max_iters or cfg.max_iters_dr
        gamma = 1.0
        a = gamma / npen  # weight of the quadratic inside each component prox

        def prox_g(i, v, st):
            # prox of gamma*(f_i + ||.-Y||^2/(2 npen)) at v: the quadratic is
            # split evenly across components so the diagonal recovers
            # 0.5||x-Y||^2 + sum_i f_i(x) exactly.
            t = (v + a * Y) / (1.0 + a)
            return prox_i(i, t, gamma / (1.0 + a), st)

        def body(state):
            zs, sts = state
            x = sum(zs) / npen
            outs = [prox_g(i, 2.0 * x - zs[i], sts[i]) for i in range(npen)]
            return (tuple(zs[i] + outs[i][0] - x for i in range(npen)),
                    tuple(o[1] for o in outs))

        init = (tuple(Y for _ in range(npen)), states0)
        return _loop(body, init, lambda s: sum(s[0]) / npen, cap, tol)

    if method == "yang":
        # Consensus ADMM, rho = 10 (reference Yang2/Yang3).
        cap = max_iters or cfg.max_iters_yang
        rho = cfg.yang_rho

        def body(state):
            x, zs, us, sts = state
            zs_new, us_new, sts_new = [], [], []
            for i in range(npen):
                z, st = prox_i(i, x + us[i], 1.0 / rho, sts[i])
                us_new.append(us[i] + x - z)
                zs_new.append(z)
                sts_new.append(st)
            x_new = (Y + rho * sum(z - u for z, u in zip(zs_new, us_new))) / (
                1.0 + npen * rho)
            return x_new, tuple(zs_new), tuple(us_new), tuple(sts_new)

        zero = jnp.zeros_like(Y)
        init = (Y, tuple(Y for _ in range(npen)),
                tuple(zero for _ in range(npen)), states0)
        return _loop(body, init, lambda s: s[0], cap, tol)

    raise ValueError(f"Unknown ND method: {method!r}")


def tvgen_dispatch(X, ws, ds, ps, max_iters: int = 0,
                   cfg: CombinerConfig = DEFAULT_COMBINER):
    """Unbatched generalized-TV entry with the intended (MATLAB) dispatch
    (matlab/solveTVgen.cpp:90-97): 2D signal with both dims penalized ->
    2D Douglas-Rachford; two arbitrary terms -> sequential Proximal Dykstra
    (``pd2``); more -> Parallel Proximal Dykstra.

    Returns (x, info) for a single tensor.
    """
    X = jnp.asarray(X)
    ws = tuple(float(w) for w in ws)
    ds = tuple(int(d) for d in ds)
    ps = tuple(float(p) for p in ps)
    if X.ndim == 2 and len(ws) == 2 and set(ds) == {1, 2}:
        # Both dims of a 2D signal: direct 2D splitting.
        i_col = ds.index(1)
        i_row = ds.index(2)
        x, info = tv2d.tvp_2d_batched(X[None], ws[i_col], ws[i_row],
                                      ps[i_col], ps[i_row], max_iters=max_iters,
                                      cfg=cfg)
        return x[0], info
    # Two arbitrary terms -> sequential Dykstra (reference PD2_TV route,
    # matlab/solveTVgen.cpp:93-94); more -> Parallel Proximal Dykstra.
    method = "pd2" if len(ws) == 2 else "pd"
    x, info = tv_nd_batched(X[None], ws, ds, ps, max_iters=max_iters,
                            method=method, cfg=cfg)
    return x[0], info
