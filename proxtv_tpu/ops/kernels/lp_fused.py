"""Pallas TPU kernel: fused GPFW dual loop for the batched TV-Lp prox.

One kernel call runs the ENTIRE hybrid Frank-Wolfe / projected-gradient dual
solve (reference ``GPFW_TVp``, src/TVLPopt.cpp:1111) for a (TB, n) tile of
fibers on VMEM-resident values: per trip one projected-gradient step with the
joint-KKT q-ball projection (see :func:`proxtv_tpu.ops.lp._joint_kkt_newton`)
followed by ``fw_cycles - 1`` Frank-Wolfe steps (closed-form Lp linear oracle
+ exact line search, reference ``solveLinearLP`` src/LPopt.cpp:1000), with the
Holder duality-gap stop evaluated once per trip.  The XLA composition in
:mod:`proxtv_tpu.ops.tv1d_lp` round-trips the (B, n) state through HBM on
every sub-step; here HBM traffic is one read of (y, w0, lam, mu0) and one
write of (w, mu, gap, iters) for the whole solve.

Division of labor: the XLA wrapper (:func:`proxtv_tpu.ops.tv1d_lp` drivers)
keeps the exact setup/finalize — centering, the unconstrained tridiagonal
dual solve, the interior / zero-penalty closed-form exits, and the final
primal reconstruction — because they are one-pass and need the exact
tridiag solve; only the many-iteration loop moves into the kernel.

Gating: f32, TPU, and the q-exponent range where the joint-KKT Newton
converges on every lane ([1.12, 3.1] in f32 — the same gate as
``lp._lp_ball_project_general``).  If a lane's 8-step Newton still misses,
the radial clamp keeps the iterate FEASIBLE (``||w||_q <= lam``), so the
duality-gap certificate remains truthful and the lane degrades to more
iterations, never to a wrong certified answer.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import common
from .common import (
    shift_left as _shift_left,
    shift_right as _shift_right,
)

_TINY = 1e-30


def _spow(x, e: float):
    """``x ** e`` for x >= 0 with a STATIC exponent, strength-reduced to
    multiply/sqrt chains when e is an integer or half-integer (the common
    bench exponents: p = 1.5 -> q = 3, p = 3 -> q = 1.5 / rr = 2, p = 5 ->
    qq = 5).  Mosaic lowers a generic ``pow`` through exp/log on the VPU —
    measured ~7x the whole-kernel cost at p = 1.5 vs the reduced chain —
    while integer/half-integer powers are a couple of multiplies."""
    e = float(e)
    if e == 0.0:
        return jnp.ones_like(x)
    if e == 1.0:
        return x
    if not (0.0 < e <= 8.0) or 2.0 * e != round(2.0 * e):
        return x ** e
    k = int(round(2.0 * e))  # e = k / 2
    acc = None
    base = x
    m = k // 2
    while m:  # square-and-multiply for the integer part
        if m & 1:
            acc = base if acc is None else acc * base
        m >>= 1
        if m:
            base = base * base
    if k % 2:
        s = jnp.sqrt(x)
        acc = s if acc is None else acc * s
    return acc


def _rowsum(x):
    # Row scalars stay broadcast at full (TB, n) width: narrow (TB, 1)
    # vregs inside while_loop bodies crash the Mosaic layout pass.
    return jnp.broadcast_to(jnp.sum(x, axis=-1, keepdims=True), x.shape)


def _rowmax(x):
    return jnp.broadcast_to(jnp.max(x, axis=-1, keepdims=True), x.shape)


def _joint_newton_tile(an, Rn, T, q: float, mu, iters: int):
    """Joint primal-dual Newton for the q-ball projection KKT system on a
    (TB, n) tile; all operands are full-width (row scalars broadcast).
    Mirrors ``lp._joint_kkt_newton`` (u-substitution for q < 2)."""
    pos = an > 0
    if q >= 2.0:
        def body(_, state):
            s, mu = state
            sq1 = _spow(s, q - 1.0)
            F = s + mu * q * sq1 - an
            G = _rowsum(s * sq1) - T
            d = 1.0 + mu * q * (q - 1.0) * _spow(s, q - 2.0)
            r = q * sq1
            rod = r / d
            A = _rowsum(rod * F)
            Bq = _rowsum(rod * r)
            dmu = (G - A) / jnp.maximum(Bq, _TINY)
            mu_new = jnp.maximum(mu + dmu, 0.0)
            ds = -(F + r * dmu) / d
            s_new = jnp.clip(s + ds, 1e-20, an)
            s_new = jnp.where(pos, s_new, 0.0)
            return s_new, mu_new

        nrm = _spow(_rowsum(_spow(an, q)), 1.0 / q)
        fac0 = Rn / jnp.maximum(nrm, _TINY)
        s0 = an * fac0
        s, mu = jax.lax.fori_loop(0, iters, body, (s0, mu))
    else:
        rr = 1.0 / (q - 1.0)
        u_hi = _spow(an, q - 1.0)  # loop-invariant clip ceiling

        def body_u(_, state):
            u, mu = state
            F = _spow(u, rr) + mu * q * u - an
            G = _rowsum(_spow(u, rr * q)) - T
            d = rr * _spow(u, rr - 1.0) + mu * q
            g = (rr * q) * _spow(u, rr * q - 1.0)
            qu = q * u
            A = _rowsum(g * F / d)
            Bq = _rowsum(g * qu / d)
            dmu = (G - A) / jnp.maximum(Bq, _TINY)
            mu_new = jnp.maximum(mu + dmu, 0.0)
            du = -(F + qu * dmu) / d
            u_new = jnp.clip(u + du, _TINY, u_hi)
            u_new = jnp.where(pos, u_new, 0.0)
            return u_new, mu_new

        nrm = _spow(_rowsum(_spow(an, q)), 1.0 / q)
        fac0 = Rn / jnp.maximum(nrm, _TINY)
        u0 = _spow(an * fac0, q - 1.0)
        u, mu = jax.lax.fori_loop(0, iters, body_u, (u0, mu))
        s = _spow(u, rr)
    return s, mu


def _make_kernel(n, n_pad, p: float, q: float, max_trips, fw_cycles,
                 stop_rel, newton_iters):
    """GPFW dual loop on a (TB, n_pad) tile.  ``p`` is the primal norm (gap
    statistic), ``q`` its Holder conjugate (dual-ball exponent)."""
    step = 0.25  # 1/L, L = 4 > lambda_max(DD') (src/TVLPopt.cpp:45)

    def kernel(y_ref, w0_ref, lam_ref, mu0_ref, run_ref,
               w_ref, mu_ref, gap_ref, it_ref):
        y = y_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        v = (col < n - 1).astype(y.dtype) + 0.0 * y  # valid dual edges

        def rowscalar(ref):
            # (TB, 128) scalar block -> full-width (TB, n_pad) broadcast.
            return jnp.broadcast_to(
                jnp.max(ref[:], axis=-1, keepdims=True), y.shape) + 0.0 * y

        lam = rowscalar(lam_ref)
        run_mask = rowscalar(run_ref)
        w = w0_ref[:] * v
        mu = jnp.maximum(rowscalar(mu0_ref), _TINY)

        def primal(w):
            return y + (w - _shift_right(w, 1, 0.0))

        def grad(x):
            return (x - _shift_left(x, 1, 0.0)) * v

        def gap_of(w, g):
            ag = jnp.abs(g)
            mx = jnp.maximum(_rowmax(ag), _TINY)
            tv = lam * mx * _spow(_rowsum(_spow(ag / mx, p)), 1.0 / p)
            cross = _rowsum(w * g)
            return jnp.abs(tv + cross), tv + jnp.abs(cross)

        def tol_of(den):
            return jnp.maximum(stop_rel,
                               10.0 * jnp.finfo(y.dtype).eps
                               * jnp.maximum(1.0, den))

        def project(z, mu):
            """q-ball projection of z (radius lam), warm KKT multiplier."""
            a = jnp.abs(z) * v
            mx = jnp.maximum(_rowmax(a), _TINY)
            nrm = mx * _spow(_rowsum(_spow(a / mx, q)), 1.0 / q)
            inside = nrm <= lam
            scale = mx
            an = a / scale
            Rn = lam / scale
            T = _spow(Rn, q)
            s, mu_new = _joint_newton_tile(an, Rn, T, q, mu, newton_iters)
            # Radial clamp to exact feasibility: with the Newton near its
            # root this is second-order small; if a lane's Newton missed,
            # feasibility (and hence the gap certificate) still holds.
            snrm = _spow(_rowsum(_spow(s, q)), 1.0 / q)
            fac = jnp.minimum(1.0, Rn / jnp.maximum(snrm, _TINY))
            x = jnp.sign(z) * s * fac * scale
            return (jnp.where(inside, z, x) * v,
                    jnp.where(inside, mu, mu_new))

        # The oracle over the q-ball uses the conjugate exponent
        # qq = q/(q-1) (= p, since q is already p's conjugate).
        qq = q / (q - 1.0)

        def fw_step(w):
            g = grad(primal(w))
            # Linear oracle: argmin_{||s||_q <= lam} s'g, closed form via
            # Holder equality (src/LPopt.cpp:1000).
            ag = jnp.abs(g)
            mx = jnp.maximum(_rowmax(ag), _TINY)
            r = ag / mx
            s = -lam * jnp.sign(g) * _spow(r, qq - 1.0) / jnp.maximum(
                _spow(_rowsum(_spow(r, qq)), (qq - 1.0) / qq), _TINY)
            d = (s - w) * v
            ad = d - _shift_right(d, 1, 0.0)
            Hd = (ad - _shift_left(ad, 1, 0.0)) * v
            num = -_rowsum(g * d)
            den = _rowsum(d * Hd)
            gamma = jnp.where(den > 0,
                              jnp.clip(num / jnp.maximum(den, _TINY),
                                       0.0, 1.0),
                              jnp.where(num > 0, 1.0, 0.0))
            return w + gamma * d

        def trip(state):
            w, mu, gap, it, running = state
            # One projected-gradient step (the reference projects every
            # FW_CYCLES_TVLP-th iteration, src/TVLPopt.cpp:1252).
            g = grad(primal(w))
            w_gp, mu_gp = project(w - step * g, mu)
            w = jnp.where(running > 0, w_gp, w)
            mu = jnp.where(running > 0, mu_gp, mu)
            # fw_cycles - 1 Frank-Wolfe steps (cheap: no projection; ~3 pow
            # passes each).  fori_loop, not Python unroll: the unrolled body
            # multiplied the Mosaic program ~10x and blew the compile time.
            w = jax.lax.fori_loop(
                0, fw_cycles - 1,
                lambda _, w: jnp.where(running > 0, fw_step(w), w), w)
            g = grad(primal(w))
            gap_new, den = gap_of(w, g)
            it = it + float(fw_cycles) * running
            gap = jnp.where(running > 0, gap_new, gap)
            running = running * (gap > tol_of(den)).astype(y.dtype)
            return w, mu, gap, it, running

        def cond(state):
            *_, it, running = state
            return (jnp.max(running) > 0) & (jnp.max(it) < float(max_trips
                                                                * fw_cycles))

        g0 = grad(primal(w))
        gap0, den0 = gap_of(w, g0)
        running0 = run_mask * (gap0 > tol_of(den0)).astype(y.dtype)
        it0 = jnp.zeros_like(gap0)
        w, mu, gap, it, running = jax.lax.while_loop(
            cond, trip, (w, mu, gap0, it0, running0))
        w_ref[:] = w * v
        mu_ref[:] = mu[:, :128]
        gap_ref[:] = gap[:, :128]
        it_ref[:] = (it * run_mask + 0.5 * running)[:, :128]

    return kernel


@functools.partial(jax.jit, static_argnames=("p", "max_iters", "fw_cycles",
                                             "stop_rel", "tb",
                                             "newton_iters"))
def gpfw_fused(y, w0, lam, mu0, run_mask, p: float, max_iters: int,
               fw_cycles: int = 10, stop_rel: float = 1e-5, tb: int = 0,
               newton_iters: int = 8):
    """Run the fused GPFW dual loop.

    Args:
        y: (B, n) CENTERED signals (f32).
        w0: (B, n) dual start, zero final column (already box/ball feasible).
        lam: (B,) per-signal penalties.
        mu0: (B,) warm KKT multipliers (>= 0; pass ones cold).
        run_mask: (B,) float 0/1 — zero freezes a lane (interior/zero-pen
            closed-form lanes handled by the caller).
        p: primal norm exponent; the dual ball uses q = p/(p-1).
        max_iters: iteration cap (counted in single GPFW iterations).

    Returns:
        (w, mu, gap, iters_f): final dual (B, n), multiplier (B,), Holder
        gap (B,), and float iteration count (B,) — a trailing 0.5 marks
        lanes still running at the cap (the caller maps that to RC_ITERS).
    """
    from . import gating

    B, n = y.shape
    dtype = y.dtype
    q = p / (p - 1.0)
    if not tb:
        # cap 32 (not the PN kernels' 64): the trip body's projection +
        # FW temporaries hold ~55 live (tb, n_pad) arrays under Mosaic's
        # double-buffering — 64 rows at n_pad = 1024 would brush the 16M
        # scoped-VMEM limit.
        tb = gating.pn_tile_rows(n, cap=32)
    tb = max(8, (min(tb, max(8, B)) // 8) * 8)
    n_pad = -(-n // 128) * 128
    grid = (-(-common.pad_rows(y, tb).shape[0] // tb),)

    def pad2(a):
        a = common.pad_rows(a, tb)
        if n_pad != n:
            a = jnp.pad(a, ((0, 0), (0, n_pad - n)))
        return a

    def padrow(a):
        # (B,) row scalars ride as (Bp, 128) blocks ((TB, 1) inputs crash
        # Mosaic; the kernel reduces them back with a row-max).
        return common.pad_rows(
            jnp.broadcast_to(jnp.asarray(a, dtype)[:, None], (B, 128)), tb)

    y_p, w_p = pad2(y), pad2(w0)
    lam_p, mu_p, run_p = padrow(lam), padrow(mu0), padrow(run_mask)
    max_trips = -(-int(max_iters) // fw_cycles)
    kernel = _make_kernel(n, n_pad, p, q, max_trips, fw_cycles,
                          stop_rel, newton_iters)
    spec = pl.BlockSpec((tb, n_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((tb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    Bp = y_p.shape[0]
    w, mu, gap, it = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[spec, spec, rspec, rspec, rspec],
        out_specs=(spec, rspec, rspec, rspec),
        out_shape=(jax.ShapeDtypeStruct((Bp, n_pad), dtype),
                   jax.ShapeDtypeStruct((Bp, 128), dtype),
                   jax.ShapeDtypeStruct((Bp, 128), dtype),
                   jax.ShapeDtypeStruct((Bp, 128), dtype)),
        interpret=jax.default_backend() != "tpu",
    )(y_p, w_p, lam_p, mu_p, run_p)
    return w[:B, :n], mu[:B, 0], gap[:B, 0], it[:B, 0]
