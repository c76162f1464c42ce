"""Pallas TPU kernel: fully-fused batched More-Sorensen TV-L2 prox.

One kernel call = the ENTIRE TV-L2 prox solve for a (TB, n) tile of fibers:
the unconstrained tridiagonal solve, the interior-case test, the secular
Newton iteration (two shifted parallel-cyclic-reduction solves per step), and
the duality-gap certificate — all on VMEM-resident values.  HBM traffic is
one read of (y [, lam, alpha0]) and one write of (x, alpha, gap, iters);
the XLA composition in :func:`proxtv_tpu.ops.tv1d_l2.tv2_ms` round-trips HBM
on every sub-step of every secular iteration.

Numerics mirror ``tv2_ms`` (reference ``more_TV2``/``morePG_TV2``,
src/TVL2opt.cpp:35,190): Newton on the Cholesky form of the secular equation
``1/lam - 1/||w(alpha)|| = 0`` with the update
``alpha += (||w||^2 / w'q) (||w|| - lam)/lam`` where ``(DD'+alpha I) q = w``,
started from ``alpha = 0`` (or a warm restart, the Workspace analog of
src/TVL2opt.cpp:255-257), stopping at ``| ||w|| - lam | <= tol * lam``.

Layout rules (see CLAUDE.md): row scalars are carried (TB, n)-broadcast,
loop flags are float 0/1, per-lane inputs/outputs ride (TB, 128) blocks.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-10


from . import common  # noqa: E402
from .common import (  # noqa: E402 — shared kernel helpers
    shift_left as _shift_left,
    shift_right as _shift_right,
)


def _rowsum(x):
    return jnp.broadcast_to(jnp.sum(x, axis=-1, keepdims=True), x.shape)


def _pcr_shifted(rhs, alpha, v, n_pad):
    """Exact solve of ``(DD' + alpha I) w = rhs`` on the v-masked edge rows
    (identity rows elsewhere) by normalized parallel cyclic reduction.

    ``DD'`` is the (n-1)-point second-difference matrix (diag 2, off -1);
    ``alpha`` is a (TB, n)-broadcast nonnegative shift.  Diagonal dominance
    (2 + alpha vs 2) keeps the normalized off-diagonals <= 1/2 — stable in
    f32.  Full log-depth: the secular Newton iteration needs exact solves
    (there is no line search to absorb truncation)."""
    b = -(v * _shift_right(v, 1, 0.0))
    c = _shift_left(b, 1, 0.0)
    r = 1.0 / (1.0 + v * (1.0 + alpha))
    b = b * r
    c = c * r
    d = (v * rhs) * r
    steps = max(1, math.ceil(math.log2(n_pad)))
    for k in range(steps):
        stride = 1 << k
        if stride >= n_pad:
            break
        bm = _shift_right(b, stride, 0.0)
        bp = _shift_left(b, stride, 0.0)
        cm = _shift_right(c, stride, 0.0)
        cp = _shift_left(c, stride, 0.0)
        dm = _shift_right(d, stride, 0.0)
        dp = _shift_left(d, stride, 0.0)
        r = 1.0 / (1.0 - b * cm - c * bp)
        d = (d - b * dm - c * dp) * r
        if stride * 2 < n_pad:  # b, c dead after the final step
            b = (-b * bm) * r
            c = (-c * cp) * r
    return d


def _make_kernel(n, n_pad, max_iters, stop_boundary, lam_scalar, warm):
    def kernel(*refs):
        if warm:
            y_ref, lam_ref, a0_ref, x_ref, a_ref, gap_ref, it_ref = refs
        else:
            y_ref, lam_ref, x_ref, a_ref, gap_ref, it_ref = refs

        y = y_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        v = (col < n - 1).astype(y.dtype) + 0.0 * y  # dense layout (Mosaic)
        ybar = _rowsum(y) / float(n)
        y = y - ybar
        if lam_scalar:
            lam = jnp.zeros_like(y) + lam_ref[0, 0]
        else:
            # (TB, 128) row block with the per-lane penalty replicated across
            # all 128 lanes: a mean over the block reconstructs it without
            # narrow-vreg slicing.
            lam = jnp.broadcast_to(
                jnp.sum(lam_ref[:], axis=-1, keepdims=True) * (1.0 / 128.0),
                y.shape)
        dy = (_shift_left(y, 1, 0.0) - y) * v

        zero_pen = (lam <= 0).astype(y.dtype)
        safe_lam = jnp.where(lam > 0, lam, 1.0)
        tolb = stop_boundary * safe_lam

        # Bootstrap: one Cholesky-form Newton step of the secular equation
        # phi(alpha) = 1/lam - 1/||w(alpha)|| from the start point (reference
        # more_TV2 update, src/TVL2opt.cpp:106-128) — the only place the
        # derivative system q = (DD'+aI)^{-1} w is solved.  phi is convex
        # decreasing with phi(root) = 0, so Newton from below under-shoots
        # and the subsequent SECANT iteration (one PCR solve per step
        # instead of two) also converges monotonically from below.
        if warm:
            a_start = jnp.maximum(
                jnp.broadcast_to(
                    jnp.sum(a0_ref[:], axis=-1, keepdims=True) * (1.0 / 128.0),
                    y.shape), 0.0)
        else:
            a_start = jnp.zeros_like(y)
        w_s = _pcr_shifted(dy, a_start, v, n_pad)
        q_s = _pcr_shifted(w_s, a_start, v, n_pad)
        nrm2_s = _rowsum(w_s * w_s)
        nrm_s = jnp.sqrt(nrm2_s)
        wq_s = _rowsum(w_s * q_s)
        delta0 = (nrm2_s / jnp.maximum(wq_s, _EPS)) * (nrm_s - safe_lam) / safe_lam
        alpha1 = jnp.maximum(a_start + delta0, 0.0)
        phi_s = 1.0 / safe_lam - 1.0 / jnp.maximum(nrm_s, _EPS)

        # Interior case: ||w(0)|| <= lam means the unconstrained solution is
        # feasible and x is exactly the signal mean; detected in-loop as
        # alpha driven to 0 with ||w|| <= lam (covers warm starts too, since
        # ||w(alpha)|| decreases in alpha).
        conv0 = ((jnp.abs(nrm_s - safe_lam) <= tolb)
                 | ((a_start <= 0) & (nrm_s <= safe_lam))).astype(y.dtype)
        interior0 = ((a_start <= 0) & (nrm_s <= safe_lam)).astype(y.dtype)
        running0 = (1.0 - conv0) * (1.0 - zero_pen)

        def body(state):
            alpha, aprev, phiprev, w, interior, itv, running = state
            w_new = _pcr_shifted(dy, alpha, v, n_pad)
            nrm = jnp.sqrt(_rowsum(w_new * w_new))
            phi = 1.0 / safe_lam - 1.0 / jnp.maximum(nrm, _EPS)
            denom = phi - phiprev
            secant = alpha - phi * (alpha - aprev) / denom
            alpha_new = jnp.maximum(
                jnp.where(jnp.abs(denom) > _EPS, secant, alpha), 0.0)
            inter = ((alpha <= 0) & (nrm <= safe_lam)).astype(y.dtype)
            conv = ((jnp.abs(nrm - safe_lam) <= tolb).astype(y.dtype)
                    + inter >= 1.0).astype(y.dtype)
            w = jnp.where(running > 0, w_new, w)
            interior = jnp.where(running > 0, inter, interior)
            aprev = jnp.where(running > 0, alpha, aprev)
            phiprev = jnp.where(running > 0, phi, phiprev)
            alpha = jnp.where(running * (1.0 - conv) > 0, alpha_new, alpha)
            itv = itv + running
            running = running * (1.0 - conv)
            return alpha, aprev, phiprev, w, interior, itv, running

        def cond(state):
            *_, itv, running = state
            return (jnp.max(running) > 0) & (jnp.max(itv) < float(max_iters))

        alpha, _, _, w, interior, itv, running = jax.lax.while_loop(
            cond, body, (alpha1, a_start, phi_s, w_s, interior0,
                         jnp.zeros_like(y), running0))

        x = y + (w - _shift_right(w, 1, 0.0))
        x = jnp.where(interior > 0, 0.0, x)       # interior: x = mean (centered)
        x = jnp.where(zero_pen > 0, y, x)
        g = (x - _shift_left(x, 1, 0.0)) * v
        gap = jnp.abs(lam * jnp.sqrt(_rowsum(g * g)) + _rowsum(w * g))
        gap = jnp.where((interior + zero_pen) > 0, 0.0, gap)

        x_ref[:] = x + ybar
        a_ref[:] = alpha[:, :128]
        gap_ref[:] = gap[:, :128]
        it_ref[:] = itv[:, :128]

    return kernel


_pad_rows = common.pad_rows


def _tb_for(n_pad):
    # ~40 live (tb, n_pad) f32 arrays (solver state + PCR temporaries with
    # Mosaic's ~3x stencil/double-buffer multiplier) must fit ~14 MB VMEM.
    tb = (14 << 20) // (160 * n_pad)
    return int(max(8, min(64, (tb // 8) * 8)))


@functools.partial(jax.jit, static_argnames=("max_iters", "stop_boundary",
                                             "tb"))
def ms_tv2_fused(y, lam=None, lam_rows=None, alpha_init=None,
                 max_iters: int = 100, stop_boundary: float = 1e-5,
                 tb: int | None = None):
    """Fused batched TV-L2 More-Sorensen prox.

    Args:
        y: (B, n) signals, float32.
        lam: traced scalar penalty (shipped via SMEM), or
        lam_rows: (B,) per-lane penalties.
        alpha_init: optional (B,) secular-multiplier warm start.

    Returns:
        (x, alpha, gap, iters): solution, final multiplier (for warm
        restarts), duality-gap certificate and per-lane iteration counts.
    """
    B, n = y.shape
    dtype = y.dtype
    n_pad = -(-n // 128) * 128
    if tb is None:
        tb = _tb_for(n_pad)
    tb = max(8, (min(tb, max(8, B)) // 8) * 8)
    grid = (-(-_pad_rows(y, tb).shape[0] // tb),)

    def pad2(a):
        a = _pad_rows(a, tb)
        if n_pad != n:
            a = jnp.pad(a, ((0, 0), (0, n_pad - n)))
        return a

    y_p = pad2(y)
    Bp = y_p.shape[0]
    spec = pl.BlockSpec((tb, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((tb, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    scalar_mode = lam_rows is None
    if scalar_mode:
        lam_in = jnp.asarray(lam, dtype).reshape(1, 1)
        lam_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
    else:
        lam_in = _pad_rows(
            jnp.broadcast_to(jnp.asarray(lam_rows, dtype)[:, None], (B, 128)),
            tb)
        lam_spec = row_spec

    warm = alpha_init is not None
    ins = [y_p, lam_in]
    in_specs = [spec, lam_spec]
    if warm:
        ins.append(_pad_rows(
            jnp.broadcast_to(jnp.asarray(alpha_init, dtype)[:, None],
                             (B, 128)), tb))
        in_specs.append(row_spec)

    kernel = _make_kernel(n, n_pad, max_iters, stop_boundary,
                          lam_scalar=scalar_mode, warm=warm)
    out_shape = (jax.ShapeDtypeStruct((Bp, n_pad), dtype),
                 jax.ShapeDtypeStruct((Bp, 128), dtype),
                 jax.ShapeDtypeStruct((Bp, 128), dtype),
                 jax.ShapeDtypeStruct((Bp, 128), dtype))
    out_specs = (spec, row_spec, row_spec, row_spec)
    x, a, gap, it = pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                                   out_specs=out_specs,
                                   out_shape=out_shape)(*ins)
    return (x[:B, :n], a[:B, 0], gap[:B, 0],
            it[:B, 0].astype(jnp.int32))
