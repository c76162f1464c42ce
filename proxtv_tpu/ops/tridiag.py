"""Batched tridiagonal solvers — the TPU-native replacement for LAPACK dpttrf/dpttrs.

The reference factors and solves symmetric positive-definite tridiagonal systems with
LAPACK (``dpttrf_`` / ``dpttrs_``, reference ``src/general.h:23-25``, used by the
projected-Newton and More-Sorensen solvers ``src/TVL1opt.cpp:189-198``,
``src/TVL2opt.cpp:106-110``).  Those are sequential, one system at a time.

Here we provide:

*   :func:`pcr_solve` — parallel cyclic reduction.  O(log n) depth, fully
    vectorized over both the batch axes and the system size.  The default on TPU:
    every step is a handful of full-width VPU ops (shifts + multiply-adds), no
    gather/scatter, no data-dependent control flow.
*   :func:`thomas_solve` — classic Thomas elimination expressed as two
    ``lax.scan`` passes.  Sequential in n but embarrassingly parallel across the
    batch; used as a cross-check and as a fallback for very large n with very
    large batch.

Both operate on the last axis with arbitrary leading batch axes and solve the
general (not necessarily symmetric) system

    b[i] * x[i-1] + a[i] * x[i] + c[i] * x[i+1] = d[i]

with the convention ``b[0] == 0`` and ``c[n-1] == 0`` (arrays all length n).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _shift_right(x, s, fill=0.0):
    """Shift along last axis so result[i] = x[i-s]; vacated slots take ``fill``."""
    pad = jnp.full(x.shape[:-1] + (s,), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-s]], axis=-1)


def _shift_left(x, s, fill=0.0):
    """Shift along last axis so result[i] = x[i+s]; vacated slots take ``fill``."""
    pad = jnp.full(x.shape[:-1] + (s,), fill, dtype=x.dtype)
    return jnp.concatenate([x[..., s:], pad], axis=-1)


def pcr_solve(a, b, c, d):
    """Solve batched tridiagonal systems by parallel cyclic reduction.

    Args:
        a: (..., n) main diagonal.
        b: (..., n) sub-diagonal; ``b[..., 0]`` must be 0.
        c: (..., n) super-diagonal; ``c[..., n-1]`` must be 0.
        d: (..., n) right-hand side.

    Returns:
        (..., n) solution x.
    """
    n = a.shape[-1]
    if n == 1:
        return d / a
    steps = max(1, math.ceil(math.log2(n)))
    for k in range(steps):
        stride = 1 << k
        if stride >= n:
            break
        am = _shift_right(a, stride, fill=1.0)
        ap = _shift_left(a, stride, fill=1.0)
        bm = _shift_right(b, stride)
        bp = _shift_left(b, stride)
        cm = _shift_right(c, stride)
        cp = _shift_left(c, stride)
        dm = _shift_right(d, stride)
        dp = _shift_left(d, stride)
        alpha = -b / am
        beta = -c / ap
        a = a + alpha * cm + beta * bp
        d = d + alpha * dm + beta * dp
        b = alpha * bm
        c = beta * cp
    return d / a


def thomas_solve(a, b, c, d):
    """Solve batched tridiagonal systems with the Thomas algorithm via lax.scan.

    Sequential in n; vectorized across all leading batch axes.
    Same argument convention as :func:`pcr_solve`.
    """
    n = a.shape[-1]
    # Move the system axis to the front for scanning: (n, ...batch)
    aT = jnp.moveaxis(a, -1, 0)
    bT = jnp.moveaxis(b, -1, 0)
    cT = jnp.moveaxis(c, -1, 0)
    dT = jnp.moveaxis(d, -1, 0)

    def fwd(carry, row):
        cp_prev, dp_prev = carry
        ai, bi, ci, di = row
        denom = ai - bi * cp_prev
        cp = ci / denom
        dp = (di - bi * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(aT[0])
    (_, _), (cps, dps) = jax.lax.scan(fwd, (zeros, zeros), (aT, bT, cT, dT))

    def bwd(x_next, row):
        cp, dp = row
        x = dp - cp * x_next
        return x, x

    _, xs_rev = jax.lax.scan(bwd, zeros, (cps, dps), reverse=True)
    return jnp.moveaxis(xs_rev, 0, -1)


def spd_second_difference_solve(rhs, diag_shift=0.0, mask=None, method="pcr"):
    """Solve ``(DD' + shift I) x = rhs`` where DD' is the (2,-1) second-difference
    matrix of size n = rhs.shape[-1] — the Hessian of the TV dual problems
    (reference ``src/TVL1opt.cpp:110-117``).

    Args:
        rhs: (..., n) right-hand side.
        diag_shift: optional scalar (or broadcastable) added to the diagonal
            (More-Sorensen uses ``2 + lam``, reference ``src/TVL2opt.cpp:100``).
        mask: optional (..., n) boolean; True rows participate, False rows are
            replaced by identity rows with zero RHS (the masked equivalent of the
            reference's reduced active-set Hessian, ``src/TVL1opt.cpp:177-181``).
            An off-diagonal entry is kept only when both endpoints are True —
            matching the reference rule that sets the coupling to zero when the
            inactive indices are not adjacent.
        method: 'pcr' or 'thomas'.

    Returns:
        (..., n) solution.
    """
    n = rhs.shape[-1]
    dtype = rhs.dtype

    # Hot path: on TPU, run the whole cyclic reduction VMEM-resident in a
    # Pallas kernel (~50x less HBM traffic than the XLA fallback below).
    # Routed through the shared gate (backend/dtype/shape/fused-flag/
    # sharding): a pallas_call is a single-device op, so sharded solves
    # traced under fused_ctx(False) — e.g. tv1_pn inside a GSPMD-sharded
    # combiner — must take the GSPMD-shardable XLA path below.
    from .kernels import gating

    # The kernel carries the shift as ONE value per row; a shift varying
    # along the system axis (allowed by the broadcastable contract) must
    # use the XLA path rather than silently solving with column 0's value.
    shift_arr = jnp.asarray(diag_shift)
    shift_per_row = not (shift_arr.ndim >= 1 and shift_arr.shape[-1] == n
                         and n > 1)
    if (method == "pcr" and rhs.ndim == 2 and shift_per_row
            and gating.gate(rhs, "pcr")):
        from .kernels import pcr as pcr_kernels

        tb = int(max(8, min(128, ((2 << 20) // (4 * n) // 8) * 8)))
        shift = None
        if not (isinstance(diag_shift, (int, float)) and diag_shift == 0.0):
            shift = jnp.broadcast_to(jnp.asarray(diag_shift, dtype),
                                     rhs.shape)[:, 0]
        if not (mask is not None and shift is not None):  # kernel handles one of the two
            return pcr_kernels.pcr_spd_solve_pallas(rhs, mask=mask,
                                                    diag_shift=shift, tb=tb)

    a = jnp.full(rhs.shape, 2.0, dtype) + jnp.asarray(diag_shift, dtype)
    ones = jnp.ones(rhs.shape[:-1] + (1,), dtype)
    minus = jnp.full(rhs.shape[:-1] + (n - 1,), -1.0, dtype)
    b = jnp.concatenate([jnp.zeros_like(ones), minus], axis=-1)
    c = jnp.concatenate([minus, jnp.zeros_like(ones)], axis=-1)
    d = rhs
    if mask is not None:
        mask = mask.astype(bool)
        both_lo = jnp.concatenate([jnp.zeros_like(mask[..., :1]), mask[..., :-1] & mask[..., 1:]], axis=-1)
        both_hi = jnp.concatenate([mask[..., :-1] & mask[..., 1:], jnp.zeros_like(mask[..., :1])], axis=-1)
        a = jnp.where(mask, a, jnp.ones_like(a))
        b = jnp.where(both_lo, b, jnp.zeros_like(b))
        c = jnp.where(both_hi, c, jnp.zeros_like(c))
        d = jnp.where(mask, d, jnp.zeros_like(d))
    solver = pcr_solve if method == "pcr" else thomas_solve
    return solver(a, b, c, d)


def spd_shifted_solve_normalized(rhs, diag_shift=0.0):
    """Solve ``(DD' + shift I) x = rhs`` by NORMALIZED parallel cyclic
    reduction: the diagonal is rescaled to 1 each level, so only (b, c, d)
    flow through the reduction — ~30% less HBM traffic than
    :func:`pcr_solve`'s general (a, b, c, d) form, which is what the
    long-signal (n ~ 1e6, HBM-bound) TV-L2 secular iteration pays per
    solve (measured 1.65 vs 2.10 ms on a v5e).  Same normalization as the
    fused MS kernel's in-VMEM reduction (ops/kernels/ms_fused.py); diagonal
    dominance (2 + shift) keeps the normalized off-diagonals <= 1/2 —
    stable in f32.

    (Classic cyclic reduction — O(n) total work, halving the active system
    per level — was tried here and reverted: the per-level stride-2 lane
    slicing forces Mosaic/XLA cross-lane relayouts that made the n = 1e6
    solve ~26x SLOWER on TPU despite ~5x less nominal traffic.)

    Args:
        rhs: (..., n) right-hand side.
        diag_shift: scalar or (..., 1) nonnegative diagonal shift.
    """
    n = rhs.shape[-1]
    dtype = rhs.dtype
    r0 = 1.0 / (2.0 + jnp.asarray(diag_shift, dtype))
    if n == 1:
        return rhs * r0
    mr0 = jnp.broadcast_to(-r0, rhs.shape).astype(dtype)
    zero = jnp.zeros(rhs.shape[:-1] + (1,), dtype)
    b = jnp.concatenate([zero, mr0[..., 1:]], axis=-1)
    c = jnp.concatenate([mr0[..., :-1], zero], axis=-1)
    d = rhs * r0
    steps = max(1, math.ceil(math.log2(n)))
    for k in range(steps):
        stride = 1 << k
        if stride >= n:
            break
        bm = _shift_right(b, stride)
        bp = _shift_left(b, stride)
        cm = _shift_right(c, stride)
        cp = _shift_left(c, stride)
        dm = _shift_right(d, stride)
        dp = _shift_left(d, stride)
        r = 1.0 / (1.0 - b * cm - c * bp)
        d = (d - b * dm - c * dp) * r
        if stride * 2 < n:  # b, c dead after the final step
            b = (-b * bm) * r
            c = (-c * cp) * r
    return d
