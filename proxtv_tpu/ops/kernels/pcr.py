"""Pallas TPU kernel: batched masked SPD second-difference tridiagonal solve.

Solves ``(DD' [+ shift I]) x = rhs`` per batch row — the Newton/secular systems
of the TV dual solvers (the LAPACK dpttrf/dpttrs replacement, reference
``src/general.h:23-25``) — by parallel cyclic reduction executed entirely in
VMEM.  The XLA fallback (:mod:`proxtv_tpu.ops.tridiag`) materializes ~10
shifted HBM-sized temporaries per reduction step; this kernel reads ``rhs``
(+ ``mask``) once, runs all log2(n) reduction steps on VMEM-resident values,
and writes ``x`` once — turning a bandwidth-bound solve into a compute-bound
one (~50x less HBM traffic at n=1024).

Masking semantics match ``tridiag.spd_second_difference_solve``: masked-out
rows become identity rows with zero RHS, and an off-diagonal survives only if
both endpoints are unmasked (the active-set-reduced Newton system of the
projected-Newton solver, reference ``src/TVL1opt.cpp:177-181``).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block rows per grid step: 6 live (TB, n) f32 arrays must fit VMEM (~16 MB).
_DEF_TB = 128


from . import common  # noqa: E402
from .common import (  # noqa: E402 — shared kernel helpers
    shift_left as _shift_left,
    shift_right as _shift_right,
)


def _pcr_body(a, b, c, d, n):
    steps = max(1, math.ceil(math.log2(n)))
    for k in range(steps):
        stride = 1 << k
        if stride >= n:
            break
        am = _shift_right(a, stride, 1.0)
        ap = _shift_left(a, stride, 1.0)
        bm = _shift_right(b, stride, 0.0)
        bp = _shift_left(b, stride, 0.0)
        cm = _shift_right(c, stride, 0.0)
        cp = _shift_left(c, stride, 0.0)
        dm = _shift_right(d, stride, 0.0)
        dp = _shift_left(d, stride, 0.0)
        alpha = -b / am
        beta = -c / ap
        a = a + alpha * cm + beta * bp
        d = d + alpha * dm + beta * dp
        b = alpha * bm
        c = beta * cp
    return d / a


def _kernel_masked(rhs_ref, mask_ref, out_ref):
    # Mask algebra in float (Mosaic mishandles concatenated i1 vregs):
    # a = 1 + m;  b_i = -(m_{i-1} m_i);  c_i = b_{i+1};  d = m * rhs.
    d0 = rhs_ref[:]
    n = d0.shape[-1]
    m = mask_ref[:].astype(d0.dtype)
    b = -(m * _shift_right(m, 1, 0.0))
    a = 1.0 + m
    c = _shift_left(b, 1, 0.0)
    d = m * d0
    out_ref[:] = _pcr_body(a, b, c, d, n)


def _kernel_plain(rhs_ref, out_ref):
    d = rhs_ref[:]
    n = d.shape[-1]
    one = jnp.ones_like(d)
    a = 2.0 * one
    b = jnp.concatenate([jnp.zeros_like(one[..., :1]), -one[..., 1:]], axis=-1)
    c = jnp.concatenate([-one[..., :-1], jnp.zeros_like(one[..., :1])], axis=-1)
    out_ref[:] = _pcr_body(a, b, c, d, n)


def _kernel_shifted(rhs_ref, shift_ref, out_ref):
    # shift arrives pre-broadcast to (TB, n): Mosaic cannot slice (TB, 1) vregs.
    d = rhs_ref[:]
    n = d.shape[-1]
    one = jnp.ones_like(d)
    a = 2.0 * one + shift_ref[:]
    b = jnp.concatenate([jnp.zeros_like(one[..., :1]), -one[..., 1:]], axis=-1)
    c = jnp.concatenate([-one[..., :-1], jnp.zeros_like(one[..., :1])], axis=-1)
    out_ref[:] = _pcr_body(a, b, c, d, n)


def _pad_rows(x, tb):
    return common.pad_rows(x, tb), x.shape[0]


@functools.partial(jax.jit, static_argnames=("tb",))
def pcr_spd_solve_pallas(rhs, mask=None, diag_shift=None, tb: int = _DEF_TB):
    """VMEM-resident PCR solve of (DD' [+ shift I]) x = rhs on (B, n) batches.

    ``mask``: optional (B, n) bool active-row mask. ``diag_shift``: optional
    (B,) per-row diagonal shift (used by the More-Sorensen secular iteration).
    Rows are tiled ``tb`` at a time over the grid.
    """
    B, n = rhs.shape
    dtype = rhs.dtype
    tb = max(8, (min(tb, max(8, B)) // 8) * 8)
    rhs_p, B0 = _pad_rows(rhs, tb)
    Bp = rhs_p.shape[0]
    grid = (Bp // tb,)
    spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Bp, n), dtype)

    if mask is not None:
        mask_p, _ = _pad_rows(mask.astype(jnp.int8), tb)
        out = pl.pallas_call(
            _kernel_masked,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
            out_shape=out_shape,
        )(rhs_p, mask_p)
    elif diag_shift is not None:
        shift = jnp.broadcast_to(jnp.asarray(diag_shift, dtype).reshape(-1, 1),
                                 (B, n))
        shift_p, _ = _pad_rows(shift, tb)
        out = pl.pallas_call(
            _kernel_shifted,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
            out_shape=out_shape,
        )(rhs_p, shift_p)
    else:
        out = pl.pallas_call(
            _kernel_plain,
            grid=grid,
            in_specs=[spec],
            out_specs=spec,
            out_shape=out_shape,
        )(rhs_p)
    return out[:B0]
