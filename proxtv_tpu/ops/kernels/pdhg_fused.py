"""Pallas TPU kernel: temporally-blocked fused PDHG for 2D anisotropic TV-L1.

The primal-dual (Chambolle-Pock / Condat) iteration for

    min_X 0.5||X - Y||^2 + lam ||D_row X||_1 + lam ||D_col X||_1

is a pure radius-1 stencil:

    u1 <- clip(u1 + sigma * D_row(xbar), +-lam)
    u2 <- clip(u2 + sigma * D_col(xbar), +-lam)
    x' <- (x - tau * (D_row' u1 + D_col' u2) + tau * Y) / (1 + tau)
    xbar <- x' + theta (x' - x)

XLA executes each iteration at ~1x HBM round trip of the full state (~28 MB at
1024^2).  This kernel runs K iterations per HBM pass on VMEM-resident row
bands: information propagates <= 2 rows per iteration, so a band with a 2K-row
halo computes its core exactly for K steps — K-fold less HBM traffic (the
classic trapezoidal/temporal stencil blocking).

Correctness devices:
* All state is stored row-padded; padded rows (and the invalid last dual
  column) carry lam = 0, which pins their duals to 0 and *exactly decouples*
  them — halo windows can therefore read padding freely, and image-boundary
  adjoints emerge naturally from the zero duals.
* The accelerated schedule (sigma_k, tau_k, theta_k) is closed-form in the
  global iteration index: the driver precomputes it and feeds each chunk's
  slice through SMEM.

Reference: CondatChambollePock2_TV, src/TV2Dopt.cpp:587 (sigma/tau constants
:609-618); this kernel is the TPU-native engine behind methods 'condat',
'chambolle-pock', 'chambolle-pock-acc' for f32 images.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _halo(k_steps):
    return 2 * k_steps


def _drow(X):
    z = jnp.zeros_like(X[..., :1])
    return X - jnp.concatenate([X[..., 1:], z], axis=-1)


def _drow_t(U):
    z = jnp.zeros_like(U[..., :1])
    return U - jnp.concatenate([z, U[..., :-1]], axis=-1)


def _dcol(X):
    z = jnp.zeros_like(X[:1, :])
    return X - jnp.concatenate([X[1:, :], z], axis=0)


def _dcol_t(U):
    z = jnp.zeros_like(U[:1, :])
    return U - jnp.concatenate([z, U[:-1, :]], axis=0)


def _make_kernel(k_steps, tm, win, n, n_valid, m_valid, stride, count,
                 grad_step, weighted=False):
    """A batch of ``count`` images of ``m_valid`` rows is stacked vertically
    with period ``stride`` (gap rows carry lam = 0 and are exactly decoupled,
    so one tall solve == independent per-image solves).

    The canvas's global row offset (``pad_top`` for a single-device canvas;
    ``pad_top - device_row_offset`` for a row-banded multi-chip canvas, where
    every device runs this same program on its own slab) arrives as a (1,)
    SMEM scalar so the one compiled kernel serves every band (SPMD).

    ``weighted``: two extra (Mp, N) inputs carry per-edge weight fields
    (zero at invalid edges — they subsume the validity masks)."""
    def kernel(*refs):
        if weighted:
            (sched_ref, roff_ref, x_hbm, xb_hbm, u1_hbm, u2_hbm, y_hbm,
             wr_hbm, wc_hbm,
             xo_hbm, xbo_hbm, u1o_hbm, u2o_hbm) = refs
        else:
            (sched_ref, roff_ref, x_hbm, xb_hbm, u1_hbm, u2_hbm, y_hbm,
             xo_hbm, xbo_hbm, u1o_hbm, u2o_hbm) = refs
        i = pl.program_id(0)
        row0 = i * tm
        pad_top = roff_ref[0]

        def body(*scratch):
            bufs = list(scratch[:-1])
            sems = scratch[-1]
            srcs = [x_hbm, xb_hbm, u1_hbm, u2_hbm, y_hbm]
            if weighted:
                srcs += [wr_hbm, wc_hbm]
            nin = len(srcs)
            for s in range(nin):
                pltpu.make_async_copy(srcs[s].at[pl.ds(row0, win)], bufs[s],
                                      sems.at[s]).start()
            for s in range(nin):
                pltpu.make_async_copy(srcs[s].at[pl.ds(row0, win)], bufs[s],
                                      sems.at[s]).wait()

            x = bufs[0][:]
            xb = bufs[1][:]
            u1 = bufs[2][:]
            u2 = bufs[3][:]
            y = bufs[4][:]

            col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            rowl = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            rowg = rowl + row0
            dense = 0.0 * x
            # lam masks: valid row-edge cols; valid col-edges = both endpoint
            # rows inside the same stacked image.
            r = rowg - pad_top
            q = r - (r // stride) * stride
            vr = ((col < n_valid - 1) & (r >= 0) & (q <= m_valid - 1)
                  & (r < count * stride)).astype(x.dtype) + dense
            vc = ((q <= m_valid - 2) & (r >= 0) & (r < count * stride)
                  & (col < n_valid)).astype(x.dtype) + dense
            if weighted:
                wr = bufs[5][:] * vr
                wc = bufs[6][:] * vc

            def step(k, carry):
                x, xb, u1, u2 = carry
                sigma = sched_ref[k, 0]
                tau = sched_ref[k, 1]
                theta = sched_ref[k, 2]
                if weighted:
                    lamr = wr
                    lamc = wc
                else:
                    lamr = sched_ref[k, 3] * vr
                    lamc = sched_ref[k, 3] * vc
                # where(...) not clip-to-0: padding rows may hold NaN garbage
                # (outputs are fresh buffers; pads are never written) and
                # clip(NaN, 0, 0) is NaN — the select contains it exactly.
                u1 = jnp.where(vr > 0,
                               jnp.clip(u1 + sigma * _drow(xb), -lamr, lamr),
                               0.0)
                u2 = jnp.where(vc > 0,
                               jnp.clip(u2 + sigma * _dcol(xb), -lamc, lamc),
                               0.0)
                div = _drow_t(u1) + _dcol_t(u2)
                if grad_step:  # Condat: explicit gradient step on the smooth term
                    xn = x - tau * ((x - y) + div)
                else:          # CP: resolvent step
                    xn = (x - tau * div + tau * y) / (1.0 + tau)
                xb = xn + theta * (xn - x)
                return xn, xb, u1, u2

            x, xb, u1, u2 = jax.lax.fori_loop(0, k_steps, step,
                                              (x, xb, u1, u2))
            bufs[0][:] = x
            bufs[1][:] = xb
            bufs[2][:] = u1
            bufs[3][:] = u2

            h = (win - tm) // 2
            outs = [xo_hbm, xbo_hbm, u1o_hbm, u2o_hbm]
            for s in range(4):
                pltpu.make_async_copy(bufs[s].at[pl.ds(h, tm)],
                                      outs[s].at[pl.ds(row0 + h, tm)],
                                      sems.at[nin + s]).start()
            for s in range(4):
                pltpu.make_async_copy(bufs[s].at[pl.ds(h, tm)],
                                      outs[s].at[pl.ds(row0 + h, tm)],
                                      sems.at[nin + s]).wait()

        n_bufs = 7 if weighted else 5
        pl.run_scoped(
            body,
            *(pltpu.VMEM((win, n), jnp.float32) for _ in range(n_bufs)),
            pltpu.SemaphoreType.DMA((n_bufs + 4,)),
        )

    return kernel


def make_schedule(max_iters, lam, sigma0, tau0, variant, cap_mult=2.0):
    """(max_iters, 4) [sigma, tau, theta, lam] schedule, jit-traceable in lam.

    cp / condat: constant steps, theta = 1.  cp-acc: Chambolle-Pock Alg.-2
    updates with sigma capped at cap_mult*sigma0 (a 1024^2 sweep found
    sigma0 = 0.5, cap 2x fastest at equal objective; unbounded sigma
    saturates the clipped duals and stalls)."""
    lam = jnp.asarray(lam, jnp.float32)
    acc = variant == "cp-acc"

    def step(carry, _):
        sig, tau = carry
        if acc:
            theta = jnp.where(sig < cap_mult * sigma0,
                              1.0 / jnp.sqrt(1.0 + 2.0 * tau), 1.0)
        else:
            theta = jnp.asarray(1.0, jnp.float32)
        row = jnp.stack([sig, tau, theta, lam])
        if acc:
            carry = (sig / theta, tau * theta)
        else:
            carry = (sig, tau)
        return carry, row

    init = (jnp.asarray(sigma0, jnp.float32), jnp.asarray(tau0, jnp.float32))
    _, rows = jax.lax.scan(step, init, None, length=max_iters)
    return rows


@functools.partial(jax.jit,
                   static_argnames=("k_steps", "tm", "n_valid", "m_valid",
                                    "stride", "count", "grad_step"))
def pdhg_chunk(sched, x, xb, u1, u2, y, k_steps: int, tm: int,
               n_valid: int, m_valid: int, stride: int, count: int,
               pad_top=0, grad_step: bool = False, wr=None, wc=None):
    """Run one K-iteration chunk over all row bands.  All state arrays are
    (Mp, N) row-padded; ``sched`` is the (k_steps, 4) schedule slice.
    ``pad_top`` may be a traced int32 scalar: the global row index of canvas
    row 0 is ``-pad_top`` (negative pad_top = a mid-image band of a row-
    sharded canvas).  ``wr``/``wc``: optional (Mp, N) per-edge weight fields
    (weighted TV)."""
    Mp, N = x.shape
    win = tm + 2 * _halo(k_steps)
    grid = ((Mp - 2 * _halo(k_steps)) // tm,)
    weighted = wr is not None
    kernel = _make_kernel(k_steps, tm, win, N, n_valid, m_valid, stride,
                          count, grad_step, weighted=weighted)
    out_shape = tuple(jax.ShapeDtypeStruct((Mp, N), jnp.float32)
                      for _ in range(4))
    roff = jnp.asarray(pad_top, jnp.int32).reshape(1)
    # NOTE: outputs must NOT alias inputs — bands run sequentially and band
    # i+1's halo must read band i's *pre-chunk* rows (classic ping-pong).
    # Padding rows of the outputs are never written; the kernel's validity
    # masks keep any garbage there from contaminating the image.
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    args = (sched, roff, x, xb, u1, u2, y) + ((wr, wc) if weighted else ())
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                 + [any_spec] * (len(args) - 2),
        out_specs=(any_spec,) * 4,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        # Off-TPU (the virtual-mesh dryrun / CPU tests) the Mosaic kernel
        # cannot compile; interpret mode executes the same program with
        # plain jax ops.
        interpret=(jax.default_backend() != "tpu"),
    )(*args)
