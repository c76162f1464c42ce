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
                 grad_step, tiles, weighted=False, cert=False,
                 double_buffer=True):
    """A batch of ``count`` images of ``m_valid`` rows is stacked vertically
    with period ``stride`` (gap rows carry lam = 0 and are exactly decoupled,
    so one tall solve == independent per-image solves).

    The canvas's global row offset (``pad_top`` for a single-device canvas;
    ``pad_top - device_row_offset`` for a row-banded multi-chip canvas, where
    every device runs this same program on its own slab) arrives as a (1,)
    SMEM scalar so the one compiled kernel serves every band (SPMD).

    ``weighted``: two extra (Mp, N) inputs carry per-edge weight fields
    (zero at invalid edges — they subsume the validity masks).

    ``double_buffer``: ping-pong window buffers with cross-band DMA overlap —
    band i+1's five input windows stream in WHILE band i computes, and band
    i's core rows drain WHILE band i+1 computes.  Without it (the interpret
    path) each band serializes DMA-in / compute / DMA-out; measured on the
    v5e that serialization left the kernel at ~50 GB/s of a 438 GB/s chip.

    ``cert``: after the K steps, each band also reduces its core rows'
    duality-gap and objective contributions (same masking as the driver's
    ``gap_and_primal``) into two per-band SMEM scalars — the certificate
    then costs ~half an iteration instead of an 8-pass XLA sweep of the
    canvas, so the driver can afford to check every chunk."""
    n_in = 7 if weighted else 5

    def kernel(*refs):
        sched_ref, roff_ref = refs[0], refs[1]
        srcs = list(refs[2:2 + n_in])
        pos = 2 + n_in
        outs = list(refs[pos:pos + 4])
        pos += 4
        if cert:
            gap_ref, obj_ref = refs[pos], refs[pos + 1]
            pos += 2
        bufs, in_sems, out_sems = refs[pos:pos + 3]
        i = pl.program_id(0)
        row0 = i * tm
        pad_top = roff_ref[0]
        h = (win - tm) // 2
        slot = jax.lax.rem(i, 2) if double_buffer else 0

        def in_dma(sl, band, s):
            return pltpu.make_async_copy(
                srcs[s].at[pl.ds(band * tm, win)],
                bufs.at[sl * n_in + s],
                in_sems.at[sl, s])

        def out_dma(sl, band, s):
            return pltpu.make_async_copy(
                bufs.at[sl * n_in + s, pl.ds(h, tm)],
                outs[s].at[pl.ds(band * tm + h, tm)],
                out_sems.at[sl, s])

        if double_buffer:
            @pl.when(i == 0)
            def _():
                for s in range(n_in):
                    in_dma(slot, i, s).start()

            @pl.when(i + 1 < tiles)
            def _():
                # Reusing the other slot: band i-1's core rows must finish
                # draining out of it before band i+1's windows stream in.
                @pl.when(i >= 1)
                def _():
                    for s in range(4):
                        out_dma(1 - slot, i - 1, s).wait()
                for s in range(n_in):
                    in_dma(1 - slot, i + 1, s).start()
        else:
            for s in range(n_in):
                in_dma(slot, i, s).start()
        for s in range(n_in):
            in_dma(slot, i, s).wait()

        base = slot * n_in
        x = bufs[base + 0]
        xb = bufs[base + 1]
        u1 = bufs[base + 2]
        u2 = bufs[base + 3]
        y = bufs[base + 4]

        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        rowl = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        rowg = rowl + row0
        # lam masks: valid row-edge cols; valid col-edges = both endpoint
        # rows inside the same stacked image.
        r = rowg - pad_top
        q = r - (r // stride) * stride
        in_img_b = (r >= 0) & (r < count * stride)
        vr_b = (col < n_valid - 1) & in_img_b & (q <= m_valid - 1)
        vc_b = (q <= m_valid - 2) & in_img_b & (col < n_valid)
        # Sanitize ONCE per chunk instead of a where() per step: the output
        # canvases' padding rows are never written and may hold NaN garbage;
        # with finite state, clip to the lam=0 box pins invalid duals to 0
        # every step and the resolvent decays padded x toward 0.  This MUST
        # happen before the `+ dense` density trick below — 0 * NaN = NaN
        # would otherwise poison the masks themselves.
        x = jnp.where(in_img_b, x, 0.0)
        xb = jnp.where(in_img_b, xb, 0.0)
        u1 = jnp.where(vr_b, u1, 0.0)
        u2 = jnp.where(vc_b, u2, 0.0)
        dense = 0.0 * x  # force a dense vreg layout (Mosaic: shifting
        vr = vr_b.astype(x.dtype) + dense  # replicated iota layouts crashes)
        vc = vc_b.astype(x.dtype) + dense
        if weighted:
            lamr = bufs[base + 5] * vr
            lamc = bufs[base + 6] * vc
        else:
            # lam is constant within a chunk: hoist the masked fields out of
            # the step loop (saves 2 mults/cell/step).
            lamr = sched_ref[0, 3] * vr
            lamc = sched_ref[0, 3] * vc
        vrow = in_img_b.astype(x.dtype) + dense

        def step(k, carry):
            x, xb, u1, u2 = carry
            sigma = sched_ref[k, 0]
            tau = sched_ref[k, 1]
            theta = sched_ref[k, 2]
            u1 = jnp.clip(u1 + sigma * _drow(xb), -lamr, lamr)
            u2 = jnp.clip(u2 + sigma * _dcol(xb), -lamc, lamc)
            div = _drow_t(u1) + _dcol_t(u2)
            if grad_step:  # Condat: explicit gradient step on the smooth term
                xn = x - tau * ((x - y) + div)
            else:          # CP: resolvent step
                xn = (x - tau * div + tau * y) / (1.0 + tau)
            xb = xn + theta * (xn - x)
            return xn, xb, u1, u2

        x, xb, u1, u2 = jax.lax.fori_loop(0, k_steps, step, (x, xb, u1, u2))
        bufs[base + 0] = x
        bufs[base + 1] = xb
        bufs[base + 2] = u1
        bufs[base + 3] = u2

        if double_buffer:
            for s in range(4):
                out_dma(slot, i, s).start()

            @pl.when(i == tiles - 1)
            def _():
                for s in range(4):
                    out_dma(slot, i, s).wait()
            if tiles >= 2:
                @pl.when(i == tiles - 1)
                def _():
                    for s in range(4):
                        out_dma(1 - slot, i - 1, s).wait()
        else:
            for s in range(4):
                out_dma(slot, i, s).start()
            for s in range(4):
                out_dma(slot, i, s).wait()

        if cert:
            # Per-band partial duality gap / objective over this band's core
            # rows (the driver's gap_and_primal on the canvas, restricted):
            # xhat = Y - D'u is dual-feasible; all stencil neighbors of core
            # rows [h, h+tm) lie inside the window (h = 2k >= 1 rows of halo
            # on each side).
            xhat = y - (_drow_t(u1) + _dcol_t(u2))
            gr = _drow(xhat) * vr
            gc = _dcol(xhat) * vc
            core = ((rowl >= h) & (rowl < h + tm)).astype(x.dtype) + dense
            e_gap = (lamr * jnp.abs(gr) - u1 * gr
                     + lamc * jnp.abs(gc) - u2 * gc) * core
            e_obj = (0.5 * (xhat - y) * (xhat - y) * vrow
                     + lamr * jnp.abs(gr) + lamc * jnp.abs(gc)) * core
            # Full-array SMEM outputs (a (1, 1) block is not lowerable);
            # band i owns slot i.
            gap_ref[i, 0] = jnp.sum(e_gap)
            obj_ref[i, 0] = jnp.sum(e_obj)

    return kernel


def sched_chunk(carry, k_steps, lam, sigma0, cap_mult, variant):
    """Next ``k_steps`` rows of the (sigma, tau, theta, lam) schedule from a
    carried (sigma, tau) pair — the incremental form of
    :func:`make_schedule`.  Building the full cap-length schedule up front
    (a 2500-step lax.scan of scalar ops) measured ~0.7 ms per 1024^2 solve
    — ~20% of the whole solve; generating one chunk's rows inside the
    driver's while body costs ~a dozen scalar ops per chunk and only for
    chunks that actually run."""
    lam = jnp.asarray(lam, jnp.float32)
    acc = variant == "cp-acc"

    def step(c, _):
        sig, tau = c
        if acc:
            theta = jnp.where(sig < cap_mult * sigma0,
                              1.0 / jnp.sqrt(1.0 + 2.0 * tau), 1.0)
            nxt = (sig / theta, tau * theta)
        else:
            theta = jnp.asarray(1.0, jnp.float32)
            nxt = c
        return nxt, jnp.stack([sig, tau, theta, lam])

    carry, rows = jax.lax.scan(step, carry, None, length=k_steps,
                               unroll=k_steps)
    return rows, carry


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
                                    "stride", "count", "grad_step", "cert"))
def pdhg_chunk(sched, x, xb, u1, u2, y, k_steps: int, tm: int,
               n_valid: int, m_valid: int, stride: int, count: int,
               pad_top=0, grad_step: bool = False, wr=None, wc=None,
               cert: bool = False):
    """Run one K-iteration chunk over all row bands.  All state arrays are
    (Mp, N) row-padded; ``sched`` is the (k_steps, 4) schedule slice.
    ``pad_top`` may be a traced int32 scalar: the global row index of canvas
    row 0 is ``-pad_top`` (negative pad_top = a mid-image band of a row-
    sharded canvas).  ``wr``/``wc``: optional (Mp, N) per-edge weight fields
    (weighted TV).

    ``cert=True`` appends two (tiles, 1) outputs: per-band partial duality
    gap and objective of the post-chunk state (summing them gives the
    canvas-total certificate — a per-IMAGE split needs count == 1)."""
    Mp, N = x.shape
    win = tm + 2 * _halo(k_steps)
    tiles = (Mp - 2 * _halo(k_steps)) // tm
    weighted = wr is not None
    n_in = 7 if weighted else 5
    interpret = jax.default_backend() != "tpu"
    kernel = _make_kernel(k_steps, tm, win, N, n_valid, m_valid, stride,
                          count, grad_step, tiles, weighted=weighted,
                          cert=cert,
                          # Interpret mode (CPU tests / virtual-mesh dryrun)
                          # re-runs the kernel body per grid step with fresh
                          # scratch, so cross-band DMA pipelining cannot
                          # carry state — use the serialized schedule there.
                          double_buffer=not interpret)
    out_shape = [jax.ShapeDtypeStruct((Mp, N), jnp.float32)
                 for _ in range(4)]
    roff = jnp.asarray(pad_top, jnp.int32).reshape(1)
    # NOTE: outputs must NOT alias inputs — bands run sequentially and band
    # i+1's halo must read band i's *pre-chunk* rows (classic ping-pong).
    # Padding rows of the outputs are never written; the kernel's validity
    # masks keep any garbage there from contaminating the image.
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    out_specs = [any_spec] * 4
    if cert:
        out_shape += [jax.ShapeDtypeStruct((tiles, 1), jnp.float32)] * 2
        out_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    args = (sched, roff, x, xb, u1, u2, y) + ((wr, wc) if weighted else ())
    return pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                 + [any_spec] * (len(args) - 2),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((2 * n_in, win, N), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_in)),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*args)
