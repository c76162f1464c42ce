"""Pallas TPU kernel: temporally-blocked fused PDHG for 3D anisotropic TV-L1.

The 3D analog of :mod:`pdhg_fused` (reference algorithm: Yang3_TV ADMM,
src/TVNDopt.cpp:678-781, re-posed as primal-dual): for

    min_X 0.5||X - Y||^2 + lam (||D_L X||_1 + ||D_M X||_1 + ||D_N X||_1)

the PDHG iteration is a radius-1 stencil over three dual fields:

    u_a <- clip(u_a + sigma * D_a(xbar), +-lam)        a in {L, M, N}
    x'  <- (x - tau * sum_a D_a' u_a + tau * Y) / (1 + tau)
    xbar <- x' + theta (x' - x)

with ||D||^2 <= 12, so tau = 0.9 / (12 sigma).  Volumes are stacked along the
leading (L) axis with decoupled lam = 0 gap layers; the kernel runs K
iterations per HBM pass on VMEM-resident (WL, WM, N) bricks — information
propagates <= 2 cells per iteration along L and M, so a brick with a 2K halo
on both tiled axes computes its core exactly for K steps (N is untiled: the
whole line lives in VMEM).

Correctness devices mirror the 2D kernel: padded cells carry lam = 0 and are
exactly decoupled; validity masks are densified iotas (Mosaic requires
``+ 0.0 * x``); outputs are fresh buffers whose halo/pad cells are never
written (drivers must mask with where(), NaN garbage there is expected).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_l(k_steps):
    """Per-side halo along L (untiled leading dim): exact propagation depth."""
    return 2 * k_steps


def _halo_m(k_steps):
    """Per-side halo along M (sublane dim): rounded to the 8-row tile."""
    return -(-2 * k_steps // 8) * 8


def _sn(X):  # shift -1 along N (bring next element), zero fill
    z = jnp.zeros_like(X[..., :1])
    return jnp.concatenate([X[..., 1:], z], axis=-1)


def _snb(X):  # shift +1 along N (bring previous element), zero fill
    z = jnp.zeros_like(X[..., :1])
    return jnp.concatenate([z, X[..., :-1]], axis=-1)


def _sm(X):
    z = jnp.zeros_like(X[:, :1, :])
    return jnp.concatenate([X[:, 1:, :], z], axis=1)


def _smb(X):
    z = jnp.zeros_like(X[:, :1, :])
    return jnp.concatenate([z, X[:, :-1, :]], axis=1)


def _sl(X):
    z = jnp.zeros_like(X[:1])
    return jnp.concatenate([X[1:], z], axis=0)


def _slb(X):
    z = jnp.zeros_like(X[:1])
    return jnp.concatenate([z, X[:-1]], axis=0)


def _make_kernel(k_steps, tl, tm, wl, wm, n, n_valid, m_valid, l_valid,
                 stride, count, pad_m, grad_step):
    """``count`` volumes of ``l_valid`` layers stacked along L with period
    ``stride``; gap layers carry lam = 0 and decouple exactly.  Valid M rows
    start at canvas offset ``pad_m``.  The canvas's L offset (``pad_top``;
    negative for a mid-volume slab of a layer-banded multi-chip canvas)
    arrives as a (1,) SMEM scalar so one compiled kernel serves every band
    (SPMD) — same device as the 2D kernel."""

    def kernel(*refs):
        (sched_ref, loff_ref, x_hbm, xb_hbm, u1_hbm, u2_hbm, u3_hbm, y_hbm,
         xo_hbm, xbo_hbm, u1o_hbm, u2o_hbm, u3o_hbm) = refs
        li = pl.program_id(0)
        mi = pl.program_id(1)
        l0 = li * tl
        m0 = mi * tm
        pad_top = loff_ref[0]

        def body(*scratch):
            bufs = list(scratch[:-1])
            sems = scratch[-1]
            srcs = [x_hbm, xb_hbm, u1_hbm, u2_hbm, u3_hbm, y_hbm]
            nin = len(srcs)
            for s in range(nin):
                pltpu.make_async_copy(
                    srcs[s].at[pl.ds(l0, wl), pl.ds(m0, wm)], bufs[s],
                    sems.at[s]).start()
            for s in range(nin):
                pltpu.make_async_copy(
                    srcs[s].at[pl.ds(l0, wl), pl.ds(m0, wm)], bufs[s],
                    sems.at[s]).wait()

            x = bufs[0][:]
            xb = bufs[1][:]
            u1 = bufs[2][:]
            u2 = bufs[3][:]
            u3 = bufs[4][:]
            y = bufs[5][:]

            col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
            rm = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + (m0 - pad_m)
            rowl = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + l0
            dense = 0.0 * x
            r = rowl - pad_top
            q = r - (r // stride) * stride
            in_img = ((r >= 0) & (r < count * stride) & (q <= l_valid - 1)
                      & (rm >= 0) & (rm < m_valid) & (col < n_valid))
            v1 = (in_img & (col < n_valid - 1)).astype(x.dtype) + dense
            v2 = (in_img & (rm < m_valid - 1)).astype(x.dtype) + dense
            v3 = (in_img & (q <= l_valid - 2)).astype(x.dtype) + dense

            def step(k, carry):
                x, xb, u1, u2, u3 = carry
                sigma = sched_ref[k, 0]
                tau = sched_ref[k, 1]
                theta = sched_ref[k, 2]
                lam1 = sched_ref[k, 3] * v1   # N-axis penalty
                lam2 = sched_ref[k, 4] * v2   # M-axis penalty
                lam3 = sched_ref[k, 5] * v3   # L-axis penalty
                # where(), not clip-to-0: halo/pad cells may hold NaN garbage
                # (outputs are fresh buffers) and clip(NaN, 0, 0) is NaN.
                u1 = jnp.where(v1 > 0,
                               jnp.clip(u1 + sigma * (xb - _sn(xb)),
                                        -lam1, lam1), 0.0)
                u2 = jnp.where(v2 > 0,
                               jnp.clip(u2 + sigma * (xb - _sm(xb)),
                                        -lam2, lam2), 0.0)
                u3 = jnp.where(v3 > 0,
                               jnp.clip(u3 + sigma * (xb - _sl(xb)),
                                        -lam3, lam3), 0.0)
                div = ((u1 - _snb(u1)) + (u2 - _smb(u2)) + (u3 - _slb(u3)))
                if grad_step:  # Condat: explicit gradient step
                    xn = x - tau * ((x - y) + div)
                else:          # CP: resolvent step
                    xn = (x - tau * div + tau * y) / (1.0 + tau)
                xb = xn + theta * (xn - x)
                return xn, xb, u1, u2, u3

            x, xb, u1, u2, u3 = jax.lax.fori_loop(
                0, k_steps, step, (x, xb, u1, u2, u3))
            bufs[0][:] = x
            bufs[1][:] = xb
            bufs[2][:] = u1
            bufs[3][:] = u2
            bufs[4][:] = u3

            hl = (wl - tl) // 2   # L-side halo
            hm = (wm - tm) // 2   # M-side halo (8-aligned)
            outs = [xo_hbm, xbo_hbm, u1o_hbm, u2o_hbm, u3o_hbm]
            for s in range(5):
                pltpu.make_async_copy(
                    bufs[s].at[pl.ds(hl, tl), pl.ds(hm, tm)],
                    outs[s].at[pl.ds(l0 + hl, tl), pl.ds(m0 + hm, tm)],
                    sems.at[nin + s]).start()
            for s in range(5):
                pltpu.make_async_copy(
                    bufs[s].at[pl.ds(hl, tl), pl.ds(hm, tm)],
                    outs[s].at[pl.ds(l0 + hl, tl), pl.ds(m0 + hm, tm)],
                    sems.at[nin + s]).wait()

        pl.run_scoped(
            body,
            *(pltpu.VMEM((wl, wm, n), jnp.float32) for _ in range(6)),
            pltpu.SemaphoreType.DMA((11,)),
        )

    return kernel


def best_params(N, slots: int = 21, vmem_bytes: int = 14 << 20):
    """(k_steps, tl, tm) maximizing effective iterations per unit of HBM
    traffic: k * core / window, subject to the VMEM window budget.

    ``slots``: live window-sized f32 arrays the Mosaic allocator holds — 6
    scratch buffers + fori_loop state double-buffers + stencil temporaries
    (measured ~18 on v5e; 21 leaves headroom under the 16M scoped limit)."""
    budget = max(1, vmem_bytes // (slots * 4 * N))  # window cells in L x M
    best, best_score = (1, 4, 8), 0.0
    for k in (6, 4, 3, 2, 1):
        hl, hm = _halo_l(k), _halo_m(k)
        for tm in (64, 48, 40, 32, 24, 16, 8):
            wm = tm + 2 * hm
            wl = budget // wm
            tl = wl - 2 * hl
            if tl < 2:
                continue
            score = k * tl * tm / float(wl * wm)
            if score > best_score:
                best, best_score = (k, tl, tm), score
    return best


def sched_chunk3(carry, k_steps, lams, sigma0, cap_mult, variant):
    """Next ``k_steps`` rows of the (sigma, tau, theta, lam_N, lam_M, lam_L)
    schedule from a carried (sigma, tau) pair — the incremental form of
    :func:`make_schedule3` (see pdhg_fused.sched_chunk for why: the full
    cap-length scan cost ~20% of a whole 2D solve, and the carried pair is
    what lets the driver do gap-stall restarts)."""
    lams = [jnp.asarray(l, jnp.float32) for l in lams]
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
        return nxt, jnp.stack([sig, tau, theta] + lams)

    carry, rows = jax.lax.scan(step, carry, None, length=k_steps,
                               unroll=k_steps)
    return rows, carry


def make_schedule3(max_iters, lams, sigma0, tau0, variant, cap_mult=2.0):
    """(max_iters, 6) [sigma, tau, theta, lam_N, lam_M, lam_L] schedule (the
    3D analog of pdhg_fused.make_schedule; per-axis penalties)."""
    lams = [jnp.asarray(l, jnp.float32) for l in lams]
    acc = variant == "cp-acc"

    def step(carry, _):
        sig, tau = carry
        if acc:
            theta = jnp.where(sig < cap_mult * sigma0,
                              1.0 / jnp.sqrt(1.0 + 2.0 * tau), 1.0)
        else:
            theta = jnp.asarray(1.0, jnp.float32)
        row = jnp.stack([sig, tau, theta] + lams)
        if acc:
            carry = (sig / theta, tau * theta)
        else:
            carry = (sig, tau)
        return carry, row

    init = (jnp.asarray(sigma0, jnp.float32), jnp.asarray(tau0, jnp.float32))
    _, rows = jax.lax.scan(step, init, None, length=max_iters)
    return rows


@functools.partial(jax.jit,
                   static_argnames=("k_steps", "tl", "tm", "n_valid",
                                    "m_valid", "l_valid", "stride", "count",
                                    "pad_m", "grad_step"))
def pdhg3d_chunk(sched, x, xb, u1, u2, u3, y, k_steps: int, tl: int, tm: int,
                 n_valid: int, m_valid: int, l_valid: int, stride: int,
                 count: int, pad_top=0, pad_m: int = 0,
                 grad_step: bool = False):
    """Run one K-iteration chunk over all (L, M) bricks.  State arrays are
    (Lp, Mp, N) canvases; ``sched`` is the (k_steps, 6) schedule slice
    ([sigma, tau, theta, lam_N, lam_M, lam_L], see make_schedule3).
    ``pad_top`` may be a traced int32 scalar (see _make_kernel)."""
    Lp, Mp, N = x.shape
    hl = _halo_l(k_steps)
    hm = _halo_m(k_steps)
    wl = tl + 2 * hl
    wm = tm + 2 * hm
    grid = ((Lp - 2 * hl) // tl, (Mp - 2 * hm) // tm)
    kernel = _make_kernel(k_steps, tl, tm, wl, wm, N, n_valid, m_valid,
                          l_valid, stride, count, pad_m, grad_step)
    out_shape = tuple(jax.ShapeDtypeStruct((Lp, Mp, N), jnp.float32)
                      for _ in range(5))
    loff = jnp.asarray(pad_top, jnp.int32).reshape(1)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + [any_spec] * 6,
        out_specs=(any_spec,) * 5,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        # Off-TPU (virtual-mesh dryrun / CPU tests) interpret mode executes
        # the same program with plain jax ops.
        interpret=(jax.default_backend() != "tpu"),
    )(sched, loff, x, xb, u1, u2, u3, y)
