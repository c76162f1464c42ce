"""Round-5 roofline/MFU audit of the fused kernels (VERDICT r4 item 1).

All measurements are IN-PROGRAM (a jitted fori_loop of many kernel calls),
so the axon tunnel's 0.3-1 ms dispatch overhead divides out.  For each
kernel: an analytic bytes-per-HBM-pass model, the measured per-pass time at
the bench shape, achieved GB/s, and the fraction of the measured streaming
ceiling.  Results go into docs/KERNELS.md's roofline table.

Traffic models (f32 = 4 B/cell):
  pdhg2d chunk: per band, n_in windows in (win rows) + 4 cores out (tm rows)
      -> tiles * (n_in*win + 4*tm) * Np * 4 bytes for k_steps iterations.
  pdhg3d chunk: per brick, 6 windows in (wl*wm) + 5 cores out (tl*tm)
      -> bricks * (6*wl*wm + 5*tl*tm) * N * 4 bytes for k iterations.
  pn/ms/lp solves: whole-solve fusion - one read of the inputs + one write
      of the outputs; the solve is compute-bound (r4: inner unroll slower),
      so GB/s is reported for completeness and the iteration count is the
      real cost metric.
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed(f, *args):
    r = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
        best = min(best, time.time() - t0)
    return best


def hbm_ceiling(trips=64):
    n = 64 << 20

    @jax.jit
    def f(x):
        return jax.lax.fori_loop(0, trips, lambda i, x: x + 1.0, x)

    t = timed(f, jnp.zeros((n,), jnp.float32))
    return 2 * n * 4 * trips / t / 1e9


def pdhg2d(M, N, weighted=False, trips=32):
    from proxtv_tpu.ops.kernels import pdhg_fused as PK
    from proxtv_tpu.ops.kernels.gating import pdhg2d_params

    k, tm = pdhg2d_params(N, weighted=weighted)
    S = M + 8
    Np = -(-N // 128) * 128
    tiles = max(1, -(-S // tm))
    Mp = tiles * tm + 4 * k
    win = tm + 4 * k
    rng = np.random.RandomState(0)
    sched = PK.make_schedule(k, 0.3, 0.5, 0.9 / 4.0, "cp-acc")
    y = jnp.asarray(rng.randn(Mp, Np).astype(np.float32))
    kw, n_in = {}, 5
    if weighted:
        w = jnp.abs(jnp.asarray(rng.randn(Mp, Np).astype(np.float32)))
        kw, n_in = dict(wr=w, wc=w), 7

    @jax.jit
    def f(carry):
        def body(_, c):
            return PK.pdhg_chunk(sched, *c, y, k_steps=k, tm=tm, n_valid=N,
                                 m_valid=M, stride=S, count=1, pad_top=2 * k,
                                 grad_step=False, **kw)

        return jax.lax.fori_loop(0, trips, body, carry)

    z = jnp.zeros_like(y)
    t = timed(f, (y, y, z, z)) / trips
    traffic = tiles * (n_in * win + 4 * tm) * Np * 4
    # elementwise op count per cell per iteration of the step loop (shifts,
    # clips, fma) ~ 30 incl. masks; windows recompute halos.
    flops = tiles * win * Np * k * 30
    return {"k": k, "tm": tm, "tiles": tiles, "ms_per_chunk": t * 1e3,
            "us_per_iter": t / k * 1e6, "bytes_per_chunk": traffic,
            "achieved_gbs": traffic / t / 1e9,
            "achieved_gflops": flops / t / 1e9,
            "iter_cap_mpx_s": M * N / (t / k) / 1e6}


def pdhg3d(L, M, N, trips=16):
    from proxtv_tpu.models import tvnd
    from proxtv_tpu.ops.kernels import pdhg3d_fused as PK3

    k, tl, tm = PK3.best_params(-(-N // 128) * 128)
    hl, hm = 2 * k, 4 * k
    Np = -(-N // 128) * 128
    S = M + 4
    gl = max(1, -(-L // tl))
    gm = max(1, -(-S // tm))
    Lp = gl * tl + 2 * hl
    Mp = gm * tm + 2 * hm
    wl, wm = tl + 2 * hl, tm + 2 * hm
    rng = np.random.RandomState(0)
    sched = PK3.make_schedule3(k, (0.3, 0.3, 0.3), 0.5, 0.9 / 12.0, "cp-acc")
    y = jnp.asarray(rng.randn(Lp, Mp, Np).astype(np.float32))

    @jax.jit
    def f(carry):
        def body(_, c):
            return PK3.pdhg3d_chunk(sched, *c, y, k_steps=k, tl=tl, tm=tm,
                                    n_valid=N, m_valid=M, l_valid=L,
                                    stride=S, count=1, pad_top=hl, pad_m=hm)

        return jax.lax.fori_loop(0, trips, body, carry)

    z = jnp.zeros_like(y)
    t = timed(f, (y, y, z, z, z)) / trips
    traffic = gl * gm * (6 * wl * wm + 5 * tl * tm) * Np * 4
    flops = gl * gm * wl * wm * Np * k * 40
    return {"k": k, "tl": tl, "tm": tm, "bricks": gl * gm,
            "ms_per_chunk": t * 1e3, "us_per_iter": t / k * 1e6,
            "bytes_per_chunk": traffic, "achieved_gbs": traffic / t / 1e9,
            "achieved_gflops": flops / t / 1e9,
            "iter_cap_mpx_s": L * M * N / (t / k) / 1e6}


def pn(B=10000, n=1000, trips=8):
    from proxtv_tpu.ops.kernels import pn_fused

    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(B, n).astype(np.float32))

    @jax.jit
    def f(y):
        def body(_, y):
            x, _ = pn_fused.pn_tv1_fused(y, lam_scalar=0.7, tb=32,
                                         return_dual=False)
            return x

        return jax.lax.fori_loop(0, trips, body, y)

    t = timed(f, y) / trips
    traffic = 2 * B * n * 4  # read y, write x (scalar lam rides SMEM)
    return {"ms_per_solve": t * 1e3, "signals_s": B / t,
            "bytes_per_solve": traffic, "achieved_gbs": traffic / t / 1e9}


def ms(B=10000, n=1000, trips=8):
    from proxtv_tpu.ops.kernels import ms_fused

    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(B, n).astype(np.float32))

    @jax.jit
    def f(y):
        def body(_, y):
            out = ms_fused.ms_tv2_fused(y, lam=1.0)
            return out[0]

        return jax.lax.fori_loop(0, trips, body, y)

    t = timed(f, y) / trips
    traffic = 2 * B * n * 4
    return {"ms_per_solve": t * 1e3, "signals_s": B / t,
            "bytes_per_solve": traffic, "achieved_gbs": traffic / t / 1e9}


def lp(B=512, n=1000, p=1.5, trips=64):
    # trips must be large enough that trips * t_solve >> the ~28 ms tunnel
    # RTT of the single dispatch, or the "in-program" number is really
    # RTT / trips (that artifact produced a phantom 7 ms/solve in round 5).
    from proxtv_tpu.ops import tv1d_lp

    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(B, n).astype(np.float32))

    @jax.jit
    def f(y):
        def body(_, y):
            return tv1d_lp.tvp_gpfw(y, 0.7, p)[0]

        return jax.lax.fori_loop(0, trips, body, y)

    t = timed(f, y) / trips
    traffic = 2 * B * n * 4
    return {"p": p, "ms_per_solve": t * 1e3, "signals_s": B / t,
            "achieved_gbs": traffic / t / 1e9}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="ceil,2d,2dw,4k,3d,pn,ms,lp")
    args = ap.parse_args()
    secs = set(args.sections.split(","))
    out = {"backend": jax.default_backend()}

    def rep(k, v):
        out[k] = v
        print(k, json.dumps(v), file=sys.stderr, flush=True)

    if "ceil" in secs:
        rep("hbm_gbs", hbm_ceiling())
    if "2d" in secs:
        rep("pdhg2d_1024", pdhg2d(1024, 1024))
    if "2dw" in secs:
        rep("pdhg2d_1024_weighted", pdhg2d(1024, 1024, weighted=True))
    if "4k" in secs:
        # transposed orientation (how the driver actually runs 4K)
        rep("pdhg2d_4k_transposed", pdhg2d(3840, 2160))
    if "3d" in secs:
        rep("pdhg3d_32_256_256", pdhg3d(32, 256, 256))
    if "pn" in secs:
        rep("pn_10000x1000", pn())
    if "ms" in secs:
        rep("ms_10000x1000", ms())
    if "lp" in secs:
        rep("lp_512x1000_p1.5", lp(p=1.5))
        rep("lp_512x1000_p3", lp(p=3.0))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
