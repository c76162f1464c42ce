"""Roofline round 2: in-program measurements (dispatch-free).

Everything here times a jitted fori_loop of many repetitions INSIDE one XLA
program, so the axon tunnel's per-dispatch overhead (0.3-1 ms) divides out.

Sections:
  ceil   — HBM streaming bandwidth + VPU f32 FMA throughput, in-program.
  dma    — the pdhg chunk's DMA pattern alone (5 windows in, 4 cores out,
           no compute): is the kernel DMA-bound or compute-bound?
  ksweep — pdhg_chunk per-iteration time for k in {8,12,16,20} with the
           VMEM-budget tm for each.
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def timed(f, *args, n_reps=10):
    r = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
        best = min(best, time.time() - t0)
    return best


def measure_hbm_inprog(trips=64):
    n = 64 << 20  # 256 MB f32

    @jax.jit
    def f(x):
        return jax.lax.fori_loop(0, trips, lambda i, x: x + 1.0, x)

    x = jnp.zeros((n,), jnp.float32)
    t = timed(f, x)
    return 2 * n * 4 * trips / t / 1e9


def measure_vpu_inprog(chains=4, iters=512, rows=256, cols=1024, grid=64):
    def kernel(x_ref, o_ref):
        xs = [x_ref[:] + float(c) for c in range(chains)]

        def body(_, xs):
            return [x * 1.0000001 + 1e-9 for x in xs]

        xs = jax.lax.fori_loop(0, iters, body, xs)
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:] = acc

    spec = pl.BlockSpec((rows, cols), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel, grid=(grid,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32))(x))
    x = jnp.ones((rows, cols), jnp.float32)
    t = timed(f, x)
    flops = grid * rows * cols * iters * 2 * chains
    return flops / t / 1e12


def measure_dma_pattern(N=1024, k=12, tm=168, tiles=7, n_in=5, trips=32):
    """The pdhg chunk's exact DMA pattern, zero compute."""
    win = tm + 4 * k
    Mp = tiles * tm + 4 * k

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:]
        i = pl.program_id(0)
        row0 = i * tm

        def body(*scratch):
            bufs = list(scratch[:-1])
            sems = scratch[-1]
            for s in range(n_in):
                pltpu.make_async_copy(ins[s].at[pl.ds(row0, win)], bufs[s],
                                      sems.at[s]).start()
            for s in range(n_in):
                pltpu.make_async_copy(ins[s].at[pl.ds(row0, win)], bufs[s],
                                      sems.at[s]).wait()
            h = 2 * k
            for s in range(4):
                pltpu.make_async_copy(bufs[s].at[pl.ds(h, tm)],
                                      outs[s].at[pl.ds(row0 + h, tm)],
                                      sems.at[n_in + s]).start()
            for s in range(4):
                pltpu.make_async_copy(bufs[s].at[pl.ds(h, tm)],
                                      outs[s].at[pl.ds(row0 + h, tm)],
                                      sems.at[n_in + s]).wait()

        pl.run_scoped(
            body,
            *(pltpu.VMEM((win, N), jnp.float32) for _ in range(n_in)),
            pltpu.SemaphoreType.DMA((n_in + 4,)),
        )

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    call = lambda *a: pl.pallas_call(  # noqa: E731
        kernel, grid=(tiles,), in_specs=[any_spec] * n_in,
        out_specs=(any_spec,) * 4,
        out_shape=tuple(jax.ShapeDtypeStruct((Mp, N), jnp.float32)
                        for _ in range(4)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*a)

    @jax.jit
    def f(x):
        def body(_, x):
            a, b, c, d = call(x[0], x[1], x[2], x[3], x[4])
            return jnp.stack([a, b, c, d, x[4]])

        return jax.lax.fori_loop(0, trips, body, x)

    x = jnp.zeros((5, Mp, N), jnp.float32)
    t = timed(f, x)
    bytes_chunk = tiles * (n_in * win + 4 * tm) * N * 4
    return {"ms_per_chunk": t / trips * 1e3,
            "dma_gbs": bytes_chunk * trips / t / 1e9}


def measure_chunk_inprog(N=1024, M=1024, k=12, tm=None, trips=32,
                         weighted=False):
    from proxtv_tpu.ops.kernels import pdhg_fused as PK

    live = 20 if weighted else 14
    budget_rows = (12 << 20) // (live * 4 * max(N, 128))
    if tm is None:
        tm = ((budget_rows - 4 * k) // 8) * 8
    if tm < 8:
        return None
    win = tm + 4 * k
    S = M + 8
    Np = -(-N // 128) * 128
    tiles = max(1, -(-S // tm))
    Mp = tiles * tm + 4 * k
    rng = np.random.RandomState(0)
    sched = PK.make_schedule(k, 0.3, 0.5, 0.9 / 4.0, "cp-acc")
    y = jnp.asarray(rng.randn(Mp, Np).astype(np.float32))
    kw = {}
    n_in = 5
    if weighted:
        w = jnp.abs(jnp.asarray(rng.randn(Mp, Np).astype(np.float32)))
        kw = dict(wr=w, wc=w)
        n_in = 7

    @jax.jit
    def f(x0):
        def body(_, carry):
            x, xb, u1, u2 = carry
            return PK.pdhg_chunk(sched, x, xb, u1, u2, y, k_steps=k, tm=tm,
                                 n_valid=N, m_valid=M, stride=S, count=1,
                                 pad_top=2 * k, grad_step=False, **kw)

        return jax.lax.fori_loop(0, trips, body,
                                 (x0, x0, jnp.zeros_like(x0),
                                  jnp.zeros_like(x0)))

    x0 = y * 1.0
    t = timed(f, x0)
    bytes_chunk = tiles * (n_in * win + 4 * tm) * Np * 4
    t_chunk = t / trips
    return {"k": k, "tm": tm, "win": win, "tiles": tiles, "Mp": Mp,
            "ms_per_chunk": t_chunk * 1e3,
            "us_per_iter": t_chunk / k * 1e6,
            "achieved_gbs": bytes_chunk / t_chunk / 1e9,
            "useful_mpx_per_s_per_iter_cap": M * N / (t_chunk / k) / 1e6}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="ceil,dma,ksweep")
    args = ap.parse_args()
    secs = set(args.sections.split(","))
    out = {"backend": jax.default_backend()}

    def rep(k, v):
        out[k] = v
        print(k, v, file=sys.stderr, flush=True)

    if "ceil" in secs:
        rep("hbm_gbs_inprog", measure_hbm_inprog())
        rep("vpu_tflops_inprog", measure_vpu_inprog())
    if "dma" in secs:
        rep("dma_1024_k12", measure_dma_pattern())
    if "ksweep" in secs:
        for k in (8, 12, 16, 20):
            rep(f"chunk_1024_k{k}", measure_chunk_inprog(k=k))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
