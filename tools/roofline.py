"""Roofline / MFU audit for the fused Pallas kernels (VERDICT r4 item 1).

Measures, on the attached TPU:
  1. Device ceilings — empirical, not datasheet numbers:
     * ``hbm_gbs``: streaming HBM bandwidth (one read + one write of a
       256 MB f32 array through a trivial elementwise op).
     * ``vpu_tflops``: f32 VPU throughput (a Pallas kernel running a long
       FMA chain on a VMEM-resident block; effectively zero HBM traffic).
     * ``vpu_div_cost``: relative cost of an elementwise divide-by-scalar
       vs multiply (informs the PDHG resolvent step).
  2. Per-kernel achieved numbers at the bench shapes: wall time per call,
     analytic HBM bytes and VPU flops per call (formulas below), and the
     achieved fraction of each ceiling.  The binding roofline is whichever
     fraction is higher; headroom = 1 - that fraction.

Analytic traffic model (pdhg_chunk, ops/kernels/pdhg_fused.py): per chunk a
band of ``tm`` core rows DMAs ``win = tm + 4k`` rows of 5 (7 weighted) state
fields in and ``tm`` rows of 4 fields out, then runs ``k`` PDHG iterations
on the (win, Np) window.  Per chunk:
    bytes  = bands * (n_in * win + 4 * tm) * Np * 4
    flops ~= bands * win * Np * k * FLOPS_PER_CELL   (halo cells recompute)
FLOPS_PER_CELL counts the step() body's elementwise ops (~25 unweighted).

Usage: python tools/roofline.py [--quick]   (writes JSON to stdout)
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


def timed(f, *args, n_reps=50, **kw):
    r = f(*args, **kw)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    best = float("inf")
    for _half in range(2):
        t0 = time.time()
        for _ in range(n_reps // 2):
            r = f(*args, **kw)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
        best = min(best, (time.time() - t0) / (n_reps // 2))
    return best


# ---------------------------------------------------------------------------
# Ceilings
# ---------------------------------------------------------------------------


def measure_hbm_gbs():
    n = 64 << 20  # 256 MB f32
    x = jnp.zeros((n,), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    t = timed(f, x, n_reps=20)
    return 2 * n * 4 / t / 1e9


def measure_vpu_tflops():
    ROWS, COLS, ITERS = 512, 1024, 512
    GRID = 8

    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def body(_, x):
            return x * 1.0000001 + 1e-9

        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x)

    spec = pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel, grid=(GRID,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((GRID * ROWS, COLS), jnp.float32))(x))
    x = jnp.ones((GRID * ROWS, COLS), jnp.float32)
    t = timed(f, x, n_reps=50)
    flops = GRID * ROWS * COLS * ITERS * 2
    return flops / t / 1e12


def measure_div_vs_mul():
    """Per-element divide-by-scalar vs multiply, VMEM-resident chain."""
    ROWS, COLS, ITERS = 512, 1024, 256

    def make(div):
        def kernel(t_ref, x_ref, o_ref):
            t = t_ref[0, 0]
            x = x_ref[:]

            def body(_, x):
                if div:
                    return (x + 1e-9) / (1.0 + t)
                return (x + 1e-9) * t

            o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x)

        spec = pl.BlockSpec((ROWS, COLS), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
        return jax.jit(lambda t, x: pl.pallas_call(
            kernel, grid=(1,),
            in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM), spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32))(t, x))

    t = jnp.array([[0.9]], jnp.float32)
    x = jnp.ones((ROWS, COLS), jnp.float32)
    td = timed(make(True), t, x)
    tm = timed(make(False), t, x)
    return {"div_ms": td * 1e3, "mul_ms": tm * 1e3, "ratio": td / tm}


# ---------------------------------------------------------------------------
# pdhg2d fused kernel at the bench shape
# ---------------------------------------------------------------------------


def measure_pdhg2d(M=1024, N=1024, weighted=False):
    from proxtv_tpu.ops.kernels import pdhg_fused as PK
    from proxtv_tpu.ops.kernels.gating import pdhg2d_params

    k_steps, tm = pdhg2d_params(N, weighted=weighted)
    halo = 2 * k_steps
    S = M + 8
    Np = -(-N // 128) * 128
    tiles = max(1, -(-S // tm))
    Mp = tiles * tm + 2 * halo
    win = tm + 2 * halo
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(Mp, Np).astype(np.float32))
    y = jnp.asarray(rng.randn(Mp, Np).astype(np.float32))
    z = jnp.zeros((Mp, Np), jnp.float32)
    sched = PK.make_schedule(k_steps, 0.3, 0.5, 0.9 / 4.0, "cp-acc")
    kw = {}
    n_in = 5
    if weighted:
        w = jnp.abs(jnp.asarray(rng.randn(Mp, Np).astype(np.float32)))
        kw = dict(wr=w, wc=w)
        n_in = 7

    def f():
        return PK.pdhg_chunk(sched, x, x, z, z, y, k_steps=k_steps, tm=tm,
                             n_valid=N, m_valid=M, stride=S, count=1,
                             pad_top=halo, grad_step=False, **kw)

    t = timed(f, n_reps=50)
    bytes_chunk = tiles * (n_in * win + 4 * tm) * Np * 4
    FL = 27 if not weighted else 25  # step() elementwise ops per cell
    flops_chunk = tiles * win * Np * k_steps * FL
    return {
        "k_steps": k_steps, "tm": tm, "win": win, "tiles": tiles,
        "Mp": Mp, "Np": Np,
        "ms_per_chunk": t * 1e3,
        "ms_per_iter": t / k_steps * 1e3,
        "bytes_per_chunk": bytes_chunk,
        "flops_per_chunk": flops_chunk,
        "achieved_gbs": bytes_chunk / t / 1e9,
        "achieved_tflops": flops_chunk / t / 1e12,
        "useful_mpx_per_s_per_iter_cap": M * N / (t / k_steps) / 1e6,
    }


def measure_pdhg2d_cert(M=1024, N=1024):
    """Cost of one duality-gap certificate evaluation (driver-side XLA)."""
    from proxtv_tpu.models import tv2d
    from proxtv_tpu.utils.config import DEFAULT_COMBINER
    import functools

    rng = np.random.RandomState(0)
    Y = jnp.asarray(rng.randn(1, M, N).astype(np.float32))
    # Full solve minus chunks ~= certificate cost; instead time a capped run
    # at two cert cadences and difference.  Simpler: time gap path directly.
    f = jax.jit(functools.partial(
        tv2d._run_pdhg_fused, lam=0.3, cap=96, tol=DEFAULT_COMBINER.stop,
        cfg=DEFAULT_COMBINER, variant="cp-acc", gap_tol=0.0))
    t96 = timed(f, Y, n_reps=30)
    f2 = jax.jit(functools.partial(
        tv2d._run_pdhg_fused, lam=0.3, cap=192, tol=DEFAULT_COMBINER.stop,
        cfg=DEFAULT_COMBINER, variant="cp-acc", gap_tol=0.0))
    t192 = timed(f2, Y, n_reps=30)
    return {"solve96_ms": t96 * 1e3, "solve192_ms": t192 * 1e3}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip", default="", help="comma list of sections")
    args = ap.parse_args()
    skip = set(args.skip.split(","))
    out = {"backend": jax.default_backend()}
    if "ceil" not in skip:
        out["hbm_gbs"] = measure_hbm_gbs()
        print("hbm", out["hbm_gbs"], file=sys.stderr, flush=True)
        out["vpu_tflops"] = measure_vpu_tflops()
        print("vpu", out["vpu_tflops"], file=sys.stderr, flush=True)
        out["div_vs_mul"] = measure_div_vs_mul()
        print("div", out["div_vs_mul"], file=sys.stderr, flush=True)
    if "pdhg2d" not in skip:
        out["pdhg2d_1024"] = measure_pdhg2d(1024, 1024)
        print("pdhg2d", out["pdhg2d_1024"], file=sys.stderr, flush=True)
        if not args.quick:
            out["pdhg2d_4k_t"] = measure_pdhg2d(3840, 2160)  # transposed 4K
            print("pdhg2d4k", out["pdhg2d_4k_t"], file=sys.stderr, flush=True)
            out["pdhg2d_1024_w"] = measure_pdhg2d(1024, 1024, weighted=True)
    if "cert" not in skip and not args.quick:
        out["cert_1024"] = measure_pdhg2d_cert()
        print("cert", out["cert_1024"], file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
