"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: 2D TV-L1 denoise throughput (megapixels/s) on a 1024x1024 image at
the reference's own convergence contract, vs the reference C implementation
(albarji/proxTV DR2_TV, 35 Douglas-Rachford sweeps) measured on this host's
CPU.  The reference baseline is re-measured when possible (compiled from
/root/reference into /tmp) and cached in bench_baseline.json; otherwise the
cached value is used.

Every BASELINE.md family carries a measured reference pair:
  * 1D TV-L1 batched: our native OpenMP batch host (all cores, FFI-free) —
    the strongest CPU execution of the same scan algorithm.
  * weighted 1D / TV-L2 / TV-Lp: reference C solvers driven by a thread pool
    (ctypes releases the GIL, so this is true multi-core scaling).
  * weighted 2D: reference DR2L1W_TV (OpenMP, all cores).
  * 3D: reference Yang3_TV.
  * long single 1D signal (1e6 samples): reference hybridTautString_TV1.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "bench_baseline.json")

M = N = 1024
M4, N4 = 2160, 3840      # 4K UHD grayscale (BASELINE.md 2D row)
LAM = 0.3
B1, N1 = 10000, 1000
LAM1 = 0.7
BLP, NLP = 64, 1000      # TV-Lp reference sample (GPFW is slow per signal)
NLONG = 1_000_000        # single huge signal
SLONG = 8                # streaming batch of huge signals (sustained rate)
LAMLONG = 50.0           # penalty for the long TV-L2 / TV-Lp rows
L3, M3, N3 = 32, 256, 256

# Cached baselines missing any of these keys are re-measured.
BASE_KEYS = ["ref_2d_mpx_s", "ref_2d_obj", "ref_2d4k_mpx_s", "ref_2d4k_obj",
             "ref_1d_signals_s", "ref_1d_pool_signals_s",
             "ref_1d_batch_signals_s", "ref_1dw_signals_s", "ref_l2_signals_s",
             "ref_lp15_signals_s", "ref_lp3_signals_s", "ref_lp5_signals_s",
             "ref_2dw_mpx_s",
             "ref_2dw_obj", "ref_3d_mpx_s", "ref_3d_obj", "ref_long1d_ms",
             "ref_long1d_stream_ms", "ref_long_l2_ms", "ref_long_l2_obj",
             "ref_long_lp_ms", "ref_long_lp_obj", "ref_long1d_1e7_ms",
             "ref_long1d_1e7_obj", "ref_2dp_mpx_s", "ref_2dp_obj",
             "ref_threads"]
NLONG7 = 10_000_000          # banded long-1D row (VERDICT r3 item 1)
M5 = N5 = 512                # general-norm 2D row (VERDICT r3 item 8)
LAM2P, P2P = 0.3, 1.5


def _obj_2dp(X, Y, lam, p):
    """0.5||X-Y||^2 + lam (sum_cols ||D X[:,j]||_p + sum_rows ||D X[i,:]||_p)."""
    col = np.sum(np.sum(np.abs(np.diff(X, axis=0)) ** p, axis=0) ** (1.0 / p))
    row = np.sum(np.sum(np.abs(np.diff(X, axis=1)) ** p, axis=1) ** (1.0 / p))
    return 0.5 * np.sum((X - Y) ** 2) + lam * (col + row)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Reference CPU baseline (compiled from /root/reference, cached)
# ---------------------------------------------------------------------------


def _build_reference():
    lib = "/tmp/proxtv_ref_bench/libproxtv_ref.so"
    if os.path.exists(lib):
        return lib
    os.makedirs(os.path.dirname(lib), exist_ok=True)
    src = "/root/reference/src"
    if not os.path.isdir(src):
        return None
    cmd = (f"g++ -O3 -march=native -fopenmp -DNOMATLAB=1 -shared -fPIC "
           f"{src}/*.cpp -o {lib} -l:liblapack.so.3 -l:libblas.so.3")
    try:
        subprocess.run(cmd, shell=True, check=True, capture_output=True,
                       timeout=600)
        return lib
    except Exception as e:  # noqa: BLE001
        log("reference build failed:", e)
        return None


def _thread_map(fn, n_items, workers):
    """Run fn(i) for i in range(n_items) on a thread pool, one contiguous
    slab of items per task so Python dispatch overhead (~100 us/task) does
    not pollute the measurement; ctypes calls release the GIL, so the slabs
    run on real cores in parallel."""
    from concurrent.futures import ThreadPoolExecutor

    bounds = [(n_items * w // workers, n_items * (w + 1) // workers)
              for w in range(workers)]

    def slab(w):
        lo, hi = bounds[w]
        for i in range(lo, hi):
            fn(i)

    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(slab, range(workers)))


def _fork_map_1d(libpath, Y1, lam, workers):
    """Reference hybridTautString_TV1 over the batch with one forked process
    per core (best of 3 sweeps); returns signals/s."""
    import ctypes
    import multiprocessing as mp

    B, n = Y1.shape
    bounds = [(B * w // workers, B * (w + 1) // workers)
              for w in range(workers)]

    def slab(w):
        lib = ctypes.CDLL(libpath)
        pd = ctypes.POINTER(ctypes.c_double)
        lib.hybridTautString_TV1.restype = None
        lib.hybridTautString_TV1.argtypes = [pd, ctypes.c_int,
                                             ctypes.c_double, pd]
        x = np.zeros(n)
        lo, hi = bounds[w]
        for k in range(lo, hi):
            lib.hybridTautString_TV1(Y1[k].ctypes.data_as(pd), n, lam,
                                     x.ctypes.data_as(pd))

    ctx = mp.get_context("fork")
    best = float("inf")
    for _ in range(3):
        procs = [ctx.Process(target=slab, args=(w,)) for w in range(workers)]
        t0 = time.time()
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        best = min(best, time.time() - t0)
    return B / best


def measure_reference():
    import ctypes

    libpath = _build_reference()
    if libpath is None:
        return None
    lib = ctypes.CDLL(libpath)
    pd = ctypes.POINTER(ctypes.c_double)
    ci, cd, cs = ctypes.c_int, ctypes.c_double, ctypes.c_size_t
    lib.DR2_TV.restype = ci
    lib.DR2_TV.argtypes = [cs, cs, pd, cd, cd, cd, cd, pd, ci, ci, pd]
    lib.hybridTautString_TV1.restype = None
    lib.hybridTautString_TV1.argtypes = [pd, ci, cd, pd]
    lib.tautString_TV1_Weighted.restype = ci
    lib.tautString_TV1_Weighted.argtypes = [pd, pd, pd, ci]
    lib.morePG_TV2.restype = ci
    lib.morePG_TV2.argtypes = [pd, cd, pd, pd, ci, ctypes.c_void_p]
    lib.GPFW_TVp.restype = ci
    lib.GPFW_TVp.argtypes = [pd, cd, pd, pd, ci, cd, ctypes.c_void_p]
    lib.DR2L1W_TV.restype = ci
    lib.DR2L1W_TV.argtypes = [cs, cs, pd, pd, pd, pd, ci, ci, pd]
    lib.Yang3_TV.restype = ci
    lib.Yang3_TV.argtypes = [cs, cs, cs, pd, cd, pd, ci, pd]

    nthreads = os.cpu_count() or 1
    rng = np.random.RandomState(0)
    out = {"ref_threads": nthreads}

    def P(a):
        return a.ctypes.data_as(pd)

    # ---- 2D TV-L1 (DR2_TV, OpenMP all cores) ----
    Y = np.ascontiguousarray(rng.randn(M, N))
    X = np.zeros_like(Y)
    info = np.zeros(3)
    t0 = time.time()
    lib.DR2_TV(M, N, P(Y), LAM, LAM, 1.0, 1.0, P(X), nthreads, 35, P(info))
    t_2d = time.time() - t0
    out["ref_2d_mpx_s"] = M * N / 1e6 / t_2d
    out["ref_2d_obj"] = float(0.5 * np.sum((X - Y) ** 2)
                              + LAM * (np.abs(np.diff(X, axis=0)).sum()
                                       + np.abs(np.diff(X, axis=1)).sum()))

    # ---- 2D TV-L1 at 4K UHD (the BASELINE.md "4K grayscale" row) ----
    Y4 = np.ascontiguousarray(rng.randn(M4, N4))
    X4 = np.zeros_like(Y4)
    t0 = time.time()
    lib.DR2_TV(M4, N4, P(Y4), LAM, LAM, 1.0, 1.0, P(X4), nthreads, 35,
               P(info))
    t_4k = time.time() - t0
    out["ref_2d4k_mpx_s"] = M4 * N4 / 1e6 / t_4k
    out["ref_2d4k_obj"] = float(0.5 * np.sum((X4 - Y4) ** 2)
                                + LAM * (np.abs(np.diff(X4, axis=0)).sum()
                                         + np.abs(np.diff(X4, axis=1)).sum()))

    # ---- batched 1D TV-L1: (a) sequential ctypes loop (historic number),
    # (b) our native OpenMP batch host (FFI-free, all cores — the honest
    # multi-core CPU execution of the same scan) ----
    Y1 = np.ascontiguousarray(rng.randn(B1, N1))
    X1 = np.zeros_like(Y1)
    t0 = time.time()
    for k in range(B1):
        lib.hybridTautString_TV1(P(Y1[k]), N1, LAM1, P(X1[k]))
    out["ref_1d_signals_s"] = B1 / (time.time() - t0)

    # The reference's own scan on ALL cores: the BASELINE.md "reference
    # multi-core CPU throughput" comparator.  One *process* per core (fork
    # inherits Y1), each looping its contiguous slab — a thread pool GIL-
    # convoys on these ~30 us calls and lands *below* the sequential loop.
    out["ref_1d_pool_signals_s"] = _fork_map_1d(libpath, Y1, LAM1, nthreads)
    try:
        from proxtv_tpu.runtime import native
        assert native.available()
        native.tv1_batch_host(Y1, LAM1, n_threads=nthreads)  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            native.tv1_batch_host(Y1, LAM1, n_threads=nthreads)
            best = min(best, time.time() - t0)
        out["ref_1d_batch_signals_s"] = B1 / best
    except Exception as e:  # noqa: BLE001
        log("native batch host unavailable:", e)
        out["ref_1d_batch_signals_s"] = out["ref_1d_signals_s"]

    # ---- weighted 1D (tautString_TV1_Weighted, thread pool) ----
    W1 = np.ascontiguousarray(0.5 + rng.rand(B1, N1 - 1))
    X1w = np.zeros_like(Y1)

    def run_1dw(k):
        lib.tautString_TV1_Weighted(P(Y1[k]), P(W1[k]), P(X1w[k]), N1)

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _thread_map(run_1dw, B1, nthreads)
        best = min(best, time.time() - t0)
    out["ref_1dw_signals_s"] = B1 / best

    # ---- TV-L2 (morePG_TV2, thread pool) ----
    def run_l2(k):
        x = np.zeros(N1)
        inf = np.zeros(3)
        lib.morePG_TV2(P(Y1[k]), 1.0, P(x), P(inf), N1, None)

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        _thread_map(run_l2, B1, nthreads)
        best = min(best, time.time() - t0)
    out["ref_l2_signals_s"] = B1 / best

    # ---- TV-Lp (GPFW_TVp, thread pool, BLP signals) ----
    for p, key in ((1.5, "ref_lp15_signals_s"), (3.0, "ref_lp3_signals_s"),
                   (5.0, "ref_lp5_signals_s")):
        def run_lp(k, p=p):
            x = np.zeros(N1)
            inf = np.zeros(3)
            lib.GPFW_TVp(P(Y1[k]), 0.7, P(x), P(inf), N1, p, None)

        t0 = time.time()
        _thread_map(run_lp, BLP, nthreads)
        out[key] = BLP / (time.time() - t0)

    # ---- weighted 2D (DR2L1W_TV, OpenMP all cores) ----
    # The reference reads buffers in Fortran order; ravel the natural (C
    # order) instance accordingly so reference and TPU solve the SAME
    # problem, and record the reference's achieved objective (the TPU side
    # runs to this target — BASELINE.md: equal objective vs the reference).
    Wc = np.ascontiguousarray(0.5 + rng.rand(M - 1, N))
    Wr = np.ascontiguousarray(0.5 + rng.rand(M, N - 1))
    Yf = np.asfortranarray(Y).ravel(order="F").copy()
    Wcf = np.asfortranarray(Wc).ravel(order="F").copy()
    Wrf = np.asfortranarray(Wr).ravel(order="F").copy()
    Xwf = np.zeros_like(Yf)
    t0 = time.time()
    lib.DR2L1W_TV(M, N, P(Yf), P(Wcf), P(Wrf), P(Xwf), nthreads, 35, P(info))
    out["ref_2dw_mpx_s"] = M * N / 1e6 / (time.time() - t0)
    Xw = Xwf.reshape(M, N, order="F")
    out["ref_2dw_obj"] = float(
        0.5 * np.sum((Xw - Y) ** 2)
        + np.sum(Wc * np.abs(np.diff(Xw, axis=0)))
        + np.sum(Wr * np.abs(np.diff(Xw, axis=1))))

    # ---- 3D (Yang3_TV) ----
    V = np.ascontiguousarray(rng.randn(L3, M3, N3))
    Vf = np.asfortranarray(V).ravel(order="F").copy()
    XVf = np.zeros_like(Vf)
    t0 = time.time()
    lib.Yang3_TV(L3, M3, N3, P(Vf), 0.3, P(XVf), 35, P(info))
    out["ref_3d_mpx_s"] = L3 * M3 * N3 / 1e6 / (time.time() - t0)
    XV = XVf.reshape(L3, M3, N3, order="F")
    out["ref_3d_obj"] = float(
        0.5 * np.sum((XV - V) ** 2)
        + 0.3 * sum(np.abs(np.diff(XV, axis=a)).sum() for a in range(3)))

    # ---- single huge 1D signal (sequential scan, the reference's headline) --
    ylong = np.ascontiguousarray(np.cumsum(rng.randn(NLONG)) * 0.05
                                 + rng.randn(NLONG))
    xlong = np.zeros_like(ylong)
    lib.hybridTautString_TV1(P(ylong), NLONG, LAM1, P(xlong))  # warm
    t0 = time.time()
    for _ in range(3):
        lib.hybridTautString_TV1(P(ylong), NLONG, LAM1, P(xlong))
    out["ref_long1d_ms"] = (time.time() - t0) / 3 * 1e3

    # ---- n = 1e7 single signal (the banded-path comparator) ----
    ylong7 = np.ascontiguousarray(np.cumsum(rng.randn(NLONG7)) * 0.05
                                  + rng.randn(NLONG7))
    xlong7 = np.zeros_like(ylong7)
    lib.hybridTautString_TV1(P(ylong7), NLONG7, LAM1, P(xlong7))  # warm
    t0 = time.time()
    for _ in range(2):
        lib.hybridTautString_TV1(P(ylong7), NLONG7, LAM1, P(xlong7))
    out["ref_long1d_1e7_ms"] = (time.time() - t0) / 2 * 1e3
    out["ref_long1d_1e7_obj"] = float(
        0.5 * ((xlong7 - ylong7) ** 2).sum()
        + LAM1 * np.abs(np.diff(xlong7)).sum())
    del ylong7, xlong7

    # ---- streaming long signals (sustained rate: one scan per core) ----
    Ylong = np.ascontiguousarray(np.cumsum(rng.randn(SLONG, NLONG), axis=1)
                                 * 0.05 + rng.randn(SLONG, NLONG))
    Xlong = np.zeros_like(Ylong)

    def run_long(k):
        lib.hybridTautString_TV1(P(Ylong[k]), NLONG, LAM1, P(Xlong[k]))

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _thread_map(run_long, SLONG, nthreads)
        best = min(best, time.time() - t0)
    out["ref_long1d_stream_ms"] = best / SLONG * 1e3

    # ---- long single-signal TV-L2 / TV-Lp (n = 1e6; reference solves these
    # with the same unbounded-length solvers, src/TVL2opt.cpp:190,
    # src/TVLPopt.cpp:1111) ----
    xl = np.zeros_like(ylong)
    t0 = time.time()
    lib.morePG_TV2(P(ylong), LAMLONG, P(xl), P(info), NLONG, None)
    out["ref_long_l2_ms"] = (time.time() - t0) * 1e3
    out["ref_long_l2_obj"] = float(0.5 * ((xl - ylong) ** 2).sum()
                                   + LAMLONG * np.linalg.norm(np.diff(xl)))
    xl = np.zeros_like(ylong)
    t0 = time.time()
    lib.GPFW_TVp(P(ylong), LAMLONG, P(xl), P(info), NLONG, 1.5, None)
    out["ref_long_lp_ms"] = (time.time() - t0) * 1e3
    out["ref_long_lp_obj"] = float(0.5 * ((xl - ylong) ** 2).sum()
                                   + LAMLONG * np.linalg.norm(np.diff(xl), 1.5))

    # ---- general-norm 2D (DR2_TV with p = 1.5 both dims, 512^2) ----
    Y5 = np.ascontiguousarray(rng.randn(M5, N5))
    Y5f = np.asfortranarray(Y5).ravel(order="F").copy()
    X5f = np.zeros_like(Y5f)
    t0 = time.time()
    lib.DR2_TV(M5, N5, P(Y5f), LAM2P, LAM2P, P2P, P2P, P(X5f), nthreads, 35,
               P(info))
    out["ref_2dp_mpx_s"] = M5 * N5 / 1e6 / (time.time() - t0)
    X5 = X5f.reshape(M5, N5, order="F")
    out["ref_2dp_obj"] = float(_obj_2dp(X5, Y5, LAM2P, P2P))
    return out


def _merge_best(old, new):
    """Per-row best-observed merge of two baseline measurements.

    This host's 4 vCPUs are noisy (observed 2.5x swings on the reference 2D
    row between runs); a slow, contaminated CPU baseline would *flatter* our
    ratios.  Keeping the fastest observed reference number per row makes the
    cached baseline monotone in the reference's favor."""
    out = dict(new)
    for k, v in (old or {}).items():
        if not isinstance(v, (int, float)) or out.get(k) is None:
            if k not in out:
                out[k] = v
            continue
        if k.endswith(("_signals_s", "_mpx_s")):
            out[k] = max(out[k], v)
        elif k.endswith("_ms"):
            out[k] = min(out[k], v)
    return out


def get_baseline():
    cached = None
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cached = json.load(f)
        if all(k in cached for k in BASE_KEYS):
            return cached
    base = measure_reference()
    if base is None:
        # conservative fallback from a previous measurement on this host
        base = {"ref_2d_mpx_s": 0.49, "ref_2d_obj": 416575.42,
                "ref_1d_signals_s": 31004.0, "ref_threads": 1}
        base.update({k: None for k in BASE_KEYS if k not in base})
    base = _merge_best(cached, base)
    with open(CACHE, "w") as f:
        json.dump(base, f)
    return base


# ---------------------------------------------------------------------------
# TPU measurements
# ---------------------------------------------------------------------------


def measure_tpu(base):
    import jax
    import jax.numpy as jnp

    from proxtv_tpu.models import tv2d
    from proxtv_tpu.ops import tv1d_l1

    rng = np.random.RandomState(0)
    Y = jnp.asarray(rng.randn(1, M, N).astype(np.float32))
    Yn = np.asarray(Y)[0]
    # Drawn here to keep the numpy stream aligned with measure_reference's
    # (same problem instances -> objectives comparable); measured below.
    Y4 = jnp.asarray(rng.randn(1, M4, N4).astype(np.float32))

    # The axon tunnel costs ~30 ms of fixed dispatch latency per timed block
    # (pipelined across calls; measured floor ~1.1 ms/call at 30 reps even
    # for a trivial elementwise op).  A local TPU host pays ~50 us for the
    # same sync, so amortizing it over 100 reps (<3% inflation on every
    # metric here) is the honest sustained-rate measurement.
    reps = 100
    # Per-row dispersion record (VERDICT r4 item 4): every labeled row
    # reports its per-batch times so BENCH artifacts carry error bars
    # instead of best-of-two scalars.
    dispersion = {}

    def timed(f, *args, n_reps=None, label=None, **kw):
        # Sub-5 ms rows pass n_reps=400: the axon tunnel's per-dispatch
        # overhead (measured 0.34-0.79 ms/call depending on pipeline depth
        # and day) would otherwise inflate them by tens of percent.
        # Median of >= 5 batches: the shared tunnel occasionally stalls for
        # seconds mid-run (observed a 90x outlier on one row); the median is
        # robust to <= 2 contaminated batches AND honest about sustained
        # rate (a best-of scalar hides run-to-run drift — the r2->r4
        # "9% flagship slide" turned out to be exactly that).
        n_reps = n_reps or reps
        n_batches = 5
        per = max(1, n_reps // n_batches)
        r = f(*args, **kw)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
        ts = []
        for _b in range(n_batches):
            t0 = time.time()
            for _i in range(per):
                r = f(*args, **kw)
            _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
            ts.append((time.time() - t0) / per)
        med = float(np.median(ts))
        if label:
            q1, q3 = np.percentile(ts, [25, 75])
            dispersion[label] = {
                "median_ms": round(med * 1e3, 4),
                "iqr_ms": [round(float(q1) * 1e3, 4),
                           round(float(q3) * 1e3, 4)],
                "batches": n_batches, "reps_per_batch": per}
        return med

    f2d = jax.jit(lambda Y: tv2d.tv1_2d_batched(
        Y, LAM, method="chambolle-pock-acc", max_iters=2500)[0])
    t_2d = timed(f2d, Y, label="2d_1024")
    Xn = np.asarray(f2d(Y))[0]
    obj_2d = (0.5 * np.sum((Xn - Yn) ** 2)
              + LAM * (np.abs(np.diff(Xn, axis=0)).sum()
                       + np.abs(np.diff(Xn, axis=1)).sum()))

    Y1 = jnp.asarray(rng.randn(B1, N1).astype(np.float32))
    f1d = jax.jit(lambda Y: tv1d_l1.tv1_batched(Y, LAM1, method="pn"))
    t_1d = timed(f1d, Y1, label="1d_batch")

    # Secondary BASELINE configs: weighted 1D, TV-L2, TV-Lp, weighted 2D,
    # 3D video (Yang), single huge 1D signal.
    from proxtv_tpu.models import tvnd
    from proxtv_tpu.ops import tv1d_l2, tv1d_lp

    # ---- 2D at 4K UHD (same fused engine; BASELINE.md's 4K row) ----
    f4k = jax.jit(lambda Y: tv2d.tv1_2d_batched(
        Y, LAM, method="chambolle-pock-acc", max_iters=2500)[0])
    t_2d4k = timed(f4k, Y4, label="2d_4k")
    X4n = np.asarray(f4k(Y4))[0]
    Y4n = np.asarray(Y4)[0]
    obj_2d4k = float(0.5 * np.sum((X4n - Y4n) ** 2)
                     + LAM * (np.abs(np.diff(X4n, axis=0)).sum()
                              + np.abs(np.diff(X4n, axis=1)).sum()))

    # Cross-chip banded fused driver at D=1 (SURVEY §5.8's mesh-spanning
    # path; on one chip the band is the whole image, so this measures the
    # banding machinery's overhead against the plain fused engine — the
    # multi-chip halo model is in docs/SCALING.md).
    t_band4k = None
    if jax.default_backend() == "tpu":
        from proxtv_tpu.parallel import sharded as psharded
        mesh1 = psharded.make_mesh(1)
        Y4s = Y4[0]

        def fband():
            return psharded.tv1_2d_banded(Y4s, LAM, mesh1)[0]

        t_band4k = timed(fband, label="2d_banded_4k")

    W1 = jnp.asarray((0.5 + rng.rand(B1, N1 - 1)).astype(np.float32))
    t_1dw = timed(jax.jit(lambda Y, W: tv1d_l1.tv1_batched(Y, W, method="pn")),
                  Y1, W1, label="1dw")
    t_l2 = timed(jax.jit(lambda Y: tv1d_l2.tv2_ms(Y, 1.0)[0]), Y1, label="l2")
    t_lp15 = timed(jax.jit(lambda Y: tv1d_lp.tvp_gpfw(Y, 0.7, 1.5)[0]),
                   Y1[:512], label="lp15")
    t_lp3 = timed(jax.jit(lambda Y: tv1d_lp.tvp_gpfw(Y, 0.7, 3.0)[0]),
                  Y1[:512], label="lp3")
    # p = 5 (q = 1.25) exercises the fused GPFW kernel's u-substitution
    # (q < 2) projection branch; the XLA nested-root-find fallback runs for
    # p outside ~[1.47, 9.3] and on CPU/f64 (covered by tests).
    t_lp5 = timed(jax.jit(lambda Y: tv1d_lp.tvp_gpfw(Y, 0.7, 5.0)[0]),
                  Y1[:512], label="lp5")

    # Weighted 2D and 3D: equal-objective mode (BASELINE.md contract — run to
    # the reference's achieved objective; the per-image duality-gap
    # certificate still applies as the stricter alternative stop).
    import functools

    from proxtv_tpu.utils.config import DEFAULT_COMBINER

    Wc2 = jnp.asarray((0.5 + rng.rand(1, M - 1, N)).astype(np.float32))
    Wr2 = jnp.asarray((0.5 + rng.rand(1, M, N - 1)).astype(np.float32))
    obj_2dw = None
    if jax.default_backend() == "tpu" and base.get("ref_2dw_obj"):
        tgt = jnp.asarray([base["ref_2dw_obj"]], jnp.float32)
        f2dw = jax.jit(functools.partial(
            tv2d._run_pdhg_fused, lam=0.0, cap=2500,
            tol=DEFAULT_COMBINER.stop, cfg=DEFAULT_COMBINER,
            variant="cp-acc"))
        with tv2d._fused_ctx(True):
            t_2dw = timed(f2dw, Y, W_col=Wc2, W_row=Wr2, obj_target=tgt,
                          label="2dw")
            Xw, _ = f2dw(Y, W_col=Wc2, W_row=Wr2, obj_target=tgt)
        Xwn, Wcn, Wrn = np.asarray(Xw)[0], np.asarray(Wc2)[0], np.asarray(Wr2)[0]
        obj_2dw = float(0.5 * np.sum((Xwn - Yn) ** 2)
                        + np.sum(Wcn * np.abs(np.diff(Xwn, axis=0)))
                        + np.sum(Wrn * np.abs(np.diff(Xwn, axis=1))))
    else:
        t_2dw = timed(jax.jit(lambda Y, Wc, Wr: tv2d.tv1w_2d_batched(
            Y, Wc, Wr, method="chambolle-pock-acc", max_iters=2500)[0]),
            Y, Wc2, Wr2)

    V = jnp.asarray(rng.randn(1, L3, M3, N3).astype(np.float32))
    obj_3d = None
    if jax.default_backend() == "tpu" and base.get("ref_3d_obj"):
        tgt3 = jnp.asarray([base["ref_3d_obj"]], jnp.float32)
        f3d = jax.jit(functools.partial(
            tvnd._run_pdhg3d_fused, lams_by_dim=(0.3, 0.3, 0.3), cap=2500,
            cfg=DEFAULT_COMBINER, variant="cp-acc"))
        t_3d = timed(f3d, V, obj_target=tgt3, label="3d")
        XV, _ = f3d(V, obj_target=tgt3)
        XVn, Vn = np.asarray(XV)[0], np.asarray(V)[0]
        obj_3d = float(0.5 * np.sum((XVn - Vn) ** 2)
                       + 0.3 * sum(np.abs(np.diff(XVn, axis=a)).sum()
                                   for a in range(3)))
    else:
        meth3d = ("chambolle-pock-acc" if jax.default_backend() == "tpu"
                  else "yang")
        t_3d = timed(jax.jit(lambda V: tvnd.tv_nd_batched(
            V, (0.3, 0.3, 0.3), (1, 2, 3), (1.0, 1.0, 1.0),
            method=meth3d, max_iters=2500)[0]), V)

    # Single huge 1D signal, TPU-resident path.
    from proxtv_tpu.ops import tv1d_long
    ylong = jnp.asarray((np.cumsum(rng.randn(NLONG)) * 0.05
                         + rng.randn(NLONG)).astype(np.float32))
    flong = jax.jit(lambda y: tv1d_long.tv1_long(y, LAM1)[0])
    t_long = timed(flong, ylong, n_reps=400, label="long1d")

    # Long single-signal TV-L2 / TV-Lp at the same n (certificate-stopped;
    # equal-objective checks against the reference run in main()).
    ylong2 = ylong[None]
    f_l2l = jax.jit(lambda Y: tv1d_l2.tv2_ms(Y, LAMLONG)[0])
    t_long_l2 = timed(f_l2l, ylong2, n_reps=400, label="long_l2")
    x_l2l = np.asarray(f_l2l(ylong2)[0], np.float64)
    yl64 = np.asarray(ylong, np.float64)
    obj_long_l2 = float(0.5 * ((x_l2l - yl64) ** 2).sum()
                        + LAMLONG * np.linalg.norm(np.diff(x_l2l)))
    f_lpl = jax.jit(lambda Y: tv1d_lp.tvp_gpfw(Y, LAMLONG, 1.5)[0])
    t_long_lp = timed(f_lpl, ylong2, label="long_lp")
    x_lpl = np.asarray(f_lpl(ylong2)[0], np.float64)
    obj_long_lp = float(0.5 * ((x_lpl - yl64) ** 2).sum()
                        + LAMLONG * np.linalg.norm(np.diff(x_lpl), 1.5))

    # Banded long-1D at n = 1e7: ONE signal through the mesh-spanning
    # machinery (D = 1 mesh on the single bench chip — measures the banded
    # window/halo/certificate path at 10x the single-device headline size;
    # the cross-device collective structure is validated on the virtual
    # mesh by tests/test_banded.py and the driver dryrun).
    t_long7 = None
    obj_long7 = None
    # Consume the stream draws unconditionally (alignment with
    # measure_reference); materialize the 1e7 signal only on TPU.
    _a7 = rng.randn(NLONG7)
    _b7 = rng.randn(NLONG7)
    if jax.default_backend() == "tpu":
        ylong7_np = (np.cumsum(_a7) * 0.05 + _b7).astype(np.float32)
        from proxtv_tpu.parallel import sharded as psharded
        mesh1 = psharded.make_mesh(1)
        ylong7 = jnp.asarray(ylong7_np)

        def fband7():
            return psharded.tv1_1d_banded(ylong7, LAM1, mesh1)[0]

        t_long7 = timed(fband7, label="long1d_1e7")
        x7 = np.asarray(fband7(), np.float64)
        y7 = np.asarray(ylong7_np, np.float64)
        obj_long7 = float(0.5 * ((x7 - y7) ** 2).sum()
                          + LAM1 * np.abs(np.diff(x7)).sum())
        del x7, y7, ylong7_np
    del _a7, _b7

    # Sustained rate on a stream of long signals: all SLONG signals' windows
    # run as ONE fused kernel batch (the TPU analog of one scan per core).
    Ylong = jnp.asarray((np.cumsum(rng.randn(SLONG, NLONG), axis=1) * 0.05
                         + rng.randn(SLONG, NLONG)).astype(np.float32))
    t_long_stream = timed(flong, Ylong, label="long1d_stream") / SLONG

    # General-norm 2D (tvp_2d, p = 1.5 both dims at 512^2; reference DR2_TV
    # with p args).  Run at the reference'"'"'s own 35-sweep default; the
    # equal-objective check in main() compares achieved objectives.
    Y5 = jnp.asarray(rng.randn(1, M5, N5).astype(np.float32))
    f2dp = jax.jit(lambda Y: tv2d.tvp_2d_batched(
        Y, LAM2P, LAM2P, P2P, P2P, max_iters=35)[0])
    t_2dp = timed(f2dp, Y5, label="2dp")
    X5n = np.asarray(f2dp(Y5), np.float64)[0]
    obj_2dp = float(_obj_2dp(X5n, np.asarray(Y5, np.float64)[0], LAM2P, P2P))

    return {
        "tpu_2d_mpx_s": M * N / 1e6 / t_2d,
        "tpu_2d_obj": float(obj_2d),
        "tpu_2d4k_mpx_s": M4 * N4 / 1e6 / t_2d4k,
        "tpu_2d4k_obj": obj_2d4k,
        "tpu_2d_banded4k_mpx_s": (M4 * N4 / 1e6 / t_band4k
                                  if t_band4k else None),
        "tpu_1d_signals_s": B1 / t_1d,
        "tpu_1dw_signals_s": B1 / t_1dw,
        "tpu_l2_signals_s": B1 / t_l2,
        "tpu_lp15_signals_s": 512 / t_lp15,
        "tpu_lp3_signals_s": 512 / t_lp3,
        "tpu_lp5_signals_s": 512 / t_lp5,
        "tpu_2dw_mpx_s": M * N / 1e6 / t_2dw,
        "tpu_2dw_obj": obj_2dw,
        "tpu_3d_mpx_s": L3 * M3 * N3 / 1e6 / t_3d,
        "tpu_3d_obj": obj_3d,
        "tpu_2dp_mpx_s": M5 * N5 / 1e6 / t_2dp,
        "tpu_2dp_obj": obj_2dp,
        "tpu_long1d_ms": t_long * 1e3,
        "tpu_long1d_1e7_ms": t_long7 * 1e3 if t_long7 else None,
        "tpu_long1d_1e7_obj": obj_long7,
        "tpu_long1d_stream_ms": t_long_stream * 1e3,
        "tpu_long_l2_ms": t_long_l2 * 1e3,
        "tpu_long_l2_obj": obj_long_l2,
        "tpu_long_lp_ms": t_long_lp * 1e3,
        "tpu_long_lp_obj": obj_long_lp,
        "dispersion": dispersion,
    }


def _ratio(a, b):
    if a is None or b is None or not b:
        return None
    return round(a / b, 2)


def run_parity(round_tag="r05"):
    """Regenerate PARITY_run.json (VERDICT r2 item 7): differential checks
    vs the reference C library, run as a CPU subprocess so the random
    per-trial shapes don't trigger an axon AOT compile storm.

    Returns (ok, detail): ok is True/False for a completed run, None only
    when the run could not execute — and then ``detail`` says WHY (the
    failure is recorded in the bench JSON rather than swallowed, VERDICT r3
    item 5).  A completed run also writes a small committed-per-round
    summary ``PARITY_<round_tag>.json`` (n_checks, n_failed, per-family
    maxima — the full per-check artifact stays in the gitignored
    PARITY_run.json)."""
    # Pre-build the reference library OUTSIDE the subprocess timeout: the
    # r3 driver run timed out compiling 9.5 kLoC of C++ inside the parity
    # budget and silently yielded parity_ok: null.
    lib = _build_reference()
    if lib is None:
        return None, "reference library build failed (see stderr log)"
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_ENABLE_X64="1")
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools",
                                          "parity_vs_reference.py")],
            env=env, capture_output=True, text=True, timeout=1800)
        log(r.stdout[-2000:], r.stderr[-2000:])
        if r.returncode not in (0, 1):
            return None, (f"parity subprocess crashed rc={r.returncode}: "
                          + r.stderr[-300:].replace("\n", " "))
    except subprocess.TimeoutExpired:
        return None, "parity subprocess timed out (1800 s)"
    except Exception as e:  # noqa: BLE001
        return None, f"parity subprocess failed to launch: {e}"
    try:
        with open(os.path.join(REPO, "PARITY_run.json")) as f:
            full = json.load(f)
        summary = {k: full[k] for k in ("passed", "n_checks", "n_failed",
                                        "max_deviation_by_family")}
        with open(os.path.join(REPO, f"PARITY_{round_tag}.json"), "w") as f:
            json.dump(summary, f, indent=1)
    except Exception as e:  # noqa: BLE001
        return r.returncode == 0, f"summary write failed: {e}"
    return r.returncode == 0, (f"{summary['n_checks']} checks, "
                               f"{summary['n_failed']} failed")


def main():
    base = get_baseline()
    parity_ok, parity_detail = run_parity()
    ours = measure_tpu(base)
    log("baseline:", base)
    log("ours:", ours)
    # Equal-quality guard: our objective must not exceed the reference's
    # (both solve the same problem instance; lower = better converged).
    obj_ok = ours["tpu_2d_obj"] <= base["ref_2d_obj"] * (1 + 1e-4)
    log("objective check (ours <= ref):", obj_ok,
        ours["tpu_2d_obj"], "vs", base["ref_2d_obj"])
    vs = ours["tpu_2d_mpx_s"] / base["ref_2d_mpx_s"]
    long_ms = ours.get("tpu_long1d_ms")
    print(json.dumps({
        "metric": "tv1_2d_denoise_1024px",
        "value": round(ours["tpu_2d_mpx_s"], 3),
        "unit": "Mpx/s",
        "vs_baseline": round(vs, 2),
        "extra": {
            "tpu_2d_4k_mpx_s": round(ours["tpu_2d4k_mpx_s"], 2),
            "vs_baseline_2d4k": _ratio(ours["tpu_2d4k_mpx_s"],
                                       base.get("ref_2d4k_mpx_s")),
            "objective_4k_ok": (None if not base.get("ref_2d4k_obj") else
                                bool(ours["tpu_2d4k_obj"] <=
                                     base["ref_2d4k_obj"] * (1 + 1e-4))),
            "tpu_2d_banded4k_mpx_s": (
                round(ours["tpu_2d_banded4k_mpx_s"], 2)
                if ours.get("tpu_2d_banded4k_mpx_s") else None),
            "tpu_1d_signals_s": round(ours["tpu_1d_signals_s"]),
            "ref_1d_signals_s": round(base["ref_1d_signals_s"]),
            "ref_1d_pool_signals_s": round(base.get("ref_1d_pool_signals_s")
                                           or 0),
            "ref_1d_batch_signals_s": round(base["ref_1d_batch_signals_s"] or 0),
            # vs_baseline_1d: the BASELINE.md contract — the reference's own
            # scan on all cores.  vs_native_host_1d: our (stronger) hand-
            # written OpenMP batch engine, kept as the harder yardstick.
            "vs_baseline_1d": _ratio(ours["tpu_1d_signals_s"],
                                     base.get("ref_1d_pool_signals_s")
                                     or base["ref_1d_batch_signals_s"]),
            "vs_native_host_1d": _ratio(ours["tpu_1d_signals_s"],
                                        base["ref_1d_batch_signals_s"]),
            "tpu_1d_weighted_signals_s": round(ours["tpu_1dw_signals_s"]),
            "vs_baseline_1dw": _ratio(ours["tpu_1dw_signals_s"],
                                      base["ref_1dw_signals_s"]),
            "tpu_tvl2_signals_s": round(ours["tpu_l2_signals_s"]),
            "vs_baseline_l2": _ratio(ours["tpu_l2_signals_s"],
                                     base["ref_l2_signals_s"]),
            "tpu_tvlp_p1.5_signals_s": round(ours["tpu_lp15_signals_s"]),
            "vs_baseline_lp1.5": _ratio(ours["tpu_lp15_signals_s"],
                                        base["ref_lp15_signals_s"]),
            "tpu_tvlp_p3_signals_s": round(ours["tpu_lp3_signals_s"]),
            "vs_baseline_lp3": _ratio(ours["tpu_lp3_signals_s"],
                                      base["ref_lp3_signals_s"]),
            "tpu_tvlp_p5_signals_s": round(ours["tpu_lp5_signals_s"]),
            "vs_baseline_lp5": _ratio(ours["tpu_lp5_signals_s"],
                                      base.get("ref_lp5_signals_s")),
            "tpu_2d_weighted_mpx_s": round(ours["tpu_2dw_mpx_s"], 2),
            "vs_baseline_2dw": _ratio(ours["tpu_2dw_mpx_s"],
                                      base["ref_2dw_mpx_s"]),
            "objective_2dw_ok": (None if ours["tpu_2dw_obj"] is None else
                                 bool(ours["tpu_2dw_obj"] <=
                                      base["ref_2dw_obj"] * (1 + 1e-4))),
            "tpu_3d_yang_mpx_s": round(ours["tpu_3d_mpx_s"], 2),
            "vs_baseline_3d": _ratio(ours["tpu_3d_mpx_s"],
                                     base["ref_3d_mpx_s"]),
            "objective_3d_ok": (None if ours["tpu_3d_obj"] is None else
                                bool(ours["tpu_3d_obj"] <=
                                     base["ref_3d_obj"] * (1 + 1e-4))),
            "tpu_2dp_mpx_s": round(ours["tpu_2dp_mpx_s"], 2),
            "vs_baseline_2dp": _ratio(ours["tpu_2dp_mpx_s"],
                                      base.get("ref_2dp_mpx_s")),
            "objective_2dp_ok": (None if not base.get("ref_2dp_obj") else
                                 bool(ours["tpu_2dp_obj"] <=
                                      base["ref_2dp_obj"] * (1 + 1e-4))),
            "tpu_long1d_ms": round(long_ms, 2) if long_ms else None,
            "ref_long1d_ms": (round(base["ref_long1d_ms"], 2)
                              if base.get("ref_long1d_ms") else None),
            "vs_baseline_long1d": _ratio(base.get("ref_long1d_ms"), long_ms),
            "tpu_long1d_1e7_banded_ms": (
                round(ours["tpu_long1d_1e7_ms"], 2)
                if ours.get("tpu_long1d_1e7_ms") else None),
            "vs_baseline_long1d_1e7": _ratio(base.get("ref_long1d_1e7_ms"),
                                             ours.get("tpu_long1d_1e7_ms")),
            "objective_long1d_1e7_ok": (
                None if (ours.get("tpu_long1d_1e7_obj") is None
                         or not base.get("ref_long1d_1e7_obj"))
                else bool(ours["tpu_long1d_1e7_obj"] <=
                          base["ref_long1d_1e7_obj"] * (1 + 1e-4))),
            "tpu_long1d_stream_ms": round(ours["tpu_long1d_stream_ms"], 2),
            "ref_long1d_stream_ms": (round(base["ref_long1d_stream_ms"], 2)
                                     if base.get("ref_long1d_stream_ms")
                                     else None),
            "vs_baseline_long1d_stream": _ratio(
                base.get("ref_long1d_stream_ms"),
                ours["tpu_long1d_stream_ms"]),
            "tpu_long_l2_ms": round(ours["tpu_long_l2_ms"], 2),
            "vs_baseline_long_l2": _ratio(base.get("ref_long_l2_ms"),
                                          ours["tpu_long_l2_ms"]),
            "objective_long_l2_ok": (None if not base.get("ref_long_l2_obj")
                                     else bool(ours["tpu_long_l2_obj"] <=
                                               base["ref_long_l2_obj"]
                                               * (1 + 1e-4))),
            "tpu_long_lp_ms": round(ours["tpu_long_lp_ms"], 2),
            "vs_baseline_long_lp": _ratio(base.get("ref_long_lp_ms"),
                                          ours["tpu_long_lp_ms"]),
            "objective_long_lp_ok": (None if not base.get("ref_long_lp_obj")
                                     else bool(ours["tpu_long_lp_obj"] <=
                                               base["ref_long_lp_obj"]
                                               * (1 + 1e-4))),
            "objective_ok": bool(obj_ok),
            "parity_ok": parity_ok,
            "parity_detail": parity_detail,
        },
    }))


if __name__ == "__main__":
    main()
