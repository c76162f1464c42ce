"""Differential parity harness: proxtv_tpu vs the reference C library.

Compiles the reference (albarji/proxTV) from /root/reference into /tmp, then
compares solutions across the API surface on random instances — the strongest
form of the reference's own cross-method test strategy.  Acceptance follows
the reference contract: elementwise atol 1e-3 OR our objective <= theirs
(both solvers stop at their own tolerances; lower objective = at least as
converged).

Run: python tools/parity_vs_reference.py [--out PARITY_run.json]

Writes a machine-readable artifact (default ``PARITY_run.json`` at the repo
root) with every check's name, max elementwise deviation and objective pair,
so each round's parity claim is auditable after the fact (VERDICT r2 item 7).
``bench.py`` regenerates it on every bench run (CPU subprocess — the random
per-trial shapes would trigger a remote AOT compile storm on the axon TPU).
"""
import argparse
import ctypes
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LIB = "/tmp/proxtv_ref_bench/libproxtv_ref.so"


def build():
    if os.path.exists(LIB):
        return True
    os.makedirs(os.path.dirname(LIB), exist_ok=True)
    if not os.path.isdir("/root/reference/src"):
        return False
    cmd = (f"g++ -O3 -fopenmp -DNOMATLAB=1 -shared -fPIC "
           f"/root/reference/src/*.cpp -o {LIB} "
           f"-l:liblapack.so.3 -l:libblas.so.3")
    subprocess.run(cmd, shell=True, check=True, capture_output=True)
    return True


def main(out_path=None):
    if not build():
        print("reference sources unavailable; nothing to compare")
        return 0
    # Force CPU f64 the way tests/conftest.py does: a JAX_PLATFORMS=cpu env
    # var alone does NOT stick when the axon TPU plugin is preset (the first
    # JAX-path check would fire a remote AOT compile per random shape and
    # die on any tunnel hiccup — seen live in round 5).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import proxtv_tpu as ptv

    lib = ctypes.CDLL(LIB)
    pd = ctypes.POINTER(ctypes.c_double)
    lib.hybridTautString_TV1.restype = None
    lib.hybridTautString_TV1.argtypes = [pd, ctypes.c_int, ctypes.c_double, pd]
    lib.TV1D_denoise.restype = None
    lib.TV1D_denoise.argtypes = [pd, pd, ctypes.c_int, ctypes.c_double]
    lib.classicTautString_TV1.restype = ctypes.c_int
    lib.classicTautString_TV1.argtypes = [pd, ctypes.c_int, ctypes.c_double,
                                          pd]
    lib.tautString_TV1_Weighted.restype = ctypes.c_int
    lib.tautString_TV1_Weighted.argtypes = [pd, pd, pd, ctypes.c_int]
    lib.morePG_TV2.restype = ctypes.c_int
    lib.morePG_TV2.argtypes = [pd, ctypes.c_double, pd, pd, ctypes.c_int, pd,
                               ctypes.c_void_p]
    lib.GPFW_TVp.restype = ctypes.c_int
    lib.GPFW_TVp.argtypes = [pd, ctypes.c_double, pd, pd, ctypes.c_int,
                             ctypes.c_double, ctypes.c_void_p]
    lib.DR2_TV.restype = ctypes.c_int
    lib.DR2_TV.argtypes = [ctypes.c_size_t, ctypes.c_size_t, pd,
                           ctypes.c_double, ctypes.c_double, ctypes.c_double,
                           ctypes.c_double, pd, ctypes.c_int, ctypes.c_int, pd]

    rng = np.random.RandomState(123)
    fails = 0
    records = []

    def report(name, ok, detail="", **extra):
        nonlocal fails
        print(("PASS " if ok else "FAIL ") + name + (" " + detail if detail else ""),
              flush=True)
        fails += 0 if ok else 1
        records.append({"name": name, "ok": bool(ok), "detail": detail,
                        **{k: (float(v) if isinstance(v, (int, float)) else v)
                           for k, v in extra.items()}})

    def obj1(x, y, lam):
        return 0.5 * np.sum((x - y) ** 2) + lam * np.abs(np.diff(x)).sum()

    # --- 1D TV-L1, every method ---
    for trial in range(3):
        n = int(rng.randint(20, 200))
        y = rng.randn(n) * 2
        lam = float(rng.rand() + 0.1)
        xr = np.zeros(n)
        lib.hybridTautString_TV1(y.ctypes.data_as(pd), n, lam,
                                 xr.ctypes.data_as(pd))
        for m in ["hybridtautstring", "pn", "dp", "condat"]:
            xo = np.asarray(ptv.tv1_1d(y, lam, method=m))
            ok = (np.abs(xo - xr).max() < 1e-3
                  or obj1(xo, y, lam) <= obj1(xr, y, lam) + 1e-6)
            report(f"tv1_1d[{m}] n={n}", ok,
                   f"maxdiff={np.abs(xo-xr).max():.2e}",
                   maxdiff=np.abs(xo - xr).max(), obj_ours=obj1(xo, y, lam),
                   obj_ref=obj1(xr, y, lam))
        # Engine-vs-engine: our lock-step Condat dual-variable scan against
        # the reference's own TV1D_denoise (the vendored Condat code,
        # src/condat_fast_tv.cpp:78) — same algorithm family on both sides.
        xc = np.zeros(n)
        lib.TV1D_denoise(y.ctypes.data_as(pd), xc.ctypes.data_as(pd), n, lam)
        from proxtv_tpu.ops import tv1d_l1
        xoc = np.asarray(tv1d_l1.tv1_condat(y[None], lam))[0]
        report(f"tv1_condat_vs_TV1D_denoise n={n}",
               np.abs(xoc - xc).max() < 1e-3,
               f"maxdiff={np.abs(xoc-xc).max():.2e}",
               maxdiff=np.abs(xoc - xc).max())
        # Engine-vs-engine: our lock-step classic hull-merge taut string
        # against the reference's own classicTautString_TV1
        # (src/TVL1opt_tautstring.cpp:256) — same algorithm on both sides.
        xct = np.zeros(n)
        lib.classicTautString_TV1(y.ctypes.data_as(pd), n, lam,
                                  xct.ctypes.data_as(pd))
        xoct = np.asarray(tv1d_l1.tv1_classic_ts(y[None], lam))[0]
        report(f"tv1_classic_ts_vs_classicTautString n={n}",
               np.abs(xoct - xct).max() < 1e-3,
               f"maxdiff={np.abs(xoct-xct).max():.2e}",
               maxdiff=np.abs(xoct - xct).max())

    # --- weighted 1D ---
    for trial in range(2):
        n = int(rng.randint(10, 100))
        y = rng.randn(n) * 2
        w = rng.rand(n - 1) * 1.5
        xr = np.zeros(n)
        lib.tautString_TV1_Weighted(y.ctypes.data_as(pd),
                                    w.ctypes.data_as(pd),
                                    xr.ctypes.data_as(pd), n)
        xo = np.asarray(ptv.tv1w_1d(y, w))
        report(f"tv1w_1d n={n}", np.abs(xo - xr).max() < 1e-3,
               f"maxdiff={np.abs(xo-xr).max():.2e}",
               maxdiff=np.abs(xo - xr).max())

    # --- TV-L2 ---
    for trial in range(2):
        n = int(rng.randint(10, 80))
        y = rng.randn(n) * 2
        lam = float(rng.rand() + 0.3)
        xr = np.zeros(n)
        info = np.zeros(3)
        lib.morePG_TV2(y.ctypes.data_as(pd), lam, xr.ctypes.data_as(pd),
                       info.ctypes.data_as(pd), n, None, None)
        xo = np.asarray(ptv.tv2_1d(y, lam))
        report(f"tv2_1d n={n}", np.abs(xo - xr).max() < 2e-3,
               f"maxdiff={np.abs(xo-xr).max():.2e}",
               maxdiff=np.abs(xo - xr).max())

    # --- TV-Lp ---
    for p in [1.5, 3.0]:
        n = 60
        y = rng.randn(n) * 2
        lam = 0.7
        xr = np.zeros(n)
        info = np.zeros(3)
        lib.GPFW_TVp(y.ctypes.data_as(pd), lam, xr.ctypes.data_as(pd),
                     info.ctypes.data_as(pd), n, p, None)
        xo = np.asarray(ptv.tvp_1d(y, lam, p))

        def objp(x):
            return 0.5 * np.sum((x - y) ** 2) + lam * np.linalg.norm(np.diff(x), p)

        ok = np.abs(xo - xr).max() < 2e-3 or objp(xo) <= objp(xr) + 1e-6
        report(f"tvp_1d p={p}", ok, f"maxdiff={np.abs(xo-xr).max():.2e}",
               maxdiff=np.abs(xo - xr).max(), obj_ours=objp(xo),
               obj_ref=objp(xr))

    # --- 2D (reference runs in Fortran order; transpose for comparison) ---
    for trial in range(2):
        M, N = int(rng.randint(20, 60)), int(rng.randint(20, 60))
        Y = rng.randn(M, N)
        lam = 0.4
        Yf = np.asfortranarray(Y).ravel(order="F").copy()
        Xr = np.zeros(M * N)
        info = np.zeros(3)
        lib.DR2_TV(M, N, Yf.ctypes.data_as(pd), lam, lam, 1.0, 1.0,
                   Xr.ctypes.data_as(pd), 2, 35, info.ctypes.data_as(pd))
        Xr = Xr.reshape(M, N, order="F")
        Xo = np.asarray(ptv.tv1_2d(Y, lam))

        def obj2(X):
            return (0.5 * np.sum((X - Y) ** 2)
                    + lam * (np.abs(np.diff(X, axis=0)).sum()
                             + np.abs(np.diff(X, axis=1)).sum()))

        ok = np.abs(Xo - Xr).max() < 1e-3 or obj2(Xo) <= obj2(Xr) + 1e-6
        report(f"tv1_2d {M}x{N}", ok,
               f"maxdiff={np.abs(Xo-Xr).max():.2e} "
               f"obj(ours)={obj2(Xo):.4f} obj(ref)={obj2(Xr):.4f}",
               maxdiff=np.abs(Xo - Xr).max(), obj_ours=obj2(Xo),
               obj_ref=obj2(Xr))

    print(("ALL PARITY CHECKS PASSED" if fails == 0
           else f"{fails} PARITY CHECKS FAILED"), flush=True)
    if out_path:
        families = {}
        for r in records:
            fam = r["name"].split("[")[0].split(" ")[0]
            d = r.get("maxdiff")
            if d is not None:
                families[fam] = max(families.get(fam, 0.0), d)
        with open(out_path, "w") as f:
            json.dump({"passed": fails == 0, "n_checks": len(records),
                       "n_failed": fails,
                       "max_deviation_by_family": families,
                       "checks": records}, f, indent=1)
        print(f"wrote {out_path}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_run.json"))
    sys.exit(main(ap.parse_args().out))
