"""Roofline round 3: in-situ per-chunk cost via driver cap sweeps.

The standalone pdhg_chunk loop measurement (roofline2) disagrees with the
end-to-end solve by ~4x, so measure the chunk cost where it actually runs:
time _run_pdhg_fused(gap_tol=0) at several iteration caps and take the slope.
Each 24-iteration block = cpc chunks + 1 certificate.  Sweeping k via a
pdhg2d_params monkeypatch gives the in-situ k comparison.
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from proxtv_tpu.models import tv2d  # noqa: E402
from proxtv_tpu.ops.kernels import gating  # noqa: E402
from proxtv_tpu.utils.config import DEFAULT_COMBINER  # noqa: E402


def timed(f, *args, n_reps=40, **kw):
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


def sweep(Y, k_tm, caps=(96, 480)):
    orig = tv2d._pdhg_fused_params
    try:
        if k_tm is not None:
            tv2d._pdhg_fused_params = lambda N, weighted=False: k_tm
        res = {}
        for cap in caps:
            f = jax.jit(functools.partial(
                tv2d._run_pdhg_fused, lam=0.3, cap=cap,
                tol=DEFAULT_COMBINER.stop, cfg=DEFAULT_COMBINER,
                variant="cp-acc", gap_tol=0.0))
            res[cap] = timed(f, Y) * 1e3
        caps_l = sorted(res)
        lo, hi = caps_l[0], caps_l[-1]
        res["us_per_iter_slope"] = (res[hi] - res[lo]) / (hi - lo) * 1e3
        return res
    finally:
        tv2d._pdhg_fused_params = orig


def main():
    rng = np.random.RandomState(0)
    Y = jnp.asarray(rng.randn(1, 1024, 1024).astype(np.float32))
    out = {}

    def rep(k, v):
        out[k] = v
        print(k, v, file=sys.stderr, flush=True)

    rep("k12_default", sweep(Y, None))
    rep("k16", sweep(Y, (16, 152)))
    rep("k20", sweep(Y, (20, 136)))
    rep("k24", sweep(Y, (24, 120)))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
