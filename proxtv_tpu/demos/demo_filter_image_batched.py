"""Demo: batched image denoising — the TPU replacement for the reference's
thread-scaling demo (prox_tv/demos/demo_filter_image_threads.py).

The reference sweeps 1-8 OpenMP threads on one image; on TPU the native
scaling axis is the *batch*: many images (or fibers) denoised concurrently by
one jitted call.  Prints throughput vs batch size.
"""
import time

import numpy as np

import jax.numpy as jnp

from proxtv_tpu.models import tv2d


def main():
    rng = np.random.RandomState(4)
    n = 256
    for B in [1, 4, 16]:
        Y = jnp.asarray(rng.randn(B, n, n).astype(np.float32))
        X, info = tv2d.tv1_2d_batched(Y, 0.4, method="kolmogorov")
        np.asarray(X.ravel()[:1])  # compile
        t0 = time.time()
        X, info = tv2d.tv1_2d_batched(Y, 0.4, method="kolmogorov")
        np.asarray(X.ravel()[:1])
        dt = time.time() - t0
        print("B=%-3d %6.1f ms  %8.2f Mpx/s" % (B, dt * 1e3, B * n * n / 1e6 / dt))


if __name__ == "__main__":
    main()
