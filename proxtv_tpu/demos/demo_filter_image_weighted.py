"""Demo: spatially-varying weighted 2D TV denoising.

Mirrors the reference demo (prox_tv/demos/demo_filter_image_weighted.py):
weight fields that smooth one region strongly while preserving another.
"""
import numpy as np

import proxtv_tpu as ptv


def main():
    rng = np.random.RandomState(5)
    n = 128
    truth = np.kron(rng.rand(4, 4), np.ones((n // 4, n // 4)))
    noisy = truth + 0.2 * rng.randn(n, n)

    # Strong smoothing on the left half, weak on the right.
    W_col = np.full((n - 1, n), 0.05)
    W_row = np.full((n, n - 1), 0.05)
    W_col[:, : n // 2] = 0.5
    W_row[: , : n // 2 - 1] = 0.5

    den = ptv.tv1w_2d(noisy, W_col, W_row)
    left = np.mean((den[:, : n // 2] - truth[:, : n // 2]) ** 2)
    right = np.mean((den[:, n // 2:] - truth[:, n // 2:]) ** 2)
    print("weighted 2D: MSE left(smoothed) %.4f, right(preserved) %.4f" % (
        left, right))
    print("noisy      : MSE %.4f" % np.mean((noisy - truth) ** 2))


if __name__ == "__main__":
    main()
