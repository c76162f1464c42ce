"""Demo: 2D grayscale image denoising with anisotropic TV-L1.

Mirrors the reference demo (prox_tv/demos/demo_filter_image.py), using a
synthetic piecewise-constant image (no asset files needed on a TPU host).
"""
import numpy as np

import proxtv_tpu as ptv


def make_image(n=256):
    img = np.zeros((n, n))
    img[: n // 2, :] = 1.0
    img[:, 2 * n // 3:] += 2.0
    img[n // 4: n // 2, n // 8: n // 4] = 3.0
    return img


def main():
    rng = np.random.RandomState(2)
    truth = make_image()
    noisy = truth + 0.4 * rng.randn(*truth.shape)
    for method in ["dr", "kolmogorov", "chambolle-pock-acc"]:
        den = ptv.tv1_2d(noisy, 0.6, method=method)
        print("%-20s MSE %.4f -> %.4f" % (
            method, np.mean((noisy - truth) ** 2), np.mean((den - truth) ** 2)))


if __name__ == "__main__":
    main()
