"""Demo: color (3D) image denoising via the generalized TV prox.

Mirrors the reference demo (prox_tv/demos/demo_filter_image_color.py):
penalize the two spatial dimensions with TV-L1, and optionally couple the
color channels with an L2 penalty on the channel dimension.
"""
import numpy as np

import proxtv_tpu as ptv


def main():
    rng = np.random.RandomState(3)
    n = 96
    truth = np.zeros((n, n, 3))
    truth[: n // 2, :, 0] = 1.0
    truth[:, n // 3:, 1] = 0.8
    truth[n // 4:, : n // 2, 2] = 0.6
    noisy = truth + 0.25 * rng.randn(*truth.shape)

    # Spatial TV only (each channel independent).
    den = ptv.tvgen(noisy, [0.3, 0.3], [1, 2], [1, 1])
    print("spatial TV      : MSE %.4f -> %.4f" % (
        np.mean((noisy - truth) ** 2), np.mean((den - truth) ** 2)))

    # Spatial TV + L2 coupling across color channels.
    den2 = ptv.tvgen(noisy, [0.3, 0.3, 0.02], [1, 2, 3], [1, 1, 2])
    print("spatial+color TV: MSE %.4f -> %.4f" % (
        np.mean((noisy - truth) ** 2), np.mean((den2 - truth) ** 2)))


if __name__ == "__main__":
    main()
