"""Generate the committed demo image assets (deterministic).

The reference ships real-image demo assets (prox_tv/demos/QRbig.png,
colors.png — demo_filter_image.py:12-20).  We generate equivalents from
scratch rather than copying the reference's binaries:

* ``qr.png``    — a QR-style blocky binary image (finder squares + random
                  modules): the archetypal piecewise-constant target TV-L1
                  is designed for.
* ``colors.png``— an RGB test card of smooth gradients and flat geometric
                  patches: exercises the color (3D / tvgen) demo's channel
                  coupling.

Run: python tools/make_demo_assets.py   (writes proxtv_tpu/demos/assets/)
"""
import os

import numpy as np
from PIL import Image

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "proxtv_tpu", "demos", "assets")


def make_qr(modules=58, scale=8, seed=7):
    """QR-style binary pattern: 3 finder patterns + timing rows + random
    payload modules, upscaled to blocky pixels."""
    rng = np.random.RandomState(seed)
    m = (rng.rand(modules, modules) < 0.45).astype(np.uint8)

    def finder(a, r, c):
        a[r:r + 7, c:c + 7] = 1
        a[r + 1:r + 6, c + 1:c + 6] = 0
        a[r + 2:r + 5, c + 2:c + 5] = 1

    finder(m, 0, 0)
    finder(m, 0, modules - 7)
    finder(m, modules - 7, 0)
    m[7, :8] = m[:8, 7] = 0
    m[6, 8:modules - 8] = np.arange(modules - 16) % 2  # timing pattern
    m[8:modules - 8, 6] = np.arange(modules - 16) % 2
    img = np.kron(1 - m, np.ones((scale, scale), np.uint8)) * 255
    return Image.fromarray(img, mode="L")


def make_colors(h=320, w=480):
    """RGB test card: hue gradient bands + flat color patches + a gray ramp."""
    img = np.zeros((h, w, 3), np.float64)
    yy = np.linspace(0, 1, h)[:, None]
    xx = np.linspace(0, 1, w)[None, :]
    img[..., 0] = 0.5 + 0.5 * np.sin(2 * np.pi * (xx + 0.0 * yy))
    img[..., 1] = 0.5 + 0.5 * np.sin(2 * np.pi * (0.5 * xx + 0.7 * yy + 0.3))
    img[..., 2] = 0.5 + 0.5 * np.cos(2 * np.pi * (0.8 * yy))
    # flat patches (piecewise-constant content for the TV prior)
    patches = [((20, 20), (120, 140), (0.9, 0.1, 0.1)),
               ((40, 300), (140, 440), (0.1, 0.8, 0.2)),
               ((180, 80), (290, 220), (0.15, 0.25, 0.9)),
               ((200, 320), (280, 460), (0.95, 0.85, 0.1))]
    for (r0, c0), (r1, c1), rgb in patches:
        img[r0:r1, c0:c1] = rgb
    img[h - 40:, :, :] = np.repeat(xx, 3, axis=0).T.reshape(1, w, 3)[:, :, :]
    return Image.fromarray((img * 255).clip(0, 255).astype(np.uint8), "RGB")


def main():
    os.makedirs(OUT, exist_ok=True)
    make_qr().save(os.path.join(OUT, "qr.png"), optimize=True)
    make_colors().save(os.path.join(OUT, "colors.png"), optimize=True)
    for f in ("qr.png", "colors.png"):
        p = os.path.join(OUT, f)
        print(f, os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
