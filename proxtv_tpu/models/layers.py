"""Differentiable TV-prox layers (flax.linen modules).

The reference is a solver library; on TPU the natural extension is proxes as
*layers* inside gradient-trained models (plug-and-play denoisers, unrolled
optimization, learned regularization strength).  Built on the exact
generalized-Jacobian VJPs of :mod:`proxtv_tpu.ops.diffprox`.

Example::

    layer = TVDenoise1D()
    params = layer.init(key, y)            # lam is a learnable parameter
    x = layer.apply(params, y)             # denoised signal, differentiable
"""
from __future__ import annotations

import jax.numpy as jnp

try:
    import flax.linen as nn
except Exception:  # pragma: no cover - flax should be present in the image
    nn = None

from ..ops import diffprox

if nn is not None:

    class TVDenoise1D(nn.Module):
        """1D TV-L1 prox layer with a learnable penalty.

        Input (B, n); the penalty is ``softplus(raw_lam)`` to stay positive.
        Gradients flow to both the input and the penalty (exact generalized
        Jacobians — segment averaging / jump-sign sensitivity).
        """

        init_lam: float = 0.1
        method: str = "pn"

        @nn.compact
        def __call__(self, y):
            raw = self.param(
                "raw_lam",
                lambda _: jnp.asarray(_softplus_inv(self.init_lam), y.dtype))
            lam = nn.softplus(raw)
            return diffprox.tv1_prox(y, lam, self.method)

    class TVDenoise2D(nn.Module):
        """2D anisotropic TV-L1 prox layer with a learnable penalty.

        Input (B, M, N).  The penalty gradient is not available through the 2D
        VJP (see diffprox.tv2d_prox); wrap in jax.lax.stop_gradient-free outer
        finite differences for 2D hyperparameter tuning, or treat lam as a
        buffer.  Input gradients are exact (flat-component averaging).
        """

        init_lam: float = 0.1
        method: str = "dr"
        max_iters: int = 0

        @nn.compact
        def __call__(self, y):
            raw = self.param(
                "raw_lam",
                lambda _: jnp.asarray(_softplus_inv(self.init_lam), y.dtype))
            lam = nn.softplus(raw)
            return diffprox.tv2d_prox(y, lam, self.method, self.max_iters)


def _softplus_inv(v: float) -> float:
    import math

    return math.log(math.expm1(max(v, 1e-6)))
