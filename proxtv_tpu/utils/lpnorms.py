"""Stabilized Lp-norm primitives (reference ``src/LPopt.cpp:43-76`` semantics).

The reference clamps the norm degree: values of p below ``LPPROJ_PSMALL = 1.002``
are treated as L1 and values above ``LPPROJ_PLARGE = 100`` as Linf
(``src/LPopt.h:33-36``), and the general case is computed in max-normalized form
``norm(x, p) = norm(x, inf) * (sum_i |x_i / norm(x, inf)|^p)^(1/p)`` for stability.
"""
from __future__ import annotations

import jax.numpy as jnp

P_SMALL = 1.002
P_LARGE = 100.0


def dual_exponent(p):
    """Holder conjugate q = 1 / (1 - 1/p)."""
    p = jnp.asarray(p, jnp.float64) if jnp.asarray(p).dtype == jnp.float64 else jnp.asarray(p)
    return 1.0 / (1.0 - 1.0 / p)


def lp_norm(x, p, axis=-1):
    """Stabilized Lp norm along ``axis``.

    ``p`` may be a Python float (static) or a traced scalar.  Follows the
    reference's clamping rules: p <= 1.002 -> L1, p >= 100 -> Linf.
    """
    l1 = jnp.sum(jnp.abs(x), axis=axis)
    c = jnp.max(jnp.abs(x), axis=axis)
    if isinstance(p, (int, float)):
        if p <= P_SMALL:
            return l1
        if p >= P_LARGE:
            return c
        safe_c = jnp.where(c == 0, 1.0, c)
        s = jnp.sum(jnp.abs(x / jnp.expand_dims(safe_c, axis)) ** p, axis=axis)
        return jnp.where(c == 0, 0.0, c * s ** (1.0 / p))
    # Traced p: compute all three branches and select.
    p = jnp.asarray(p, x.dtype)
    safe_c = jnp.where(c == 0, 1.0, c)
    s = jnp.sum(jnp.abs(x / jnp.expand_dims(safe_c, axis)) ** p, axis=axis)
    gen = jnp.where(c == 0, 0.0, c * s ** (1.0 / p))
    return jnp.where(p <= P_SMALL, l1, jnp.where(p >= P_LARGE, c, gen))
