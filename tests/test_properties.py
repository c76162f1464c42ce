"""Mathematical property tests for the prox operators — invariants that hold
for EVERY total-variation prox regardless of engine, complementing the
cross-method and oracle tests (SURVEY §4's strategy, extended):

*   nonexpansiveness: ||prox(y1) - prox(y2)|| <= ||y1 - y2|| (any prox of a
    convex function is firmly nonexpansive);
*   translation equivariance: prox(y + c) = prox(y) + c (TV ignores DC);
*   scaling equivariance: prox_{c*lam}(c*y) = c * prox_lam(y) for c > 0
    (the objective is 2-homogeneous under joint scaling);
*   monotonicity in lam: TV(prox_lam(y)) is nonincreasing in lam while the
    fidelity term is nondecreasing.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from proxtv_tpu.ops import tv1d_l1, tv1d_l2, tv1d_lp

ENGINES_1D = {
    "tv1_tautstring": lambda Y, lam: tv1d_l1.tv1_tautstring(Y, lam),
    "tv1_condat": lambda Y, lam: tv1d_l1.tv1_condat(Y, lam),
    "tv1_dp": lambda Y, lam: tv1d_l1.tv1_dp(Y, lam),
    "tv1_pn": lambda Y, lam: tv1d_l1.tv1_pn(Y, lam)[0],
    "tv2_ms": lambda Y, lam: tv1d_l2.tv2_ms(Y, lam)[0],
    "tvp_gpfw_1.5": lambda Y, lam: tv1d_lp.tvp_gpfw(Y, lam, 1.5)[0],
}


# Iterative Lp engines stop at a 1e-5 duality-gap tolerance, so the two
# sides of an equivariance identity are distinct approximate optima.
ATOL = {"tvp_gpfw_1.5": 5e-3}


@pytest.mark.parametrize("name", sorted(ENGINES_1D))
def test_prox_properties(name, rng):
    f = ENGINES_1D[name]
    atol = ATOL.get(name, 5e-5)
    n = 48
    Y1 = jnp.asarray(rng.randn(6, n) * 2)
    Y2 = Y1 + jnp.asarray(0.3 * rng.randn(6, n))
    lam = 0.8
    x1 = np.asarray(f(Y1, lam))
    x2 = np.asarray(f(Y2, lam))
    # nonexpansiveness (allow solver tolerance slack)
    lhs = np.linalg.norm(x1 - x2, axis=-1)
    rhs = np.linalg.norm(np.asarray(Y1 - Y2), axis=-1)
    assert np.all(lhs <= rhs * (1 + 1e-6) + 10 * atol), name

    # translation equivariance
    xc = np.asarray(f(Y1 + 7.5, lam))
    np.testing.assert_allclose(xc, x1 + 7.5, atol=atol, err_msg=name)

    # scaling equivariance (c > 0)
    c = 3.0
    xs = np.asarray(f(c * Y1, c * lam))
    np.testing.assert_allclose(xs, c * x1, atol=atol * c, err_msg=name)

    # lam-monotonicity of the TV term
    x_lo = np.asarray(f(Y1, 0.2))
    x_hi = np.asarray(f(Y1, 2.0))
    tv = lambda z: np.abs(np.diff(z, axis=-1)).sum(-1)
    assert np.all(tv(x_hi) <= tv(x_lo) + 10 * atol), name
