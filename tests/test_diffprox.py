"""Tests for the differentiable TV prox (custom VJP vs finite differences)."""
import numpy as np

import jax
import jax.numpy as jnp

from proxtv_tpu.ops import diffprox


def test_vjp_matches_finite_differences(rng):
    B, n = 3, 24
    Y = jnp.asarray(rng.randn(B, n))
    lam = 0.6
    g = jnp.asarray(rng.randn(B, n))

    def f(y, lam):
        return jnp.sum(diffprox.tv1_prox(y, lam) * g)

    gy, glam = jax.grad(f, argnums=(0, 1))(Y, jnp.asarray(lam))
    eps = 1e-5
    # y-gradient: a few random directions
    for _ in range(5):
        d = rng.randn(B, n)
        d = jnp.asarray(d / np.linalg.norm(d))
        num = (f(Y + eps * d, lam) - f(Y - eps * d, lam)) / (2 * eps)
        ana = jnp.sum(gy * d)
        np.testing.assert_allclose(float(num), float(ana), atol=2e-4)
    # lam-gradient
    num = (f(Y, lam + eps) - f(Y, lam - eps)) / (2 * eps)
    np.testing.assert_allclose(float(num), float(glam), atol=2e-4)


def test_vjp_projector_properties(rng):
    """J is an averaging projector: J(Jg) == Jg, and J ones == ones."""
    B, n = 2, 30
    Y = jnp.asarray(rng.randn(B, n))
    lam = 0.8

    def apply_JT(g):
        _, vjp = jax.vjp(lambda y: diffprox.tv1_prox(y, lam), Y)
        return vjp(g)[0]

    g = jnp.asarray(rng.randn(B, n))
    Jg = apply_JT(g)
    np.testing.assert_allclose(np.asarray(apply_JT(Jg)), np.asarray(Jg),
                               atol=1e-10)
    ones = jnp.ones((B, n))
    np.testing.assert_allclose(np.asarray(apply_JT(ones)), np.asarray(ones),
                               atol=1e-10)


def test_unrolled_learning_smoke(rng):
    """Gradient descent on lam through the prox reduces a reconstruction loss."""
    truth = jnp.asarray(np.repeat(rng.randn(6), 8)[None, :])
    noisy = truth + 0.3 * jnp.asarray(rng.randn(*truth.shape))

    def loss(lam):
        x = diffprox.tv1_prox(noisy, jax.nn.softplus(lam))
        return jnp.mean((x - truth) ** 2)

    lam = jnp.asarray(-2.0)  # softplus -> small initial penalty
    l0 = float(loss(lam))
    for _ in range(25):
        lam = lam - 2.0 * jax.grad(loss)(lam)
    l1 = float(loss(lam))
    assert l1 < l0, (l0, l1)


def test_2d_vjp_matches_finite_differences(rng):
    B, M, N = 2, 10, 9
    Y = jnp.asarray(rng.randn(B, M, N))
    lam = 0.5
    g = jnp.asarray(rng.randn(B, M, N))

    def f(y):
        return jnp.sum(diffprox.tv2d_prox(y, lam, "pd", 2000) * g)

    gy = jax.grad(f)(Y)
    eps = 1e-5
    for _ in range(4):
        d = rng.randn(B, M, N)
        d = jnp.asarray(d / np.linalg.norm(d))
        num = (f(Y + eps * d) - f(Y - eps * d)) / (2 * eps)
        ana = jnp.sum(gy * d)
        np.testing.assert_allclose(float(num), float(ana), atol=5e-4)


def test_2d_vjp_projector(rng):
    Y = jnp.asarray(rng.randn(1, 8, 8))

    def apply_JT(g):
        _, vjp = jax.vjp(lambda y: diffprox.tv2d_prox(y, 0.6, "dr", 300), Y)
        return vjp(g)[0]

    g = jnp.asarray(rng.randn(1, 8, 8))
    Jg = apply_JT(g)
    np.testing.assert_allclose(np.asarray(apply_JT(Jg)), np.asarray(Jg),
                               atol=1e-8)


def test_flax_layer_learns_lambda(rng):
    """TVDenoise1D: gradient descent on the learnable penalty reduces loss."""
    import optax
    from proxtv_tpu.models.layers import TVDenoise1D

    truth = jnp.asarray(np.repeat(rng.randn(5), 10)[None, :])
    noisy = truth + 0.3 * jnp.asarray(rng.randn(*truth.shape))
    layer = TVDenoise1D(init_lam=0.01)
    params = layer.init(jax.random.PRNGKey(0), noisy)

    def loss(p):
        return jnp.mean((layer.apply(p, noisy) - truth) ** 2)

    opt = optax.adam(0.05)
    state = opt.init(params)
    l0 = float(loss(params))
    for _ in range(40):
        g = jax.grad(loss)(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
    l1 = float(loss(params))
    assert l1 < l0, (l0, l1)
