"""Tests for the cross-chip banded fused PDHG (SURVEY §5.8): one image
row-banded over the virtual 8-device mesh, halo-exchanged with ppermute,
certificate psum-reduced.  Pallas runs in interpret mode on CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from proxtv_tpu.models import tv2d
from proxtv_tpu.parallel import sharded


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def _obj(X, Y, lam):
    return (0.5 * np.sum((X - Y) ** 2)
            + lam * (np.abs(np.diff(X, axis=0)).sum()
                     + np.abs(np.diff(X, axis=1)).sum()))


def test_banded_matches_single_device(rng):
    """Sharding invariance: the banded solve over 8 devices equals the same
    solve over a 1-device mesh (identical code path, schedule, cadence) to
    f32 reduction noise, and both match the XLA engine's solution within
    the certificate contract."""
    M, N = 72, 40
    Y = rng.randn(M, N).astype(np.float32)
    lam = 0.4
    mesh8 = sharded.make_mesh(8)
    mesh1 = sharded.make_mesh(1)
    x8, info8 = sharded.tv1_2d_banded(Y, lam, mesh8, k_steps=2, tm=8,
                                      max_iters=600)
    x1, info1 = sharded.tv1_2d_banded(Y, lam, mesh1, k_steps=2, tm=8,
                                      max_iters=600)
    assert np.all(np.asarray(info8.rc) == 0), np.asarray(info8.gap)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), atol=2e-5)
    # Cross-engine: objective parity with the (f64) XLA Davis-Yin engine.
    xr, _ = tv2d.tv1_2d_batched(jnp.asarray(Y, jnp.float64)[None], lam,
                                method="dr", max_iters=300)
    o8, orf = _obj(np.asarray(x8, np.float64), Y, lam), _obj(
        np.asarray(xr)[0], Y, lam)
    assert o8 <= orf * (1 + 1e-3), (o8, orf)


def test_banded_uneven_rows(rng):
    """M not divisible by the mesh: the padded tail rows are masked invalid
    and the result still matches the 1-device banded solve."""
    M, N = 50, 33
    Y = rng.randn(M, N).astype(np.float32)
    lam = 0.3
    x8, info8 = sharded.tv1_2d_banded(Y, lam, sharded.make_mesh(8),
                                      k_steps=2, tm=8, max_iters=480)
    x1, _ = sharded.tv1_2d_banded(Y, lam, sharded.make_mesh(1),
                                  k_steps=2, tm=8, max_iters=480)
    assert x8.shape == (M, N)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), atol=2e-5)
