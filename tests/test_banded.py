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


@pytest.mark.parametrize("M,N", [(17, 9), (9, 130), (33, 40)])
def test_banded_geometry_fuzz(rng, M, N):
    """Awkward geometries (M smaller than the mesh, N just past a lane
    boundary, odd everything): the 8-device banded solve must equal the
    1-device one and keep the image region finite/valid."""
    Y = rng.randn(M, N).astype(np.float32)
    x8, _ = sharded.tv1_2d_banded(Y, 0.3, sharded.make_mesh(8),
                                  k_steps=2, tm=8, max_iters=240)
    x1, _ = sharded.tv1_2d_banded(Y, 0.3, sharded.make_mesh(1),
                                  k_steps=2, tm=8, max_iters=240)
    assert x8.shape == (M, N)
    assert np.isfinite(np.asarray(x8)).all()
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), atol=2e-5)


def test_banded_weighted_uniform_equals_unweighted(rng):
    """Uniform weight fields == scalar lam: the weighted banded driver must
    reproduce the unweighted one (same schedule: mean row-edge weight = lam)."""
    M, N = 48, 24
    Y = rng.randn(M, N).astype(np.float32)
    lam = 0.4
    mesh = sharded.make_mesh(8)
    Wc = np.full((M - 1, N), lam, np.float32)
    Wr = np.full((M, N - 1), lam, np.float32)
    xw, infow = sharded.tv1w_2d_banded(Y, Wc, Wr, mesh, k_steps=2, tm=8,
                                       max_iters=480)
    xu, _ = sharded.tv1_2d_banded(Y, lam, mesh, k_steps=2, tm=8,
                                  max_iters=480)
    assert np.all(np.asarray(infow.rc) == 0), np.asarray(infow.gap)
    np.testing.assert_allclose(np.asarray(xw), np.asarray(xu), atol=2e-5)
    # lam scales the weight fields: lam=0.4 with unit weights == the same
    # problem (the effective per-edge penalty is lam * W).
    xs, _ = sharded.tv1_2d_banded(Y, lam, mesh, k_steps=2, tm=8,
                                  max_iters=480,
                                  W_col=np.ones((M - 1, N), np.float32),
                                  W_row=np.ones((M, N - 1), np.float32))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xu), atol=2e-5)


def test_banded_weighted_matches_single_device(rng):
    """Weighted banded solve over 8 devices == 1-device mesh, and its
    objective matches the (f64) weighted Davis-Yin engine within the
    certificate contract."""
    M, N = 56, 30
    Y = rng.randn(M, N).astype(np.float32)
    Wc = (0.2 + 0.6 * rng.rand(M - 1, N)).astype(np.float32)
    Wr = (0.2 + 0.6 * rng.rand(M, N - 1)).astype(np.float32)
    x8, info8 = sharded.tv1w_2d_banded(Y, Wc, Wr, sharded.make_mesh(8),
                                       k_steps=2, tm=8, max_iters=600)
    x1, _ = sharded.tv1w_2d_banded(Y, Wc, Wr, sharded.make_mesh(1),
                                   k_steps=2, tm=8, max_iters=600)
    assert np.all(np.asarray(info8.rc) == 0), np.asarray(info8.gap)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), atol=2e-5)

    def objw(X):
        return (0.5 * np.sum((X - Y) ** 2)
                + np.sum(Wc * np.abs(np.diff(X, axis=0)))
                + np.sum(Wr * np.abs(np.diff(X, axis=1))))

    xr, _ = tv2d.tv1w_2d_batched(jnp.asarray(Y, jnp.float64)[None],
                                 jnp.asarray(Wc, jnp.float64)[None],
                                 jnp.asarray(Wr, jnp.float64)[None],
                                 method="dr", max_iters=300)
    o8, orf = objw(np.asarray(x8, np.float64)), objw(np.asarray(xr)[0])
    assert o8 <= orf * (1 + 1e-3), (o8, orf)


def test_banded_3d_bands_longest_axis(rng):
    """A volume with M > L is banded along M (via the symmetric transpose)
    on a multi-device mesh; the result agrees with the untransposed 1-device
    banded solve at the same certificate."""
    L, M, N = 9, 24, 10
    Y = rng.randn(L, M, N).astype(np.float32)
    lam = 0.3
    x8, info8 = sharded.tv1_3d_banded(Y, lam, sharded.make_mesh(8),
                                      k_steps=1, tl=3, tm=8, max_iters=480)
    x1, _ = sharded.tv1_3d_banded(Y, lam, sharded.make_mesh(1),
                                  k_steps=1, tl=3, tm=8, max_iters=480)
    assert x8.shape == (L, M, N)
    assert np.all(np.asarray(info8.rc) == 0), np.asarray(info8.gap)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), atol=1e-3)


def test_banded_3d_matches_single_device(rng):
    """3D layer-banded fused PDHG over the 8-device mesh equals the 1-device
    run bitwise-to-f32-noise, and matches the Parallel-Dykstra engine's
    objective within the certificate contract."""
    from proxtv_tpu.models import tvnd

    L, M, N = 24, 10, 9
    Y = rng.randn(L, M, N).astype(np.float32)
    lam = 0.3
    x8, info8 = sharded.tv1_3d_banded(Y, lam, sharded.make_mesh(8),
                                      k_steps=1, tl=3, tm=8, max_iters=480)
    x1, _ = sharded.tv1_3d_banded(Y, lam, sharded.make_mesh(1),
                                  k_steps=1, tl=3, tm=8, max_iters=480)
    assert np.all(np.asarray(info8.rc) == 0), np.asarray(info8.gap)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), atol=2e-5)
    xr, _ = tvnd.tv_nd_batched(jnp.asarray(Y, jnp.float64)[None],
                               (lam, lam, lam), (1, 2, 3), (1.0, 1.0, 1.0),
                               method="pd", max_iters=300)

    def obj3(X):
        return (0.5 * np.sum((X - Y) ** 2)
                + lam * sum(np.abs(np.diff(X, axis=a)).sum()
                            for a in range(3)))

    o8, orf = obj3(np.asarray(x8, np.float64)), obj3(np.asarray(xr)[0])
    assert o8 <= orf * (1 + 1e-3), (o8, orf)


# ---------------------------------------------------------------------------
# Banded long-1D (one huge signal spanning the mesh, ops/tv1d_long_banded)
# ---------------------------------------------------------------------------


def _obj1(x, y, lam):
    return 0.5 * ((x - y) ** 2).sum() + lam * np.abs(np.diff(x)).sum()


def test_banded_long1d_ndev_invariance(rng):
    """One long signal banded over 8 devices equals the 1-device banded
    solve and the single-device tv1_long path (fast certificate path)."""
    from proxtv_tpu.ops import tv1d_long

    n = 30000
    y = np.cumsum(rng.randn(n)) * 0.05 + rng.randn(n)
    lam = 0.7
    mesh8 = sharded.make_mesh(8)
    mesh1 = sharded.make_mesh(1)
    x8, i8 = sharded.tv1_1d_banded(jnp.asarray(y), lam, mesh8,
                                   chunk=1024, overlap=128)
    x1, i1 = sharded.tv1_1d_banded(jnp.asarray(y), lam, mesh1,
                                   chunk=1024, overlap=128)
    xs, _ = tv1d_long.tv1_long(jnp.asarray(y), lam, chunk=1024, overlap=128)
    assert np.all(np.asarray(i8.rc) == 0)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(xs), atol=1e-10)


def test_banded_long1d_adversarial_plateaus(rng):
    """The adversarial every-seam-in-a-flat geometry exercises the FULL
    shard-resident escalation ladder (window resumes, jitter stitch via
    distributed segmented scans, PGD, snap, distributed-PCR projected-Newton
    polish): must certify rc = 0 at the scan engine's objective, identically
    on 8 and 1 devices."""
    from proxtv_tpu.ops import tv1d_l1

    chunk, overlap = 512, 64
    n = 32 * chunk
    flat = 200
    y = np.repeat(rng.randn(-(-n // flat)), flat)[:n] + 0.1 * rng.randn(n)
    lam = 5.0
    mesh8 = sharded.make_mesh(8)
    mesh1 = sharded.make_mesh(1)
    x8, i8 = sharded.tv1_1d_banded(jnp.asarray(y), lam, mesh8,
                                   chunk=chunk, overlap=overlap)
    x1, i1 = sharded.tv1_1d_banded(jnp.asarray(y), lam, mesh1,
                                   chunk=chunk, overlap=overlap)
    assert np.all(np.asarray(i8.rc) == 0), np.asarray(i8.gap)
    assert np.all(np.asarray(i1.rc) == 0)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), atol=1e-12)
    ref = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(y)[None],
                                            jnp.asarray(lam)))[0]
    rel = (_obj1(np.asarray(x8), y, lam) - _obj1(ref, y, lam)) / _obj1(ref, y, lam)
    assert rel <= 1e-8, rel


def test_banded_long1d_weighted_and_odd_n(rng):
    """Per-edge weights band with the signal; an n that is not divisible by
    the mesh geometry pads with exactly-decoupled zero-weight edges (tested
    on a 3-device mesh)."""
    from proxtv_tpu.ops import tv1d_l1

    n = 10011
    y = np.cumsum(rng.randn(n)) * 0.05 + rng.randn(n)
    w = 0.5 + rng.rand(n - 1)
    mesh3 = sharded.make_mesh(3)
    mesh1 = sharded.make_mesh(1)
    xw3, iw3 = sharded.tv1_1d_banded(jnp.asarray(y), jnp.asarray(w), mesh3,
                                     chunk=512, overlap=64)
    xw1, _ = sharded.tv1_1d_banded(jnp.asarray(y), jnp.asarray(w), mesh1,
                                   chunk=512, overlap=64)
    assert np.all(np.asarray(iw3.rc) == 0)
    np.testing.assert_allclose(np.asarray(xw3), np.asarray(xw1), atol=1e-12)
    ref = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(y)[None],
                                            jnp.asarray(w)[None]))[0]
    ow = lambda z: 0.5 * ((z - y) ** 2).sum() + (w * np.abs(np.diff(z))).sum()
    assert ow(np.asarray(xw3)) <= ow(ref) * (1 + 1e-10)


def test_banded_long1d_distributed_pcr(rng):
    """The banded masked-PCR Newton solve equals the single-device masked
    solve on random masks (the polish rung's linear algebra)."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from proxtv_tpu.ops import tridiag
    from proxtv_tpu.ops.tv1d_long_banded import _pcr_masked_banded

    D = 8
    mesh = sharded.make_mesh(D)
    n = 64 * D
    rhs = rng.randn(n)
    mask = rng.rand(n) > 0.3
    f = jax.jit(jax.shard_map(
        partial(_pcr_masked_banded, axis_name="d", n_dev=D),
        mesh=mesh, in_specs=(P("d"), P("d")), out_specs=P("d"),
        check_vma=False))
    out = f(jax.device_put(jnp.asarray(rhs), NamedSharding(mesh, P("d"))),
            jax.device_put(jnp.asarray(mask), NamedSharding(mesh, P("d"))))
    ref = np.asarray(tridiag.spd_second_difference_solve(
        jnp.asarray(rhs)[None], mask=jnp.asarray(mask)[None]))[0]
    ref = np.where(mask, ref, 0.0)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-9)


def test_banded_wide_image_transposed_orientation(rng):
    """A wider-than-tall image may run transposed (lane-axis orientation
    choice); the result must match the tall orientation and the XLA engine.
    Forces the transpose branch by making _pdhg_lane_eff prefer M."""
    from proxtv_tpu.models import tv2d

    M, N = 40, 72
    Y = rng.randn(M, N).astype(np.float32)
    lam = 0.4
    mesh8 = sharded.make_mesh(8)
    x_w, i_w = sharded.tv1_2d_banded(jnp.asarray(Y), lam, mesh8,
                                     max_iters=300)
    x_t, i_t = sharded.tv1_2d_banded(jnp.asarray(Y.T), lam, mesh8,
                                     max_iters=300)
    assert x_w.shape == (M, N)
    ref, _ = tv2d.tv1_2d_batched(jnp.asarray(Y)[None], lam, method="dr",
                                 max_iters=300, use_fused=False)
    assert (_obj(np.asarray(x_w), Y, lam)
            <= _obj(np.asarray(ref)[0], Y, lam) * (1 + 1e-3))
    np.testing.assert_allclose(np.asarray(x_w), np.asarray(x_t).T, atol=2e-5)


def test_banded_long1d_geometry_fuzz(rng):
    """Random (n, chunk, overlap, D) geometries: the banded solve must stay
    ndev-invariant and beat-or-match the exact scan's objective within the
    certificate contract, including n far from any multiple of the band."""
    from proxtv_tpu.ops import tv1d_l1

    for trial in range(6):
        D = int(rng.choice([2, 3, 5, 8]))
        chunk = int(rng.choice([128, 256, 512]))
        overlap = int(rng.choice([16, 32, chunk // 4]))
        n = int(rng.randint(2 * chunk, 6 * chunk * D))
        lam = float(0.2 + 2 * rng.rand())
        y = np.cumsum(rng.randn(n)) * 0.1 + rng.randn(n)
        mesh = sharded.make_mesh(D)
        mesh1 = sharded.make_mesh(1)
        xD, iD = sharded.tv1_1d_banded(jnp.asarray(y), lam, mesh,
                                       chunk=chunk, overlap=overlap)
        x1, _ = sharded.tv1_1d_banded(jnp.asarray(y), lam, mesh1,
                                      chunk=chunk, overlap=overlap)
        tag = (trial, D, chunk, overlap, n, lam)
        np.testing.assert_allclose(np.asarray(xD), np.asarray(x1),
                                   atol=1e-11, err_msg=str(tag))
        ref = np.asarray(tv1d_l1.tv1_tautstring(jnp.asarray(y)[None],
                                                jnp.asarray(lam)))[0]
        o = lambda z: 0.5 * ((z - y) ** 2).sum() + lam * np.abs(np.diff(z)).sum()
        assert o(np.asarray(xD)) <= o(ref) * (1 + 1e-5), tag


def test_banded_weighted_wide_image_orientation(rng):
    """Weighted banded 2D on a wider-than-tall image: the orientation choice
    must swap the weight fields consistently (W_col <-> W_row transposed)."""
    M, N = 24, 64
    Y = rng.randn(M, N).astype(np.float32)
    Wc = (0.5 + rng.rand(M - 1, N)).astype(np.float32)
    Wr = (0.5 + rng.rand(M, N - 1)).astype(np.float32)
    mesh8 = sharded.make_mesh(8)
    x, info = sharded.tv1w_2d_banded(jnp.asarray(Y), jnp.asarray(Wc),
                                     jnp.asarray(Wr), mesh8, max_iters=300)
    assert x.shape == (M, N)
    ref, _ = tv2d.tv1w_2d_batched(jnp.asarray(Y)[None], jnp.asarray(Wc)[None],
                                  jnp.asarray(Wr)[None], method="dr",
                                  max_iters=300, use_fused=False)

    def objw(Z):
        return (0.5 * np.sum((Z - Y) ** 2)
                + np.sum(Wc * np.abs(np.diff(Z, axis=0)))
                + np.sum(Wr * np.abs(np.diff(Z, axis=1))))

    assert objw(np.asarray(x)) <= objw(np.asarray(ref)[0]) * (1 + 1e-3)


def test_banded_3d_single_layer_bands(rng):
    """Code-review regression: 1-layer bands (L <= n_dev after the
    longest-axis transpose) must not read halo layers from the wrong device
    — the band is grown to 2 validity-masked layers instead."""
    from proxtv_tpu.models import tvnd

    V = rng.randn(8, 8, 96).astype(np.float32)  # share = tl = 1 at D = 8
    x8, i8 = sharded.tv1_3d_banded(jnp.asarray(V), 0.3, sharded.make_mesh(8),
                                   max_iters=96)
    x1, i1 = sharded.tv1_3d_banded(jnp.asarray(V), 0.3, sharded.make_mesh(1),
                                   max_iters=96)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), atol=1e-5)


def test_banded_long1d_overlap_validation():
    """overlap = 0 would crash the dual glue on the XLA window path; the
    wrapper must reject it up front."""
    with pytest.raises(ValueError):
        sharded.tv1_1d_banded(jnp.zeros(4096, jnp.float32), 1.0,
                              sharded.make_mesh(1), chunk=256, overlap=0)
