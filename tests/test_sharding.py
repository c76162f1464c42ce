"""Sharding-invariance tests: a sharded solve must equal the single-device
solve bitwise-to-tolerance (SURVEY.md §4's implication; the reference has no
multi-device capability to test)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proxtv_tpu import parallel
from proxtv_tpu.models import tv2d
from proxtv_tpu.ops import tv1d_l1


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_tv1_1d_sharding_invariance(rng):
    mesh = parallel.make_mesh()
    Y = rng.randn(16, 33)
    lam = 0.7
    x_single = np.asarray(tv1d_l1.tv1_batched(jnp.asarray(Y), lam))
    x_shard = np.asarray(parallel.tv1_1d_sharded(Y, lam, mesh))
    np.testing.assert_allclose(x_shard, x_single, atol=1e-12)


def test_tv1_2d_batch_sharding_invariance(rng):
    mesh = parallel.make_mesh()
    Y = rng.randn(8, 12, 10)
    x_single, _ = tv2d.tv1_2d_batched(jnp.asarray(Y), 0.4, max_iters=40)
    x_shard, _ = parallel.tv1_2d_sharded(Y, 0.4, mesh, max_iters=40)
    np.testing.assert_allclose(np.asarray(x_shard), np.asarray(x_single),
                               atol=1e-10)


def test_tv1_2d_fiber_sharding_invariance(rng):
    """Single large image sharded along columns: fiber parallelism with GSPMD
    all-to-alls between row/col passes."""
    mesh = parallel.make_mesh()
    Y = rng.randn(1, 16, 24)  # 24 columns over 8 devices
    x_single, _ = tv2d.tv1_2d_batched(jnp.asarray(Y), 0.4, max_iters=40)
    x_shard, _ = parallel.tv1_2d_sharded(Y, 0.4, mesh, max_iters=40,
                                         shard_axis="cols")
    np.testing.assert_allclose(np.asarray(x_shard), np.asarray(x_single),
                               atol=1e-10)


def test_tv_nd_sharding_invariance(rng):
    from proxtv_tpu.models import tvnd
    mesh = parallel.make_mesh()
    Y = rng.randn(8, 6, 5, 4)
    ws, ds, ps = (0.3, 0.3, 0.3), (1, 2, 3), (1.0, 1.0, 1.0)
    x_single, _ = tvnd.tv_nd_batched(jnp.asarray(Y), ws, ds, ps, max_iters=20)
    x_shard, _ = parallel.tv_nd_sharded(Y, ws, ds, ps, mesh, max_iters=20)
    np.testing.assert_allclose(np.asarray(x_shard), np.asarray(x_single),
                               atol=1e-10)


def test_tv1_2d_cp_acc_sharded(rng):
    """Primal-dual methods on a sharded batch take the XLA PDHG path (fused
    Pallas kernels are single-device and auto-disabled for sharded inputs)."""
    mesh = parallel.make_mesh()
    Y = rng.randn(8, 20, 18)
    x_single, _ = tv2d.tv1_2d_batched(jnp.asarray(Y), 0.4,
                                      method="chambolle-pock", max_iters=400)
    x_shard, _ = parallel.tv1_2d_sharded(Y, 0.4, mesh,
                                         method="chambolle-pock",
                                         max_iters=400)
    np.testing.assert_allclose(np.asarray(x_shard), np.asarray(x_single),
                               atol=1e-10)


def test_tv1w_2d_sharded(rng):
    """Weighted 2D solve with the image batch sharded over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = parallel.make_mesh()
    B, M, N = 8, 10, 9
    Y = rng.randn(B, M, N)
    Wc = 0.5 + rng.rand(B, M - 1, N)
    Wr = 0.5 + rng.rand(B, M, N - 1)
    x_single, _ = tv2d.tv1w_2d_batched(jnp.asarray(Y), jnp.asarray(Wc),
                                       jnp.asarray(Wr), max_iters=40)
    sh = NamedSharding(mesh, P(mesh.axis_names[0], None, None))
    Ys, Wcs, Wrs = (jax.device_put(jnp.asarray(a), sh) for a in (Y, Wc, Wr))
    x_shard, _ = tv2d.tv1w_2d_batched(Ys, Wcs, Wrs, max_iters=40)
    np.testing.assert_allclose(np.asarray(x_shard), np.asarray(x_single),
                               atol=1e-10)


def test_use_fused_flag_plumbing(rng):
    """use_fused=False must give the same result as the default (on CPU both
    run the XLA path; this asserts the static-arg plumbing traces cleanly)."""
    Y = jnp.asarray(rng.randn(2, 12, 10))
    a, _ = tv2d.tv1_2d_batched(Y, 0.4, method="chambolle-pock", max_iters=60)
    b, _ = tv2d.tv1_2d_batched(Y, 0.4, method="chambolle-pock", max_iters=60,
                               use_fused=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_tv1_2d_sharded_fused_shardmap(rng):
    """shard_map per-device fused path: each device solves its own sub-batch
    with the single-device engine (XLA fallback on CPU; the pallas_call on
    TPU) — results must match the unsharded solve and report per-image info."""
    mesh = parallel.make_mesh()
    Y = rng.randn(8, 16, 14).astype(np.float32)
    x_single, info_s = tv2d.tv1_2d_batched(jnp.asarray(Y), 0.4,
                                           method="chambolle-pock",
                                           max_iters=200)
    x_shard, info = parallel.tv1_2d_sharded_fused(Y, 0.4, mesh,
                                                  method="chambolle-pock",
                                                  max_iters=200)
    np.testing.assert_allclose(np.asarray(x_shard), np.asarray(x_single),
                               atol=1e-5)
    assert np.asarray(info.iters).shape == (8,)
    with pytest.raises(ValueError, match="divisible"):
        parallel.tv1_2d_sharded_fused(Y[:6], 0.4, mesh)


def test_tv1w_2d_sharded_fused_shardmap(rng):
    mesh = parallel.make_mesh()
    B, M, N = 8, 12, 10
    Y = rng.randn(B, M, N).astype(np.float32)
    Wc = (0.5 + rng.rand(B, M - 1, N)).astype(np.float32)
    Wr = (0.5 + rng.rand(B, M, N - 1)).astype(np.float32)
    x_single, _ = tv2d.tv1w_2d_batched(jnp.asarray(Y), jnp.asarray(Wc),
                                       jnp.asarray(Wr), method="dr",
                                       max_iters=40)
    x_shard, info = parallel.tv1w_2d_sharded_fused(Y, Wc, Wr, mesh,
                                                   method="dr", max_iters=40)
    np.testing.assert_allclose(np.asarray(x_shard), np.asarray(x_single),
                               atol=1e-5)
    assert np.asarray(info.rc).shape == (B,)


def test_collective_structure(rng):
    """Pin the communication structure GSPMD produces (docs/SCALING.md):
    batch-DP solves move no array data between devices (scalar convergence
    all-reduces only), and the shard_map fused path has no collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = parallel.make_mesh()
    ax = mesh.axis_names[0]

    def hlo(fn, *args):
        return jax.jit(fn).lower(*args).compile().as_text()

    Y2 = jax.device_put(jnp.asarray(rng.randn(8, 32, 32).astype(np.float32)),
                        NamedSharding(mesh, P(ax, None, None)))
    txt = hlo(lambda y: tv2d.tv1_2d_batched(y, 0.3, max_iters=10,
                                            use_fused=False)[0], Y2)
    for op in ("all-to-all", "all-gather", "collective-permute",
               "reduce-scatter"):
        assert op + "(" not in txt, f"batch-DP solve moves data via {op}"

    f = jax.shard_map(
        lambda y: tv2d.tv1_2d_batched(y, 0.3, method="chambolle-pock",
                                      max_iters=10, use_fused=True)[0],
        mesh=mesh, in_specs=(P(ax, None, None),),
        out_specs=P(ax, None, None), check_vma=False)
    txt = hlo(f, Y2)
    for op in ("all-reduce", "all-to-all", "all-gather", "collective-permute",
               "reduce-scatter"):
        assert op + "(" not in txt, f"shard_map path contains {op}"


def test_tv2_and_tvp_1d_sharded(rng):
    from proxtv_tpu.ops import tv1d_l2, tv1d_lp
    mesh = parallel.make_mesh()
    Y = rng.randn(16, 20)
    x2s, _ = parallel.tv2_1d_sharded(Y, 0.8, mesh)
    x2, _ = tv1d_l2.tv2_mspg(jnp.asarray(Y), 0.8)
    np.testing.assert_allclose(np.asarray(x2s), np.asarray(x2), atol=1e-10)
    xps, _ = parallel.tvp_1d_sharded(Y, 0.5, 1.5, mesh)
    xp, _ = tv1d_lp.tvp_gpfw(jnp.asarray(Y), 0.5, 1.5)
    # The nested Newton root-find's bracket branches amplify 1-ulp compilation
    # differences between the sharded and unsharded programs.
    np.testing.assert_allclose(np.asarray(xps), np.asarray(xp), atol=1e-5)
