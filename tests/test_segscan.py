"""Property tests for the distributed segmented scans (parallel/segscan.py)
against numpy oracles, across mesh sizes and segment layouts."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from proxtv_tpu.parallel import segscan, sharded


def _oracle(x, starts, op):
    n = x.shape[0]
    out = np.empty_like(x)
    idx = np.where(starts)[0].tolist() + [n]
    for a, b in zip(idx[:-1], idx[1:]):
        out[a:b] = op(x[a:b])
    return out


def _run(mesh, D, xl, sl):
    def body(x, s):
        nxt = lax.ppermute(s[:1], "d", [(i + 1, i) for i in range(D - 1)])
        tail = jnp.where(lax.axis_index("d") == D - 1, 1.0,
                         nxt[0] if D > 1 else 1.0)
        se = jnp.concatenate([s[1:], tail[None]])
        m = segscan.segment_mean(x, s, "d", D, seg_end=se)
        mn = segscan.segment_min(x, s, "d", D, seg_end=se)
        return m, mn

    f = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P("d"), P("d")),
                              out_specs=(P("d"), P("d")), check_vma=False))
    return f(xl, sl)


@pytest.mark.parametrize("D", [1, 2, 3, 8])
def test_segment_scans_match_oracle(D, rng):
    mesh = sharded.make_mesh(D)
    n = 24 * D
    x = rng.randn(n)
    for density in (0.0, 0.08, 0.5, 1.0):
        starts = rng.rand(n) < density
        starts[0] = True
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("d")))
        ss = jax.device_put(jnp.asarray(starts, jnp.float64),
                            NamedSharding(mesh, P("d")))
        m, mn = _run(mesh, D, xs, ss)
        np.testing.assert_allclose(np.asarray(m),
                                   _oracle(x, starts, np.mean), atol=1e-12)
        np.testing.assert_allclose(np.asarray(mn),
                                   _oracle(x, starts, np.min), atol=0)


def test_segment_spanning_all_devices(rng):
    """One segment covering the whole 8-device band (the plateau-snap case
    the carries exist for)."""
    D = 8
    mesh = sharded.make_mesh(D)
    n = 16 * D
    x = rng.randn(n)
    starts = np.zeros(n, bool)
    starts[0] = True
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("d")))
    ss = jax.device_put(jnp.asarray(starts, jnp.float64),
                        NamedSharding(mesh, P("d")))
    m, mn = _run(mesh, D, xs, ss)
    np.testing.assert_allclose(np.asarray(m), np.full(n, x.mean()),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(mn), np.full(n, x.min()), atol=0)
