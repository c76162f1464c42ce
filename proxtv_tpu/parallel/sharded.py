"""Multi-chip sharded entry points (jax.sharding / GSPMD).

The reference's only parallel dimension is OpenMP threads over fibers on one
node (SURVEY.md §2.1).  Here the equivalents are first-class device-mesh
shardings:

*   **Batch (data) parallelism** — independent signals/images sharded over the
    mesh: no communication at all during the solve except the scalar
    convergence all-reduce of the masked ``while_loop``.
*   **Fiber parallelism** — a single large image sharded along one image axis.
    The column pass runs fiber-parallel; the row pass requires the transposed
    layout, and XLA GSPMD inserts the all-to-all between the passes
    automatically from the sharding constraints.  This replaces the
    reference's shared-memory gather/scatter (src/TV2Dopt.cpp:173-207).

All functions are thin jit wrappers over the single-device batched engines —
the engines themselves are written with only full-width ops along fiber-batch
axes, so they shard without modification.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import tv2d, tvnd
from ..ops import tv1d_l1, tv1d_l2, tv1d_lp


def make_mesh(n_devices: Optional[int] = None, axis: str = "d") -> Mesh:
    """A 1D device mesh over ``n_devices`` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devs), (axis,))


def _shard(Y, mesh, spec):
    return jax.device_put(Y, NamedSharding(mesh, spec))


def tv1_1d_sharded(Y, lam, mesh: Mesh, method: str = "hybridtautstring"):
    """Batched 1D TV-L1 with the batch axis sharded over the mesh (pure DP)."""
    axis = mesh.axis_names[0]
    Ys = _shard(jnp.asarray(Y), mesh, P(axis, None))
    return tv1d_l1.tv1_batched(Ys, lam, method=method)


def tv2_1d_sharded(Y, lam, mesh: Mesh, method: str = "mspg"):
    axis = mesh.axis_names[0]
    Ys = _shard(jnp.asarray(Y), mesh, P(axis, None))
    return tv1d_l2.tv2_batched(Ys, lam, method=method)


def tvp_1d_sharded(Y, lam, p: float, mesh: Mesh, method: str = "gpfw"):
    axis = mesh.axis_names[0]
    Ys = _shard(jnp.asarray(Y), mesh, P(axis, None))
    return tv1d_lp.tvp_batched(Ys, lam, p, method=method)


def tv1_2d_sharded(Y, lam, mesh: Mesh, method: str = "dr", max_iters: int = 0,
                   shard_axis: str = "batch"):
    """Batched 2D TV-L1 prox sharded over the mesh.

    shard_axis='batch': images distributed over devices (DP over B).
    shard_axis='cols': every image's column dimension sharded (fiber
    parallelism for a single huge image); GSPMD inserts the all-to-alls
    between row and column passes.
    """
    axis = mesh.axis_names[0]
    spec = P(axis, None, None) if shard_axis == "batch" else P(None, None, axis)
    Ys = _shard(jnp.asarray(Y), mesh, spec)
    return tv2d.tv1_2d_batched(Ys, lam, method=method, max_iters=max_iters)


def tv1_2d_sharded_fused(Y, lam, mesh: Mesh,
                         method: str = "chambolle-pock-acc",
                         max_iters: int = 0):
    """Batch-sharded 2D TV-L1 with the fused Pallas engine running PER DEVICE.

    ``shard_map`` hands each device its own (B/n, M, N) sub-batch, inside
    which the single-device fused kernel (or the XLA engine off-TPU) runs
    unmodified — the ``pallas_call`` never sees a sharded operand, there is
    no communication during the solve, and each device stops on its own
    sub-batch's duality-gap certificates instead of a global lock-step
    convergence vote.  This is the multi-chip analog of the reference's
    per-thread Workspace pools (src/utils.cpp:206): perfectly parallel work,
    device-local state.  Requires B divisible by the mesh size.
    """
    shard_map = jax.shard_map

    axis = mesh.axis_names[0]
    Y = jnp.asarray(Y)
    n = int(mesh.devices.size)
    if Y.shape[0] % n:
        raise ValueError(f"batch {Y.shape[0]} not divisible by mesh size {n}")
    lam = jnp.asarray(lam, Y.dtype)

    def solve(Ys):
        return tv2d.tv1_2d_batched(Ys, lam, method=method,
                                   max_iters=max_iters, use_fused=True)

    f = shard_map(solve, mesh=mesh, in_specs=(P(axis, None, None),),
                  out_specs=(P(axis, None, None), P(axis)),
                  check_vma=False,
)
    return jax.jit(f)(_shard(Y, mesh, P(axis, None, None)))


def tv1w_2d_sharded_fused(Y, W_col, W_row, mesh: Mesh,
                          method: str = "chambolle-pock-acc",
                          max_iters: int = 0):
    """Weighted variant of :func:`tv1_2d_sharded_fused` (per-edge weight
    fields sharded with the batch)."""
    shard_map = jax.shard_map

    axis = mesh.axis_names[0]
    Y = jnp.asarray(Y)
    n = int(mesh.devices.size)
    if Y.shape[0] % n:
        raise ValueError(f"batch {Y.shape[0]} not divisible by mesh size {n}")

    def solve(Ys, Wc, Wr):
        # use_fused=True: the per-path gates still fall back to XLA engines
        # off-TPU; the weighted cp-acc family itself requires the TPU kernel
        # (use method='dr'/'pd' on other backends).
        return tv2d.tv1w_2d_batched(Ys, Wc, Wr, method=method,
                                    max_iters=max_iters, use_fused=True)

    spec = P(axis, None, None)
    f = shard_map(solve, mesh=mesh, in_specs=(spec, spec, spec),
                  out_specs=(spec, P(axis)), check_vma=False)
    return jax.jit(f)(_shard(jnp.asarray(Y), mesh, spec),
                      _shard(jnp.asarray(W_col, Y.dtype), mesh, spec),
                      _shard(jnp.asarray(W_row, Y.dtype), mesh, spec))


def tv_nd_sharded(Y, ws, ds, ps, mesh: Mesh, max_iters: int = 0,
                  method: str = "pd"):
    """Batched ND generalized TV with batch sharded over the mesh."""
    axis = mesh.axis_names[0]
    nd = jnp.asarray(Y).ndim
    Ys = _shard(jnp.asarray(Y), mesh, P(axis, *([None] * (nd - 1))))
    return tvnd.tv_nd_batched(Ys, tuple(ws), tuple(ds), tuple(ps),
                              max_iters=max_iters, method=method)
