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

import functools

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


def tv1_2d_banded(Y, lam, mesh: Mesh, method: str = "chambolle-pock-acc",
                  max_iters: int = 0, k_steps: int = None, tm: int = None,
                  gap_tol=None, W_col=None, W_row=None):
    """ONE large image solved by the fused PDHG kernel SPANNING the mesh
    (SURVEY §5.8: cross-chip fused execution).

    The image is row-banded over the mesh's devices; each device runs the
    temporally-blocked Pallas kernel on its band and exchanges 2*k_steps-row
    halos of the four state fields with its row neighbors over ICI
    (``jax.lax.ppermute``) before every K-iteration chunk, so the fused
    kernel's exactness argument holds across chips.  The per-image
    duality-gap certificate is ``psum``-reduced.  Compare
    :func:`tv1_2d_sharded` (unfused GSPMD engines) and
    :func:`tv1_2d_sharded_fused` (fused per-device, batch-parallel only).

    Args:
        Y: (M, N) single image (f32 for the TPU kernel).
        lam: scalar penalty.
        mesh: 1D device mesh; the image rows are banded over its axis.
        k_steps/tm: kernel chunk length and band rows (default: auto-tuned
            single-device parameters, with tm shrunk to fit the local band).
        W_col/W_row: optional (M-1, N) / (M, N-1) per-edge weight fields
            (weighted anisotropic TV); use :func:`tv1w_2d_banded`.
    Returns:
        (x, info): the denoised (M, N) image and its per-solve SolverInfo.
    """
    from ..models.tv2d import _pdhg_fused_params, _pdhg_lane_eff
    from ..utils.config import DEFAULT_COMBINER

    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    Y = jnp.asarray(Y)
    M, N = Y.shape
    # Orientation (as the single-device fused driver): a wider-than-tall
    # image runs transposed when the shorter lane axis buys more effective
    # iterations per HBM pass — and banding the LONGER axis also spreads
    # more rows per device.  Only when auto-tuned (explicit k_steps/tm pin
    # the caller's geometry).
    if (k_steps is None and tm is None and M < N
            and _pdhg_lane_eff(M, W_row is not None)
            > 1.05 * _pdhg_lane_eff(N, W_row is not None)):
        x_t, info = tv1_2d_banded(
            Y.T, lam, mesh, method=method, max_iters=max_iters,
            gap_tol=gap_tol,
            W_col=None if W_row is None else jnp.asarray(W_row).T,
            W_row=None if W_col is None else jnp.asarray(W_col).T)
        return x_t.T, info
    Np = -(-N // 128) * 128
    explicit_k = k_steps is not None
    if k_steps is None or tm is None:
        k_auto, tm_auto = _pdhg_fused_params(N, weighted=W_row is not None)
        k_steps = k_steps or k_auto
        tm = tm or tm_auto
    if jax.default_backend() == "tpu" and (k_steps % 4 or tm % 8):
        # Mosaic slices the VMEM window at sublane offset halo = 2*k_steps,
        # which must be divisible by the (8, 128) tiling; interpret mode
        # (tests / virtual meshes) has no such constraint.  Validated after
        # the defaults are filled so a PARTIALLY explicit call (e.g.
        # k_steps=2, tm=None) cannot slip through to crash the layout pass.
        raise ValueError(
            f"on TPU k_steps must be a multiple of 4 and tm a multiple of 8 "
            f"(got k_steps={k_steps}, tm={tm}); omit them for auto-tuning")
    # Geometry: every device gets Lt*tm rows of the globally padded canvas
    # (the padding sits entirely after image row M and is masked invalid);
    # shrink tm if a device's fair share is below the single-device band.
    share = -(-M // n_dev)               # ceil rows per device
    if tm > share:
        tm = max(8, -(-share // 8) * 8)  # one tile per device, 8-row aligned
    local_rows = -(-share // tm) * tm
    # The halo exchange refreshes 2*k_steps rows from ONE neighbor band, so
    # the band must be at least that tall — otherwise halo rows silently
    # carry garbage from the wrong device (regression: auto geometry at
    # M = 40 over 8 devices shrank tm to 8 while keeping k_steps = 12).
    if 2 * k_steps > local_rows:
        k_fit = max(4, (local_rows // 2) // 4 * 4)
        if explicit_k:
            raise ValueError(
                f"k_steps={k_steps} needs a 2*k_steps={2*k_steps}-row halo "
                f"but each band has only {local_rows} rows; use k_steps<="
                f"{k_fit} or omit it for auto-tuning")
        k_steps = k_fit
    Mg = n_dev * local_rows
    Ypad = jnp.pad(Y, ((0, Mg - M), (0, Np - N)))

    variant = {"condat": "condat", "chambolle-pock": "cp",
               "chambolle-pock-acc": "cp-acc"}[method.lower()]
    cap = int(max_iters) or DEFAULT_COMBINER.max_iters_condat

    weighted = W_row is not None
    f = _banded_jit(mesh, axis, n_dev, M, N, k_steps, tm, variant, cap,
                    gap_tol, weighted=weighted)
    Ys = _shard(Ypad, mesh, P(axis, None))
    if weighted:
        # Row-/col-edge weight canvases padded to the SAME (Mg, Np) banded
        # layout as Y (the driver's validity masks zero the pad regions).
        # ``lam`` scales the weight fields (the effective per-edge penalty
        # is lam * W, so tv1w_2d_banded's lam = 1.0 means "W as given").
        Wr = jnp.asarray(W_row, Y.dtype) * jnp.asarray(lam, Y.dtype)
        Wc = jnp.asarray(W_col, Y.dtype) * jnp.asarray(lam, Y.dtype)
        Wrp = jnp.pad(Wr, ((0, Mg - M), (0, Np - (N - 1))))
        Wcp = jnp.pad(Wc, ((0, Mg - (M - 1)), (0, Np - N)))
        x, info = f(Ys, jnp.asarray(1.0, Y.dtype),
                    _shard(Wrp, mesh, P(axis, None)),
                    _shard(Wcp, mesh, P(axis, None)))
    else:
        x, info = f(Ys, jnp.asarray(lam, Y.dtype))
    return x[:M, :N], info


def tv1w_2d_banded(Y, W_col, W_row, mesh: Mesh,
                   method: str = "chambolle-pock-acc", max_iters: int = 0,
                   k_steps: int = None, tm: int = None, gap_tol=None):
    """ONE large WEIGHTED image solved by the fused PDHG kernel spanning the
    mesh: the weighted counterpart of :func:`tv1_2d_banded` (reference
    problem DR2L1W_TV, src/TV2DWopt.cpp:46).  The per-edge weight canvases
    are row-banded with the image and halo-exchanged once at setup.

    Args:
        Y: (M, N) image.  W_col: (M-1, N) column-edge weights.
        W_row: (M, N-1) row-edge weights.
    Returns:
        (x, info): denoised image and per-solve SolverInfo.
    """
    W_col = jnp.asarray(W_col)
    W_row = jnp.asarray(W_row)
    M, N = jnp.asarray(Y).shape
    if W_col.shape != (M - 1, N) or W_row.shape != (M, N - 1):
        raise ValueError(f"weight shapes {W_col.shape}/{W_row.shape} do not "
                         f"match image ({M}, {N})")
    return tv1_2d_banded(Y, 1.0, mesh, method=method, max_iters=max_iters,
                         k_steps=k_steps, tm=tm, gap_tol=gap_tol,
                         W_col=W_col, W_row=W_row)


def tv1_3d_banded(Y, lam, mesh: Mesh, method: str = "chambolle-pock-acc",
                  max_iters: int = 0, k_steps: int = None, tl: int = None,
                  tm: int = None, gap_tol=None):
    """ONE large 3D volume solved by the fused 3D PDHG kernel SPANNING the
    mesh: the volume is layer-banded along its leading axis, 2*k_steps-layer
    halos of the five state fields ppermute between neighbors before every
    K-step chunk, and the duality-gap certificate is psum-reduced — the 3D
    counterpart of :func:`tv1_2d_banded`.

    Args:
        Y: (L, M, N) volume (f32 for the TPU kernel).
        lam: scalar penalty applied to all three axes (the Yang3_TV
            problem, reference src/TVNDopt.cpp:678).
    Returns:
        (x, info): denoised volume and per-solve SolverInfo.
    """
    from ..ops.kernels import pdhg3d_fused as PK3
    from ..utils.config import DEFAULT_COMBINER

    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    Y = jnp.asarray(Y)
    # Band along the LONGEST of the two non-lane axes: per-iteration halo
    # traffic is a fixed number (~20) of cross-sections of the banded axis,
    # so banding a shallow axis is halo-dominated on a real mesh (measured:
    # at 32x256x256 a 2-chunk L-band moves a 256x256 section per field per
    # direction while computing only a few layers).  Anisotropic TV with one
    # scalar lam is symmetric in L and M, so a transpose is free semantics.
    if Y.shape[1] > Y.shape[0] and n_dev > 1:
        x, info = tv1_3d_banded(jnp.swapaxes(Y, 0, 1), lam, mesh,
                                method=method, max_iters=max_iters,
                                k_steps=k_steps, tl=tl, tm=tm,
                                gap_tol=gap_tol)
        return jnp.swapaxes(x, 0, 1), info
    L, M, N = Y.shape
    Np = -(-N // 128) * 128
    explicit_k3 = k_steps is not None
    if k_steps is None or tl is None or tm is None:
        k_auto, tl_auto, tm_auto = PK3.best_params(Np)
        k_steps = k_steps or k_auto
        tl = tl or tl_auto
        tm = tm or tm_auto
    if jax.default_backend() == "tpu" and tm % 8:
        # The 3D kernel's M (sublane) halo is self-aligned (_halo_m rounds
        # to the 8-row tile) and L is the untiled leading dim, so only the
        # M tile height carries a Mosaic tiling constraint.
        raise ValueError(f"on TPU tm must be a multiple of 8 (got tm={tm}); "
                         f"omit it for auto-tuning")
    hl, hm = PK3._halo_l(k_steps), PK3._halo_m(k_steps)
    share = -(-L // n_dev)
    if tl > share:
        tl = share
    local_layers = -(-share // tl) * tl
    # The L-axis halo exchange refreshes hl = 2*k_steps layers from ONE
    # neighbor band, so every band needs >= 2 layers even at k_steps = 1:
    # grow the (validity-masked, zero-padded) band rather than silently
    # reading a wrong device's layers (regression: an 8x8x128 volume over 8
    # devices — 1-layer bands — returned a 5%-worse objective).
    if local_layers < 2:   # only reachable with tl == 1 (local is a
        local_layers = 2   # multiple of tl), so 2 keeps the tiling valid
    if 2 * k_steps > local_layers:
        k_fit = max(1, local_layers // 2)
        if explicit_k3:
            raise ValueError(
                f"k_steps={k_steps} needs a {2*k_steps}-layer halo but each "
                f"band has only {local_layers} layers; use k_steps<={k_fit} "
                f"or omit it for auto-tuning")
        k_steps = k_fit
        hl, hm = PK3._halo_l(k_steps), PK3._halo_m(k_steps)
    Lg = n_dev * local_layers
    mtiles = max(1, -(-M // tm))
    Mp = mtiles * tm + 2 * hm
    Ypad = jnp.pad(Y, ((0, Lg - L), (hm, Mp - hm - M), (0, Np - N)))

    variant = {"condat": "condat", "chambolle-pock": "cp",
               "chambolle-pock-acc": "cp-acc"}[method.lower()]
    cap = int(max_iters) or DEFAULT_COMBINER.max_iters_condat

    f = _banded3d_jit(mesh, axis, n_dev, L, M, N, k_steps, tl, tm, variant,
                      cap, gap_tol)
    Ys = _shard(Ypad, mesh, P(axis, None, None))
    x, info = f(Ys, jnp.asarray(lam, Y.dtype))
    return x[:L, hm:hm + M, :N], info


@functools.lru_cache(maxsize=64)
def _banded3d_jit(mesh, axis, n_dev, L, M, N, k_steps, tl, tm, variant, cap,
                  gap_tol):
    """Compiled banded 3D solver, cached per geometry (see _banded_jit)."""
    from functools import partial

    from ..models.tvnd import _run_pdhg3d_fused_banded
    from ..utils.config import DEFAULT_COMBINER

    f = jax.shard_map(
        partial(_run_pdhg3d_fused_banded, cap=cap, cfg=DEFAULT_COMBINER,
                variant=variant, axis_name=axis, L=L, M=M, N=N, n_dev=n_dev,
                gap_tol=gap_tol, k_steps=k_steps, tl=tl, tm=tm),
        mesh=mesh, in_specs=(P(axis, None, None), P()),
        out_specs=(P(axis, None, None), P()), check_vma=False)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _banded_jit(mesh, axis, n_dev, M, N, k_steps, tm, variant, cap, gap_tol,
                weighted=False):
    """Compiled banded solver, cached per geometry — rebuilding the
    shard_map + jit wrapper on every call would retrace (and on the remote-
    compile TPU tunnel, recompile) each time."""
    from functools import partial

    from ..models.tv2d import _run_pdhg_fused_banded
    from ..utils.config import DEFAULT_COMBINER

    band = P(axis, None)
    in_specs = (band, P()) + ((band, band) if weighted else ())
    f = jax.shard_map(
        partial(_run_pdhg_fused_banded, cap=cap, cfg=DEFAULT_COMBINER,
                variant=variant, axis_name=axis, M=M, N=N, n_dev=n_dev,
                gap_tol=gap_tol, k_steps=k_steps, tm=tm),
        mesh=mesh, in_specs=in_specs,
        out_specs=(band, P()), check_vma=False)
    return jax.jit(f)


def tv1_1d_banded(y, lam, mesh: Mesh, chunk: int = 5120, overlap: int = 640):
    """ONE huge 1D TV-L1 signal SPANNING the mesh (SURVEY §5.8's last
    corner; reference headline case src/condat_fast_tv.cpp:129-131).

    The signal is contiguously banded over the mesh's devices; each device
    solves its own overlapped-window sub-batch with the fused VMEM Newton
    kernel after ``ppermute``-ing ``overlap``-sample halos from its band
    neighbors, the glued dual's duality-gap certificate is ``psum``-reduced,
    and the escalation ladder (window resumes, half-chunk-shifted stitch via
    distributed segmented scans, dual PGD, plateau snap) runs entirely
    shard-resident — see :mod:`proxtv_tpu.ops.tv1d_long_banded`.

    Args:
        y: (n,) single long signal.
        lam: scalar penalty or (n-1,) per-edge weights.
        mesh: 1D device mesh; the signal is banded over its axis.
        chunk/overlap: window geometry (see
            :func:`proxtv_tpu.ops.tv1d_long.tv1_long`).

    Returns:
        (x, info): the (n,) solution and its (1,)-shaped SolverInfo
        certificate (rc = RC_ITERS reports an uncertified solve honestly —
        the banded ladder has no global-polish rung).
    """
    from ..utils.info import make_info

    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    y = jnp.asarray(y)
    (n,) = y.shape
    if not 1 <= overlap < chunk:
        # >= 1: the dual glue slices [overlap, overlap + chunk) from a
        # window dual that may be (win - 1)-wide on the XLA path.
        raise ValueError(f"overlap ({overlap}) must be in [1, chunk) "
                         f"(chunk = {chunk})")
    # Geometry: every device gets Kl windows of `chunk` owned samples; the
    # zero-padding past n is exactly decoupled by zero edge weights.
    Kl = max(1, -(-n // (chunk * n_dev)))
    B_l = Kl * chunk
    if chunk // 2 + overlap > B_l:
        raise ValueError("band too small for the jitter halo: need "
                         f"chunk//2 + overlap <= {B_l}")
    Ng = n_dev * B_l
    ypad = jnp.pad(y, (0, Ng - n))
    lam = jnp.asarray(lam, y.dtype)
    per_edge = lam.ndim >= 1
    if per_edge:
        if lam.shape != (n - 1,):
            raise ValueError(f"per-edge weights must be (n-1,) = ({n-1},), "
                             f"got {lam.shape}")
        lam_pad = jnp.pad(lam, (0, Ng - (n - 1)))
    f = _banded1d_jit(mesh, axis, n_dev, n, chunk, overlap, per_edge,
                      Kl)
    ys = _shard(ypad, mesh, P(axis))
    if per_edge:
        x, gap, iters, rc = f(ys, _shard(lam_pad, mesh, P(axis)))
    else:
        x, gap, iters, rc = f(ys, lam)
    return x[:n], make_info(iters, gap, rc)


@functools.lru_cache(maxsize=64)
def _banded1d_jit(mesh, axis, n_dev, n, chunk, overlap, per_edge, Kl):
    """Compiled banded long-1D solver, cached per geometry."""
    from functools import partial

    from ..ops.tv1d_long_banded import run_banded

    f = jax.shard_map(
        partial(run_banded, axis_name=axis, n_dev=n_dev, n=n, chunk=chunk,
                overlap=overlap),
        mesh=mesh,
        in_specs=(P(axis), P(axis) if per_edge else P()),
        out_specs=(P(axis), P(), P(), P()), check_vma=False)
    return jax.jit(f)


def tv_nd_sharded(Y, ws, ds, ps, mesh: Mesh, max_iters: int = 0,
                  method: str = "pd"):
    """Batched ND generalized TV with batch sharded over the mesh."""
    axis = mesh.axis_names[0]
    nd = jnp.asarray(Y).ndim
    Ys = _shard(jnp.asarray(Y), mesh, P(axis, *([None] * (nd - 1))))
    return tvnd.tv_nd_batched(Ys, tuple(ws), tuple(ds), tuple(ps),
                              max_iters=max_iters, method=method)
