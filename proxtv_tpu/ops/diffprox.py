"""Differentiable TV proximity operators (custom VJP).

The reference library is solver-only; a TPU-native framework should compose
with gradient-based learning (prox layers, unrolled optimization, bilevel
hyperparameter tuning).  The iterative solvers use ``lax.while_loop`` and are
not reverse-differentiable, but the *solution map* of the TV-L1 prox has a
closed-form generalized Jacobian:

    x* = prox_{lam TV}(y) is piecewise constant; on each constant segment S
    the optimality conditions pin x*_S = mean(y_S) + (boundary dual terms
    independent of y_S to first order), so  dx*/dy = P = block-diagonal
    averaging over the segments of x*.   P is symmetric (P = P^T), hence the
    VJP of g is also the segment-mean of g.

d/d lam: on each segment, d x*_S / d lam = (s_out - s_in)/|S| where s_in/s_out
in {-1, 0, +1} are the signs of the jumps into/out of the segment (0 at the
ends) — the standard taut-string sensitivity.  Both derivatives are exact a.e.
(the solution map is piecewise affine in (y, lam)).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import tv1d_l1

_SEG_TOL = 1e-6       # 1D: engines are exact to solver tolerance
_SEG_TOL_2D = 1e-4    # 2D: combiners stop at mean-change 1e-6, leaving
                      # truly-flat edges at ~1e-5 residual jumps — classify
                      # relative to that convergence level, not exactness.


def _segment_mean(v, seg_start):
    """Per-row segment means: seg_start (B, n) bool marks segment heads."""
    B, n = v.shape
    # Segment id per element, then mean via segment sums computed with cumsum
    # differences gathered through an associative fill of head indices.
    idx = jnp.arange(n)[None, :]
    head_idx = jnp.where(seg_start, idx, 0)
    head = jax.lax.associative_scan(jnp.maximum, head_idx, axis=1)  # segment head of each elem
    cs = jnp.cumsum(v, axis=1)
    cs0 = jnp.concatenate([jnp.zeros((B, 1), v.dtype), cs[:, :-1]], axis=1)
    # tail: next head - 1 (computed via reverse min of head indices of successors)
    nxt_head = jnp.concatenate(
        [jnp.where(seg_start[:, 1:], idx[:, 1:], n), jnp.full((B, 1), n)], axis=1)
    tail_excl = jax.lax.associative_scan(jnp.minimum, nxt_head, axis=1,
                                         reverse=True)  # first head index > i
    seg_sum = jnp.take_along_axis(cs, jnp.clip(tail_excl - 1, 0, n - 1), axis=1) \
        - jnp.take_along_axis(cs0, head, axis=1)
    seg_len = (tail_excl - head).astype(v.dtype)
    return seg_sum / seg_len, seg_len, head, tail_excl


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def tv1_prox(y, lam, method: str = "pn"):
    """Differentiable batched 1D TV-L1 prox: (B, n), scalar/batched lam.

    Forward = the requested engine; backward = exact generalized Jacobian
    (segment averaging for y; jump-sign sensitivity for lam).
    """
    return tv1d_l1.tv1_batched(y, lam, method=method)


def _fwd(y, lam, method):
    x = tv1d_l1.tv1_batched(y, lam, method=method)
    return x, (x, jnp.asarray(lam))


def _bwd(method, res, g):
    x, lam = res
    B, n = x.shape
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(x), axis=1, keepdims=True))
    jump = x[:, 1:] - x[:, :-1]
    is_boundary = jnp.abs(jump) > _SEG_TOL * scale
    seg_start = jnp.concatenate(
        [jnp.ones((B, 1), bool), is_boundary], axis=1)
    gmean, seg_len, head, tail_excl = _segment_mean(g, seg_start)
    gy = gmean  # P^T g = P g (averaging projector, symmetric)

    # d x / d lam per element: (sign(jump_out) - sign(jump_in)) / |S|
    sj = jnp.sign(jump) * is_boundary
    s_in = jnp.concatenate([jnp.zeros((B, 1), x.dtype), sj], axis=1)
    s_out = jnp.concatenate([sj, jnp.zeros((B, 1), x.dtype)], axis=1)
    s_in_h = jnp.take_along_axis(s_in, head, axis=1)
    s_out_t = jnp.take_along_axis(s_out, jnp.clip(tail_excl - 1, 0, n - 1),
                                  axis=1)
    dxdlam = (s_out_t - s_in_h) / seg_len
    glam_b = jnp.sum(g * dxdlam, axis=1)
    glam = jnp.sum(glam_b) if lam.ndim == 0 else glam_b
    return gy, glam.astype(lam.dtype)


tv1_prox.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# 2D: the anisotropic TV-L1 solution is piecewise constant on 4-connected flat
# components; the same stationarity argument gives dX*/dY = component-wise
# averaging (symmetric projector), so the VJP is the component mean of g.
# ---------------------------------------------------------------------------


def _component_labels(flat_r, flat_c, shape):
    """Min-label propagation over 4-connected flat edges.

    flat_r (B, M, N-1) / flat_c (B, M-1, N): True where the solution is flat
    across the edge.  Returns (B, M, N) int32 component labels (minimum linear
    index in each component)."""
    B, M, N = shape
    lab0 = jnp.broadcast_to(
        (jnp.arange(M)[:, None] * N + jnp.arange(N)[None, :])[None], shape
    ).astype(jnp.int32)
    big = jnp.int32(M * N)

    def nbr_min(lab):
        right = jnp.concatenate(
            [jnp.where(flat_r, lab[:, :, 1:], big), jnp.full((B, M, 1), big)],
            axis=2)
        left = jnp.concatenate(
            [jnp.full((B, M, 1), big), jnp.where(flat_r, lab[:, :, :-1], big)],
            axis=2)
        down = jnp.concatenate(
            [jnp.where(flat_c, lab[:, 1:, :], big), jnp.full((B, 1, N), big)],
            axis=1)
        up = jnp.concatenate(
            [jnp.full((B, 1, N), big), jnp.where(flat_c, lab[:, :-1, :], big)],
            axis=1)
        return jnp.minimum(jnp.minimum(lab, jnp.minimum(left, right)),
                           jnp.minimum(up, down))

    def cond(state):
        lab, changed = state
        return changed

    def body(state):
        lab, _ = state
        # Doubling trick: two hops per iteration keeps the loop count near
        # O(log diameter) on convex-ish components, O(diameter) worst case.
        lab2 = nbr_min(nbr_min(lab))
        return lab2, jnp.any(lab2 != lab)

    lab, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True)))
    return lab


def _component_mean(g, labels):
    """Mean of g over each labeled component (labels = per-image linear ids)."""
    B, M, N = g.shape
    offs = (jnp.arange(B, dtype=jnp.int32) * (M * N))[:, None]
    ids = (labels.reshape(B, -1) + offs).reshape(-1)
    v = g.reshape(-1)
    sums = jax.ops.segment_sum(v, ids, num_segments=B * M * N)
    cnts = jax.ops.segment_sum(jnp.ones_like(v), ids, num_segments=B * M * N)
    return (sums[ids] / cnts[ids]).reshape(B, M, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def tv2d_prox(Y, lam, method: str = "dr", max_iters: int = 0):
    """Differentiable batched 2D anisotropic TV-L1 prox on (B, M, N).

    Forward = the requested combiner; backward = exact generalized Jacobian
    (4-connected flat-component averaging).  lam receives no gradient (pass-
    through zero) — use :func:`tv1_prox` for 1D lam sensitivity or finite
    differences for 2D hyperparameter tuning.
    """
    from ..models import tv2d

    return tv2d.tv1_2d_batched(Y, lam, method=method, max_iters=max_iters)[0]


def _fwd2(Y, lam, method, max_iters):
    from ..models import tv2d

    X = tv2d.tv1_2d_batched(Y, lam, method=method, max_iters=max_iters)[0]
    return X, (X, jnp.asarray(lam))


def _bwd2(method, max_iters, res, g):
    X, lam = res
    B, M, N = X.shape
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(X.reshape(B, -1)), axis=1))
    tol = (_SEG_TOL_2D * scale)[:, None, None]
    flat_r = jnp.abs(X[:, :, 1:] - X[:, :, :-1]) <= tol
    flat_c = jnp.abs(X[:, 1:, :] - X[:, :-1, :]) <= tol
    labels = _component_labels(flat_r, flat_c, X.shape)
    gY = _component_mean(g, labels)
    return gY, jnp.zeros_like(lam)


tv2d_prox.defvjp(_fwd2, _bwd2)
