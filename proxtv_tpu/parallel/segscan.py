"""Distributed segmented scans over a 1D-banded signal (shard_map-resident).

The long-signal escalation rungs (plateau snap, pinned-region stitch — see
``ops/tv1d_long.py``) need per-element segment statistics (mean, min) where
segments may SPAN device boundaries.  Locally these are the unrolled
log-shift scans of ``tv1d_long._segment_mean_scan`` (``lax.associative_scan``
with a tuple operator compiles pathologically on the TPU backend at n ~ 1e6);
the cross-device composition ``all_gather``s ONE (open-boundary value,
has-boundary flag) summary per device and chains the carries with an
unrolled loop over the static mesh size — O(log n_local) local work plus one
tiny collective per scan direction.

Segment conventions match the local helpers: ``seg_start`` marks the FIRST
element of each segment (element 0 of the global signal is always a start);
values accumulate inclusively from the segment head (forward) / tail
(reverse).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _shift(a, k, fill, left):
    """Shift the last axis by k (fill-padded): right shift brings a[i-k]."""
    n = a.shape[-1]
    if k >= n:
        return jnp.full_like(a, fill)
    pad = [(0, 0)] * (a.ndim - 1)
    if left:
        return jnp.pad(a[..., k:], pad + [(0, k)], constant_values=fill)
    return jnp.pad(a[..., :-k], pad + [(k, 0)], constant_values=fill)


def _local_scan(v, s, op, fill, reverse):
    """Inclusive segmented scan within the local block: v[..., i] becomes
    op over [head_i, i] (forward) or [i, tail_i] (reverse), where head/tail
    is the nearest set flag (or the block boundary); s becomes the
    propagated any-flag-seen indicator (cummax of s toward i)."""
    n = v.shape[-1]
    k = 1
    while k < n:
        vs = _shift(v, k, fill, left=reverse)
        ss = _shift(s, k, 0.0, left=reverse)
        v = op(v, jnp.where(s > 0, fill, vs))
        s = jnp.maximum(s, ss)
        k <<= 1
    return v, s


def dist_seg_scan(v, flags, op, fill, axis_name, n_dev: int, reverse=False):
    """Distributed inclusive segmented scan of ``v`` (rows (..., n_local))
    with shared per-position ``flags`` ((n_local,) float 0/1: forward =
    segment starts, reverse = segment ends), composed across the 1D device
    band ``axis_name`` of static size ``n_dev``."""
    v, s = _local_scan(v, jnp.broadcast_to(flags, v.shape), op, fill, reverse)
    if n_dev == 1:
        return v
    edge = 0 if reverse else -1
    v_b = lax.all_gather(v[..., edge], axis_name)        # (D, ...)
    s_b = lax.all_gather(s[..., edge], axis_name)
    carry = jnp.full_like(v_b[0], fill)
    carries = [carry]
    if reverse:
        # carry entering device d comes from devices d+1..D-1
        for d in range(n_dev - 2, -1, -1):
            carry = op(v_b[d + 1], jnp.where(s_b[d + 1] > 0, fill, carries[-1]))
            carries.append(carry)
        carries = carries[::-1]
    else:
        for d in range(1, n_dev):
            carry = op(v_b[d - 1], jnp.where(s_b[d - 1] > 0, fill, carries[-1]))
            carries.append(carry)
    my = jnp.stack(carries)[lax.axis_index(axis_name)]
    return op(v, jnp.where(s > 0, fill, my[..., None]))


def segment_mean(x, seg_start, axis_name, n_dev: int, seg_end=None):
    """Per-element mean of the (possibly cross-device) segment containing
    each element.  ``seg_start``: (n_local,) bool/float segment-start flags;
    ``seg_end``: segment-end flags (= seg_start shifted left by one with the
    right neighbor's halo; the caller supplies it because only it knows the
    band topology — pass ``seg_start[1:]`` + halo)."""
    add = jnp.add
    f = seg_start.astype(x.dtype)
    fe = seg_end.astype(x.dtype)
    stacked = jnp.stack([x, jnp.ones_like(x)])
    fwd = dist_seg_scan(stacked, f, add, 0.0, axis_name, n_dev)
    rev = dist_seg_scan(stacked, fe, add, 0.0, axis_name, n_dev,
                        reverse=True)
    tot = fwd[0] + rev[0] - x
    cnt = fwd[1] + rev[1] - 1.0
    return tot / cnt


def segment_min(v, seg_start, axis_name, n_dev: int, seg_end=None):
    """Per-element minimum over the (possibly cross-device) segment."""
    big = jnp.asarray(jnp.finfo(v.dtype).max, v.dtype)
    f = seg_start.astype(v.dtype)
    fe = seg_end.astype(v.dtype)
    fwd = dist_seg_scan(v, f, jnp.minimum, big, axis_name, n_dev)
    rev = dist_seg_scan(v, fe, jnp.minimum, big, axis_name, n_dev,
                        reverse=True)
    return jnp.minimum(fwd, rev)
