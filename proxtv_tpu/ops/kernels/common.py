"""Shared lane-shift / row-padding helpers for the fused kernel family.

One definition for the full-width lane shifts every Pallas kernel's cyclic
reduction and stencil code uses (previously three byte-identical copies in
pcr.py / pn_fused.py / ms_fused.py — a fill-value or edge fix applied to one
copy could silently miss the others)."""
from __future__ import annotations

import jax.numpy as jnp


def shift_right(x, s, fill):
    """result[..., i] = x[..., i - s]; vacated lanes take ``fill``."""
    pad = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-s]], axis=-1)


def shift_left(x, s, fill):
    """result[..., i] = x[..., i + s]; vacated lanes take ``fill``."""
    pad = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
    return jnp.concatenate([x[..., s:], pad], axis=-1)


def pad_rows(x, tb):
    """Zero-pad the leading (row) axis up to a multiple of the tile height."""
    B = x.shape[0]
    Bp = -(-B // tb) * tb
    if Bp == B:
        return x
    return jnp.pad(x, ((0, Bp - B), (0, 0)))
