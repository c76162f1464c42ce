"""Solver-state checkpoint/resume.

The reference's only persistence concept is the in-memory Workspace warm
restart (SURVEY.md §5.5).  Here solver state — the dual vectors that the
combiners thread across iterations — is an explicit pytree, so long-running
large-scale solves can be checkpointed to disk and resumed (e.g. preemptible
TPU jobs).  Uses orbax when available, with a numpy ``.npz`` fallback.

Usage::

    from proxtv_tpu.utils import checkpoint as ckpt
    ckpt.save("/path/state", {"w_col": w_col, "w_row": w_row, "x": x})
    state = ckpt.restore("/path/state")
"""
from __future__ import annotations

import os

import numpy as np

import jax


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save(path: str, state) -> str:
    """Persist a pytree of arrays.  Returns the written path."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, state, force=True)
        return path
    except Exception:  # noqa: BLE001 — orbax unavailable/incompatible
        path = path if path.endswith(".npz") else path + ".npz"
        leaves, treedef = _flatten(state)
        np.savez(path, treedef=np.frombuffer(
            repr(treedef).encode(), dtype=np.uint8),
            **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)})
        return path


def restore(path: str, like=None):
    """Load a pytree saved by :func:`save`.

    For the npz fallback, ``like`` (a pytree with the same structure) is
    required to rebuild the structure; with orbax it is optional.
    """
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(path)
    npz = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
    if like is not None:
        _, treedef = _flatten(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return leaves
