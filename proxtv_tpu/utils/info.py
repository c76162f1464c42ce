"""Solver diagnostics: the TPU-native equivalent of the reference ``info`` array.

The reference library reports a 3-slot ``double info[]`` per solve —
``[INFO_ITERS, INFO_GAP, INFO_RC]`` (reference ``src/general.h:58-61``) — which the
Python layer then silently drops (``prox_tv/__init__.py:199-200``).  Here the
diagnostics are a first-class pytree, returned per *batch element* so that a batched
solve reports convergence of every fiber.

Return codes mirror ``src/general.h:70-73``:
    RC_OK = 0      converged below tolerance
    RC_ITERS = 1   stopped at max iterations (possibly suboptimal)
    RC_STUCK = 2   no further improvement possible
    RC_ERROR = 3   error during the solve
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

RC_OK = 0
RC_ITERS = 1
RC_STUCK = 2
RC_ERROR = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolverInfo:
    """Per-solve diagnostics pytree.

    Attributes:
        iters: number of outer iterations run (int32, batched).
        gap: final duality gap / stopping criterion value (same dtype as solve).
        rc: return code, one of RC_* (int32, batched).
    """

    iters: Any
    gap: Any
    rc: Any

    @staticmethod
    def single(iters=0, gap=0.0, rc=RC_OK, dtype=jnp.float32) -> "SolverInfo":
        # (1,)-shaped like every batched engine's per-signal info, so a
        # caller's info.gap[0] works identically across methods (the direct
        # scan engines use this; the iterative engines return B = 1 arrays).
        return SolverInfo(
            iters=jnp.asarray([iters], jnp.int32),
            gap=jnp.asarray([gap], dtype),
            rc=jnp.asarray([rc], jnp.int32),
        )


def make_info(iters, gap, rc) -> SolverInfo:
    return SolverInfo(
        iters=jnp.asarray(iters, jnp.int32),
        gap=gap,
        rc=jnp.asarray(rc, jnp.int32),
    )
