"""proxtv_tpu — a TPU-native total-variation proximity-operator framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of proxTV
(reference: albarji/proxTV): fast solvers for TV-L1 / TV-L2 / TV-Lp proximity
problems on 1D/2D/3D/ND signals, with scalar or per-edge weights, built
TPU-first — batched fibers instead of OpenMP threads, masked cyclic-reduction
tridiagonal solves instead of LAPACK, lock-step scan state machines instead of
pointer-chasing, and jax.sharding meshes for multi-chip scale.

Public API mirrors the reference Python surface (prox_tv/__init__.py):
``tv1_1d, tv1w_1d, tv2_1d, tvp_1d, tv1_2d, tv1w_2d, tvp_2d, tvgen`` — plus the
batched / jittable functional layer in :mod:`proxtv_tpu.ops` and the sharded
multi-chip entry points in :mod:`proxtv_tpu.parallel`.
"""

from .api import (  # noqa: F401
    tv,
    tv1_1d,
    tv1w_1d,
    tv2_1d,
    tvp_1d,
    tv1_2d,
    tv1w_2d,
    tvp_2d,
    tvgen,
    tvgen_nd,
    tv_value,
)
from .utils.info import SolverInfo, RC_OK, RC_ITERS, RC_STUCK, RC_ERROR  # noqa: F401

__version__ = "0.1.0"
