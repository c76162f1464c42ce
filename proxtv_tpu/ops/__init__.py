"""Batched, jittable 1D solvers and primitives (the L0/L1 layers)."""
from . import diffprox, lp, tridiag, tv1d_l1, tv1d_l2, tv1d_lp  # noqa: F401
