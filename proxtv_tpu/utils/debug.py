"""Observability: the TPU-native equivalent of the reference's compile-time
DEBUG / TIMING instrumentation (reference src/general.h:36-46, §5.1-5.2 of
SURVEY.md).

The reference writes per-iteration dumps to a ``debug.tmp`` file behind a
recompile-only flag.  Here instrumentation is runtime-switchable via
environment variables and uses JAX-native facilities so it works inside jitted
code:

* ``PROXTV_TPU_DEBUG=1``  — solvers emit per-outer-iteration traces through
  ``jax.debug.print`` (works under jit; printed host-side).
* ``PROXTV_TPU_PROFILE=<dir>`` — :func:`profile_ctx` wraps a block in a
  ``jax.profiler.trace`` writing a TensorBoard-loadable trace.
"""
from __future__ import annotations

import contextlib
import os

import jax


def debug_enabled() -> bool:
    return os.environ.get("PROXTV_TPU_DEBUG", "0") not in ("", "0", "false")


def dprint(fmt: str, *args, **kwargs):
    """Iteration-trace print; no-op unless PROXTV_TPU_DEBUG is set.

    Usable inside jit (jax.debug.print semantics: pass traced values as
    args/kwargs, placeholders in fmt).
    """
    if debug_enabled():
        jax.debug.print(fmt, *args, **kwargs)


@contextlib.contextmanager
def profile_ctx(name: str = "proxtv"):
    """Profile a block into $PROXTV_TPU_PROFILE/<name> if set, else no-op."""
    base = os.environ.get("PROXTV_TPU_PROFILE", "")
    if not base:
        yield
        return
    path = os.path.join(base, name)
    with jax.profiler.trace(path):
        yield
