"""Shared runtime: difference ops, norms, configs, diagnostics, debug hooks."""
from . import checkpoint, config, debug, diffs, info, lpnorms  # noqa: F401
