"""Host-side native runtime (C++ engine bindings)."""
from . import native  # noqa: F401
