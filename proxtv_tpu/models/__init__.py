"""Multidimensional proximal combiners (the L2 layer)."""
from . import tv2d, tvnd  # noqa: F401
