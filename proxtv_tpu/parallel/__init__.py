"""Multi-chip sharded entry points over jax.sharding device meshes."""
from .sharded import (  # noqa: F401
    make_mesh,
    tv1_1d_sharded,
    tv2_1d_sharded,
    tvp_1d_sharded,
    tv1_2d_sharded,
    tv1_1d_banded,
    tv1_2d_banded,
    tv1w_2d_banded,
    tv1_3d_banded,
    tv1_2d_sharded_fused,
    tv1w_2d_sharded_fused,
    tv_nd_sharded,
)
