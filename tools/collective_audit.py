"""Collective-traffic audit: compile the sharded solvers on a virtual mesh
and count the communication ops GSPMD inserted in the optimized HLO.

This makes docs/SCALING.md's claims checkable without multi-chip hardware:
the batch-sharded (DP) solves must contain no array-data collectives (only
scalar convergence all-reduces), the fiber-sharded solve pays resharding
collectives per sweep, and the shard_map fused path must contain none at all.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python tools/collective_audit.py
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all", "collective-permute",
               "reduce-scatter")


def audit(name, fn, *args, shardings=None):
    """Compile fn(*args) and count collective ops (with payload bytes)."""
    lowered = jax.jit(fn).lower(*args)
    txt = lowered.compile().as_text()
    counts = {}
    bytes_by_op = {}
    for op in COLLECTIVES:
        # Lines look like:  %all-reduce.1 = f32[8]{0} all-reduce(...)
        pat = re.compile(r"= (\S+?) " + op + r"(?:-start|-done)?\(")
        shapes = pat.findall(txt)
        # -start/-done pairs describe one collective; count starts + plain.
        n = len(re.findall(op + r"(?:-start)?\(", txt)) - len(
            re.findall(op + r"-done\(", txt))
        if n > 0:
            counts[op] = n
            total = 0
            for s in shapes:
                m = re.match(r"(f32|f64|s32|pred|bf16|u32)\[([\d,]*)\]", s)
                if m:
                    dims = [int(d) for d in m.group(2).split(",") if d]
                    size = int(np.prod(dims)) if dims else 1
                    width = {"f64": 8, "f32": 4, "s32": 4, "u32": 4,
                             "bf16": 2, "pred": 1}[m.group(1)]
                    total += size * width
            bytes_by_op[op] = total
    print(f"{name:38s} " + (", ".join(
        f"{k} x{v} ({bytes_by_op.get(k, 0)} B)" for k, v in counts.items())
        or "NO collectives"))
    return counts, bytes_by_op


def main():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from proxtv_tpu import parallel
    from proxtv_tpu.models import tv2d
    from proxtv_tpu.ops import tv1d_l1

    mesh = parallel.make_mesh()
    ax = mesh.axis_names[0]
    rng = np.random.RandomState(0)

    # 1) batch-sharded 1D: DP, expect no collectives at all (direct engine).
    Y1 = jax.device_put(jnp.asarray(rng.randn(16, 64).astype(np.float32)),
                        NamedSharding(mesh, P(ax, None)))
    audit("1D scan, batch-sharded", lambda y: tv1d_l1.tv1_batched(y, 0.5), Y1)

    # 2) batch-sharded 2D DR: only the scalar convergence all-reduce.
    Y2 = jax.device_put(jnp.asarray(rng.randn(8, 32, 32).astype(np.float32)),
                        NamedSharding(mesh, P(ax, None, None)))
    audit("2D Davis-Yin, batch-sharded",
          lambda y: tv2d.tv1_2d_batched(y, 0.3, max_iters=10,
                                        use_fused=False)[0], Y2)

    # 3) fiber-sharded 2D (one image, columns sharded): resharding traffic.
    Yf = jax.device_put(jnp.asarray(rng.randn(1, 32, 64).astype(np.float32)),
                        NamedSharding(mesh, P(None, None, ax)))
    audit("2D Davis-Yin, cols-sharded",
          lambda y: tv2d.tv1_2d_batched(y, 0.3, max_iters=10,
                                        use_fused=False)[0], Yf)
    audit("2D PDHG (cp), cols-sharded",
          lambda y: tv2d.tv1_2d_batched(y, 0.3, method="chambolle-pock",
                                        max_iters=10, use_fused=False)[0], Yf)

    # 4) shard_map fused path: no collectives by construction.
    shard_map = jax.shard_map
    Ys = jax.device_put(jnp.asarray(rng.randn(8, 32, 32).astype(np.float32)),
                        NamedSharding(mesh, P(ax, None, None)))
    f = shard_map(
        lambda y: tv2d.tv1_2d_batched(y, 0.3, method="chambolle-pock",
                                      max_iters=10, use_fused=True)[0],
        mesh=mesh, in_specs=(P(ax, None, None),),
        out_specs=P(ax, None, None), check_vma=False)
    audit("2D PDHG, shard_map per-device", f, Ys)

    # 5) cross-chip banded fused PDHG: the only array traffic must be the
    # neighbor collective-permutes of the halo exchange, plus the scalar
    # psum of the certificate.
    Yb = jnp.asarray(rng.randn(64, 40).astype(np.float32))
    audit("2D banded fused (ppermute halos)",
          lambda y: parallel.tv1_2d_banded(y, 0.3, mesh, k_steps=2, tm=8,
                                           max_iters=48)[0], Yb)
    V3 = jnp.asarray(rng.randn(24, 12, 9).astype(np.float32))
    audit("3D banded fused (ppermute halos)",
          lambda v: parallel.tv1_3d_banded(v, 0.3, mesh, k_steps=1, tl=3,
                                           tm=8, max_iters=24)[0], V3)

    # 6) banded long-1D: the compiled program contains BOTH the fast path
    # (window halos + certificate psum) and the escalation ladder branch
    # (distributed segmented scans + distributed-PCR polish), so the static
    # count covers the worst case; the fast path executes only its own
    # halos + one psum (SCALING.md §2c).
    y1 = jnp.asarray(rng.randn(4096).astype(np.float32))
    audit("banded long-1D (full program)",
          lambda y: parallel.tv1_1d_banded(y, 0.7, mesh, chunk=256,
                                           overlap=32)[0], y1)


if __name__ == "__main__":
    main()
