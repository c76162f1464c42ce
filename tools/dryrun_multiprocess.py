"""Multi-host (multi-process) correctness analog — VERDICT r3 item 6.

Child worker for ``__graft_entry__.dryrun_multiprocess()``: each of two
processes owns 4 virtual CPU devices (``xla_force_host_platform_device_count``)
and joins a ``jax.distributed`` coordination service, giving an 8-device
global mesh whose 4|4 boundary is a PROCESS (DCN-analog) boundary — the Gloo
CPU collective backend carries the ``ppermute``/``psum`` traffic across it.

What this pins down that the single-process virtual mesh cannot: the banded
shard_map programs contain nothing process-local — no host callbacks, no
per-process RNG divergence, no shape/layout decisions derived from
``jax.local_devices()`` — so the same programs are safe to lift onto a real
multi-host TPU slice (BASELINE.md's v4-16 scaling row) unchanged.

Exercised paths (mirroring the single-process dryrun):
  * cross-chip banded fused 2D PDHG (``parallel.tv1_2d_banded``) — halo
    ppermutes crossing the process boundary every K-step chunk;
  * banded long-1D (``parallel.tv1_1d_banded``) on a plateau signal that
    drives the FULL escalation ladder (distributed segmented scans,
    distributed-PCR Newton polish) across processes;
  * DP-sharded batched 1D (GSPMD over the global mesh).

Run (from __graft_entry__ or manually):
    python tools/dryrun_multiprocess.py <process_id> <coordinator_port>
"""
import os
import sys


def main(pid: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from proxtv_tpu import parallel
    from proxtv_tpu.ops import tv1d_l1

    assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8
    mesh = parallel.make_mesh(8)

    def check(name, x):
        ok = bool(jax.jit(lambda a: jnp.isfinite(a).all())(x))
        assert ok, f"{name}: non-finite output"
        print(f"[p{pid}] {name} ok", flush=True)

    # Banded fused 2D PDHG: one image row-banded over the 8 global devices;
    # the 4|4 row boundary is the process boundary.
    Yb = jnp.asarray(np.random.RandomState(5).randn(64, 40).astype(np.float32))
    x_b, info_b = parallel.tv1_2d_banded(Yb, 0.3, mesh, k_steps=2, tm=8,
                                         max_iters=48)
    assert x_b.shape == Yb.shape
    check("banded 2D PDHG", x_b)

    # Banded long-1D with the full escalation ladder (plateau geometry).
    n1 = 2048
    rs = np.random.RandomState(9)
    y1 = (np.repeat(rs.randn(-(-n1 // 48)), 48)[:n1]
          + 0.1 * rs.randn(n1)).astype(np.float32)
    x_l, info_l = parallel.tv1_1d_banded(jnp.asarray(y1), 1.5, mesh,
                                         chunk=128, overlap=32)
    assert x_l.shape == (n1,)
    check("banded long-1D (escalation ladder)", x_l)

    # DP-sharded batched 1D across the global mesh (GSPMD).
    y2 = jnp.asarray(np.random.RandomState(1).randn(16, 64).astype(np.float32))
    y2s = jax.device_put(y2, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("d", None)))
    x2 = tv1d_l1.tv1_batched(y2s, 0.5)
    check("DP-sharded batched 1D", x2)

    print(f"[p{pid}] dryrun_multiprocess worker done", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
