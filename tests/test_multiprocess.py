"""The multi-host (2-process x 4-device jax.distributed) dryrun must stay
green: it pins that the banded shard_map programs contain nothing
process-local (SCALING.md §3)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multiprocess():
    import __graft_entry__

    __graft_entry__.dryrun_multiprocess(timeout=600)
