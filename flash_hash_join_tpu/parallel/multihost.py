"""Multi-host initialization + pod-slice mesh construction.

NOT PRESENT in the reference (single node).  The north star
(BASELINE.json) demands a tier that scales 1 chip -> 1 host -> >= 2 hosts;
on TPU that is `jax.distributed.initialize` (one process per host, all
chips of the slice visible as global devices) plus a mesh whose axis order
puts the join's all_to_all on ICI within a host before DCN across hosts.

This image exposes one chip, so multi-host runs are validated structurally:
the same `build_distributed_join` graph compiles over any 1-D mesh (the
driver's dryrun runs it on 8 virtual devices), and this module is the
documented entry point for real slices.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Initialize jax.distributed for a multi-host pod slice.

    On Cloud TPU the arguments are discovered from the environment; pass
    them explicitly elsewhere.  Safe to call once per process, before any
    jax computation.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def pod_mesh(axis_name: str = "x") -> Mesh:
    """1-D mesh over ALL global devices of the slice, ordered host-major.

    Host-major order makes the hash shuffle's all_to_all between
    same-host destinations ride ICI; only the inter-host slices of the
    exchange cross DCN.  The join's device id is a hash bit-slice
    (parallel/shuffle.py), so the device count must be a power of two —
    true for TPU pod slices.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    if n & (n - 1):
        raise ValueError(f"pod size must be a power of two, got {n}")
    return Mesh(np.asarray(devs), (axis_name,))


def process_local_rows(n_global: int) -> tuple[int, int]:
    """(start, count) of this host's row range for building sharded inputs
    with jax.make_array_from_process_local_data-style feeding."""
    p = jax.process_index()
    np_ = jax.process_count()
    per = -(-n_global // np_)
    start = min(p * per, n_global)
    return start, min(per, n_global - start)
