"""Distributed join tier: mesh, shuffle, hot keys, drivers, multi-host."""

from flash_hash_join_tpu.parallel.mesh import data_mesh  # noqa: F401
from flash_hash_join_tpu.parallel.distributed_join import (  # noqa: F401
    build_distributed_join,
    distributed_join_exact,
    shard_columns,
)
from flash_hash_join_tpu.parallel.multihost import (  # noqa: F401
    initialize_multihost,
    pod_mesh,
)
