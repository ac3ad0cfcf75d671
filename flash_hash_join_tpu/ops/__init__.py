"""Core column ops: hashing, tables, joins, and the north-star primitives
(hash-aggregate / filter / sort-partition) the joins decompose into."""

from flash_hash_join_tpu.ops.aggregate import hash_aggregate  # noqa: F401
from flash_hash_join_tpu.ops.filter import filter_columns  # noqa: F401
from flash_hash_join_tpu.ops.sort import (  # noqa: F401
    sort_u64,
    radix_partition_by_hash,
)
from flash_hash_join_tpu.ops.compact import compact_by_mask  # noqa: F401
