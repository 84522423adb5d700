"""DataContext configuration for the engine.

The engine relies on Ray Data's **hash-shuffle** strategy for keyed
repartition (doc reassembly), hash aggregates and hash joins. The strategy is
snapshotted into each Dataset at creation time, so it must be set *before*
sources are created — importing this package sets it once.

IMPORTANT: hash-shuffle operators default to ``num_partitions=200``, which on
a small node fans out hundreds of aggregator workers. Every keyed op in this
package passes an explicit partition count, sized to the cluster via
:func:`default_num_partitions`.
"""

from __future__ import annotations

import ray
import ray.data
from ray.data.context import ShuffleStrategy


def ensure_hash_shuffle() -> None:
    ctx = ray.data.DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE


def default_num_partitions(per_cpu: int = 2, floor: int = 8, cap: int = 512) -> int:
    """Shuffle partition count ∝ cluster CPUs (2 waves per core by default).

    At multi-node scale more partitions bound per-partition memory; the cap
    keeps coordinator overhead sane on a single test node.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover
        cpus = 8
    return max(floor, min(cap, cpus * per_cpu))
