"""Multi-host bake-farm orchestration (DCN scale-out).

The reference has no distributed execution at all (SURVEY.md §2.9); its
scalability story stops at OpenMP threads.  The TPU-native equivalent for
asset-farm bakes is two-level:

  * within a host: chips share ICI — the micro-triangle / bird-group axes
    shard over a local `Mesh` (parallel/shard.py), histograms psum over
    ICI;
  * across hosts: DCN is slow relative to ICI, so the farm partitions at
    the WORK-ITEM level — whole meshes (or whole subdivision-level groups
    of work items) are owned by exactly one host, and only the final
    deduplicated OMM blobs travel, via the serialization format
    (omm_tpu.serialize — versioned, hashed, LZ4).

`init_distributed` wires `jax.distributed` (GCE TPU pods auto-discover;
explicit coordinator otherwise); `partition_items` deterministically
assigns work items to processes (contiguous balanced ranges over the
morton-sorted item order, so each host bakes spatially-coherent OMMs and
cross-host dedup loss is minimized); `gather_results` merges each host's
serialized results.  All of it degenerates to a no-op single-partition
flow on one process, which is how the tests exercise it.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> tuple[int, int]:
    """Initialize jax.distributed when running multi-process; returns
    (process_id, num_processes).  Single-process callers get (0, 1)
    without touching jax.distributed."""
    import jax

    if num_processes is None or num_processes <= 1:
        return 0, 1
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


@dataclass
class Partition:
    """One host's slice of a bake: work-item indices it owns."""

    process_id: int
    item_indices: np.ndarray  # int64, indices into the global item list


def partition_items(costs: Sequence[int], num_processes: int) -> list[Partition]:
    """Deterministic balanced partition of work items by classification
    cost (4^subdiv per item): contiguous ranges over the given order so
    each host's set stays spatially coherent (items arrive morton-sorted
    from the bake pipeline).  Greedy prefix splitting at equal-cost
    boundaries — every process computes the identical partition."""
    costs = np.asarray(costs, dtype=np.int64)
    n = len(costs)
    if num_processes <= 1 or n == 0:
        return [Partition(0, np.arange(n, dtype=np.int64))]
    cum = np.cumsum(costs)
    total = int(cum[-1])
    bounds = [0]
    for p in range(1, num_processes):
        target = total * p // num_processes
        bounds.append(int(np.searchsorted(cum, target, side="left") + 1))
    bounds.append(n)
    bounds = np.clip(np.asarray(bounds), 0, n)
    out = []
    for p in range(num_processes):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        out.append(Partition(p, np.arange(lo, max(hi, lo), dtype=np.int64)))
    return out


def bake_partition(desc, partition: Partition, backend: str = "auto",
                   logger=None) -> bytes:
    """Bake only this host's triangles of `desc` and return the
    serialized result blob (the unit that travels over DCN).

    The partition is expressed per TRIANGLE: the host bakes the sub-mesh
    formed by its triangles (sharing the full texture), so dedup runs
    within the partition; spatially-contiguous partitions keep the
    dedup-loss across hosts small."""
    from .. import serialize as ser
    from ..bake import bake
    from ..types import BakeInputDesc

    idx = np.asarray(desc.index_buffer)[:desc.index_count].reshape(-1, 3)
    mine = idx[np.asarray(partition.item_indices)]
    sub = BakeInputDesc(**{**desc.__dict__,
                           "index_buffer": mine.reshape(-1),
                           "index_count": mine.size})
    result = bake(sub, backend=backend, logger=logger)
    d = ser.DeserializedDesc(flags=ser.SerializeFlags.COMPRESS,
                             result_descs=[result])
    return ser.serialize(d)


def gather_results(blobs: Sequence[bytes]):
    """Merge each host's serialized result back into per-partition
    results (transport layer: bytes over DCN / object store / files)."""
    from .. import serialize as ser

    return [ser.deserialize(b).result_descs[0] for b in blobs]
