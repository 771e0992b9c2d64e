"""Group-homogeneous batching (reference data/samplers/grouped_batch_sampler.py).

Batches only contain indices from one group (e.g. aspect-ratio bins / shape
buckets) — on TPU this is what bounds XLA recompilation to one program per
bucket.
"""

from __future__ import annotations

from typing import Iterable, List

__all__ = ["GroupedBatchSampler"]


class GroupedBatchSampler:
    def __init__(self, sampler: Iterable[int], group_ids: List[int], batch_size: int):
        self.sampler = sampler
        self.group_ids = list(group_ids)
        self.batch_size = batch_size

    def __iter__(self):
        buffer_per_group = {}
        for idx in self.sampler:
            group_id = self.group_ids[idx]
            buffer_per_group.setdefault(group_id, []).append(idx)
            if len(buffer_per_group[group_id]) == self.batch_size:
                yield buffer_per_group[group_id]
                buffer_per_group[group_id] = []
