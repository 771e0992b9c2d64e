"""Index samplers.

Parity with detectron2/data/samplers/distributed_sampler.py:43-199:
``TrainingSampler`` (infinite shuffled stream, rank-sliced
``indices[rank::world]``), ``RepeatFactorTrainingSampler`` (LVIS-style
category rebalancing with sqrt repeat factors) and ``InferenceSampler``
(exact contiguous sharding).  On TPU "rank" is the JAX process index — with
one process driving all local chips the global batch is simply sharded over
the mesh instead.
"""

from __future__ import annotations

import itertools
import math
from collections import defaultdict
from typing import List, Optional

import numpy as np

from ...utils import comm

__all__ = ["TrainingSampler", "RepeatFactorTrainingSampler", "InferenceSampler"]


class TrainingSampler:
    def __init__(self, size: int, shuffle: bool = True, seed: Optional[int] = None):
        self._size = size
        assert size > 0
        self._shuffle = shuffle
        self._seed = int(seed if seed is not None else comm.shared_random_seed())
        self._rank = comm.get_rank()
        self._world_size = comm.get_world_size()

    def __iter__(self):
        start = self._rank
        yield from itertools.islice(self._infinite_indices(), start, None, self._world_size)

    def _infinite_indices(self):
        rng = np.random.RandomState(self._seed)
        while True:
            if self._shuffle:
                yield from rng.permutation(self._size)
            else:
                yield from np.arange(self._size)


class RepeatFactorTrainingSampler:
    """Repeat images containing rare categories (reference :57-169)."""

    def __init__(self, dataset_dicts, repeat_thresh: float, shuffle: bool = True, seed=None):
        self._shuffle = shuffle
        self._seed = int(seed if seed is not None else comm.shared_random_seed())
        self._rank = comm.get_rank()
        self._world_size = comm.get_world_size()

        # category frequency over images
        category_freq = defaultdict(int)
        for dataset_dict in dataset_dicts:
            cat_ids = {ann["category_id"] for ann in dataset_dict["annotations"]}
            for cat_id in cat_ids:
                category_freq[cat_id] += 1
        num_images = len(dataset_dicts)
        for k, v in category_freq.items():
            category_freq[k] = v / num_images

        # r(c) = max(1, sqrt(t / f(c)))
        category_rep = {
            cat_id: max(1.0, math.sqrt(repeat_thresh / cat_freq))
            for cat_id, cat_freq in category_freq.items()
        }
        # r(I) = max over categories in image
        rep_factors = []
        for dataset_dict in dataset_dicts:
            cat_ids = {ann["category_id"] for ann in dataset_dict["annotations"]}
            rep_factors.append(max({category_rep[c] for c in cat_ids}, default=1.0))
        self._int_part = np.trunc(rep_factors)
        self._frac_part = np.asarray(rep_factors) - self._int_part

    def _get_epoch_indices(self, rng) -> np.ndarray:
        rands = rng.rand(len(self._frac_part))
        rep_factors = self._int_part + (rands < self._frac_part)
        indices = []
        for dataset_index, rep_factor in enumerate(rep_factors):
            indices.extend([dataset_index] * int(rep_factor))
        return np.asarray(indices, dtype=np.int64)

    def __iter__(self):
        start = self._rank
        yield from itertools.islice(self._infinite_indices(), start, None, self._world_size)

    def _infinite_indices(self):
        rng = np.random.RandomState(self._seed)
        while True:
            indices = self._get_epoch_indices(rng)
            if self._shuffle:
                yield from indices[rng.permutation(len(indices))]
            else:
                yield from indices


class InferenceSampler:
    """Each process gets a contiguous, exactly-partitioned index range."""

    def __init__(self, size: int):
        self._size = size
        assert size > 0
        self._rank = comm.get_rank()
        self._world_size = comm.get_world_size()
        shard_size = (self._size - 1) // self._world_size + 1
        begin = shard_size * self._rank
        end = min(shard_size * (self._rank + 1), self._size)
        self._local_indices = range(begin, end)

    def __iter__(self):
        yield from self._local_indices

    def __len__(self):
        return len(self._local_indices)
