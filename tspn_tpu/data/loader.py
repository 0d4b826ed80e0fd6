"""Bucketed, shuffled, iteration-based segment loader.

Replaces the reference's DataLoader stack (lib/dataset/build.py:57-88,
samplers/distributed.py, samplers/iteration_based_batch_sampler.py,
samplers/grouped_batch_sampler.py) with one host-side iterator that:

  * shuffles deterministically per epoch (epoch-seeded permutation, the
    DistributedSampler recipe at samplers/distributed.py:42-60),
  * shards the stream across JAX processes (rank = jax.process_index()),
  * groups segments by tracklet-count bucket — the shape-bucketing
    equivalent of the reference's aspect-ratio GroupedBatchSampler — so
    every emitted batch compiles to one XLA program,
  * loops for MAX_ITER batches like IterationBasedBatchSampler
    (samplers/iteration_based_batch_sampler.py:16-29),
  * prefetches with a background thread (the reference burned worker
    processes; segment h5 reads are IO-bound so a thread suffices).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from tspn_tpu.data.vrdataset import (
    SegmentDataset,
    batch_buffers,
    fill_padded,
    pick_bucket,
)


class BucketedLoader:
    """Yields (bucket, batch_dict, indices) tuples of fixed shapes."""

    def __init__(
        self,
        dataset: SegmentDataset,
        buckets: Sequence[int],
        batch_size: int,
        feature_dim: int,
        num_predicates: int,
        num_objects: int,
        max_iter: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
        prefetch: int = 2,
        include_records: bool = False,
        feats_dtype=None,
        include_labels: bool = True,
        skip_batches: int = 0,
    ):
        self.dataset = dataset
        self.buckets = sorted(buckets)
        self.batch_size = batch_size
        self.feature_dim = feature_dim
        self.num_predicates = num_predicates
        self.num_objects = num_objects
        self.max_iter = max_iter
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.prefetch = prefetch
        self.include_records = include_records
        # inference loaders skip label reading/matching/padding entirely
        # (no consumer; the label leaves were a measurable host cost)
        self.include_labels = include_labels
        # resume support: fast-forward the deterministic batch stream by
        # skip_batches positions (index groups are drawn but NOT
        # assembled), so a resumed run continues at the exact stream
        # position its checkpoint stopped at instead of re-training on
        # positions 0..N. Counts against max_iter: the loader then
        # yields max_iter - skip_batches batches.
        self.skip_batches = int(skip_batches)
        import numpy as _np

        self.feats_dtype = feats_dtype or _np.float32
        # bucket assignment is static per segment: probe proposal counts
        # once via the cheap trackid-only read (a full load_segment here
        # would read + label-match every h5 twice per epoch on the
        # single-core host)
        self._bucket_of = [
            pick_bucket(dataset.num_proposals_of(i), self.buckets)
            for i in range(len(dataset))
        ]

    def __len__(self) -> int:
        if self.max_iter is not None:
            return self.max_iter
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def _epoch_order(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.RandomState(self.seed + epoch).permutation(n)
        else:
            order = np.arange(n)
        # pad to a multiple of world_size then take this rank's strided shard
        if self.world_size > 1:
            pad = (-len(order)) % self.world_size
            if pad:
                order = np.concatenate([order, order[:pad]])
            order = order[self.rank:: self.world_size]
        return order

    def _batches(self) -> Iterator[Tuple[int, List[int]]]:
        """Infinite stream of (bucket, indices) groups."""
        epoch = 0
        pending: Dict[int, List[int]] = {b: [] for b in self.buckets}
        while True:
            for i in self._epoch_order(epoch):
                b = self._bucket_of[i]
                pending[b].append(int(i))
                if len(pending[b]) == self.batch_size:
                    yield b, pending[b]
                    pending[b] = []
            # flush leftovers at epoch end, padding by repetition so the
            # batch shape stays fixed
            for b, idxs in pending.items():
                if idxs:
                    full = (idxs * self.batch_size)[: self.batch_size]
                    yield b, full
            pending = {b: [] for b in self.buckets}
            epoch += 1
            if self.max_iter is None and epoch > 0:
                return

    def _assemble(self, bucket: int, idxs: List[int]):
        if self.include_labels:
            records = [self.dataset.load_segment(i) for i in idxs]
        else:
            records = [
                self.dataset.load_segment(i, with_labels=False) for i in idxs
            ]
        bufs = batch_buffers(
            records[0], len(records), bucket, self.num_predicates,
            self.num_objects, self.feature_dim, feats_dtype=self.feats_dtype,
        )
        for b, r in enumerate(records):
            fill_padded(bufs, b, r, bucket)
        out = (bucket, bufs, [r.index for r in records])
        if self.include_records:
            out = out + (records,)
        return out

    def __iter__(self):
        stream = self._batches()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        # skipped positions count against max_iter but are never
        # assembled — the per-epoch shuffle is seed-deterministic, so
        # draining the index stream reproduces a prior run's position
        count = [self.skip_batches]

        def producer():
            try:
                for _ in range(self.skip_batches):
                    if next(stream, None) is None:
                        break
                for bucket, idxs in stream:
                    if stop.is_set() or (
                        self.max_iter is not None and count[0] >= self.max_iter
                    ):
                        break
                    item = self._assemble(bucket, idxs)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    count[0] += 1
            except BaseException as exc:  # surface IO errors to the consumer
                _put_or_stop(("__loader_error__", exc))
                return
            _put_or_stop(sentinel)

        def _put_or_stop(item):
            # never block indefinitely: an early-exiting consumer leaves
            # the bounded queue full and only sets `stop`
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return
                except queue.Full:
                    continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        emitted = 0
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    return
                if isinstance(item, tuple) and len(item) == 2 and item[0] == "__loader_error__":
                    raise item[1]
                yield item
                emitted += 1
                if self.max_iter is not None and emitted >= self.max_iter:
                    return
        finally:
            stop.set()  # unblock a producer stuck on a full queue
