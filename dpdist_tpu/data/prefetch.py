"""Background-thread batch prefetching for host-side datasets.

The reference's hot loop assembles every batch synchronously on the host
between sess.run calls (train_multi_gpu_pc_compare_dist.py:732-804); on
TPU the numpy batch assembly (txt-cache reads, augmentation, label
layout) would serialize with the device step. PrefetchingLoader overlaps
the two: a daemon thread drains the dataset iterator into a bounded
queue while the trainer consumes it, preserving batch order.
"""

from __future__ import annotations

import queue
import threading

_SENTINEL = object()


class PrefetchingLoader:
    """Wrap a next_batch/has_next_batch/reset dataset (the reference's
    iterator protocol, modelnet_dataset.py:167-187) with a depth-bounded
    background producer.

    epoch() resets the dataset and yields each batch in order; exceptions
    in the producer are re-raised in the consumer.
    """

    def __init__(self, dataset, *, augment: bool = False, depth: int = 2):
        self.dataset = dataset
        self.augment = augment
        self.depth = int(depth)

    def epoch(self):
        self.dataset.reset()
        q: queue.Queue = queue.Queue(maxsize=self.depth)

        def produce():
            try:
                while self.dataset.has_next_batch():
                    q.put(self.dataset.next_batch(augment=self.augment))
                q.put(_SENTINEL)
            except BaseException as e:  # surfaced in the consumer
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()
