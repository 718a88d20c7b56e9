"""Input pipeline: host batching threads + device prefetch.

The reference uses torch DataLoader workers + per-batch .cuda() copies
(train_arco_2d.py:279-283). Here a background thread assembles numpy batches
(h5 read + host transform) while the device computes, and a two-deep prefetch
queue overlaps H2D transfer with the train step — the TPU never waits on the
host for ACDC-sized slices.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np


class Prefetcher:
    """Wrap a host batch iterator; keep ``depth`` batches in flight on
    device."""

    def __init__(self, it: Iterator, depth: int = 2, sharding=None):
        self.it = it
        self.depth = depth
        self.sharding = sharding
        self.buf = []

    def _put(self, batch):
        if self.sharding is not None:
            return jax.device_put(batch, self.sharding)
        return jax.device_put(batch)

    def __iter__(self):
        for batch in self.it:
            self.buf.append(self._put(batch))
            if len(self.buf) >= self.depth:
                yield self.buf.pop(0)
        while self.buf:
            yield self.buf.pop(0)


class TwoStreamPipeline:
    """Endless (labeled, unlabeled) batch pairs for the ARCO stage.

    Each ``next()`` returns a dict with image_l/label_l/image_u/label_u numpy
    arrays. Batch assembly runs in a worker thread.

    ``labeled_bs`` mirrors the reference's --labeled_bs split
    (train_arco_2d.py:35-36, train_arco_3d.py:34-35): ``batch_size`` is the
    TOTAL per-step batch, of which ``labeled_bs`` samples are labeled and
    the rest unlabeled. When ``labeled_bs`` is None both streams get
    ``batch_size`` samples (legacy equal-streams behavior used by the
    benches).
    """

    def __init__(self, dataset_l, dataset_u, batch_size: int, seed: int = 0,
                 queue_depth: int = 4, workers: int = 1,
                 labeled_bs: int = None):
        self.dataset_l = dataset_l
        self.dataset_u = dataset_u
        self.batch_size = batch_size
        if labeled_bs is None:
            self.bs_l = self.bs_u = batch_size
        else:
            if not 0 < labeled_bs < batch_size:
                raise ValueError(
                    f"labeled_bs ({labeled_bs}) must be in (0, batch_size="
                    f"{batch_size})")
            self.bs_l = labeled_bs
            self.bs_u = batch_size - labeled_bs
        self.seed = seed
        self.q: "queue.Queue" = queue.Queue(maxsize=queue_depth)
        self._stop = threading.Event()
        self.threads = [threading.Thread(target=self._worker, args=(w,),
                                         daemon=True)
                        for w in range(workers)]
        for t in self.threads:
            t.start()

    def _assemble(self, dataset, idxs, rng):
        samples = [dataset.get(i, rng) for i in idxs]
        return (np.stack([s["image"] for s in samples]),
                np.stack([s["label"] for s in samples]))

    def _worker(self, wid: int):
        rng = np.random.RandomState(self.seed + 1000 * wid)
        n_l, n_u = len(self.dataset_l), len(self.dataset_u)
        while not self._stop.is_set():
            li = rng.randint(0, n_l, size=self.bs_l)
            ui = rng.randint(0, n_u, size=self.bs_u)
            img_l, lab_l = self._assemble(self.dataset_l, li, rng)
            img_u, lab_u = self._assemble(self.dataset_u, ui, rng)
            batch = {"image_l": img_l, "label_l": lab_l,
                     "image_u": img_u, "label_u": lab_u}
            while not self._stop.is_set():
                try:
                    self.q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        return self.q.get()

    def close(self):
        self._stop.set()
