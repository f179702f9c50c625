"""Host-side batch production for training/validation.

The reference uses torch ``Dataset`` + ``DataLoader`` worker processes that
run the full transform chain per patch on the host
(batch/dataset.py:30-113, pipeline_train_predict/train.py:35-110).  Here the
host only *extracts raw crops* (sampler -> reader -> crop) and batches them;
every transform runs fused on device (crimac_unet_tpu.ops).  Prefetching is
a thread pool + bounded queue feeding the device, replacing DataLoader
worker forks.

Batch layout: data (B, C, wh, ww) float32 raw sv, labels (B, wh, ww) int32
raw codes, seabed_row (B, ww) int32 patch-row of seabed+pad (BIG_ROW where
absent/outside data).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from ..constants import SEABED_PAD
from ..ops.label_ops import BIG_ROW


def seabed_patch_row(reader, center, window) -> np.ndarray:
    """Per-column patch row index of the first masked (below-seabed) pixel,
    including the +SEABED_PAD shift (reference mask_label_seabed.py:24-68).
    Columns outside the data or without a seabed get BIG_ROW."""
    wh, ww = window
    # crop-origin convention shared with utils/grids.crop_bounds
    # ((N+1)//2 == N//2 for even N, the reference getGrid offsets)
    y0 = int(center[0]) - (wh + 1) // 2 + 1
    x0 = int(center[1]) - (ww + 1) // 2 + 1

    if reader.data_format == "memmap":
        n_pings = reader.shape[1]
    else:
        n_pings = reader.shape[0]

    out = np.full(ww, BIG_ROW, dtype=np.int32)
    lo = max(x0, 0)
    hi = min(x0 + ww, n_pings)
    if hi <= lo:
        return out
    sb = np.asarray(reader.get_seabed(lo, hi - lo)).astype(np.int64)
    sy0 = max(y0, 0)
    valid = np.asarray(reader.seabed_known(lo, hi - lo))
    if reader.data_format == "zarr":
        # zarr pads by shifting the *sliced* bottom mask down
        # (data_reader.py:841-846): threshold = max(seabed, patch_top)+pad
        thresh = np.maximum(sb, sy0) + SEABED_PAD
    else:
        # memmap clamps the shifted line at the patch top
        # (data_reader.py:407-431): threshold = max(seabed+pad, patch_top)
        thresh = np.maximum(sb + SEABED_PAD, sy0)
    rows = np.clip(thresh - y0, -(10 ** 6), BIG_ROW)
    out[lo - x0:hi - x0] = np.where(valid, rows, BIG_ROW).astype(np.int32)
    return out


class RandomPatchDataset:
    """Class-balanced random patch sampling
    (reference batch/dataset.py:30-113)."""

    def __init__(self, samplers, window_size, frequencies,
                 sampler_probs=None, seed=None, meta_channels=None):
        from .meta_channels import validate_meta_channels
        self.samplers = samplers
        self.window_size = window_size
        self.frequencies = frequencies
        self.meta_channels = meta_channels or None
        validate_meta_channels(self.meta_channels)
        probs = np.asarray(sampler_probs if sampler_probs is not None
                           else np.ones(len(samplers)), dtype=float)
        self.cum_probs = np.cumsum(probs) / probs.sum()
        # resume salts the seed by 100003*step (train.py), which exceeds
        # RandomState's 32-bit seed range for long recipes — wrap it
        self.rng = np.random.RandomState(
            None if seed is None else int(seed) % (2 ** 32))
        self.pool = None  # device sample pool -> coordinate-only batches

    def use_pool(self, pool, with_seabed=False):
        """Switch to coordinate-only batches for an HBM-resident sample
        pool (data/device_pool.py): the host draws (sampler, center) with
        the SAME rng sequence as the crop path, but ships only (echogram,
        start) int32 coordinates; crops are gathered on device inside the
        pooled train step.  ``with_seabed`` adds the (B, ww) seabed-row
        strips the VALIDATION label chain needs (host-computed — tiny, and
        bit-identical to the host crop path)."""
        self.pool = pool
        self.pool_with_seabed = bool(with_seabed)
        return self

    def _draw(self):
        i = self.rng.rand()
        sampler = self.samplers[int(np.searchsorted(self.cum_probs, i,
                                                    side="right"))]
        return sampler.get_sample(self.rng)

    def sample(self):
        from .meta_channels import crop_meta
        center, reader = self._draw()
        data = reader.crop_data(center, self.window_size, self.frequencies)
        labels = reader.crop_labels(center, self.window_size)
        seabed = seabed_patch_row(reader, center, self.window_size)
        meta = (crop_meta(reader, center, self.window_size,
                          self.meta_channels)
                if self.meta_channels else None)
        return data, labels.astype(np.int32), seabed, np.asarray(center), \
            meta

    def batch(self, batch_size):
        if self.pool is not None:
            samples = [self._draw() for _ in range(batch_size)]
            idxs, starts = self.pool.prepare_batch(
                [(reader, center) for center, reader in samples])
            out = {"ech_idx": idxs, "starts": starts}
            if getattr(self, "pool_with_seabed", False):
                out["seabed_row"] = np.stack(
                    [seabed_patch_row(reader, center, self.window_size)
                     for center, reader in samples])
            return out
        parts = [self.sample() for _ in range(batch_size)]
        # NOTE: sampler centers (p[3]) are deliberately NOT in the batch:
        # no train/eval step consumes them, and every batch key is shipped
        # host->device each step by device_prefetch (review finding r3)
        out = {
            "data": np.stack([p[0] for p in parts]),
            "labels": np.stack([p[1] for p in parts]),
            "seabed_row": np.stack([p[2] for p in parts]),
        }
        if self.meta_channels:
            out["meta"] = np.stack([p[4] for p in parts])
        return out


class BatchPrefetcher:
    """Threaded batch prefetch: N producer threads fill a bounded queue.

    Replaces the reference's DataLoader worker processes (train.py:73-79)
    with threads — crop extraction is numpy/memmap-bound and releases the
    GIL in the hot gathers.
    """

    def __init__(self, dataset_factory, batch_size, n_batches,
                 num_workers=4, prefetch_depth=4):
        self.batch_size = batch_size
        self.n_batches = n_batches
        self.queue: queue.Queue = queue.Queue(maxsize=prefetch_depth)
        self._count = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()    # stop producing (crash or close)
        self._closed = threading.Event()  # consumer is gone: drop batches
        num_workers = max(1, num_workers)
        self.threads = [
            threading.Thread(target=self._worker,
                             args=(dataset_factory(seed_offset=i),),
                             daemon=True)
            for i in range(num_workers)]
        for t in self.threads:
            t.start()

    def _worker(self, dataset):
        while not self._stop.is_set():
            with self._lock:
                if self._count >= self.n_batches:
                    return
                self._count += 1
            try:
                batch = dataset.batch(self.batch_size)
            except BaseException as exc:  # surface worker crashes
                batch = exc
                self._stop.set()
            while True:
                try:
                    self.queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    # close() means the consumer is gone: drop even
                    # exception batches, or a second crashed worker spins
                    # its delivery retry forever (review finding r3)
                    if self._closed.is_set():
                        return
                    if self._stop.is_set() and not isinstance(
                            batch, BaseException):
                        return
            if isinstance(batch, BaseException):
                return

    def __iter__(self):
        # close() on every exit path — raising a worker's exception (or
        # the consumer breaking out early) without closing left OTHER
        # crashed workers retrying their delivery at 2 Hz forever
        try:
            for _ in range(self.n_batches):
                batch = self.queue.get()
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            self.close()

    def close(self):
        self._closed.set()
        self._stop.set()
