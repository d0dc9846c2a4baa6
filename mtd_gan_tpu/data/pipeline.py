"""Host data pipeline: paired DICOM dataset + threaded prefetch to device.

Replaces the torch DataLoader stack (reference dataloaders.py:5-41 +
multi-worker MONAI Datasets). Decode happens on host threads (DICOM -> int16
HU); windowing/patching/augmentation run fused on device
(mtd_gan_tpu.data.transforms). Dataset roots are configuration, not
hard-coded globs (reference quirk, Mayo.py:170-194).

Layout convention mirrors the Mayo LDCT release the reference trains on:
  <root>/<split>/*/n_20/*.(IMA|dcm)   quarter-dose inputs
  <root>/<split>/*/n_100/*.(IMA|dcm)  full-dose targets
sorted naturally and paired positionally.
"""

from __future__ import annotations

import glob
import os
import queue
import re
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from mtd_gan_tpu.data.dicom import get_pixels_hu


def natural_sort(paths: Sequence[str]) -> List[str]:
    def key(s):
        return [int(t) if t.isdigit() else t for t in re.split(r"([0-9]+)", s)]

    return sorted(paths, key=key)


class PairedDicomDataset:
    """Positionally paired (n_20, n_100) DICOM slices."""

    def __init__(self, root: str, split: str = "train",
                 low_key: str = "n_20", high_key: str = "n_100",
                 extensions: Tuple[str, ...] = ("IMA", "dcm")):
        self.root, self.split = root, split
        lows: List[str] = []
        highs: List[str] = []
        for ext in extensions:
            lows += glob.glob(os.path.join(root, split, "**", low_key, f"*.{ext}"),
                              recursive=True)
            highs += glob.glob(os.path.join(root, split, "**", high_key, f"*.{ext}"),
                               recursive=True)
        self.low_paths = natural_sort(lows)
        self.high_paths = natural_sort(highs)
        if len(self.low_paths) != len(self.high_paths):
            raise ValueError(
                f"unpaired dataset: {len(self.low_paths)} low vs "
                f"{len(self.high_paths)} high dose slices under {root}/{split}"
            )

    def __len__(self) -> int:
        return len(self.low_paths)

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        return self._decode(self.low_paths[idx]), self._decode(self.high_paths[idx])

    @staticmethod
    def _decode(path: str) -> np.ndarray:
        # native C++ fast path (GIL-releasing) with pure-Python fallback
        from mtd_gan_tpu.data import native

        hu = native.decode_hu(path)
        return hu if hu is not None else get_pixels_hu(path)


def _batched_indices(n: int, batch_size: int, shuffle: bool, drop_last: bool,
                     seed: int) -> List[np.ndarray]:
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    batches = []
    for i in range(0, n, batch_size):
        chunk = idx[i : i + batch_size]
        if drop_last and len(chunk) < batch_size:
            break
        batches.append(chunk)
    return batches


def _load_batch(ds: PairedDicomDataset, idxs: np.ndarray):
    xs, ys = [], []
    for i in idxs:
        x, y = ds.load(int(i))
        xs.append(x)
        ys.append(y)
    return (
        np.stack(xs)[..., None],  # NHWC int16
        np.stack(ys)[..., None],
    )


def train_loader(ds: PairedDicomDataset, batch_size: int, seed: int = 0,
                 num_threads: int = 4, prefetch: int = 2) -> Iterator:
    """Shuffled, drop_last (reference dataloaders.py:5-16), threaded decode."""
    batches = _batched_indices(len(ds), batch_size, True, True, seed)
    yield from _threaded(ds, batches, num_threads, prefetch)


def eval_loader(ds: PairedDicomDataset, batch_size: int = 1) -> Iterator:
    """Sequential batch-1 (reference dataloaders.py:27-41); also yields the
    source paths so artifacts can be named after the input DICOMs."""
    batches = _batched_indices(len(ds), batch_size, False, False, 0)
    for idxs in batches:
        x, y = _load_batch(ds, idxs)
        paths = [ds.low_paths[int(i)] for i in idxs]
        yield x, y, paths


def _threaded(ds, batches, num_threads: int, prefetch: int):
    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
    sentinel = object()
    it_lock = threading.Lock()
    it = iter(batches)

    def worker():
        while True:
            with it_lock:
                idxs = next(it, None)
            if idxs is None:
                q.put(sentinel)
                return
            q.put(_load_batch(ds, idxs))

    threads = [threading.Thread(target=worker, daemon=True)
               for _ in range(max(1, num_threads))]
    for t in threads:
        t.start()
    done = 0
    while done < len(threads):
        item = q.get()
        if item is sentinel:
            done += 1
            continue
        yield item


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Overlap H2D copies with compute (reference analogue: DataLoader
    pin_memory + .to(device); here an explicit device_put pipeline)."""
    buf: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        for item in iterator:
            if sharding is not None:
                item = jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, sharding), item
                )
            else:
                item = jax.tree_util.tree_map(jax.device_put, item)
            buf.put(item)
        buf.put(sentinel)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = buf.get()
        if item is sentinel:
            return
        yield item
