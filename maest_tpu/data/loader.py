"""Batch assembly + device prefetch.

Replaces the reference's 16-worker torch DataLoader (reference:
discogs/datamodule.py:246-252) with a thread pool (numpy memmap reads
release the GIL) and an async double-buffered device-put, so host IO
overlaps TPU compute. When the native C++ reader is built
(maest_tpu/data/_native), the per-item read path dispatches there.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, Optional, Sequence

import numpy as np


def _collate(items: Sequence[dict]) -> dict:
    batch = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if key == "filename":
            batch[key] = vals
        else:
            batch[key] = np.stack(vals)
    return batch


class BatchLoader:
    """Iterate index batches through a dataset with a thread pool.

    When the dataset exposes ``batch_spec`` and the native C++ reader is
    built, whole batches are read by one ``mel_load_batch`` call (a C
    thread pool over pread) — no per-item Python in the hot loop.
    """

    def __init__(self, dataset, batch_size: int, *, num_workers: int = 8,
                 drop_last: bool = False, use_native: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.use_native = use_native

    def _native_ok(self) -> bool:
        if not self.use_native or not hasattr(self.dataset, "batch_spec"):
            return False
        from .. import native

        return native.available()

    def _load_batch_native(self, idxs) -> Optional[dict]:
        from .. import native

        spec = self.dataset.batch_spec(idxs)
        if spec is None:
            return None
        paths, offsets, metas = spec
        mels = native.load_batch(
            paths, offsets, self.dataset.cfg.melspectrogram_size,
            self.dataset.cfg.n_bands, threads=self.num_workers,
        )  # (B, T, bands)
        batch = _collate(metas)
        batch["x"] = np.ascontiguousarray(mels.transpose(0, 2, 1))
        return batch

    def iter_indices(self, indices: Iterable[int]) -> Iterator[dict]:
        indices = list(indices)
        bs = self.batch_size
        batches = [indices[i : i + bs] for i in range(0, len(indices), bs)]
        if self.drop_last and batches and len(batches[-1]) < bs:
            batches.pop()
        if not batches:
            return

        native_ok = self._native_ok()
        with ThreadPoolExecutor(self.num_workers) as pool:
            # pipeline: keep up to 2 batches in flight
            pending = collections.deque()
            it = iter(batches)

            def fetch(idxs):
                if native_ok:
                    batch = self._load_batch_native(idxs)
                    if batch is not None:
                        return batch
                return _collate(list(map(self.dataset.__getitem__, idxs)))

            def submit_next():
                try:
                    idxs = next(it)
                except StopIteration:
                    return False
                pending.append(pool.submit(fetch, idxs))
                return True

            for _ in range(2):
                if not submit_next():
                    break
            while pending:
                batch = pending.popleft().result()
                submit_next()
                yield batch

    def __iter__(self) -> Iterator[dict]:
        return self.iter_indices(range(len(self.dataset)))


def device_prefetch(batches: Iterator[dict], sharding=None, size: int = 2,
                    keys: Sequence[str] = ("x", "y", "y_teacher"),
                    process_local: bool = False) -> Iterator[dict]:
    """Asynchronously move batches to device (double buffering).

    Array values under ``keys`` are jax.device_put with ``sharding``;
    other entries (filenames) pass through on host.

    ``process_local=True`` (multi-host training): each host's batch holds
    only ITS shard of the global batch (global_batch / process_count rows,
    from its slice of the sampler's index space), assembled into one global
    array with ``jax.make_array_from_process_local_data``. With the default
    ``False`` every host must feed the same full global batch.
    """
    import jax

    multiproc = process_local and jax.process_count() > 1

    def put_device(arr):
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, arr)
        if sharding is not None:
            return jax.device_put(arr, sharding)
        return jax.device_put(arr)

    if jax.process_count() > 1:
        # Multi-process: every cross-process device_put /
        # make_array_from_process_local_data is (or can trigger) a
        # COLLECTIVE (jax validates replicated values with a
        # process_allgather), and collectives must be issued in identical
        # order on every process. A background prefetch thread races its
        # transfer collectives against the main thread's compute
        # collectives — observed deadlock: epoch-boundary eval all-gather
        # on the main thread vs the next batch's assert_equal allgather on
        # this thread, interleaved differently on each process. Transfer
        # synchronously instead; host-IO overlap is a single-process
        # (TPU-relay) optimization.
        try:
            for batch in batches:
                out = dict(batch)
                for k in keys:
                    if k in out:
                        out[k] = put_device(np.asarray(out[k]))
                yield out
        finally:
            if hasattr(batches, "close"):
                batches.close()
        return

    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()
    err_box: list = []  # producer exception, re-raised on the consumer side
    stop = threading.Event()

    def producer():
        try:
            for batch in batches:
                out = dict(batch)
                for k in keys:
                    if k in out:
                        out[k] = put_device(np.asarray(out[k]))
                # bounded put that aborts when the consumer went away —
                # a plain q.put would block forever if the consumer broke
                # early (limit_*_batches), leaking this thread, the
                # loader's pool, and the device-resident batches
                while not stop.is_set():
                    try:
                        q.put(out, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    break
        except Exception as e:  # noqa: BLE001 — re-raised on the consumer
            # a producer failure (bad read, cross-process device_put
            # mismatch) must surface in the training/eval loop, not
            # silently end the epoch early as if the data ran out
            err_box.append(e)
        finally:
            if hasattr(batches, "close"):
                batches.close()  # unwinds BatchLoader's pool deterministically
            # the sentinel must not be dropped on a momentarily-full queue
            # (the consumer would drain the queue and then block forever);
            # bounded-put until it lands or the consumer has gone away
            while not stop.is_set():
                try:
                    q.put(_END, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err_box:
                    raise err_box[0]
                break
            yield item
    finally:
        stop.set()
        try:
            while True:  # unblock a producer waiting on a full queue
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=10.0)
