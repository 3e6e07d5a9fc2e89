"""TPU-native serving: dynamic cross-request batching over static-shape
bucket programs.

Beyond the reference, whose inference surface is a single-process Python
API (reference: models/maest.py:935-939): production tagging on TPU wants

  1. **static shapes** — one compiled program per batch bucket; arbitrary
     request sizes are padded up to the nearest bucket so nothing ever
     retraces,
  2. **full batches** — the MXU is utilization-bound (batch 32 is the
     measured throughput optimum on v5e, see docs/DESIGN.md), so chunks
     from concurrent requests are batched together before they hit the
     device, and
  3. **async dispatch** — JAX dispatch is non-blocking, so the host
     assembles batch N+1 while the device runs batch N; only the final
     ``np.asarray`` fetch synchronises.

The unit of batching is the *chunk* (one ``img_t``-frame mel window), not
the request: a 90 s track contributes three 30 s chunks that ride in the
same device batch as other clients' chunks, and its sigmoid activations
are averaged per request afterwards — identical math to
``MAEST.predict_labels`` (reference: models/maest.py:935-939).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future, InvalidStateError
from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (the largest bucket if none fits; callers
    split oversized batches first)."""
    for b in buckets:
        if b >= n:
            return b
    return buckets[-1]


class BucketPrograms:
    """Compiled sigmoid-activation programs, one per batch bucket.

    ``run`` pads the batch up to the nearest bucket, executes the matching
    compiled program, and slices the padding back off — every request
    shape maps onto a small, fixed set of XLA executables.

    Two program families:
      * mel-chunk (default): elements are (96, img_t) mel windows —
        the fallback for arbitrary-length audio (mel runs per request).
      * fused wave (``fused_wave=True``): elements are native-length
        (img_t * hop samples) waveforms; the mel front-end, ViT and
        sigmoid run in ONE XLA program, so a clip costs a single
        host->device transfer and concurrent clips share that one
        dispatch — the serving hot path over a high-latency device link.
    """

    def __init__(self, model, buckets: Sequence[int] = DEFAULT_BUCKETS,
                 fused_wave: bool = False, pcm16: bool = False):
        if pcm16 and not fused_wave:
            raise ValueError("pcm16 requires fused_wave")
        self.model = model
        self.mesh = getattr(model, "mesh", None)
        if self.mesh is not None and jax.process_count() > 1:
            # the dispatcher thread issues device_put on its own schedule;
            # under a cross-process mesh that transfer is a hidden
            # process_allgather COLLECTIVE, and collectives from a
            # background thread race the other processes' ordering
            # (the deadlock class documented at data/loader.py
            # device_prefetch). Serving is a single-controller workload —
            # shard over the local chips only.
            raise NotImplementedError(
                "multi-process serving is not supported: build the model "
                "on a single-process mesh (local devices)")
        self.fused_wave = fused_wave
        self.pcm16 = pcm16
        buckets = sorted(set(int(b) for b in buckets))
        if not buckets or buckets[0] < 1:
            raise ValueError(f"invalid buckets {buckets}")
        if self.mesh is not None:
            # multi-chip serving (chunk-DP + head-TP, same layout as
            # MAEST.__call__): every bucket must fill the data axis
            n_data = self.mesh.shape["data"]
            buckets = sorted(set(
                -(-b // n_data) * n_data for b in buckets))
            from jax.sharding import NamedSharding, PartitionSpec

            self._in_sharding = NamedSharding(self.mesh, PartitionSpec("data"))
        else:
            self._in_sharding = None
        self.buckets = tuple(buckets)
        net = model.net
        img_f, img_t = model.cfg.img_size

        if fused_wave:
            from .dsp import HOP_LENGTH, log_mel_spectrogram

            self.native_len = img_t * HOP_LENGTH
            self.elem_shape = (self.native_len,)
            self.elem_dtype = np.int16 if pcm16 else np.float32
            # GSPMD cannot partition the Pallas mel kernel; under a mesh
            # the in-program mel falls back to the XLA path (same numbers)
            mel_impl = "xla" if self.mesh is not None else "auto"

            @jax.jit
            def activations(params, w):  # (b, native_len) waveforms
                if pcm16:
                    # s16le PCM decodes ON DEVICE: the host->device link is
                    # the serving bottleneck (not MXU time), so halving the
                    # wire bytes halves the batch cycle
                    w = w.astype(jnp.float32) / 32768.0
                mel = log_mel_spectrogram(w, impl=mel_impl)  # (b, 96, T)
                x = mel[:, :, :img_t][..., None]
                logits = net.apply({"params": params}, x, train=False)[0]
                return jax.nn.sigmoid(logits.astype(jnp.float32))

            self._prep = lambda b: jnp.asarray(b)
        else:
            self.native_len = None
            self.elem_shape = (img_f, img_t)
            self.elem_dtype = np.float32

            @jax.jit
            def activations(params, x):
                logits = net.apply({"params": params}, x, train=False)[0]
                return jax.nn.sigmoid(logits.astype(jnp.float32))

            self._prep = lambda b: jnp.asarray(b)[..., None]

        self._activations = activations

    @property
    def max_batch(self) -> int:
        return self.buckets[-1]

    def warmup(self) -> None:
        """Compile every bucket program up front (first-request latency on
        a cold server would otherwise include a full XLA compile)."""
        for b in self.buckets:
            x = np.zeros((b,) + self.elem_shape, self.elem_dtype)
            np.asarray(self._run_program(self._prep(x)))

    def _run_program(self, x):
        if self._in_sharding is not None:
            x = jax.device_put(x, self._in_sharding)
            with self.mesh:
                return self._activations(self.model.params, x)
        return self._activations(self.model.params, x)

    def run(self, batch: np.ndarray) -> np.ndarray:
        """(n, *elem_shape) elements -> (n, num_classes) sigmoid
        activations. n must be <= max_batch."""
        batch = np.asarray(batch, self.elem_dtype)
        n = batch.shape[0]
        if batch.shape[1:] != self.elem_shape:
            raise ValueError(
                f"expected (n, {self.elem_shape}), got {batch.shape}")
        if n > self.max_batch:
            raise ValueError(f"batch {n} exceeds max bucket {self.max_batch}")
        bucket = pick_bucket(n, self.buckets)
        if bucket != n:
            batch = np.concatenate(
                [batch, np.zeros((bucket - n,) + batch.shape[1:],
                                 batch.dtype)]
            )
        acts = self._run_program(self._prep(batch))
        return np.asarray(acts)[:n]


@dataclass
class ServeStats:
    """Running counters, exported by the /stats endpoint.

    Mutations come from many threads (HTTP handler threads bump
    requests/latency, each batcher's dispatcher bumps batches), so all
    updates go through the locked helpers; ``latency_ms`` is a bounded
    deque — a long-running server must not grow per-request state."""

    requests: int = 0
    chunks: int = 0
    batches: int = 0
    batched_chunks: int = 0
    latency_ms: "deque" = field(
        default_factory=lambda: deque(maxlen=2048))
    _lock: threading.Lock = field(default_factory=threading.Lock,
                                  repr=False)

    def bump(self, *, requests: int = 0, chunks: int = 0, batches: int = 0,
             batched_chunks: int = 0, latency_ms: Optional[float] = None):
        with self._lock:
            self.requests += requests
            self.chunks += chunks
            self.batches += batches
            self.batched_chunks += batched_chunks
            if latency_ms is not None:
                self.latency_ms.append(latency_ms)

    def reset_window(self):
        """Clear the latency window (benchmarks phase boundaries)."""
        with self._lock:
            self.latency_ms.clear()

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self.latency_ms)
            requests, chunks = self.requests, self.chunks
            batches, batched = self.batches, self.batched_chunks

        def pct(p):
            return lat[min(len(lat) - 1, int(p * len(lat)))] if lat else 0.0

        return {
            "requests": requests,
            "chunks": chunks,
            "batches": batches,
            "mean_batch_fill": batched / batches if batches else 0.0,
            "latency_ms_p50": pct(0.50),
            "latency_ms_p99": pct(0.99),
        }


class _Pending:
    __slots__ = ("chunks", "future", "t_submit", "consumed", "parts")

    def __init__(self, chunks: np.ndarray):
        self.chunks = chunks
        self.future: Future = Future()
        self.t_submit = time.monotonic()
        self.consumed = 0  # chunks taken into device batches so far
        self.parts: list = []  # per-batch activation slices, in order


class DynamicBatcher:
    """Batches chunk requests across clients before dispatching to the
    device.

    A background dispatcher thread drains the queue: it waits up to
    ``max_wait_ms`` after the first pending request for more chunks to
    arrive (a full batch dispatches immediately), packs up to
    ``programs.max_batch`` chunks into one device call, and resolves each
    request's Future with its own slice of the activations. Oversized
    requests (> max_batch chunks) are split across consecutive batches
    transparently.
    """

    def __init__(self, programs: BucketPrograms, max_wait_ms: float = 5.0):
        self.programs = programs
        self.max_wait_ms = float(max_wait_ms)
        self.stats = ServeStats()
        self._queue: list[_Pending] = []
        self._lock = threading.Lock()
        self._event = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True)
        self._thread.start()

    def submit(self, chunks: np.ndarray) -> Future:
        """Enqueue (n, *elem_shape) elements; the Future resolves to the
        (n, num_classes) activations for exactly those elements."""
        if chunks.shape[1:] != self.programs.elem_shape:
            raise ValueError(
                f"expected (n, {self.programs.elem_shape}), "
                f"got {chunks.shape}")
        p = _Pending(np.asarray(chunks, self.programs.elem_dtype))
        if chunks.shape[0] == 0:
            # resolve empty submissions here — the dispatcher keys on
            # chunk counts and would otherwise strand a 0-row request
            p.future.set_result(np.zeros(
                (0, self.programs.model.cfg.num_classes), np.float32))
            return p.future
        with self._lock:
            if self._stop:
                raise RuntimeError("batcher is shut down")
            self._queue.append(p)
        self._event.set()
        return p.future

    def close(self) -> None:
        with self._lock:
            self._stop = True
        self._event.set()
        self._thread.join(timeout=10)
        # under the lock: a dispatcher that outlived the join timeout (e.g.
        # mid-compile on a cold bucket) still mutates the queue
        with self._lock:
            pending = list(self._queue)
        for p in pending:
            # a dispatcher that outlived the join timeout may resolve the
            # future between a done() check and set_exception — swallow the
            # InvalidStateError instead of letting it escape close()
            try:
                p.future.set_exception(RuntimeError("batcher shut down"))
            except InvalidStateError:
                pass

    # -- dispatcher ---------------------------------------------------------
    def _dispatch_loop(self) -> None:
        max_batch = self.programs.max_batch
        while True:
            self._event.wait()
            with self._lock:
                if self._stop and not self._queue:
                    return
                have = sum(p.chunks.shape[0] - p.consumed for p in self._queue)
                if not have:
                    # clear UNDER the lock: a submit() racing between an
                    # unlocked check and clear() would be lost and its
                    # request stranded until unrelated traffic arrives
                    self._event.clear()
            if not have:
                continue
            # linger briefly for co-batching unless a full batch is ready
            if have < max_batch and self.max_wait_ms > 0:
                deadline = time.monotonic() + self.max_wait_ms / 1e3
                while time.monotonic() < deadline:
                    with self._lock:
                        have = sum(p.chunks.shape[0] - p.consumed for p in self._queue)
                    if have >= max_batch or self._stop:
                        break
                    time.sleep(min(0.001, self.max_wait_ms / 1e3))
            self._drain_once(max_batch)

    def _drain_once(self, max_batch: int) -> None:
        """Take up to max_batch chunks (splitting an oversized head
        request), run them as one device batch, resolve completed
        requests."""
        take: list[tuple[_Pending, int, int]] = []  # (req, start, count)
        with self._lock:
            room = max_batch
            for p in list(self._queue):
                if room == 0:
                    break
                n = p.chunks.shape[0] - p.consumed
                c = min(n, room)
                take.append((p, p.consumed, c))
                p.consumed += c
                room -= c
                if p.consumed == p.chunks.shape[0]:
                    self._queue.remove(p)
            if not self._queue and not self._stop:
                # never clear once close() has signalled: its set() is the
                # wakeup that lets the loop observe _stop and exit — clearing
                # it here would strand the dispatcher in _event.wait()
                # forever (close() would then burn its full join timeout and
                # leak the blocked thread)
                self._event.clear()
        if not take:
            return
        batch = np.concatenate([p.chunks[s:s + c] for p, s, c in take])
        try:
            acts = self.programs.run(batch)
        except Exception as e:  # resolve, don't kill the dispatcher
            for p, _, _ in take:
                try:
                    p.future.set_exception(e)
                except InvalidStateError:
                    pass
            return
        self.stats.bump(batches=1, batched_chunks=batch.shape[0])
        off = 0
        for p, _s, c in take:
            p.parts.append(acts[off:off + c])
            off += c
            if sum(q.shape[0] for q in p.parts) == p.chunks.shape[0]:
                # the future may already be done (client .cancel(), or
                # close() raced in an exception after the join timeout);
                # an unguarded set_result would raise InvalidStateError
                # and kill the dispatcher thread for every future caller —
                # and the done() check alone still races a concurrent
                # cancel/close between check and set
                try:
                    p.future.set_result(np.concatenate(p.parts))
                except InvalidStateError:
                    pass


class TagService:
    """End-to-end tagging service: mel front-end + chunking + dynamic
    batching + per-request activation averaging.

    ``tag(waveform)`` is thread-safe and blocking; concurrent callers'
    chunks share device batches. Results are identical to
    ``MAEST.predict_labels`` (asserted by tests/test_serve.py).
    """

    def __init__(self, model, buckets: Sequence[int] = DEFAULT_BUCKETS,
                 max_wait_ms: float = 5.0, warmup: bool = False,
                 warmup_pcm16: bool = False, host_mel: bool = False):
        # host_mel: compute the mel front-end for non-native-length clips
        # on HOST (numpy). The jitted mel retraces per distinct waveform
        # length (a cold compile can take minutes over a remote relay), so
        # deployments serving many different clip lengths trade bit-exact
        # predict_labels parity (numpy vs XLA float32 ~1e-6 mel deltas)
        # for a compile-free front-end. Default off: bit-exact.
        self.host_mel = host_mel
        self.model = model
        self.programs = BucketPrograms(model, buckets)
        self.wave_programs = BucketPrograms(model, buckets, fused_wave=True)
        self.pcm16_programs = BucketPrograms(model, buckets, fused_wave=True,
                                             pcm16=True)
        if warmup:
            self.wave_programs.warmup()  # the hot path first
            if warmup_pcm16:
                self.pcm16_programs.warmup()
            self.programs.warmup()
        self.batcher = DynamicBatcher(self.programs, max_wait_ms=max_wait_ms)
        self.wave_batcher = DynamicBatcher(self.wave_programs,
                                           max_wait_ms=max_wait_ms)
        self.pcm16_batcher = DynamicBatcher(self.pcm16_programs,
                                            max_wait_ms=max_wait_ms)
        # all batchers feed one stats object (requests/latency are
        # per-service; batches/fill count device dispatches of any kind)
        self.wave_batcher.stats = self.batcher.stats
        self.pcm16_batcher.stats = self.batcher.stats
        self.labels = model.labels

    def tag(self, waveform: np.ndarray, timeout: Optional[float] = 60.0):
        """16 kHz mono waveform -> (activations (C,), labels). Long tracks
        chunk into multiple windows averaged per request.

        Native-length clips (exactly ``img_t * hop`` samples — e.g. 30 s
        for the 30 s archs) take the fused fast path: mel + ViT + sigmoid
        in one batched device program, a single host->device transfer per
        request. An ``int16`` native-length input is treated as s16le PCM
        and decoded ON DEVICE (``pcm / 32768``) — half the wire bytes,
        which is the bottleneck when the device link is slow. Other
        lengths fall back to per-request mel + chunking."""
        t0 = time.monotonic()
        wave = np.asarray(waveform)
        pcm16 = wave.dtype == np.int16
        if not pcm16:
            wave = wave.astype(np.float32, copy=False)
        if wave.ndim == 1 and wave.shape[0] == self.wave_programs.native_len:
            n_chunks = 1
            batcher = self.pcm16_batcher if pcm16 else self.wave_batcher
            acts = batcher.submit(wave[None]).result(timeout=timeout)[0]
        elif pcm16:
            raise ValueError(
                "int16 PCM input must be exactly native length "
                f"({self.wave_programs.native_len} samples); convert to "
                "float for arbitrary-length audio"
            )
        else:
            if self.host_mel:
                from .dsp.mel import log_mel_spectrogram_np

                mel = log_mel_spectrogram_np(wave)
            else:
                mel = np.asarray(self.model.melspectrogram(wave))
            img_t = self.model.cfg.img_size[1]
            if mel.shape[-1] < img_t:
                # short clip: one window narrower than the model's native
                # width — supported natively (the time pos-embed slices to
                # the input, models/vit.py), but not by the fixed-shape
                # bucket programs. Run it directly; like the in-process
                # API this compiles one program per distinct short length.
                logits = self.model(mel, melspectrogram_input=True)[0]
                acts = np.asarray(
                    jax.nn.sigmoid(logits.astype(jnp.float32))
                ).mean(axis=0)
                n_chunks = 1
            else:
                chunks = np.asarray(
                    self.model._chunk_melspec(jnp.asarray(mel))
                )[:, 0]  # (n, 96, img_t)
                n_chunks = chunks.shape[0]
                acts = self.tag_mel_chunks(chunks, timeout=timeout)
        self.batcher.stats.bump(
            requests=1, chunks=n_chunks,
            latency_ms=(time.monotonic() - t0) * 1e3,
        )
        return acts, self.labels

    def tag_mel_chunks(self, chunks: np.ndarray,
                       timeout: Optional[float] = 60.0) -> np.ndarray:
        """(n, 96, img_t) pre-extracted mel windows -> (C,) mean sigmoid
        activations (the ``predict_labels`` averaging semantics)."""
        if chunks.shape[0] == 0:
            # mean over zero rows would return silent all-NaN activations
            raise ValueError("tag_mel_chunks needs at least one mel window")
        acts = self.batcher.submit(chunks).result(timeout=timeout)
        return acts.mean(axis=0)

    def stats_reset_window(self) -> None:
        self.batcher.stats.reset_window()

    def stats(self) -> dict:
        return self.batcher.stats.snapshot()

    def close(self) -> None:
        self.batcher.close()
        self.wave_batcher.close()
        self.pcm16_batcher.close()
