"""Online serving: dynamic batching for low-latency transcription.

The reference's deployment story is SpeechBrain's `EncoderDecoderASR`
interface — one utterance per call, no batching, no latency control
(covered offline by recipes/transcribe.py). For production serving on a
TPU the economics are different: the chip wants large static-shape
batches (decode throughput scales linearly in batch, benchmarks/
RESULTS.md "Decode batch-size sweep"), while callers arrive one request
at a time. This module bridges the two with a classic dynamic batcher:

- requests queue up; a worker drains the queue and forms a batch when
  either `batch_size` requests are waiting or the oldest request has
  waited `max_wait_ms`;
- audio is zero-padded to a `pad_quantum`-sample grid and batches are
  right-sized to one of a fixed set of bucket lengths, so the jitted
  infer function compiles a small, bounded set of shapes (XLA static-
  shape discipline — same trick as the training bucketer,
  data/batching.py);
- callers block on a per-request future and get their transcript (or
  the propagated inference error);
- p50/p95 latency and batch-occupancy stats are tracked for operators.

The batcher is model-agnostic: it takes any `infer(wav [B, N], lens [B])
-> list[str]` callable. recipes/serve.py builds that callable from a
trained run dir and exposes the whole thing over HTTP.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import numpy as np

__all__ = ["ServingConfig", "DynamicBatchingServer", "RequestError"]


class RequestError(RuntimeError):
    """Raised to the caller when its batch failed in inference."""


@dataclass
class ServingConfig:
    batch_size: int = 8            # max requests per device batch
    max_wait_ms: float = 20.0      # oldest request waits at most this
    sample_rate: int = 16000
    pad_quantum_s: float = 0.5     # audio padded to this grid
    max_audio_s: float = 120.0     # hard per-request cap (static shapes)
    # bucket edges in seconds; requests are padded up to the smallest
    # bucket that fits, bounding the number of compiled shapes
    bucket_edges_s: Sequence[float] = (5.0, 10.0, 20.0, 40.0, 120.0)


@dataclass
class _Pending:
    audio: np.ndarray
    t_enqueue: float
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[str] = None
    error: Optional[BaseException] = None


class DynamicBatchingServer:
    """Threaded dynamic batcher over a batch transcription callable."""

    def __init__(self, infer: Callable[[np.ndarray, np.ndarray], List[str]],
                 config: Optional[ServingConfig] = None):
        self.infer = infer
        self.cfg = config or ServingConfig()
        from collections import deque

        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._lock = threading.Lock()
        # bounded: stats are over the most recent window, not the
        # process lifetime (unbounded lists + full sorts under the
        # worker's lock would grow without limit on a long-lived server)
        self._latencies_ms = deque(maxlen=10000)
        self._batch_sizes = deque(maxlen=10000)
        self._served = 0
        self._errors = 0
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="serving-batcher")
        self._worker.start()

    # -- caller side --------------------------------------------------------

    def submit(self, audio: np.ndarray, timeout: Optional[float] = None
               ) -> str:
        """Blocking transcription of one float32 [-1, 1] mono utterance."""
        if self._closed:
            raise RuntimeError("server is closed")
        audio = np.asarray(audio, np.float32).reshape(-1)
        max_n = int(self.cfg.max_audio_s * self.cfg.sample_rate)
        if audio.shape[0] == 0:
            raise ValueError("empty audio")
        if audio.shape[0] > max_n:
            raise ValueError(
                f"audio longer than max_audio_s={self.cfg.max_audio_s}")
        req = _Pending(audio=audio, t_enqueue=time.monotonic())
        self._queue.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("transcription timed out")
        if req.error is not None:
            raise RequestError(str(req.error)) from req.error
        return req.result  # type: ignore[return-value]

    # -- worker side --------------------------------------------------------

    def _collect(self) -> List[_Pending]:
        """Block for the first request, then gather until the batch is
        full or the first request's deadline expires. A request whose
        deadline has already passed (backlog: the worker was busy) still
        drains everything already queued — otherwise a backlog would
        degenerate into batch-size-1 device calls and throughput would
        collapse exactly when it matters."""
        try:
            first = self._queue.get(timeout=0.2)
        except queue.Empty:
            return []
        batch = [first]
        deadline = first.t_enqueue + self.cfg.max_wait_ms / 1000.0
        while len(batch) < self.cfg.batch_size:
            remaining = deadline - time.monotonic()
            try:
                if remaining <= 0:
                    batch.append(self._queue.get_nowait())
                else:
                    batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _bucket_len(self, n_samples: int) -> int:
        quantum = int(self.cfg.pad_quantum_s * self.cfg.sample_rate)
        for edge_s in self.cfg.bucket_edges_s:
            edge = int(edge_s * self.cfg.sample_rate)
            if n_samples <= edge:
                return edge
        # above the last edge: fall back to quantum rounding
        return -(-n_samples // quantum) * quantum

    def _run(self) -> None:
        while not self._closed:
            batch = self._collect()
            if not batch:
                continue
            n = self._bucket_len(max(len(r.audio) for r in batch))
            wav = np.zeros((self.cfg.batch_size, n), np.float32)
            lens = np.zeros((self.cfg.batch_size,), np.int32)
            for i, r in enumerate(batch):
                wav[i, : len(r.audio)] = r.audio
                lens[i] = len(r.audio)
            if len(batch) < self.cfg.batch_size and len(batch) > 0:
                # repeat-pad empty rows so infer sees full batches only
                for i in range(len(batch), self.cfg.batch_size):
                    lens[i] = lens[0]
                    wav[i, : lens[0]] = wav[0, : lens[0]]
            try:
                texts = self.infer(wav, lens)
                now = time.monotonic()
                with self._lock:
                    self._batch_sizes.append(len(batch))
                    for i, r in enumerate(batch):
                        r.result = texts[i]
                        self._latencies_ms.append(
                            (now - r.t_enqueue) * 1000.0)
                        self._served += 1
            except BaseException as e:  # propagate to every caller
                with self._lock:
                    self._errors += len(batch)
                for r in batch:
                    r.error = e
            finally:
                for r in batch:
                    r.event.set()

    # -- ops ----------------------------------------------------------------

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies_ms)
            bs = self._batch_sizes
            return {
                "served": self._served,
                "errors": self._errors,
                "p50_ms": round(lat[len(lat) // 2], 2) if lat else None,
                "p95_ms": round(lat[int(len(lat) * 0.95)], 2) if lat else None,
                "mean_batch": round(float(np.mean(bs)), 2) if bs else None,
            }

    def close(self) -> None:
        self._closed = True
        self._worker.join(timeout=2.0)
        # fail any stragglers
        while True:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            r.error = RuntimeError("server closed")
            r.event.set()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
