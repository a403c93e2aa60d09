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
import uuid
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

__all__ = ["ServingConfig", "DynamicBatchingServer", "RequestError",
           "StreamingSessionServer"]


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
        # closed-check and enqueue in one critical section with close()'s
        # drain: otherwise a request enqueued between close()'s flag set
        # and its drain would never be serviced and the caller would
        # block forever (default timeout=None)
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
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
            # the WHOLE tick is guarded, batch assembly included: an
            # exception outside the try would kill the worker thread
            # silently and strand the collected callers on their events
            try:
                n = self._bucket_len(max(len(r.audio) for r in batch))
                wav = np.zeros((self.cfg.batch_size, n), np.float32)
                lens = np.zeros((self.cfg.batch_size,), np.int32)
                for i, r in enumerate(batch):
                    wav[i, : len(r.audio)] = r.audio
                    lens[i] = len(r.audio)
                if len(batch) < self.cfg.batch_size and len(batch) > 0:
                    # repeat-pad empty rows: infer sees full batches only
                    for i in range(len(batch), self.cfg.batch_size):
                        lens[i] = lens[0]
                        wav[i, : lens[0]] = wav[0, : lens[0]]
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
        with self._lock:   # pairs with submit()'s check-and-put
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


@dataclass
class _Session:
    slot: int
    gen: int                             # slot generation at open time
    residual: np.ndarray                 # buffered audio < one chunk
    lock: threading.Lock = field(default_factory=threading.Lock)
    tokens: List[int] = field(default_factory=list)
    closed: bool = False
    last_active: float = field(default_factory=time.monotonic)
    inflight: int = 0                    # queued/awaited chunk jobs


@dataclass
class _ChunkJob:
    slot: int
    gen: int                             # dropped if the slot was re-opened
    chunk: np.ndarray                    # [chunk_samples] f32
    n_valid: int
    event: threading.Event = field(default_factory=threading.Event)
    tokens: Optional[List[int]] = None
    error: Optional[BaseException] = None


class StreamingSessionServer:
    """Multiplex live audio streams onto S fixed device slots.

    The streaming step (streaming.py::make_streaming_infer_fns) is ONE
    compiled program over a fixed batch of S rows, and every piece of
    its cross-chunk state is per-row (sample buffer, chunk counter,
    conformer left context, predictor state), so independent streams at
    different positions can occupy rows of the same stacked carry. Each
    tick the worker packs at most one pending chunk per slot, feeds
    zero chunks to idle slots, steps the whole batch once, and restores
    idle rows from the pre-step carry with a jitted per-row select —
    static shapes throughout, a bounded compiled-program set, and the
    chip sees full batches (the same economics as the offline dynamic
    batcher above).

    Sessions buffer sub-chunk audio host-side; `feed` blocks until all
    full chunks it completes are processed and returns the new tokens.
    `close` flushes the residual (+ the one-chunk pipeline lag) and
    frees the slot."""

    def __init__(self, init_fn, step_fn, chunk_samples: int,
                 slots: int = 8, max_wait_ms: float = 10.0,
                 idle_timeout_s: float = 300.0):
        import jax
        import jax.numpy as jnp

        self.chunk_samples = int(chunk_samples)
        self.slots = slots
        self.max_wait_ms = max_wait_ms
        self.idle_timeout_s = idle_timeout_s

        def masked_step(carry, wav, nv, ready):
            new_carry, toks, n_new = step_fn(carry, wav, nv)

            def sel(new, old):
                m = ready.reshape((slots,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            out = jax.tree.map(sel, new_carry, carry)
            return out, jnp.where(ready[:, None], toks, 0), \
                jnp.where(ready, n_new, 0)

        def reset_rows(carry, template, mask):
            def sel(t, c):
                m = mask.reshape((slots,) + (1,) * (t.ndim - 1))
                return jnp.where(m, t, c)
            return jax.tree.map(sel, template, carry)

        self._step = jax.jit(masked_step)
        self._reset = jax.jit(reset_rows)
        self._template = jax.jit(init_fn)(jnp.zeros((slots,), jnp.int32))
        self._carry = self._template
        self._jnp = jnp

        self._sessions: Dict[str, _Session] = {}
        # transcripts of recently closed/evicted streams: tokens() stays
        # answerable after close() — including a close whose FLUSH failed
        # after earlier chunks already decoded (their tokens must not
        # vanish with the slot). Bounded FIFO.
        from collections import OrderedDict

        self._finished: "OrderedDict[str, List[int]]" = OrderedDict()
        self._finished_cap = 256
        self._free = list(range(slots))
        self._gens = [0] * slots   # bumped on every reallocation: stale
        self._lock = threading.Lock()  # queued jobs are dropped by gen
        self._queue: "queue.Queue[_ChunkJob]" = queue.Queue()
        # slots awaiting a fresh carry; applied by the WORKER between
        # collect and step (a caller-side reset could race the in-flight
        # step and be overwritten by its output)
        self._pending_resets: set = set()
        self._ticks = 0
        self._ready_counts = []
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="streaming-sessions")
        self._worker.start()

    # -- caller side ---------------------------------------------------------

    def _evict_idle_locked(self) -> None:
        """Force-free sessions idle past idle_timeout_s (clients that
        vanished mid-stream would otherwise pin their slot forever).
        Caller holds self._lock. The generation bump invalidates any
        still-queued jobs of the evicted session."""
        now = time.monotonic()
        for sid, s in list(self._sessions.items()):
            # a session waiting on in-flight work is NOT idle even if its
            # last_active is stale: a single tick can legitimately exceed
            # idle_timeout_s (first _step compile is 90 s - 12 min here)
            if s.inflight == 0 and now - s.last_active > self.idle_timeout_s:
                s.closed = True
                del self._sessions[sid]
                self._record_finished_locked(sid, s)
                self._gens[s.slot] += 1
                self._free.append(s.slot)

    def _record_finished_locked(self, sid: str, sess: _Session) -> None:
        """Keep a closed/evicted stream's transcript answerable via
        tokens(). Caller holds self._lock."""
        self._finished[sid] = list(sess.tokens)
        while len(self._finished) > self._finished_cap:
            self._finished.popitem(last=False)

    def open(self) -> str:
        """Allocate a slot for a new stream; returns the session id."""
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            if not self._free:
                self._evict_idle_locked()
            if not self._free:
                raise RuntimeError(f"all {self.slots} stream slots busy")
            slot = self._free.pop()
            self._gens[slot] += 1
            sid = uuid.uuid4().hex[:12]
            self._sessions[sid] = _Session(
                slot=slot, gen=self._gens[slot],
                residual=np.zeros((0,), np.float32))
            self._pending_resets.add(slot)
        return sid

    def _session(self, sid: str) -> _Session:
        with self._lock:
            s = self._sessions.get(sid)
        if s is None or s.closed:
            raise KeyError(f"unknown or closed session {sid!r}")
        return s

    def _submit_chunks(self, sess: _Session, chunks: List[_ChunkJob],
                       timeout: float) -> List[int]:
        out: List[int] = []
        # mark in-flight BEFORE queueing so the idle evictor never sees a
        # session whose work is queued but whose last_active is stale
        sess.inflight = len(chunks)
        try:
            for job in chunks:
                self._queue.put(job)
            for job in chunks:
                if not job.event.wait(timeout):
                    raise TimeoutError("streaming step timed out")
                if job.error is not None:
                    raise RequestError(str(job.error)) from job.error
                # record per COMPLETED job (caller holds sess.lock): if a
                # later chunk of this feed fails, the device carry has
                # already consumed the earlier ones — their tokens must
                # stay retrievable via tokens()/close(), not vanish
                out.extend(job.tokens)
                sess.tokens.extend(job.tokens)
                # a long multi-chunk feed keeps refreshing its liveness,
                # so an ACTIVE session can't be idle-evicted mid-feed
                sess.last_active = time.monotonic()
                sess.inflight -= 1
        finally:
            # on failure the session is broken anyway; making it
            # evictable again is the correct end state
            sess.inflight = 0
        return out

    def feed(self, sid: str, audio: np.ndarray,
             timeout: float = 120.0) -> List[int]:
        """Append audio to the stream; returns the tokens newly decoded
        by the chunks this audio completed (output lags input by one
        chunk — streaming.py module doc)."""
        sess = self._session(sid)
        audio = np.asarray(audio, np.float32).reshape(-1)
        cs = self.chunk_samples
        with sess.lock:
            # re-check after acquiring: a concurrent close() may have
            # freed (and another open() re-taken) the slot meanwhile
            if sess.closed:
                raise KeyError(f"session {sid!r} closed concurrently")
            sess.last_active = time.monotonic()
            buf = np.concatenate([sess.residual, audio])
            jobs = []
            while len(buf) >= cs:
                jobs.append(_ChunkJob(slot=sess.slot, gen=sess.gen,
                                      chunk=buf[:cs], n_valid=cs))
                buf = buf[cs:]
            sess.residual = buf
            return self._submit_chunks(sess, jobs, timeout)

    def close(self, sid: str, timeout: float = 120.0) -> List[int]:
        """Flush the stream (residual + pipeline lag), free the slot,
        return the tokens decoded by the flush."""
        sess = self._session(sid)
        cs = self.chunk_samples
        try:
            with sess.lock:
                if sess.closed:
                    raise KeyError(f"session {sid!r} closed concurrently")
                # mark closed INSIDE the flush's critical section: a
                # feed() blocked on sess.lock must observe it when it
                # wakes — set only in a later finally, feed could pass
                # its re-check and append audio to a flushed stream
                sess.closed = True
                jobs = []
                if len(sess.residual):
                    chunk = np.zeros((cs,), np.float32)
                    chunk[: len(sess.residual)] = sess.residual
                    jobs.append(_ChunkJob(slot=sess.slot, gen=sess.gen,
                                          chunk=chunk,
                                          n_valid=len(sess.residual)))
                    sess.residual = np.zeros((0,), np.float32)
                # TWO zero chunks: one for the pipeline lag, one for the
                # encoder frame that lands past the last input chunk when
                # the stream length is an exact chunk multiple
                # (streaming.py::run_stream)
                for _ in range(2):
                    jobs.append(_ChunkJob(slot=sess.slot, gen=sess.gen,
                                          chunk=np.zeros((cs,), np.float32),
                                          n_valid=0))
                out = self._submit_chunks(sess, jobs, timeout)
                return out
        finally:
            # free the slot even if the flush failed: the generation
            # bump invalidates any still-queued jobs, and the next open()
            # resets the slot's carry, so reuse is always safe. pop()
            # guards double-close: only the closer that actually removes
            # the session frees the slot (sess.closed is set above,
            # inside the flush's own critical section). The transcript —
            # including chunks decoded BEFORE a failed flush — stays
            # answerable via tokens() through the finished map.
            with self._lock:
                if self._sessions.pop(sid, None) is not None:
                    self._record_finished_locked(sid, sess)
                    self._gens[sess.slot] += 1
                    self._free.append(sess.slot)

    def tokens(self, sid: str) -> List[int]:
        """All tokens decoded for a stream so far — live, closed, or
        evicted (closed transcripts are kept in a bounded FIFO)."""
        with self._lock:
            s = self._sessions.get(sid)
            if s is None and sid in self._finished:
                return list(self._finished[sid])
        if s is None or s.closed:
            raise KeyError(f"unknown or closed session {sid!r}")
        return list(s.tokens)

    def active_ids(self) -> set:
        with self._lock:
            return set(self._sessions)

    # -- worker side ---------------------------------------------------------

    def _collect(self) -> Dict[int, _ChunkJob]:
        """One job per slot per tick (a session's chunks are sequential);
        waits briefly to pack more slots into the tick."""
        try:
            first = self._queue.get(timeout=0.2)
        except queue.Empty:
            return {}
        picked = {first.slot: first}
        leftover = []
        deadline = time.monotonic() + self.max_wait_ms / 1000.0
        while len(picked) < self.slots:
            remaining = deadline - time.monotonic()
            try:
                job = (self._queue.get(timeout=remaining)
                       if remaining > 0 else self._queue.get_nowait())
            except queue.Empty:
                break
            if job.slot in picked:
                leftover.append(job)   # same stream: next tick
            else:
                picked[job.slot] = job
        for job in leftover:
            self._queue.put(job)
        return picked

    def _run(self) -> None:
        cs = self.chunk_samples
        while not self._closed:
            picked = self._collect()
            if not picked:
                continue
            # the WHOLE tick is guarded: an exception anywhere (packing,
            # reset compile, step) must resolve every picked job, or the
            # callers block to timeout and the worker dies silently
            resets, resets_applied = set(), False
            try:
                # ONE critical section for the stale-job check and the
                # reset snapshot: split, an evict+reopen between them
                # could let a dead session's job consume the new
                # session's one-shot carry reset
                with self._lock:
                    stale = {slot: job for slot, job in picked.items()
                             if job.gen != self._gens[slot]}
                    resets = self._pending_resets
                    self._pending_resets = set()
                for slot, job in stale.items():
                    del picked[slot]
                    job.error = RuntimeError("session closed or evicted")
                    job.event.set()
                if not picked:
                    # keep the snapshot's resets: apply next tick
                    with self._lock:
                        self._pending_resets |= resets
                    continue
                wav = np.zeros((self.slots, cs), np.float32)
                nv = np.zeros((self.slots,), np.int32)
                ready = np.zeros((self.slots,), bool)
                for slot, job in picked.items():
                    wav[slot] = job.chunk
                    nv[slot] = job.n_valid
                    ready[slot] = True
                if resets:
                    mask = np.zeros((self.slots,), bool)
                    mask[list(resets)] = True
                    self._carry = self._reset(self._carry, self._template,
                                              self._jnp.asarray(mask))
                resets_applied = True
                carry, toks, n_new = self._step(
                    self._carry, self._jnp.asarray(wav),
                    self._jnp.asarray(nv), self._jnp.asarray(ready))
                toks, n_new = np.asarray(toks), np.asarray(n_new)
                with self._lock:
                    self._carry = carry
                    self._ticks += 1
                    self._ready_counts.append(len(picked))
                    if len(self._ready_counts) > 10000:
                        self._ready_counts = self._ready_counts[-10000:]
                for slot, job in picked.items():
                    job.tokens = [int(t) for t in
                                  toks[slot, : n_new[slot]]]
            except BaseException as e:
                for job in picked.values():
                    job.error = e
                if resets and not resets_applied:
                    # snapshotted but never applied: a new session's
                    # one-shot reset must not be lost
                    with self._lock:
                        self._pending_resets |= resets
            finally:
                for job in picked.values():
                    job.event.set()

    def stats(self) -> dict:
        with self._lock:
            rc = self._ready_counts
            return {
                "slots": self.slots,
                "active_sessions": len(self._sessions),
                "ticks": self._ticks,
                "mean_ready_per_tick": (round(float(np.mean(rc)), 2)
                                        if rc else None),
            }

    def shutdown(self) -> None:
        self._closed = True
        self._worker.join(timeout=2.0)
        while True:
            try:
                job = self._queue.get_nowait()
            except queue.Empty:
                break
            job.error = RuntimeError("server closed")
            job.event.set()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
        return False
