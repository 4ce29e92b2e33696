"""Online serving: dynamic request batching around the predictors.

The reference stops at an offline ``--only_test`` loop
(/root/reference/MTVAF_training.py:391-394); :mod:`mtvaf_tpu.infer` adds the
offline batch APIs (``predict`` / ``predict_many``).  This module is the
online tier: concurrent callers submit single sentences and a background
worker coalesces them into fixed-shape device batches — the TPU sees one
jitted program at one batch size (no shape churn, no per-request dispatch),
callers see a Future each.

Batching policy (the standard latency/throughput knobs):

* ``max_batch``   — coalesce at most this many requests per device call
                    (the predictor's compiled batch shape; tail is padded).
* ``batch_shapes`` — optional LADDER of compiled batch shapes (ascending;
                    default ``(max_batch,)``).  Each take of n requests
                    runs at the smallest rung >= n, so idle singles pay a
                    b1 program (~1/3 the b16 latency on the tunneled
                    backend) while saturation runs the top rung — the
                    queue depth at coalesce time picks the shape.  Every
                    rung is one fixed XLA program; call :meth:`warmup`
                    before taking traffic so no rung compiles mid-serving.
* ``max_wait_ms`` — a partially-filled batch launches after this long; a
                    full batch launches immediately.
* ``pipeline_depth`` — up to this many batches in flight on the device
                    (dispatch/collect split; per-batch host round-trips
                    hide behind the next batches' compute — essential on
                    tunneled backends where each fetch is a ~25-40 ms RPC).
* ``partial_inflight`` — saturation FILL policy: an aged-out batch that is
                    still below the top rung only dispatches while fewer
                    than this many batches are in flight on the replica
                    (default ``min(2, pipeline_depth)``).  Padding a rung
                    behind an already-busy pipeline buys no latency — the
                    batch just waits in line while its padding burns
                    top-rung device cycles — so the worker holds the take
                    until the queue fills the rung or a slot frees.  Full
                    batches always dispatch up to ``pipeline_depth``.
                    Under closed-loop load this converges to FULL top-rung
                    batches (the offline ``predict_many`` rate) instead of
                    the ~2/3-full batches the eager policy settles into.
* ``max_queue``   — backpressure bound: with more than this many requests
                    already waiting, ``submit`` fails fast with
                    :class:`QueueFull` instead of queueing (the HTTP tier
                    maps it to 429).  Unbounded by default; production
                    deployments should set it to a few top-rung batches —
                    past that depth every queued request only adds latency
                    it could have spent retrying a healthy replica.
* ``devices``     — optional list of chips for DATA-PARALLEL serving: one
                    predictor replica (params device_put, see
                    ``infer._PredictorBase.to_device``) and one dispatch
                    worker per device, all draining the shared queue.  No
                    collectives: per-request latency stays single-chip
                    while throughput scales with chips (on a v5e-8, 8×
                    the saturated single-chip rate).  Total in-flight
                    batches = replicas × pipeline_depth.

Under load the server converges to full, pipelined top-rung batches (the
throughput of ``predict_many``); idle single requests pay at most
``max_wait_ms`` + one smallest-rung device call.  Latency percentiles are
tracked per request.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Sequence, Tuple


class QueueFull(RuntimeError):
    """Raised by :meth:`BatchingServer.submit` when the request queue is at
    ``max_queue`` — the load-shedding signal (HTTP tier: 429)."""


class BatchingServer:
    """Dynamic-batching front-end for a ``CrfPredictor`` or ``SpanPredictor``.

    >>> server = BatchingServer(predictor, max_batch=16, max_wait_ms=5.0)
    >>> fut = server.submit("the pizza was great but service slow")
    >>> fut.result()
    [('pizza', 'POS'), ('service', 'NEG')]
    >>> server.close()

    Thread-safe; ``submit`` never blocks on device work.  Images are
    accepted per request (multimodal predictors batch them alongside the
    text).  Results keep request order within a batch and are delivered
    through each request's own Future.
    """

    def __init__(self, predictor, *, max_batch: int = 16,
                 max_wait_ms: float = 5.0, pipeline_depth: int = 4,
                 batch_shapes: Optional[Sequence[int]] = None,
                 devices: Optional[Sequence[Any]] = None,
                 max_queue: Optional[int] = None,
                 partial_inflight: Optional[int] = None):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        if pipeline_depth < 1:
            raise ValueError("pipeline_depth must be >= 1")
        # Multi-chip: one predictor REPLICA per device (params device_put
        # there — infer._PredictorBase.to_device), one dispatch worker per
        # replica, all draining the shared queue.  Data-parallel serving
        # with no collectives: per-request latency stays single-chip,
        # throughput scales with chips.  ``devices=None`` = the classic
        # single-worker server on the predictor as given.
        self._predictors = ([predictor.to_device(d) for d in devices]
                            if devices else [predictor])
        # the rung ladder: each take of n requests runs at the smallest
        # compiled shape >= n; a bare max_batch is a one-rung ladder
        self._shapes = tuple(sorted({int(s) for s in batch_shapes})) \
            if batch_shapes else (int(max_batch),)
        if self._shapes[0] < 1:
            raise ValueError("batch_shapes must be >= 1")
        self._max_batch = self._shapes[-1]
        self._max_wait_s = float(max_wait_ms) / 1e3
        if max_queue is not None and max_queue < 1:
            raise ValueError("max_queue must be >= 1 (or None = unbounded)")
        self._max_queue = max_queue
        # Keep up to pipeline_depth batches in flight on the device: the
        # worker issues predictor.dispatch() and hands the blocking
        # predictor.collect() to a fetch pool, so per-batch host round
        # trips (a full RPC each on tunneled backends) hide behind the
        # next batches' compute.  Depth 1 = fully synchronous.
        self._pipeline_depth = int(pipeline_depth) \
            if hasattr(predictor, "dispatch") else 1      # depth PER replica
        # Saturation fill policy: an aged but PARTIAL (below-top-rung) take
        # only dispatches while fewer than this many batches are in flight
        # on the replica.  With the pipeline already that deep, launching a
        # padded batch buys no latency — it just queues behind the in-flight
        # work while its padding burns top-rung device cycles — so the
        # worker holds the take until the queue fills the top rung or a
        # slot frees (a resolve notifies).  Depth 2 keeps the device busy
        # (one computing, one hiding the collect RPC); beyond that the
        # extra in-flight partials only lower the mean fill.  FULL batches
        # always dispatch up to pipeline_depth.
        self._partial_inflight = min(2, self._pipeline_depth) \
            if partial_inflight is None else int(partial_inflight)
        if self._partial_inflight < 1:
            raise ValueError("partial_inflight must be >= 1")
        self._inflight_n = [0] * len(self._predictors)
        from collections import deque
        self._lock = threading.Condition()
        self._queue: List[Tuple[str, Optional[Any], Future]] = []
        self._closed = False
        # stats windows are bounded: a long-running server must not grow
        # without limit, and stats() sorts under the lock
        self._served = 0
        self._rejected = 0
        self._batches = 0                # cumulative (Prometheus counter);
                                         # the deques below are the bounded
                                         # percentile/occupancy window
        self._latencies_ms = deque(maxlen=8192)
        self._batch_sizes = deque(maxlen=8192)
        self._replica_batches = [0] * len(self._predictors)
        self._workers = [
            threading.Thread(target=self._run, args=(i, p),
                             name=f"mtvaf-serve-{i}", daemon=True)
            for i, p in enumerate(self._predictors)]
        for w in self._workers:
            w.start()

    # ------------------------------------------------------------------ API

    def submit(self, sentence: str, image=None) -> Future:
        """Enqueue one sentence (+ optional preprocessed image, (224,224,3)
        fp32); returns a Future resolving to that sentence's predictions."""
        fut: Future = Future()
        fut._mtvaf_t0 = time.perf_counter()           # latency accounting
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            if (self._max_queue is not None
                    and len(self._queue) >= self._max_queue):
                self._rejected += 1
                raise QueueFull(
                    f"request queue at max_queue={self._max_queue}")
            self._queue.append((sentence, image, fut))
            # notify_all: with replicas, a worker holding a partial take
            # (pipeline busy) must not swallow the wakeup meant for an
            # idle one
            self._lock.notify_all()
        return fut

    def predict(self, sentence: str, image=None):
        """Synchronous convenience wrapper around :meth:`submit`."""
        return self.submit(sentence, image).result()

    def warmup(self) -> None:
        """Compile every ladder rung on every replica before taking traffic
        (each rung is one fixed XLA program; a cache-miss compile
        mid-serving would stall the queue for its full compile time —
        minutes on remote-compile backends).  Replicas warm concurrently:
        they share the compile cache, and the per-device executable loads
        overlap."""
        from concurrent.futures import ThreadPoolExecutor

        import numpy as np

        def warm(p):
            for rung in self._shapes:
                p.predict(["warm up"] * rung)
                if getattr(p, "serves_images", False):
                    # prefix predictors run a SECOND program per rung when
                    # a batch carries images (guides + packed decode with
                    # guide args) — compile it now, not on the first
                    # image-bearing request
                    p.predict(["warm up"] * rung,
                              images=np.zeros((rung, 224, 224, 3),
                                              np.float32))

        if len(self._predictors) == 1:
            warm(self._predictors[0])
            return
        with ThreadPoolExecutor(len(self._predictors)) as pool:
            list(pool.map(warm, self._predictors))

    def stats(self) -> Dict[str, float]:
        """Cumulative served/rejected/batch counts (monotonic — safe to
        export as Prometheus counters) plus latency percentiles (ms) and
        mean batch occupancy over the most recent window (8192 entries)."""
        with self._lock:
            served = self._served
            rejected = self._rejected
            batches = self._batches
            lats = sorted(self._latencies_ms)
            sizes = list(self._batch_sizes)
            replica_batches = list(self._replica_batches)
        base = {"served": served, "rejected": rejected,
                "replicas": len(self._predictors)}
        if len(replica_batches) > 1:
            base["replica_batches"] = replica_batches
        if not lats:
            return base

        def pct(p):
            return lats[min(len(lats) - 1, int(p / 100.0 * len(lats)))]

        return {**base, "p50_ms": round(pct(50), 2),
                "p95_ms": round(pct(95), 2), "p99_ms": round(pct(99), 2),
                "mean_batch": round(sum(sizes) / len(sizes), 2),
                "batches": batches}

    def close(self, timeout: Optional[float] = 30.0) -> None:
        """Stop accepting requests, drain the queue, join the worker."""
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        for w in self._workers:
            w.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # --------------------------------------------------------------- worker

    def _take_batch(self, replica: int = 0) \
            -> Optional[List[Tuple[str, Optional[Any], Future]]]:
        """Block until a batch is ready (full, aged out with a pipeline
        slot worth using, or closing)."""
        with self._lock:
            while True:
                if self._queue:
                    if len(self._queue) >= self._max_batch or self._closed:
                        take = self._queue[:self._max_batch]
                        del self._queue[:len(take)]
                        return take
                    deadline = self._queue[0][2]._mtvaf_t0 + self._max_wait_s
                    if time.perf_counter() >= deadline:
                        if (self._inflight_n[replica]
                                < self._partial_inflight):
                            take = self._queue[:self._max_batch]
                            del self._queue[:len(take)]
                            return take
                        # Aged but partial with the pipeline already
                        # partial_inflight deep: hold for fill.  A resolve
                        # (guaranteed: something IS in flight) or a new
                        # submit re-wakes this wait.
                        self._lock.wait()
                    else:
                        self._lock.wait(timeout=max(
                            0.0, deadline - time.perf_counter()))
                elif self._closed:
                    return None
                else:
                    self._lock.wait()

    def _resolve(self, batch, results_or_exc, replica: int = 0) -> None:
        if isinstance(results_or_exc, BaseException):
            for _, _, fut in batch:
                fut.set_exception(results_or_exc)
            return
        now = time.perf_counter()
        with self._lock:
            self._batch_sizes.append(len(batch))
            self._batches += 1
            self._replica_batches[replica] += 1
            self._served += len(batch)
            for _, _, fut in batch:
                self._latencies_ms.append((now - fut._mtvaf_t0) * 1e3)
        for (_, _, fut), res in zip(batch, results_or_exc):
            fut.set_result(res)

    def _run(self, replica: int, predictor) -> None:
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        import numpy as np

        inflight: deque = deque()        # pool futures, for backpressure

        def collect_and_resolve(batch, n, handle):
            # Runs on a pool thread and resolves the request futures
            # ITSELF: the worker may already be blocked waiting for new
            # requests, so trailing batches must not depend on it.
            try:
                self._resolve(batch, predictor.collect(handle)[:n], replica)
            except BaseException as e:              # resolve, don't wedge
                self._resolve(batch, e)
            finally:
                with self._lock:
                    self._inflight_n[replica] -= 1
                    # a slot freed: a worker holding a partial take may
                    # now dispatch it
                    self._lock.notify_all()

        with ThreadPoolExecutor(max_workers=self._pipeline_depth,
                                thread_name_prefix="mtvaf-serve-fetch") \
                as fetcher:
            while True:
                b = self._take_batch(replica)
                if b is None:
                    while inflight:
                        inflight.popleft().result()
                    return
                n = len(b)
                # Pad to the smallest ladder rung that fits: the device
                # must only ever see the compiled programs (a partial batch
                # at a new size would trigger a fresh XLA compile
                # mid-serving).  Idle singles ride the bottom rung's short
                # program; a saturated queue fills the top rung.
                rung = next(s for s in self._shapes if s >= n)
                sentences = [s for s, _, _ in b]
                sentences += [sentences[-1]] * (rung - n)
                images = None
                if any(img is not None for _, img, _ in b):
                    blank = np.zeros((224, 224, 3), np.float32)
                    images = np.stack([blank if img is None else img
                                       for _, img, _ in b]
                                      + [blank] * (rung - n))
                if self._pipeline_depth > 1:
                    try:
                        handle = predictor.dispatch(sentences, images=images)
                    except BaseException as e:
                        self._resolve(b, e)
                        continue
                    with self._lock:
                        self._inflight_n[replica] += 1
                    inflight.append(fetcher.submit(collect_and_resolve,
                                                   b, n, handle))
                    while len(inflight) >= self._pipeline_depth:
                        inflight.popleft().result()
                else:
                    try:
                        results = predictor.predict(
                            sentences, images=images)[:n]
                    except BaseException as e:
                        self._resolve(b, e)
                        continue
                    self._resolve(b, results, replica)
