"""Rate-limited, retrying, batching model client — the production path the
deterministic enricher fakes stand in for.

The reference serializes one chat call per chunk on the pull path
(``Processors/SummaryEnricher.cs:50-64`` — await per chunk, no batching, no
rate control). At 100 TB that shape is untenable: an enricher pass is
millions of model calls, and the bottleneck is the model endpoint, not the
cluster. This module gives the Arrow-batched ``chat_fn`` seam in
``operators/enrichers.py`` a real client:

* **micro-batching** — an incoming Arrow batch (thousands of chunks) is cut
  into model-sized requests (``batch_size`` items per call);
* **bounded concurrency** — at most ``max_concurrency`` requests in flight
  per executor process (I/O-bound → threads, no asyncio requirement on the
  model SDK); combined with Spark's own task parallelism this caps global
  pressure at ``executors × cores × max_concurrency``;
* **token-bucket rate limiting** — ``requests_per_second`` is enforced
  *before* a request is attempted, so a saturated bucket applies
  backpressure by blocking the worker thread (Spark naturally stops feeding
  Arrow batches to a blocked UDF — no unbounded queue anywhere);
* **retry with exponential backoff + decorrelated jitter** on retryable
  errors, raising after ``max_attempts`` so a poisoned batch fails the task
  (and Spark's task retry takes over) instead of silently dropping rows.

Clock and sleep are injectable; tests run with a fake clock and assert the
schedule instead of sleeping.

Executor-side lifecycle: model connections aren't picklable, so ship a
*factory* with :func:`remote_chat_fn` — each executor process builds its
client on first use and caches it for the lifetime of the Python worker.
"""

from __future__ import annotations

import random
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple, Type


class ModelCallError(RuntimeError):
    """Raised when a model call keeps failing after every retry."""


@dataclass
class RetryPolicy:
    """Exponential backoff with decorrelated jitter (AWS-style): delay_n is
    uniform in [base, min(max_delay, 3 × previous_delay)]. ``rng`` is
    injectable for deterministic tests."""

    max_attempts: int = 4
    base_delay: float = 0.5
    max_delay: float = 30.0
    retryable: Tuple[Type[BaseException], ...] = (Exception,)
    rng: Callable[[], float] = random.random

    def delays(self):
        prev = self.base_delay
        for _ in range(self.max_attempts - 1):
            lo, hi = self.base_delay, min(self.max_delay, prev * 3)
            prev = lo + (hi - lo) * self.rng()
            yield prev


class TokenBucket:
    """Thread-safe token bucket: ``rate`` tokens/sec, burst up to
    ``capacity``. ``acquire`` blocks (backpressure) until a token is
    available. No busy-wait — sleeps exactly until the next token accrues."""

    def __init__(self, rate: float, capacity: Optional[float] = None,
                 clock: Callable[[], float] = time.monotonic,
                 sleep: Callable[[float], None] = time.sleep):
        if rate <= 0:
            raise ValueError("rate must be positive")
        self.rate = rate
        self.capacity = capacity if capacity is not None else max(1.0, rate)
        self._tokens = self.capacity
        self._clock = clock
        self._sleep = sleep
        self._last = clock()
        self._lock = threading.Lock()

    def acquire(self, n: float = 1.0) -> float:
        """Take ``n`` tokens, blocking as needed; returns seconds slept."""
        slept = 0.0
        while True:
            with self._lock:
                now = self._clock()
                self._tokens = min(self.capacity, self._tokens + (now - self._last) * self.rate)
                self._last = now
                if self._tokens >= n:
                    self._tokens -= n
                    return slept
                wait = (n - self._tokens) / self.rate
            self._sleep(wait)
            slept += wait


@dataclass
class BatchingModelClient:
    """Order-preserving batched executor for a remote model call.

    ``call_fn`` receives a list of ≤ ``batch_size`` inputs and must return
    one output per input (the model request). ``__call__`` takes the whole
    Arrow batch, fans sub-batches across a bounded thread pool behind the
    rate limiter, and reassembles results in input order — the exact
    signature ``operators/enrichers.py`` expects for ``chat_fn``.
    """

    call_fn: Callable[[List], List]
    batch_size: int = 16
    max_concurrency: int = 4
    requests_per_second: Optional[float] = None
    retry: RetryPolicy = field(default_factory=RetryPolicy)
    clock: Callable[[], float] = time.monotonic
    sleep: Callable[[float], None] = time.sleep

    def __post_init__(self):
        if self.batch_size < 1 or self.max_concurrency < 1:
            raise ValueError("batch_size and max_concurrency must be ≥ 1")
        self._bucket = (
            TokenBucket(self.requests_per_second, clock=self.clock, sleep=self.sleep)
            if self.requests_per_second else None
        )
        # one pool per client per process; lazily built so the dataclass
        # survives cloudpickle before first use
        self._pool: Optional[ThreadPoolExecutor] = None
        self._pool_lock = threading.Lock()

    def _ensure_pool(self) -> ThreadPoolExecutor:
        with self._pool_lock:
            if self._pool is None:
                self._pool = ThreadPoolExecutor(max_workers=self.max_concurrency)
            return self._pool

    def _one_request(self, chunk: List) -> List:
        if self._bucket is not None:
            self._bucket.acquire()
        attempt_errors: List[BaseException] = []
        delays = list(self.retry.delays()) + [None]  # None = no sleep after last
        for delay in delays:
            try:
                out = self.call_fn(list(chunk))
                if len(out) != len(chunk):
                    raise ModelCallError(
                        f"model returned {len(out)} results for {len(chunk)} inputs"
                    )
                return list(out)
            except self.retry.retryable as exc:  # noqa: PERF203
                if isinstance(exc, ModelCallError):
                    raise  # length mismatch is a contract bug, not transient
                attempt_errors.append(exc)
                if delay is None:
                    raise ModelCallError(
                        f"model call failed after {self.retry.max_attempts} attempts: "
                        f"{attempt_errors[-1]!r}"
                    ) from attempt_errors[-1]
                self.sleep(delay)
                if self._bucket is not None:
                    self._bucket.acquire()  # re-pay the rate cost of the retry
        raise AssertionError("unreachable")

    def __call__(self, items: Sequence) -> List:
        items = list(items)
        if not items:
            return []
        chunks = [items[i:i + self.batch_size] for i in range(0, len(items), self.batch_size)]
        if len(chunks) == 1:
            return self._one_request(chunks[0])
        pool = self._ensure_pool()
        return [x for fut in [pool.submit(self._one_request, c) for c in chunks]
                for x in fut.result()]

    def close(self):
        with self._pool_lock:
            if self._pool is not None:
                self._pool.shutdown(wait=True)
                self._pool = None


_PROCESS_CLIENTS: dict = {}
_PROCESS_CLIENTS_LOCK = threading.Lock()


def _get_or_build(cache_key: str, factory: Callable[[], "BatchingModelClient"]):
    client = _PROCESS_CLIENTS.get(cache_key)
    if client is None:
        with _PROCESS_CLIENTS_LOCK:
            client = _PROCESS_CLIENTS.get(cache_key)
            if client is None:
                client = factory()
                _PROCESS_CLIENTS[cache_key] = client
    return client


def remote_chat_fn(client_factory: Callable[[], BatchingModelClient],
                   key: Optional[str] = None) -> Callable[[List], List]:
    """Executor-side lazy client: returns a picklable ``chat_fn`` that
    builds the client via ``client_factory`` on first call *in each Python
    worker process* and caches it under ``key`` (default: the factory's
    qualified name). Pass the result as ``chat_fn=`` to any enricher.

    The process cache is resolved through an import *inside* the returned
    function: cloudpickle ships repo-local functions by value together with
    the module globals they touch, and a cached client holds a live thread
    pool — unpicklable. An in-body import rebinds to the executor's own
    (initially empty) cache instead of serializing the driver's."""
    cache_key = key or f"{client_factory.__module__}.{getattr(client_factory, '__qualname__', repr(client_factory))}"

    def chat_fn(items: List) -> List:
        from dataingestion_spark import model_client as _mc

        return _mc._get_or_build(cache_key, client_factory)(items)

    return chat_fn
