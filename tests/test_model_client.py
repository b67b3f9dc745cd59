"""BatchingModelClient: batching, rate limiting, retry, order, concurrency."""

import threading

import pytest

from dataingestion_spark.model_client import (
    BatchingModelClient,
    ModelCallError,
    RetryPolicy,
    TokenBucket,
    remote_chat_fn,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += s


def test_token_bucket_blocks_and_refills():
    clk = FakeClock()
    b = TokenBucket(rate=2.0, capacity=2.0, clock=clk, sleep=clk.sleep)
    assert b.acquire() == 0.0  # burst token 1
    assert b.acquire() == 0.0  # burst token 2
    slept = b.acquire()  # empty: must wait 1/rate
    assert slept == pytest.approx(0.5)
    # after 10 simulated seconds only rate*10 more tokens could have accrued
    total_slept = sum(b.acquire() for _ in range(10))
    assert total_slept == pytest.approx(10 * 0.5, rel=0.01)


def test_batching_preserves_order_and_sizes():
    calls = []

    def model(batch):
        calls.append(len(batch))
        return [x * 10 for x in batch]

    client = BatchingModelClient(model, batch_size=4, max_concurrency=2)
    out = client(list(range(11)))
    assert out == [x * 10 for x in range(11)]
    assert sorted(calls, reverse=True) == [4, 4, 3]
    client.close()


def test_retry_transient_then_success_records_backoff():
    clk = FakeClock()
    fails = {"n": 2}
    slept = []

    def model(batch):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise ConnectionError("transient")
        return batch

    client = BatchingModelClient(
        model, batch_size=8,
        retry=RetryPolicy(max_attempts=4, base_delay=1.0, rng=lambda: 0.5),
        clock=clk, sleep=lambda s: (slept.append(s), clk.sleep(s)),
    )
    assert client([1, 2, 3]) == [1, 2, 3]
    # decorrelated jitter with rng=0.5: d1 = 1 + (min(30,3)-1)*0.5 = 2.0;
    # d2 = 1 + (min(30,6)-1)*0.5 = 3.5
    assert slept == [pytest.approx(2.0), pytest.approx(3.5)]


def test_retry_gives_up_with_model_call_error():
    def model(batch):
        raise TimeoutError("down")

    clk = FakeClock()
    client = BatchingModelClient(
        model, retry=RetryPolicy(max_attempts=3, base_delay=0.1, rng=lambda: 0.0),
        clock=clk, sleep=clk.sleep,
    )
    with pytest.raises(ModelCallError, match="after 3 attempts"):
        client([1])


def test_length_mismatch_is_not_retried():
    calls = {"n": 0}

    def model(batch):
        calls["n"] += 1
        return batch[:-1]  # contract violation

    client = BatchingModelClient(model, retry=RetryPolicy(max_attempts=5))
    with pytest.raises(ModelCallError, match="results for"):
        client([1, 2, 3])
    assert calls["n"] == 1  # a contract bug must fail fast, not retry


def test_concurrency_cap_enforced():
    cap = 3
    active = {"now": 0, "peak": 0}
    lock = threading.Lock()
    gate = threading.Event()

    def model(batch):
        with lock:
            active["now"] += 1
            active["peak"] = max(active["peak"], active["now"])
        gate.wait(timeout=5)
        with lock:
            active["now"] -= 1
        return batch

    client = BatchingModelClient(model, batch_size=1, max_concurrency=cap)
    t = threading.Thread(target=lambda: client(list(range(10))))
    t.start()
    import time

    time.sleep(0.3)  # let the pool saturate
    gate.set()
    t.join(timeout=10)
    assert not t.is_alive()
    assert active["peak"] <= cap
    client.close()


def test_rate_limit_applies_per_request_including_retries():
    clk = FakeClock()
    fails = {"n": 1}

    def model(batch):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise ConnectionError("x")
        return batch

    client = BatchingModelClient(
        model, batch_size=2, max_concurrency=1, requests_per_second=1.0,
        retry=RetryPolicy(max_attempts=2, base_delay=0.0, rng=lambda: 0.0),
        clock=clk, sleep=clk.sleep,
    )
    client([1, 2, 3, 4])  # 2 sub-batches + 1 retry = 3 token acquisitions
    # bucket capacity 1: first free, then 2 waits of 1s each
    assert clk.t == pytest.approx(2.0)


def test_remote_chat_fn_builds_client_once_per_process():
    built = {"n": 0}

    def factory():
        built["n"] += 1
        return BatchingModelClient(lambda b: [s.upper() for s in b], batch_size=2)

    fn = remote_chat_fn(factory, key="test-upper")
    assert fn(["a", "b", "c"]) == ["A", "B", "C"]
    assert fn(["d"]) == ["D"]
    assert built["n"] == 1


def test_enricher_through_spark_with_flaky_model(spark):
    """E2E: summary_enricher(chat_fn=...) through a real pandas UDF with a
    model that fails its first call per process — retries make it exact."""
    from pyspark.sql import functions as F

    from dataingestion_spark.operators.enrichers import summary_enricher

    df = spark.createDataFrame(
        [(str(i), f"text number {i}") for i in range(20)], "key string, content string"
    )

    def factory():
        state = {"first": True}

        def model(batch):
            if state["first"]:
                state["first"] = False
                raise ConnectionError("cold start")
            return ["SUM:" + c.split()[-1] for c in batch]

        return BatchingModelClient(
            model, batch_size=4, max_concurrency=2,
            retry=RetryPolicy(max_attempts=3, base_delay=0.0, rng=lambda: 0.0),
        )

    out = summary_enricher(df, chat_fn=remote_chat_fn(factory, key="flaky-e2e"))
    got = {r.key: r.summary for r in out.collect()}
    assert got == {str(i): f"SUM:{i}" for i in range(20)}
    assert out.filter(F.col("summary").isNull()).count() == 0
