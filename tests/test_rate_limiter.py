"""A13 rate limiter: sliding-window timing + backoff with a fake clock
(semantics mirror the reference's ``utils/rate_limiter.py:7-44``)."""

from __future__ import annotations

import pytest

from entity_extractor_linker_ray.state.rate_limiter import (
    RateLimitedError,
    RateLimiter,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def now(self) -> float:
        return self.t

    def sleep(self, sec: float) -> None:
        self.sleeps.append(round(sec, 6))
        self.t += sec


def make(max_calls, period, **kw):
    clock = FakeClock()
    limiter = RateLimiter(
        max_calls, period,
        clock=clock.now, sleep=clock.sleep, jitter=lambda a, b: 0.0, **kw,
    )
    return limiter, clock


class TestSlidingWindow:
    def test_under_limit_never_sleeps(self):
        limiter, clock = make(3, 10.0)
        for _ in range(3):
            limiter.acquire()
        assert clock.sleeps == []

    def test_at_capacity_sleeps_until_oldest_expires(self):
        limiter, clock = make(2, 10.0)
        limiter.acquire()          # t=0
        clock.t = 4.0
        limiter.acquire()          # t=4
        clock.t = 6.0
        limiter.acquire()          # window full -> sleep until t=10
        assert clock.sleeps == [4.0]
        assert clock.t == 10.0

    def test_expired_calls_free_slots(self):
        limiter, clock = make(2, 10.0)
        limiter.acquire()
        limiter.acquire()
        clock.t = 11.0             # both calls out of window
        limiter.acquire()
        assert clock.sleeps == []


class TestBackoff:
    def test_retries_with_exponential_backoff(self):
        limiter, clock = make(100, 1.0, backoff_base=1.0, backoff_max=60.0)
        attempts = []

        @limiter
        def flaky():
            attempts.append(clock.t)
            if len(attempts) < 3:
                raise RateLimitedError("429")
            return "ok"

        assert flaky() == "ok"
        # backoff_base * 2^(attempt+1): 2s after first failure, 4s after second
        assert clock.sleeps == [2.0, 4.0]

    def test_backoff_capped(self):
        limiter, clock = make(100, 1.0, backoff_base=30.0, backoff_max=45.0)

        calls = {"n": 0}

        @limiter
        def flaky():
            calls["n"] += 1
            if calls["n"] < 2:
                raise RateLimitedError("429")
            return "ok"

        assert flaky() == "ok"
        assert clock.sleeps == [45.0]  # capped, not 60

    def test_non_rate_errors_propagate(self):
        limiter, clock = make(100, 1.0)

        @limiter
        def broken():
            raise ValueError("boom")

        with pytest.raises(ValueError):
            broken()
        assert clock.sleeps == []

    def test_429_response_attribute_detected(self):
        limiter, clock = make(100, 1.0)

        class Resp:
            status_code = 429

        class HttpError(Exception):
            response = Resp()

        calls = {"n": 0}

        @limiter
        def flaky():
            calls["n"] += 1
            if calls["n"] < 2:
                raise HttpError()
            return "ok"

        assert flaky() == "ok"
        assert len(clock.sleeps) == 1


class TestPoolShare:
    def test_share_division(self):
        limiter = RateLimiter.for_pool_share(30, 1.0, pool_size=6)
        assert limiter.max_calls == 5

    def test_share_floor_is_one(self):
        limiter = RateLimiter.for_pool_share(2, 1.0, pool_size=10)
        assert limiter.max_calls == 1

    def test_make_llm_client_wires_limiter(self, kb):
        from entity_extractor_linker_ray.stages.kg_stage import make_llm_client

        cfg = {
            "MODEL": "stub",
            "RATE_LIMIT_MAX_CALLS": 40,
            "RATE_LIMIT_PERIOD": 1.0,
            "RAY_KG_CONCURRENCY": (4, 4),
        }
        client = make_llm_client(cfg, kb)
        assert client.chat.__wrapped__ is not None  # limiter-wrapped
        out = client.chat([{"role": "user", "content": "extract: Spark"}])
        assert isinstance(out, str)
