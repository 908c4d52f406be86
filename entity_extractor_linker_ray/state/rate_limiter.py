"""Sliding-window rate limiter with exponential backoff (A13).

Mirrors the reference's thread-safe limiter semantics
(``utils/rate_limiter.py:7-44``): call timestamps are retained within
``period``; at capacity the caller sleeps until the oldest call leaves
the window; a rate-limit error triggers exponential backoff with ±10%
jitter (capped at ``backoff_max``) and a retry.

Adaptations for the actor-pool world (and the sealed environment):

* the clock, sleep and jitter sources are injectable, so tests drive a
  fake clock deterministically;
* :meth:`for_pool_share` divides a GLOBAL budget across the ``N``
  actors of a pool — each actor enforces ``budget/N`` locally, so the
  pool as a whole never exceeds the global rate without any cross-actor
  coordination (the scale-correct shape: a shared limiter actor would
  serialize every LLM/KB call through one process);
* the 429 trigger is :class:`RateLimitedError` (or any exception whose
  ``response.status_code`` is 429, matching the reference's check) —
  raised by whatever networked client gets registered in
  ``make_llm_client``.
"""

from __future__ import annotations

import logging
import random
import threading
import time
from functools import wraps

logger = logging.getLogger(__name__)


class RateLimitedError(Exception):
    """Raised by a client when the remote side rate-limits (HTTP 429
    equivalent); the limiter backs off and retries."""


def _is_rate_limit_error(exc: Exception) -> bool:
    if isinstance(exc, RateLimitedError):
        return True
    response = getattr(exc, "response", None)
    return response is not None and getattr(response, "status_code", None) == 429


class RateLimiter:
    def __init__(
        self,
        max_calls: int,
        period: float,
        backoff_base: float = 1.0,
        backoff_max: float = 60.0,
        *,
        clock=time.monotonic,
        sleep=time.sleep,
        jitter=random.uniform,
        max_retries: int = 8,
    ):
        self.max_calls = max(1, int(max_calls))
        self.period = float(period)
        self.backoff_base = backoff_base
        self.backoff_max = backoff_max
        self.clock = clock
        self.sleep = sleep
        self.jitter = jitter
        self.max_retries = max_retries
        self.lock = threading.Lock()
        self.calls: list[float] = []

    @classmethod
    def for_pool_share(
        cls, global_max_calls: int, period: float, pool_size: int, **kwargs
    ) -> "RateLimiter":
        """Per-actor limiter enforcing an equal share of a global
        budget: ``N`` actors each limited to ``global/N`` keep the pool
        under ``global`` with zero coordination."""
        share = max(1, int(global_max_calls) // max(1, int(pool_size)))
        return cls(share, period, **kwargs)

    def acquire(self) -> None:
        """Block (via the injected sleep) until a call slot is free,
        then record the call — the reference's window/sleep logic."""
        with self.lock:
            now = self.clock()
            self.calls = [t for t in self.calls if t > now - self.period]
            if len(self.calls) >= self.max_calls:
                sleep_t = self.calls[0] + self.period - now
                if sleep_t > 0:
                    logger.info("rate limit reached, sleeping %.2fs", sleep_t)
                    self.sleep(sleep_t)
                now = self.clock()
                self.calls = [t for t in self.calls if t > now - self.period]
            self.calls.append(self.clock())

    def __call__(self, func):
        @wraps(func)
        def wrapper(*args, **kwargs):
            for attempt in range(self.max_retries + 1):
                self.acquire()
                try:
                    return func(*args, **kwargs)
                except Exception as exc:  # noqa: BLE001 - re-raised below
                    if not _is_rate_limit_error(exc) or attempt == self.max_retries:
                        raise
                    expo = min(
                        self.backoff_base * 2 ** (attempt + 1), self.backoff_max
                    )
                    sleep_t = expo + expo * self.jitter(-0.1, 0.1)
                    logger.warning(
                        "rate-limited by remote, backing off %.2fs", sleep_t
                    )
                    self.sleep(sleep_t)
            raise RuntimeError("unreachable")

        return wrapper
