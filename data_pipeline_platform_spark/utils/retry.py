"""Exponential-backoff retry (SURVEY.md §2 O8).

Reference: src/pipeline/utils/retry.py:19-302 — decorator + context-manager
forms; delay = base_delay * exponential_base**(attempt-1), capped at
max_delay; exception-filtered; failures wrapped in RetryError. Engine-
agnostic, re-expressed here (used around Spark *actions*, never inside the
lazy plan — task-level retry inside a job belongs to the Spark scheduler).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Callable, Tuple, Type

logger = logging.getLogger(__name__)


class RetryError(Exception):
    """All attempts failed; ``last_exception`` holds the final cause."""

    def __init__(self, message: str, last_exception: Exception):
        super().__init__(message)
        self.last_exception = last_exception


def retry_call(
    func: Callable[..., Any],
    *args: Any,
    max_retries: int = 3,
    base_delay: float = 1.0,
    max_delay: float = 60.0,
    exponential_base: float = 2.0,
    retry_on: Tuple[Type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    **kwargs: Any,
) -> Any:
    """Call ``func`` with up to ``max_retries`` attempts."""
    last_exc: Exception = RuntimeError("no attempts made")
    for attempt in range(1, max_retries + 1):
        try:
            return func(*args, **kwargs)
        except retry_on as exc:
            last_exc = exc
            if attempt == max_retries:
                break
            delay = min(base_delay * exponential_base ** (attempt - 1), max_delay)
            logger.warning(
                "attempt %d/%d failed (%s); retrying in %.2fs",
                attempt,
                max_retries,
                exc,
                delay,
            )
            sleep(delay)
    raise RetryError(f"failed after {max_retries} attempts: {last_exc}", last_exc)


def retry(
    max_retries: int = 3,
    base_delay: float = 1.0,
    max_delay: float = 60.0,
    exponential_base: float = 2.0,
    retry_on: Tuple[Type[BaseException], ...] = (Exception,),
) -> Callable:
    """Decorator form."""

    def decorator(func: Callable) -> Callable:
        @functools.wraps(func)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            return retry_call(
                func,
                *args,
                max_retries=max_retries,
                base_delay=base_delay,
                max_delay=max_delay,
                exponential_base=exponential_base,
                retry_on=retry_on,
                **kwargs,
            )

        return wrapper

    return decorator


def retry_async(
    max_retries: int = 3,
    base_delay: float = 1.0,
    max_delay: float = 60.0,
    exponential_base: float = 2.0,
    retry_on: Tuple[Type[BaseException], ...] = (Exception,),
    on_retry: Callable[[int, Exception], None] | None = None,
):
    """Async decorator form (reference retry.py:135-238): same backoff
    schedule as :func:`retry`, awaiting ``asyncio.sleep`` so the event
    loop stays free between attempts — the variant async API handlers
    (FastAPI) need, where a blocking ``time.sleep`` would stall every
    in-flight request. Exceptions outside ``retry_on`` propagate
    immediately; ``on_retry(attempt, exc)`` fires after each failed
    attempt (callback errors are logged, never raised)."""
    import asyncio

    def decorator(func: Callable) -> Callable:
        @functools.wraps(func)
        async def wrapper(*args: Any, **kwargs: Any) -> Any:
            last_exc: Exception = RuntimeError("no attempts made")
            for attempt in range(1, max_retries + 1):
                try:
                    return await func(*args, **kwargs)
                except retry_on as exc:
                    last_exc = exc
                    if on_retry is not None:
                        try:
                            on_retry(attempt, exc)
                        except Exception as cb_exc:  # advisory only
                            logger.warning("on_retry callback failed: %s", cb_exc)
                    if attempt == max_retries:
                        break
                    delay = min(
                        base_delay * exponential_base ** (attempt - 1), max_delay
                    )
                    logger.warning(
                        "attempt %d/%d failed (%s); retrying in %.2fs",
                        attempt,
                        max_retries,
                        exc,
                        delay,
                    )
                    await asyncio.sleep(delay)
            raise RetryError(
                f"failed after {max_retries} attempts: {last_exc}", last_exc
            )

        return wrapper

    return decorator


class RetryContext:
    """Context-manager form (reference retry.py:241-302): loop over
    ``attempts()``, breaking on success."""

    def __init__(self, max_retries: int = 3, base_delay: float = 1.0, **kwargs: Any):
        self.max_retries = max_retries
        self.base_delay = base_delay
        self.kwargs = kwargs

    def attempts(self):
        max_delay = self.kwargs.get("max_delay", 60.0)
        base = self.kwargs.get("exponential_base", 2.0)
        for attempt in range(1, self.max_retries + 1):
            yield attempt
            if attempt < self.max_retries:
                time.sleep(min(self.base_delay * base ** (attempt - 1), max_delay))
