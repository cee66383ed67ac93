"""Retry-with-backoff for transient tunnel/remote-compile failures.

The TPU tunnel's remote-compile path can throw transient HTTP 500 /
"response body closed" errors under heavy host-CPU load (CLAUDE.md
environment notes); those happen during lowering/compilation, before any
donated buffer is consumed, so re-invoking the same call is safe. Some
markers ("deadline exceeded", "unavailable") can also fire at RUNTIME,
after donation — callers whose `fn` donates inputs must pass
`should_retry=lambda: buffers_intact(<the donated trees>)` so a
post-donation failure propagates instead of retrying on deleted arrays.
Anything that doesn't match the transient markers is re-raised
immediately.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence, TypeVar

T = TypeVar("T")

TRANSIENT_MARKERS: tuple[str, ...] = (
    "response body closed",
    "http 500",
    "500 internal",
    "deadline exceeded",
    "connection reset",
    "unavailable",
)


def is_transient(exc: BaseException, markers: Sequence[str] = TRANSIENT_MARKERS) -> bool:
    msg = str(exc).lower()
    return any(m in msg for m in markers)


def buffers_intact(*trees) -> bool:
    """True iff no jax.Array leaf in `trees` has been deleted.

    Guard for retrying a call whose arguments are DONATED: markers like
    "deadline exceeded"/"unavailable" can also fire at runtime, AFTER the
    donated input buffers were consumed — re-invoking then would raise a
    confusing "Array has been deleted" that masks the original error. Only
    retry when this returns True."""
    import jax

    for tree in trees:
        for leaf in jax.tree.leaves(tree):
            if isinstance(leaf, jax.Array) and leaf.is_deleted():
                return False
    return True


def retry_transient(
    fn: Callable[[], T],
    *,
    retries: int = 3,
    base_delay: float = 5.0,
    markers: Sequence[str] = TRANSIENT_MARKERS,
    on_retry: Callable[[int, BaseException], None] | None = None,
    should_retry: Callable[[], bool] | None = None,
) -> T:
    """Call `fn()`; on a transient error retry up to `retries` times with
    exponential backoff (base_delay * 2^attempt). Non-transient errors and
    the final failure propagate. `should_retry` (e.g. a `buffers_intact`
    closure when `fn` donates its inputs) can veto the retry after the
    marker matched — the original error then propagates."""
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — filtered by marker below
            if attempt >= retries or not is_transient(exc, markers):
                raise
            if should_retry is not None and not should_retry():
                raise
            if on_retry is not None:
                on_retry(attempt, exc)
            time.sleep(base_delay * (2.0**attempt))
    raise AssertionError("unreachable")
