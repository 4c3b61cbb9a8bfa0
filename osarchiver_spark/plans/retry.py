"""Job-level retry + fault bisection (SURVEY X2 / S20).

Spark retries *tasks* by itself; these helpers cover the layer the
reference handles manually:

- ``retry_with_backoff`` — the reference's db_request retry loop
  (osarchiver/common/db.py:148-160, 305-391: max_retries=5, 2 s
  backoff, fail-fast on non-retryable errors).
- ``bisect_failing_rows`` — the reference's dichotomic fault
  isolation (source/db.py:376-426): when a sink rejects a batch,
  recursively split it by pk range until the poison rows are
  isolated, so one bad row doesn't block the other N-1. The split is
  a pk-sorted half-partition (numpy array_split's distributed moral
  equivalent); each probe is a pushdown range filter, not a shuffle.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_RETRIES = 5  # common/db.py:40
DEFAULT_BACKOFF_S = 2.0  # common/db.py:42


def retry_with_backoff(
    fn: Callable[[], object],
    max_retries: int = DEFAULT_MAX_RETRIES,
    backoff_s: float = DEFAULT_BACKOFF_S,
    retryable: Callable[[Exception], bool] = lambda e: True,
):
    """Run fn; on retryable failure sleep and retry, else raise."""
    last: Exception | None = None
    for attempt in range(max_retries):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001
            if not retryable(exc):
                raise
            last = exc
            if attempt < max_retries - 1:
                time.sleep(backoff_s)
    assert last is not None
    raise last


def bisect_failing_rows(
    df: DataFrame,
    pk: str,
    write_fn: Callable[[DataFrame], None],
    min_rows: int = 1,
) -> list:
    """Write df via write_fn; on failure, bisect by pk median until
    the failing unit is ≤ min_rows. Returns the isolated poison pk
    values (written rows are committed by write_fn as it goes —
    idempotent sinks make re-probing safe, mirroring the reference's
    ON-DUPLICATE no-op upserts)."""
    poison: list = []

    def attempt(part: DataFrame) -> None:
        try:
            write_fn(part)
            return
        except Exception:  # noqa: BLE001
            n = part.count()
            if n <= min_rows:
                poison.extend([r[0] for r in part.select(pk).collect()])
                return
            # median pk splits the range; both halves are pushdown
            # range scans of the original source
            mid = part.approxQuantile(pk, [0.5], 0.001)[0]
            left = part.filter(F.col(pk) <= F.lit(mid))
            right = part.filter(F.col(pk) > F.lit(mid))
            if left.count() in (0, n):  # degenerate split (duplicate pks)
                poison.extend([r[0] for r in part.select(pk).collect()])
                return
            attempt(left)
            attempt(right)

    attempt(df)
    return poison
