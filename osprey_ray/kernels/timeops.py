"""Time kernels.

Analogues of /root/reference/osprey_worker/src/osprey/engine/stdlib/udfs/
time_delta.py:17-31, time_since.py:22-32, time_bucket.py:13-78 — the
reference's only built-in time-bucketing primitives; our tumbling-window key
assignment builds on ``GetTimestampBucket``.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.compute as pc

from osprey_ray.expr import ExprError
from osprey_ray.kernels import kernel

# snowflake epoch (Discord convention, ms) — worker/lib/snowflake.py semantics
SNOWFLAKE_EPOCH_MS = 1_420_070_400_000


def _ts_to_us(v) -> int:
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return int(v.timestamp() * 1e6)
    raise ExprError(f"not a timestamp: {v!r}")


@kernel("TimeDelta")
class TimeDelta:
    """Constant duration in seconds → float seconds (TimeDeltaT serializes
    to seconds, engine/language_types/time_delta.py:10-24)."""

    @staticmethod
    def batch(ctx, seconds=0, minutes=0, hours=0, days=0):
        total = seconds + 60 * minutes + 3600 * hours + 86400 * days
        return pa.array([float(total)] * ctx.n, pa.float64())

    @staticmethod
    def row(rctx, seconds=0, minutes=0, hours=0, days=0):
        return float(seconds + 60 * minutes + 3600 * hours + 86400 * days)


@kernel("TimeSince")
class TimeSince:
    """Seconds between the action timestamp (``now``, default the ``ts``
    column) and ``timestamp`` (time_since.py:22-32)."""

    @staticmethod
    def batch(ctx, timestamp, now=None):
        if now is None:
            now = ctx.resolve("ts")
        delta = pc.subtract(pc.cast(now, pa.int64()), pc.cast(timestamp, pa.int64()))
        return pc.divide(pc.cast(delta, pa.float64()), 1e6)

    @staticmethod
    def row(rctx, timestamp, now=None):
        if timestamp is None:
            raise ExprError("None")
        if now is None:
            now = rctx.resolve("ts")
        return (_ts_to_us(now) - _ts_to_us(timestamp)) / 1e6


@kernel("GetTimestampBucket")
class GetTimestampBucket:
    """Floor a timestamp to bucket_seconds granularity (>=3600s in the
    reference, time_bucket.py:21,45 — we accept any positive granularity
    because our windows need finer buckets).  Output: int64 bucket start in
    epoch seconds."""

    @staticmethod
    def batch(ctx, timestamp, bucket_seconds=3600):
        s = pc.divide(pc.cast(timestamp, pa.int64()), 1_000_000)
        return pc.multiply(pc.divide(s, bucket_seconds), bucket_seconds)

    @staticmethod
    def row(rctx, timestamp, bucket_seconds=3600):
        if timestamp is None:
            raise ExprError("None")
        s = _ts_to_us(timestamp) // 1_000_000
        return (s // bucket_seconds) * bucket_seconds


@kernel("GetTimedeltaBucket")
class GetTimedeltaBucket:
    """Floor a seconds-duration to bucket granularity (time_bucket.py:13-78)."""

    @staticmethod
    def batch(ctx, delta, bucket_seconds=3600):
        d = pc.cast(delta, pa.int64())
        return pc.multiply(pc.divide(d, bucket_seconds), bucket_seconds)

    @staticmethod
    def row(rctx, delta, bucket_seconds=3600):
        if delta is None:
            raise ExprError("None")
        return (int(delta) // bucket_seconds) * bucket_seconds


@kernel("GetSnowflakeBucket")
class GetSnowflakeBucket:
    """Snowflake id → bucketed epoch seconds (time_bucket.py + snowflake
    layout: ms timestamp in the top 42 bits)."""

    @staticmethod
    def batch(ctx, snowflake, bucket_seconds=3600):
        ms = pc.add(pc.shift_right(pc.cast(snowflake, pa.int64()), 22), SNOWFLAKE_EPOCH_MS)
        s = pc.divide(ms, 1000)
        return pc.multiply(pc.divide(s, bucket_seconds), bucket_seconds)

    @staticmethod
    def row(rctx, snowflake, bucket_seconds=3600):
        if snowflake is None:
            raise ExprError("None")
        s = ((int(snowflake) >> 22) + SNOWFLAKE_EPOCH_MS) // 1000
        return (s // bucket_seconds) * bucket_seconds
