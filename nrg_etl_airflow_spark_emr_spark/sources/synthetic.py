"""Custom Python DataSource (Spark 4 API): deterministic synthetic events.

A seedable, partition-parallel generator with the same schema as the
``events`` fixture — the engine's answer to "give me N rows of realistic
stream traffic at any scale without staging files". Use cases: load
benchmarks beyond the largest fixture, streaming backfill rehearsals,
and CI that must not depend on fixture files.

Determinism contract: row ``i`` (globally numbered) is a pure function
of ``(seed, i)`` via the same md5-split construction as
``functions/hashing.py`` — so the same options produce the same table on
any partition count, executor layout, or retry. Generation is
embarrassingly parallel: each InputPartition owns a contiguous row
range; there is no coordination, no driver-side data, and throughput
scales linearly with partitions (the 100 TB story: this is how you
synthesize a 100 TB test corpus in minutes on a 1000-executor cluster).

Registered per-session via ``spark.dataSource.register(...)``; see
``register_synthetic_events``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

EVENT_TYPES = ("signup", "click", "error", "view", "purchase")
_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)
_EPOCH_START = 1704067200  # 2024-01-01T00:00:00Z, matching the fixture's era


def _h64(seed: int, i: int, field: str) -> int:
    """Deterministic 60-bit value for (seed, row, field) — md5-based like
    hash60, so the generator is reproducible anywhere Python runs."""
    digest = hashlib.md5(f"{seed}:{i}:{field}".encode()).hexdigest()
    return int(digest[:15], 16)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` with options:

    - ``rows`` (default 1000): total rows
    - ``partitions`` (default 8): parallel generators
    - ``seed`` (default 0): corpus seed; different seeds → independent corpora
    - ``users`` (default 1000): user-id cardinality
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 0))
        self.users = max(1, int(options.get("users", 1000)))

    def partitions(self) -> list[_RangePartition]:
        per = -(-self.rows // self.n_parts)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        import datetime

        for i in range(partition.start, partition.end):
            ts_s = _EPOCH_START + _h64(self.seed, i, "ts") % (30 * 86400)
            ts = datetime.datetime.fromtimestamp(ts_s, tz=datetime.timezone.utc).replace(
                tzinfo=None
            )
            user_id = _h64(self.seed, i, "user") % self.users
            etype = EVENT_TYPES[_h64(self.seed, i, "type") % len(EVENT_TYPES)]
            value = (_h64(self.seed, i, "value") % 100_000) / 100.0
            props = f'{{"k":{_h64(self.seed, i, "props") % 10}}}'
            yield (i, ts, user_id, etype, value, props)


def register_synthetic_events(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(SyntheticEventsDataSource)
