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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
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

    def simpleStreamReader(self, schema: StructType) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


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


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch generator: offsets are plain row counts, each trigger
    emits up to ``rows_per_batch`` new rows of the same deterministic
    corpus as the batch reader (row i is a pure function of (seed, i)).
    Replay between committed offsets re-yields identical rows, which is
    exactly the exactly-once-with-idempotent-sink contract a real source
    must honor.
    """

    def __init__(self, options):
        self.total = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rowsPerBatch", 250))
        self.seed = int(options.get("seed", 0))
        self.users = max(1, int(options.get("users", 1000)))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _gen(self, start: int, end: int):
        import datetime

        for i in range(start, end):
            ts_s = _EPOCH_START + _h64(self.seed, i, "ts") % (30 * 86400)
            ts = datetime.datetime.fromtimestamp(
                ts_s, tz=datetime.timezone.utc
            ).replace(tzinfo=None)
            yield (
                i,
                ts,
                _h64(self.seed, i, "user") % self.users,
                EVENT_TYPES[_h64(self.seed, i, "type") % len(EVENT_TYPES)],
                (_h64(self.seed, i, "value") % 100_000) / 100.0,
                f'{{"k":{_h64(self.seed, i, "props") % 10}}}',
            )

    def read(self, start: dict):
        lo = start["row"]
        hi = min(lo + self.per_batch, self.total)
        # Lists, not generators: the simple-stream harness buffers the
        # batch for replay (prefetch cache), which requires picklability.
        return list(self._gen(lo, hi)), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._gen(start["row"], end["row"]))

    def commit(self, end: dict) -> None:
        pass  # offsets are pure row counts; nothing to clean up
