"""Spark 4 Python DataSource API — the extension surface for sources the
built-in readers don't cover (the reference wires custom per-supplier
extractors through its own connector layer, etl/extractor.py:42-121; on
Spark, a bespoke feed becomes a first-class `spark.read.format(...)`
citizen with partition-parallel reads and filter pushdown instead of a
driver-side loop).

The demo source here generates synthetic events DETERMINISTICALLY as a
pure function of the global row index, which is what makes it
oracle-checkable: DuckDB rebuilds the identical table from range(n), so
the driver's hash compare verifies the whole read path — partition
planning, per-partition Arrow batches, pushed filters — end to end.

Scale design: `partitions()` splits the index range into `parts` input
splits, so a 1000-executor cluster reads 1000 splits concurrently; rows
are emitted as pyarrow RecordBatches (the vectorized path — tuples would
round-trip through pickle row-at-a-time); `pushFilters` accepts EqualTo
on `kind` so the scan skips non-matching rows at the source instead of
shipping them to a post-filter.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)
from pyspark.sql.types import StructType

_BATCH = 4096


def row_at(i: int) -> tuple[int, int, int, str]:
    """The generation rule — shared, pure, and mirrored by the DuckDB
    oracle: user_id = i % 97, cents = (i*i) % 10000, kind cycles a/b/c."""
    return (i, i % 97, (i * i) % 10000, "abc"[i % 3])


@dataclass
class _RangeSplit(InputPartition):
    start: int
    end: int


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._n = int(options.get("n", 100_000))
        self._parts = max(1, int(options.get("parts", 8)))
        self._kind_eq: str | None = None

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Accept EqualTo('kind', v); everything else stays post-scan."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("kind",):
                self._kind_eq = f.value
            else:
                yield f

    def partitions(self):
        step = -(-self._n // self._parts)
        return [
            _RangeSplit(s, min(s + step, self._n))
            for s in range(0, self._n, step)
        ]

    def read(self, partition: _RangeSplit):
        import pyarrow as pa

        kinds = self._kind_eq
        for base in range(partition.start, partition.end, _BATCH):
            hi = min(base + _BATCH, partition.end)
            rows = [
                row_at(i)
                for i in range(base, hi)
                if kinds is None or "abc"[i % 3] == kinds
            ]
            if not rows:
                continue
            cols = list(zip(*rows))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], pa.int64()),
                    pa.array(cols[1], pa.int64()),
                    pa.array(cols[2], pa.int64()),
                    pa.array(cols[3], pa.string()),
                ],
                names=["i", "user_id", "cents", "kind"],
            )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "i bigint, user_id bigint, cents bigint, kind string"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(schema, self.options)
