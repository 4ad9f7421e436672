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
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    InputPartition,
    WriterCommitMessage,
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


# --------------------------------------------------------------------------
# Writer side of the Python DataSource API (Spark 4 DataSourceArrowWriter):
# the extension surface for SINKS the built-in writers don't cover — the
# reference's loader owns its own write protocol (etl/loader.py:60-140,
# staged write + atomic publish); here the same staged-commit contract is
# expressed through Spark's executor-parallel writer API.
#
# Protocol: each task streams its Arrow batches to a uniquely-named temp
# file inside the target directory (no cross-task coordination), returns
# the temp path as its commit message; `commit()` — driver-side, only
# after EVERY task succeeded — renames temp files into `part-*.parquet`
# and stamps _SUCCESS, so readers never observe a half-written directory;
# `abort()` deletes the orphans. This is the classic Hadoop v1-style
# output-commit dance, implemented in ~40 lines of Python.
# --------------------------------------------------------------------------
@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    n_rows: int


class ArrowParquetSinkWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, overwrite: bool):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("arrow_parquet_sink requires option('path', ...)")
        self._overwrite = overwrite

    def write(self, iterator):
        """Executor-side: stream RecordBatches to one temp parquet file.
        Arrow batches pass zero-copy from the JVM (DataSourceArrowWriter),
        so the Python hop costs serialization only once, not per row."""
        import os
        import uuid

        import pyarrow.parquet as papq

        os.makedirs(self._dir, exist_ok=True)
        tmp = os.path.join(self._dir, f"_tmp-{uuid.uuid4().hex}.parquet")
        writer = None
        n = 0
        try:
            for batch in iterator:
                if writer is None:
                    writer = papq.ParquetWriter(tmp, batch.schema)
                writer.write_batch(batch)
                n += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        if writer is None:
            return _PartFile("", 0)  # empty split: nothing staged
        return _PartFile(tmp, n)

    def commit(self, messages):
        import json
        import os

        total = 0
        for idx, m in enumerate(messages):
            if m is not None and m.path:
                final = os.path.join(self._dir, f"part-{idx:05d}.parquet")
                os.replace(m.path, final)
                total += m.n_rows
        with open(os.path.join(self._dir, "_SUCCESS"), "w") as fh:
            json.dump({"rows": total}, fh)

    def abort(self, messages):
        import contextlib
        import os

        for m in messages:
            if m is not None and m.path:
                with contextlib.suppress(OSError):
                    os.remove(m.path)


class ArrowParquetSinkDataSource(DataSource):
    """`df.write.format("arrow_parquet_sink").option("path", d).save()` —
    a Python-implemented, executor-parallel, staged-commit parquet sink."""

    @classmethod
    def name(cls) -> str:
        return "arrow_parquet_sink"

    def writer(self, schema: StructType, overwrite: bool):
        if overwrite:
            # Driver-side (writer() runs on the driver): clear previous
            # contents BEFORE tasks fan out, so overwrite semantics do not
            # race the distributed temp-file staging.
            import contextlib
            import glob
            import os

            for f in glob.glob(os.path.join(self.options["path"], "*")) + glob.glob(
                os.path.join(self.options["path"], "_SUCCESS")
            ):
                with contextlib.suppress(OSError):
                    os.remove(f)
        return ArrowParquetSinkWriter(self.options, overwrite)
