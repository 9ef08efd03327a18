"""Custom Python data sources — the reference's ``Source`` trait, verbatim.

The reference defines a push-based source trait (`run(self, Sender<V>)`,
reference src/lib.rs:60-62) and ships test sources built on it:
``IncrementingSource`` emits 0..n as events (src/lib.rs:968-984),
``SliceEventSource`` replays a fixed event slice (src/lib.rs:1019-1033).

Spark 4's Python DataSource API is the exact counterpart: a user class
produces rows, the engine handles partitioning/scheduling/backpressure.
This module ports both test sources:

- ``IncrementingDataSource`` (format name ``tamar_incrementing``):
  ``n`` sequential events with the Event-envelope columns (value,
  event_time, processing_time) — partition-parallel: the range is split
  into ``num_partitions`` contiguous slices, each produced independently
  (the reference is single-task; this is the distributed upgrade).
- ``SliceEventDataSource`` (format ``tamar_slice``): replays a
  JSON-encoded list of (value, event_time) pairs — the deterministic
  fixture-replay source the reference's golden-sequence tests use.

Register once per session::

    spark.dataSource.register(IncrementingDataSource)
    df = (spark.read.format("tamar_incrementing")
          .option("n", 1000).option("num_partitions", 8).load())
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "IncrementingDataSource",
    "SliceEventDataSource",
    "JsonlSinkDataSource",
    "register_py_sources",
]

_BASE = dt.datetime(2009, 10, 11, 0, 0, 0)  # the reference's fixture date


class _RangeSlice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _IncrementingReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.num_partitions = int(options.get("num_partitions", 4))

    def partitions(self):
        step = max(1, self.n // self.num_partitions)
        bounds = list(range(0, self.n, step)) + [self.n]
        return [_RangeSlice(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            t = _BASE + dt.timedelta(seconds=i)
            yield (i, t, t)


class IncrementingDataSource(DataSource):
    """The reference's ``IncrementingSource`` (src/lib.rs:968-984) as a
    partition-parallel Spark data source."""

    @classmethod
    def name(cls):
        return "tamar_incrementing"

    def schema(self):
        return StructType(
            [
                StructField("value", LongType()),
                StructField("event_time", TimestampType()),
                StructField("processing_time", TimestampType()),
            ]
        )

    def reader(self, schema):
        return _IncrementingReader(self.options)

    def simpleStreamReader(self, schema):
        return _IncrementingStreamReader(self.options)


class _IncrementingStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: each micro-batch advances the counter by
    ``rows_per_batch`` until ``n`` — the push-source loop of the reference
    (``run(self, Sender)`` emitting until exhausted, src/lib.rs:968-984)
    with Spark owning offsets/retries instead of a raw channel."""

    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.rows_per_batch = int(options.get("rows_per_batch", 10))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start: dict):
        a = start["offset"]
        b = min(a + self.rows_per_batch, self.n)
        rows = []
        for i in range(a, b):
            t = _BASE + dt.timedelta(seconds=i)
            rows.append((i, t, t))
        return iter(rows), {"offset": b}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for i in range(start["offset"], end["offset"]):
            t = _BASE + dt.timedelta(seconds=i)
            rows.append((i, t, t))
        return iter(rows)


class _SliceReader(DataSourceReader):
    def __init__(self, options):
        self.events = json.loads(options.get("events", "[]"))

    def partitions(self):
        return [_RangeSlice(0, len(self.events))]

    def read(self, partition):
        for value, hour, minute in self.events[partition.start : partition.end]:
            t = _BASE.replace(hour=hour, minute=minute)
            yield (int(value), t, t)


class SliceEventDataSource(DataSource):
    """The reference's ``SliceEventSource`` (src/lib.rs:1019-1033): replay a
    fixed (value, hour, minute) slice with event=processing time — the
    golden-sequence test fixture shape (src/lib.rs:1171-1186)."""

    @classmethod
    def name(cls):
        return "tamar_slice"

    def schema(self):
        return StructType(
            [
                StructField("value", IntegerType()),
                StructField("event_time", TimestampType()),
                StructField("processing_time", TimestampType()),
            ]
        )

    def reader(self, schema):
        return _SliceReader(self.options)


def register_py_sources(spark) -> None:
    """Register the custom sources and sink with a session (idempotent)."""
    spark.dataSource.register(IncrementingDataSource)
    spark.dataSource.register(SliceEventDataSource)
    spark.dataSource.register(JsonlSinkDataSource)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path, count):
        self.path = path
        self.count = count


class JsonlSinkDataSource(DataSource):
    """Custom Python writer — the reference's ``Sink`` trait
    (``run(self, Receiver<V>)``, src/lib.rs:74-76): arbitrary user code
    consumes rows.  Each partition writes its rows as one jsonl file under
    ``path``; ``commit`` runs once on the driver with every partition's
    receipt and records the COMMITTED FILE MANIFEST in ``_SUCCESS.json`` —
    the two-phase contract that replaces the reference's unchecked channel
    consumption.  Retried/speculative task attempts may leave orphan part
    files; readers must consume only manifest-listed files (see
    :func:`read_jsonl_sink`), which makes the sink exactly-once at the
    manifest level without coordinating attempt file names."""

    @classmethod
    def name(cls):
        return "tamar_jsonl_sink"

    def writer(self, schema, overwrite):
        return _JsonlWriter(self.options, [f.name for f in schema.fields])


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options, col_names):
        self.path = options.get("path")
        self.col_names = col_names

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        # per-attempt unique name: a retried attempt never clobbers a file a
        # reader may already hold open; exactly-once comes from the commit
        # manifest, which lists ONE attempt's file per partition
        fname = os.path.join(self.path, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(_json.dumps(dict(zip(self.col_names, [str(v) for v in row]))) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages):
        import json as _json
        import os

        total = sum(m.count for m in messages)
        with open(os.path.join(self.path, "_SUCCESS.json"), "w") as f:
            f.write(
                _json.dumps(
                    {
                        "files": sorted(os.path.basename(m.path) for m in messages),
                        "rows": total,
                    }
                )
            )

    def abort(self, messages):
        import os

        # Spark passes None entries for tasks that failed or never
        # committed — skip them or abort itself raises and leaks the
        # remaining part files (r2 ADVICE fix)
        for m in messages or []:
            if m is None:
                continue
            try:
                os.remove(m.path)
            except OSError:
                pass


def read_jsonl_sink(path: str):
    """Read back a :class:`JsonlSinkDataSource` directory exactly-once:
    only files listed in the ``_SUCCESS.json`` manifest count — orphan part
    files from retried/speculative attempts are ignored."""
    import json as _json
    import os

    with open(os.path.join(path, "_SUCCESS.json")) as f:
        manifest = _json.load(f)
    rows = []
    for base in manifest["files"]:
        with open(os.path.join(path, base)) as f:
            rows.extend(_json.loads(line) for line in f if line.strip())
    return rows
