"""Fluent dataflow API: DataStream → KeyedDataStream → WindowedDataStream.

Mirrors the reference's stream-object hierarchy (reference src/lib.rs:108-254,
742-746) but records a declarative DataFrame plan instead of spawning tasks —
Catalyst then gets to push filters, prune columns, and reorder joins, none of
which the reference has (SURVEY §4.1).

Design rule (the single most important one for scale): every operator accepts
Column expressions FIRST — expression trees stay inside whole-stage codegen
and reach the parquet scan as pushed filters.  Opaque Python callables are the
explicit fallback (`*_pandas` variants, Arrow-batched), never the default.

API quirk preserved from the reference: keyed ``map``/``filter``/``process``
return an *un-keyed* DataStream (reference src/lib.rs:269-321) — re-key
explicitly after a transform.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["DataStream", "KeyedDataStream", "WindowedDataStream"]

ColumnOrName = Union[Column, str]


def _to_cols(cols: Sequence[ColumnOrName]):
    return [F.col(c) if isinstance(c, str) else c for c in cols]


class DataStream:
    """Un-keyed stream (reference ``DataStream``, src/lib.rs:108-111).

    Wraps a (batch or streaming) DataFrame plus event-time metadata.  All
    transforms return new streams; the plan stays lazy until a sink/action.
    """

    def __init__(self, df: DataFrame, env=None, event_time: Optional[str] = None):
        self.df = df
        self.env = env
        self.event_time = event_time

    # -- expression-first transforms (Catalyst-visible) ------------------
    def map(self, *cols: ColumnOrName, **named: Column) -> "DataStream":
        """1→1 transform (reference ``DataStream::map``, src/lib.rs:127-144).

        ``map(expr.alias("x"), y=expr2)``: positional Columns are selected
        as-is, keyword Columns are added/replaced.  Timestamp metadata columns
        are carried through automatically (the reference's ``with_value``
        preservation, src/lib.rs:38-45) when only keyword args are used.
        """
        if cols:
            keep = [c for c in ([self.event_time] if self.event_time else []) if c in self.df.columns]
            df = self.df.select(*_to_cols(list(keep) + list(cols)))
        else:
            df = self.df
        for name, expr in named.items():
            df = df.withColumn(name, expr)
        return self._wrap(df)

    def select(self, *cols: ColumnOrName) -> "DataStream":
        return self._wrap(self.df.select(*_to_cols(cols)))

    def filter(self, cond: Union[Column, str]) -> "DataStream":
        """Predicate filter (reference ``DataStream::filter``, src/lib.rs:146-162).

        Column/SQL-string predicates push down to the scan.
        """
        return self._wrap(self.df.filter(cond))

    def explode(self, col: ColumnOrName, alias: str) -> "DataStream":
        """0..n outputs per input for the expression-expressible case of the
        reference's ``process`` (src/lib.rs:164-174)."""
        c = F.col(col) if isinstance(col, str) else col
        return self._wrap(self.df.withColumn(alias, F.explode(c)))

    # -- opaque-callable fallbacks (Arrow-batched, still distributed) ----
    def map_pandas(self, fn: Callable, schema) -> "DataStream":
        """Arbitrary-Python 1→n transform via ``mapInPandas`` (the slow path;
        reference ``process``, src/lib.rs:164-174)."""
        return self._wrap(self.df.mapInPandas(fn, schema=schema))

    process = map_pandas  # reference name (src/lib.rs:164)

    def filter_pandas(self, fn: Callable) -> "DataStream":
        """Opaque predicate: ``fn(pandas.Series-per-column) -> bool Series``."""
        import pandas as pd  # noqa: F401
        from pyspark.sql.functions import pandas_udf

        cols = self.df.columns

        @pandas_udf("boolean")
        def _pred(*series):
            import pandas as pd
            df = pd.concat(series, axis=1)
            df.columns = cols
            return fn(df)

        return self._wrap(self.df.filter(_pred(*[F.col(c) for c in cols])))

    # -- keying ----------------------------------------------------------
    def key_by(self, *keys: ColumnOrName) -> "KeyedDataStream":
        """Attach key expressions (reference ``key_by``, src/lib.rs:201-210).

        The reference never repartitions (selector evaluated in one task,
        src/lib.rs:344-345); here the downstream groupBy hash-shuffles on the
        keys — identical per-key semantics, actually parallel.
        """
        return KeyedDataStream(self.df, keys=_to_cols(keys), env=self.env, event_time=self.event_time)

    # -- structural ------------------------------------------------------
    def split(self) -> Tuple["DataStream", "DataStream"]:
        """Broadcast fan-out (reference ``split``, src/lib.rs:217-245).

        DataFrames are immutable — both halves reference the same plan; Spark
        recomputes or reuses (AQE exchange reuse / ``.cache()`` if wanted).
        """
        return self._wrap(self.df), self._wrap(self.df)

    def union(self, other: "DataStream") -> "DataStream":
        return self._wrap(self.df.unionByName(other.df))

    def with_watermark(self, event_time: str, delay: str) -> "DataStream":
        ds = self._wrap(self.df.withWatermark(event_time, delay) if self.df.isStreaming else self.df)
        ds.event_time = event_time
        return ds

    # -- sinks -----------------------------------------------------------
    def add_sink(
        self,
        sink: str = "memory",
        path: Optional[str] = None,
        name: str = "out",
        mode: str = "append",
        trigger_available_now: bool = True,
    ):
        """Terminal action (reference ``add_sink``, src/lib.rs:117-125).

        Batch: writes eagerly (parquet/csv/json path sinks) or returns the
        collected rows for ``memory``/``console``.  Streaming: starts a
        ``writeStream`` (AvailableNow by default — the reference's
        run-to-completion ``execute`` semantics, src/lib.rs:920-925) and
        registers it with the Environment.
        """
        if self.df.isStreaming:
            writer = self.df.writeStream.outputMode(mode).queryName(name)
            if trigger_available_now:
                writer = writer.trigger(availableNow=True)
            if sink == "memory":
                q = writer.format("memory").start()
            elif sink == "console":
                q = writer.format("console").start()
            else:
                q = writer.format(sink).option("path", path).option(
                    "checkpointLocation", (path or "/tmp/tamar") + "/_chk"
                ).start()
            if self.env is not None:
                self.env.register_query(q)
            return q
        if sink == "memory":
            self.df.createOrReplaceTempView(name)
            return self.df
        if sink == "console":
            self.df.show(truncate=False)
            return self.df
        self.df.write.mode(mode).format(sink).save(path)
        return self.df

    def foreach_batch(
        self,
        fn: Callable,
        mode: str = "append",
        trigger_available_now: bool = True,
    ):
        """Multi-sink fan-out: one computation, arbitrary writes per batch.

        The reference fans out with ``split`` + one task per sink
        (src/lib.rs:217-245); on Spark the idiomatic streaming equivalent is
        ``foreachBatch`` — the micro-batch is computed ONCE and ``fn(df,
        batch_id)`` writes it to any number of sinks, instead of N parallel
        queries re-reading (and re-computing) the source N times.  In batch
        mode the call degenerates to ``fn(df, 0)``.
        """
        if not self.df.isStreaming:
            fn(self.df, 0)
            return self.df
        writer = self.df.writeStream.outputMode(mode).foreachBatch(fn)
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        if self.env is not None:
            self.env.register_query(q)
        return q

    # -- plumbing --------------------------------------------------------
    def _wrap(self, df: DataFrame) -> "DataStream":
        return DataStream(df, env=self.env, event_time=self.event_time)

    def to_df(self) -> DataFrame:
        return self.df

    def explain(self, mode: str = "formatted"):
        return self.df.explain(mode=mode)


class KeyedDataStream:
    """Stream + key expressions (reference ``KeyedDataStream``, src/lib.rs:248-254)."""

    def __init__(self, df: DataFrame, keys: Sequence[Column], env=None, event_time: Optional[str] = None):
        self.df = df
        self.keys = list(keys)
        self.env = env
        self.event_time = event_time

    # keyed transforms drop keyed-ness (reference src/lib.rs:269-321)
    def map(self, *cols: ColumnOrName, **named: Column) -> DataStream:
        return self._unkeyed().map(*cols, **named)

    def filter(self, cond: Union[Column, str]) -> DataStream:
        return self._unkeyed().filter(cond)

    def process(self, fn: Callable, schema) -> DataStream:
        return self._unkeyed().map_pandas(fn, schema)

    def split(self) -> Tuple["KeyedDataStream", "KeyedDataStream"]:
        mk = lambda: KeyedDataStream(self.df, self.keys, self.env, self.event_time)
        return mk(), mk()

    def add_sink(self, *a, **kw):
        return self._unkeyed().add_sink(*a, **kw)

    # -- aggregation shortcuts (capability-gap: reference has none) ------
    def agg(self, *exprs: Column) -> DataStream:
        return DataStream(self.df.groupBy(*self.keys).agg(*exprs), env=self.env)

    # -- windowing -------------------------------------------------------
    def window(self, factory) -> "WindowedDataStream":
        """Attach a window factory (reference ``window``, src/lib.rs:363-371).

        ``factory`` is a WindowFactory from :mod:`tamar_spark.windows`
        (session / tumbling / sliding — the reference only ships session,
        src/lib.rs:708-740; its factory trait anticipated the others).
        """
        return WindowedDataStream(self, factory)

    # -- stateful --------------------------------------------------------
    def process_state(self, fn: Callable, schema, init_state: Callable = None):
        """Per-key ordered stateful processing (reference
        ``KeyedDataStream::process_state``, src/lib.rs:323-361).

        Delegates to :func:`tamar_spark.streaming.stateful.process_state`.
        """
        from tamar_spark.streaming.stateful import process_state as _ps

        return _ps(self, fn, schema, init_state=init_state)

    def _unkeyed(self) -> DataStream:
        return DataStream(self.df, env=self.env, event_time=self.event_time)


class WindowedDataStream:
    """Keyed stream + window factory (reference src/lib.rs:742-746)."""

    def __init__(self, keyed: KeyedDataStream, factory):
        self.keyed = keyed
        self.factory = factory

    def aggregate(self, *agg_exprs: Column) -> DataStream:
        """Incremental windowed aggregation (reference ``aggregate``,
        src/lib.rs:836-880).

        The reference eagerly compacts per insert (src/lib.rs:673-693);
        Catalyst's partial+final HashAggregate is the same optimization done
        by the planner.  Emits normalized window bounds ``window_start`` /
        ``window_end`` (SURVEY §4.3.3 — the reference's `+1ns` end encoding
        is not representable at Spark's microsecond precision).
        """
        return self.factory.aggregate(self.keyed, list(agg_exprs))

    def process(self, fn: Optional[Callable] = None, schema=None) -> DataStream:
        """Full-window-contents processing (reference ``process``,
        src/lib.rs:755-769): the user function sees every event of the fired
        (key, window) batch, Flink-ProcessWindowFunction-style."""
        return self.factory.process(self.keyed, fn, schema)

    def split(self) -> Tuple["WindowedDataStream", "WindowedDataStream"]:
        return (
            WindowedDataStream(self.keyed, self.factory),
            WindowedDataStream(self.keyed, self.factory),
        )
