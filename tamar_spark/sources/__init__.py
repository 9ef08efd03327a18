"""Source helpers: schema-aware parquet loading for the driver fixture tables.

The reference's ``Source`` trait is a push-based task (reference
src/lib.rs:60-62); here sources are Spark readers.  One real-world wrinkle the
fixtures carry: their parquet timestamps are TIMESTAMP(NANOS), which Spark
cannot read natively (DuckDB silently truncates to microseconds).  We read
them via ``spark.sql.legacy.parquet.nanosAsLong`` and convert ``ns div 1000``
→ ``timestamp_micros`` — identical truncation to DuckDB, so oracle
comparisons line up exactly.

The conversion is a cheap projection that stays inside whole-stage codegen;
column pruning and predicate pushdown on non-timestamp columns are
unaffected.  (Pushdown of a filter on the converted timestamp itself lands on
the long column after Catalyst folds the arithmetic when the literal side is
constant.)
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "spread",
    "ts_ns_columns",
    "TABLES",
]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=256)
def ts_ns_columns(path: str) -> tuple:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer (pyarrow)."""
    import pyarrow.dataset as pads
    import pyarrow.types as pat

    try:
        schema = pads.dataset(path, format="parquet").schema
    except Exception:
        return ()
    return tuple(
        f.name for f in schema if pat.is_timestamp(f.type) and f.type.unit == "ns"
    )


def spread(df: DataFrame) -> DataFrame:
    """Measured-condition repartition for CPU-bound projection stages
    (per-row token folds, n-gram transforms, raster decode): when the
    input arrives in fewer partitions than the cluster has cores —
    locally the fixture parquet is ONE row group, so Spark hands the
    whole table to one task and a fold-heavy projection serializes
    (measured: lang_segments 5.3 s single-task vs sub-second spread) —
    shuffle once up to ``defaultParallelism``.  On a real cluster a
    100 TB input arrives in thousands of splits, the condition is false,
    and NO shuffle is added: the zero-shuffle plan shapes the fold
    queries advertise are preserved exactly where they matter.  The same
    measured-condition pattern as ``plans.auto_salt`` and the k-core
    adaptive broadcast — decide from what the data actually looks like,
    never a fixed rule."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with nanosecond-timestamp normalization."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = ts_ns_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: Optional[Iterable[str]] = None
) -> Dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: Optional[Iterable[str]] = None) -> None:
    """Register fixture tables as temp views so ``spark.sql`` queries can use
    the same table names the DuckDB oracle sees."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
