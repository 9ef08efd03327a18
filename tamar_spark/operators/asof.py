"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, pick the latest right row with
``right_on <= left_on`` (direction="backward") within the same key.
Deterministic tie-break on equal ``right_on``: the greatest value of
``tiebreak`` wins (so results are stable under re-partitioning).

Two physical strategies, chosen by ``strategy``:

- ``"merge"`` (default, the 100 TB path): co-partition both sides on the key
  via ``groupBy(...).cogroup`` and run a vectorized ``pandas.merge_asof`` per
  key group.  One shuffle per side, no row blow-up, memory bounded by the
  per-key group (salt or split heavy keys upstream if a single key exceeds
  executor memory).
- ``"filter"``: non-equi join + ``row_number`` pruning.  Fully JVM-side, but
  materializes |left| × |matching right| intermediate rows — only sane when
  the per-key right side is small; kept as the oracle-shaped reference
  implementation.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    right_cols: Optional[Sequence[str]] = None,
    tiebreak: Optional[str] = None,
    strategy: str = "merge",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's columns
    (NULL when no right row precedes it)."""
    right_cols = list(right_cols or [c for c in right.columns if c not in (right_by,)])
    if strategy == "filter":
        return _asof_filter(left, right, left_on, right_on, left_by, right_by, right_cols, tiebreak)
    return _asof_merge(left, right, left_on, right_on, left_by, right_by, right_cols, tiebreak)


def _asof_filter(left, right, left_on, right_on, left_by, right_by, right_cols, tiebreak):
    r = right.select(right_by, *right_cols)
    joined = left.join(
        r, (F.col(left_by) == F.col(right_by)) & (F.col(right_on) <= F.col(left_on)), "left"
    )
    order = [F.col(right_on).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*left.columns).orderBy(*order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", right_by)
    )


def _asof_merge(left, right, left_on, right_on, left_by, right_by, right_cols, tiebreak):
    import pandas as pd

    left_schema = left.schema
    right_schema = right.select(*right_cols).schema
    out_fields = [f for f in left_schema.fields] + [
        type(f)(f.name, f.dataType, True) for f in right_schema.fields
    ]
    from pyspark.sql.types import StructType

    out_schema = StructType(out_fields)
    l_cols = list(left.columns)
    sort_r = [right_on] + ([tiebreak] if tiebreak else [])

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if l_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        l_sorted = l_pdf.sort_values(left_on)
        if r_pdf.empty:
            out = l_sorted.copy()
            for c in right_cols:
                out[c] = None
            return out
        # merge_asof keeps the LAST right row among equal keys → sorting by
        # (right_on, tiebreak) ascending implements "greatest tiebreak wins"
        r_sorted = r_pdf.sort_values(sort_r)[[right_on] + [c for c in right_cols if c != right_on]]
        out = pd.merge_asof(
            l_sorted,
            r_sorted,
            left_on=left_on,
            right_on=right_on,
            direction="backward",
            allow_exact_matches=True,
            suffixes=("", "_r"),
        )
        if right_on not in l_cols and right_on + "_r" in out.columns:
            out = out.rename(columns={right_on + "_r": right_on})
        return out[[f.name for f in out_fields]]

    lg = left.groupBy(left_by)
    rg = right.select(right_by, *[c for c in right_cols if c != right_by]).groupBy(right_by)
    return lg.cogroup(rg).applyInPandas(
        lambda l_pdf, r_pdf: merge(l_pdf, r_pdf), schema=out_schema
    )
