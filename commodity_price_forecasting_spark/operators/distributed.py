"""Distributed exact prefix-sum — global-order running totals WITHOUT
a single-partition window.

``Window.orderBy(key)`` with no ``partitionBy`` collapses the whole
dataset into one task: correct, and the scale anti-pattern this repo
bans from hot paths. The classic distributed alternative is the
two-job prefix-offset pattern (textbook parallel scan, e.g.
Blelloch 1990):

1. range-partition on the order key, so partition *i* holds a
   contiguous key range and all keys in partition *i* sort before
   all keys in partition *i+1*;
2. job 1 — per-partition value totals (one tiny row per partition,
   collected to the driver: ≤ a few thousand longs at any scale);
3. job 2 — local cumulative sum inside each partition
   (``Window.partitionBy(pid).orderBy(key)``, a per-partition sort,
   never a global one) plus the broadcast prefix offset of all
   earlier partitions.

The frame is persisted between the two jobs because
``repartitionByRange`` samples to pick its bounds — recomputing it
could re-sample different bounds and misalign partition ids between
job 1 and job 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running ``SUM(value_col)`` in ascending ``order_col``
    order, computed with the two-job prefix-offset pattern above.
    ``order_col`` must be globally unique (it defines the order).
    Returns the input columns plus ``out_col``; the result stays
    range-partitioned and locally sorted by ``order_col``. The
    caller is responsible for unpersisting lazily later if desired
    (the persist is MEMORY_AND_DISK and small: one row per input
    row, two extra long columns).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # job 1: one row per partition — tiny by construction.
    totals = part.groupBy("_pid").agg(F.sum(value_col).alias("_tot")).collect()
    offsets: dict[int, float] = {}
    running = 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = running
        running += row["_tot"]
    off_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    # job 2: per-partition local sort only — no global exchange.
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        part.withColumn(
            out_col,
            F.sum(value_col).over(w) + F.element_at(off_expr, F.col("_pid")),
        )
        .drop("_pid")
    )
