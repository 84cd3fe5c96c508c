"""Temporal join operators (SURVEY.md §2.9: as-of / range lookups).

Spark has no native AS OF join (pandas-on-Spark `merge_asof` exists but pulls
the pandas API layer in); the DataFrame-native rendering here is the
union-and-carry-forward pattern: tag both sides, union, and let a window
carry the latest right-side payload forward onto left rows. ONE shuffle on
(key) and a per-key sort — same cost class as any window — versus the
quadratic theta-join a naive `r.ts <= l.ts AND max` formulation plans.

Scale notes: the window partitions by the join key, so skewed keys behave
exactly like any per-key window (benign: per-row work is a comparison).
Right-side rows are deduplicated per (key, ts) deterministically first, so
tie behavior is well-defined: an exact timestamp tie matches (inclusive,
DuckDB ASOF semantics), and among equal timestamps the minimum id wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: str | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of the
    LATEST right row with the same ``on`` key and ``right.ts <= left.ts``
    (inclusive). Returns left's columns plus ``asof_<payload>``.

    ``id_col`` (a unique right-side column) makes equal-timestamp ties
    deterministic: the minimum id's payload wins.
    """
    payload = payload or id_col
    if payload is None:
        raise ValueError("payload or id_col required")
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.col(payload).alias("_p"),
    )
    if id_col is not None:
        wdedup = Window.partitionBy("_k", "_t").orderBy(F.col("_p"))
        r = (
            r.withColumn("_rn", F.row_number().over(wdedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    l = left.withColumn("_k", F.col(on)).withColumn("_t", F.col(left_ts))
    tagged = (
        r.withColumn("_is_left", F.lit(0))
        .unionByName(
            l.select("_k", "_t").withColumn("_p", F.lit(None).cast(r.schema["_p"].dataType))
            .withColumn("_is_left", F.lit(1))
        )
        .dropDuplicates()  # identical left probe points collapse; re-joined below
    )
    # carry the latest right payload forward; right rows sort before left
    # rows at the same timestamp, so ties are inclusive
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        tagged.withColumn("_asof", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
        .select("_k", "_t", "_asof")
        .dropDuplicates(["_k", "_t"])
    )
    out = l.join(carried, ["_k", "_t"], "left").drop("_k", "_t")
    return out.withColumnRenamed("_asof", f"asof_{payload}")


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Range (interval-containment) join without a cartesian product: bin
    points to ``floor(p/width)``, explode each interval to the bins it
    overlaps, equi-join on the bin, then apply the exact containment filter.
    Catalyst plans the bin join as a plain hash/sort-merge equi-join; the
    quadratic theta join never appears (pinned by
    test_range_join_is_equi_join).

    Candidate completeness is guaranteed by floor monotonicity:
    lo <= p <= hi implies floor(lo/w) <= floor(p/w) <= floor(hi/w). Each
    point lives in exactly one bin, so a pair appears at most once — no
    dedup pass. Pick ``bin_width`` near the median interval length: cost is
    O(sum(interval_len/width)) exploded rows vs O(points x intervals/width)
    bin collisions.
    """
    p = points.withColumn("_bin", F.floor(F.col(point_col) / bin_width))
    i = (
        intervals.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_col) / bin_width),
                    F.floor(F.col(hi_col) / bin_width),
                )
            ),
        )
    )
    return (
        i.join(p, "_bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_bin")
    )
