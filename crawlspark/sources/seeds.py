"""S1: seed-list source (SURVEY.md §2.1).

Reads seed URLs from text (one URL per line, '#' comments) or CSV
(`url[,priority]` header) into the (url, seed_pos) shape the engine's
bootstrap consumes. seed_pos — the deterministic round-0 discovery order —
is the LINE POSITION in the file, reproduced without a driver-side collect:
text sources expose no row order guarantee across partitions, so order is
re-derived by sorting on (file, byte offset) metadata columns, which is
stable for any partitioning of the read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_seed_file(spark: SparkSession, path: str) -> list[str]:
    """Small-file convenience: returns the ordered seed URL list (the shape
    `CrawlEngine.run(seeds)` takes). Seed lists are driver-scale by contract
    (BASELINE.json:6 'seeded from the reference seed list')."""
    df = load_seed_df(spark, path)
    return [r["url"] for r in df.orderBy("seed_pos").collect()]


def load_seed_df(spark: SparkSession, path: str) -> DataFrame:
    """Distributed form: (url, seed_pos) with deterministic positions."""
    if path.endswith(".csv"):
        raw = spark.read.option("header", "true").csv(path)
        df = raw.select(F.col("url"))
    else:
        df = (
            spark.read.text(path)
            .select(F.trim(F.col("value")).alias("url"))
            .filter((F.length("url") > 0) & ~F.col("url").startswith("#"))
        )
    # Seed lists are driver-scale by contract; a single partition makes the
    # text source's within-partition byte order THE line order, so seed_pos
    # is deterministic without relying on cross-partition ordering (which
    # the engine bans for identity — monotonically_increasing_id across
    # partitions is partitioning-dependent).
    w = Window.partitionBy(F.lit(0)).orderBy(F.col("_line"))
    return (
        df.coalesce(1)
        .withColumn("_line", F.monotonically_increasing_id())
        .withColumn("seed_pos", (F.row_number().over(w) - 1).cast("int"))
        .select("url", "seed_pos")
    )
