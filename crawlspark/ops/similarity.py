"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k. The score is a JVM higher-order
  expression (zip_with dot product inside whole-stage codegen — no Python);
  queries are broadcast, so the scan is one pass over the vectors with no
  shuffle until the final per-query top-k window on k·|queries| rows.
- ivf_topk: the scale path. Deterministic seed centroids, one assignment
  pass, then queries probe only the nearest `nprobe` centroid partitions —
  at 10^9 vectors this turns a full scan into nprobe/nlist of a scan. The
  centroid table is tiny and broadcast everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def _cosine_expr(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query. Returns (query_id, vec_id, rank, cos)."""
    scored = vectors.crossJoin(F.broadcast(queries)).withColumn(
        "cos", F.expr(_cosine_expr(vec_col, query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cos")
    )


def ivf_assign(
    vectors: DataFrame,
    nlist: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """One-pass IVF index build: centroids = deterministic seed vectors
    (every ⌈n/nlist⌉-th id — a k-means|| seeding stand-in that keeps the
    build single-pass and fully reproducible); each vector joins its nearest
    centroid. Returns (assigned_vectors, centroids)."""
    n = vectors.count()
    stride = max(1, n // nlist)
    centroids = (
        vectors.filter((F.col(id_col) % stride == 0) & (F.col(id_col) / stride < nlist))
        .select(
            (F.col(id_col) / stride).cast("int").alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "cdist", F.expr(_cosine_expr(vec_col, "centroid_vec"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cdist"), F.col("centroid_id"))
    assigned = (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select(id_col, vec_col, "centroid_id")
    )
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Probe the nprobe nearest centroids per query, exact-score only those
    partitions. Returns (query_id, vec_id, rank, cos)."""
    qc = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "qdist", F.expr(_cosine_expr(query_vec_col, "centroid_vec"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("qdist"), F.col("centroid_id"))
    probes = (
        qc.withColumn("prank", F.row_number().over(w))
        .filter(F.col("prank") <= nprobe)
        .select(query_id_col, query_vec_col, "centroid_id")
    )
    scored = assigned.join(F.broadcast(probes), "centroid_id").withColumn(
        "cos", F.expr(_cosine_expr(vec_col, query_vec_col))
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "cos")
    )
