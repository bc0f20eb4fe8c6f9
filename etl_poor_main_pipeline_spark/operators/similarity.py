"""Similarity search over embedding columns ([EXT] X3/X4, SURVEY §2.7).

Exact brute-force cosine top-k is the verifiable baseline; IVF (coarse
quantization) is the scale path — both entirely in DataFrame expressions.

Scale notes (100 TB / billions of vectors):
- Brute force is a single scan + TakeOrderedAndProject (per-partition top-k,
  driver merge of k*partitions rows) — no shuffle of the vector column.
- IVF: centroid assignment is a broadcast-join against a tiny centroid
  table; at query time only `nprobe` partitions of the index are scanned
  (partition pruning on ``cluster_id`` if the index is written partitioned
  by cluster). Candidate lists shrink by ~nlist/nprobe.
- Embedding-cosine near-dup (X4) blocks on cluster assignment (or label)
  to bound the pair explosion before the exact cosine check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, dot_product, l2_norm


def topk_cosine(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X3 exact top-k by cosine to a constant query vector.

    The query vector is a literal array — it constant-folds into the
    expression, so the plan is scan -> project(score) -> top-k; ties break
    on id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    score = F.round(cosine_similarity(F.col(vec_col), q), 6)
    return (
        df.select(F.col(id_col), score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_self_join(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """X4 all-pairs with cosine >= threshold (exact), blocked to bound cost.

    Pre-normalizes once so the pair check is a dot product (saves the two
    norms per pair); blocks on ``block_col`` when given.
    """
    norm = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: x / l2_norm(F.col(vec_col)),
        ).alias("_nv"),
    )
    a, b = norm.alias("a"), norm.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    cos = F.round(dot_product(F.col("a._nv"), F.col("b._nv")), 6)
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )


def ivf_build(
    df: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF coarse index.

    Centroids = the embeddings of the ``num_centroids`` smallest ids (a
    deterministic seeding; at real scale swap in k-means||, which Spark ML
    provides — determinism is what the correctness harness needs here).
    Returns (assignments, centroids); assignments carry ``cluster_id``.
    A production index writes ``partitionBy(cluster_id)`` so queries prune.
    """
    centroids = (
        df.orderBy(F.col(id_col).asc())
        .limit(num_centroids)
        .select(
            F.col(id_col).alias("cluster_id"),
            F.col(vec_col).cast("array<double>").alias("centroid"),
        )
    )
    assigned = (
        df.crossJoin(F.broadcast(centroids))
        .withColumn("_sim", cosine_similarity(F.col(vec_col), F.col("centroid")))
        .withColumn(
            "_rk",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    id_col
                ).orderBy(F.col("_sim").desc(), F.col("cluster_id").asc())
            ),
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk", "centroid")
        .withColumnRenamed("_sim", "centroid_sim")
    )
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score the query against centroids, keep the
    ``nprobe`` closest clusters, exact-rank only those clusters' vectors."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = (
        centroids.withColumn("_sim", cosine_similarity(F.col("centroid"), q))
        .orderBy(F.col("_sim").desc(), F.col("cluster_id").asc())
        .limit(nprobe)
        .select("cluster_id")
    )
    return (
        assigned.join(F.broadcast(probe), "cluster_id")
        .select(F.col(id_col), F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
