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

    With a ``block_col``: one shuffle on the block key, then a vectorized
    per-block GEMM inside ``applyInPandas`` — pairwise cosine is a matrix
    multiply, and Arrow-batched BLAS beats interpreted Catalyst
    higher-order functions by ~10-100x for this shape. At 100 TB the block
    key is a cluster/band assignment, so block sizes stay bounded and the
    payload never joins against itself row-by-row.

    Without a block key: pure-expression cross join (quadratic; only for
    small inputs or pre-filtered candidates).
    """
    if block_col is None:
        return _cosine_self_join_expr(df, threshold, id_col, vec_col)

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]], dtype=np.float64
        )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        sims = np.round(mat @ mat.T, 6)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        iu, ju = iu[keep], ju[keep]
        ia, ib = ids[iu], ids[ju]
        swap = ia > ib  # triu orders positions, not id values
        return pd.DataFrame(
            {
                "id_a": np.where(swap, ib, ia),
                "id_b": np.where(swap, ia, ib),
                "cosine": sims[iu, ju],
            }
        )

    return (
        df.filter(F.col(block_col).isNotNull())
        .select(F.col(id_col), F.col(block_col), F.col(vec_col))
        .groupBy(block_col)
        .applyInPandas(block_pairs, out_schema)
    )


def _cosine_self_join_expr(
    df: DataFrame, threshold: float, id_col: str, vec_col: str
) -> DataFrame:
    norm = df.withColumn("_norm", l2_norm(F.col(vec_col))).select(
        F.col(id_col),
        F.transform(F.col(vec_col).cast("array<double>"), lambda x: x / F.col("_norm")).alias(
            "_nv"
        ),
    )
    a, b = norm.alias("a"), norm.alias("b")
    cos = F.round(dot_product(F.col("a._nv"), F.col("b._nv")), 6)
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
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
