"""Deduplication operators ([EXT] X1/X2, SURVEY §2.7) over the ``documents``
table — exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup.

Scale notes (100 TB posture):
- Exact dedup is a hash-aggregate on a fingerprint — one shuffle on a short
  key, map-side partial aggregation, no row text moves after the project.
- MinHash+LSH: signatures are computed scan-side (pure expressions), then
  only (band_hash, doc_id) pairs shuffle — candidate generation never
  shuffles document text. Pair verification joins text back by doc_id.
- SimHash: 64-bit signature per doc; near-dup = signatures matching on
  rotated prefix buckets. All integer ops, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5, shingles_expr, tokens_expr


def exact_dedup(df: DataFrame, subset: list[str], id_col: str = "doc_id") -> DataFrame:
    """X1 exact dedup, deterministic representative = min id per key group.

    ``dropDuplicates`` keeps an arbitrary row; taking ``min(id)`` per group
    makes the result reproducible and oracle-checkable, at the same cost
    (one hash aggregate).
    """
    others = [c for c in df.columns if c not in subset and c != id_col]
    agg = [F.min(F.col(id_col)).alias(id_col)] + [F.min_by(F.col(c), F.col(id_col)).alias(c) for c in others]
    return df.groupBy(*[F.col(c) for c in subset]).agg(*agg)


def fingerprint_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact near-canonical dedup: collapse on md5(normalized text)."""
    fp = df.withColumn("fingerprint", fingerprint_md5(text_col))
    return (
        fp.groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature per document, as pure expressions.

    Universal hashing over shingle hashes: h_i(x) = (a_i * x + b_i) mod p.
    Coefficients come from a fixed seeded sequence so signatures are
    deterministic across runs. ``xxhash64`` supplies the base shingle hash
    (JVM intrinsic, no Python). p = 2^31-1 (Mersenne prime) keeps every
    intermediate product under 2^62, inside int64 with ANSI mode on.
    """
    p = (1 << 31) - 1
    import random

    rnd = random.Random(42)
    coeffs = [(rnd.randrange(1, p), rnd.randrange(0, p)) for _ in range(num_hashes)]

    # explode shingles to rows and take the per-doc min of each permuted
    # hash as plain aggregate columns: one codegen'd hash aggregate,
    # instead of num_hashes interpreted array-lambda passes per document
    keep_cols = df.columns
    exploded = df.select(
        *keep_cols,
        F.explode_outer(F.array_distinct(shingles_expr(text_col, shingle_k))).alias("_sh"),
    ).withColumn("_h", F.pmod(F.xxhash64(F.col("_sh")), F.lit(p)))
    mins = [
        F.min(F.pmod(F.col("_h") * F.lit(a) + F.lit(b), F.lit(p))).alias(f"_mh_{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    agg = exploded.groupBy(*keep_cols).agg(*mins)
    return agg.select(
        *keep_cols, F.array(*[F.col(f"_mh_{i}") for i in range(num_hashes)]).alias("minhash")
    )


def minhash_lsh_candidates(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Band the signatures and self-join on band buckets -> candidate pairs.

    Only (band, bucket_hash, id) tuples shuffle; with b bands of r rows the
    match probability is 1-(1-s^r)^b for Jaccard s — b=16, r=4 targets
    s≈0.5+. Returns distinct (id_a, id_b) with id_a < id_b.

    ``max_bucket_size`` drops mega-buckets before the join — a bucket with
    m members contributes m² candidate pairs, and buckets that big are
    non-discriminative (degenerate signatures / boilerplate text). This is
    the standard LSH skew guard: without it one hot bucket turns the
    candidate join quadratic at scale. True near-dup pairs still meet in
    their other (selective) bands.
    """
    bands = sig_df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("minhash")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "bucket")
        bands = (
            bands.withColumn("_bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_token_sets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    block_cols: list[str] | None = None,
    length_window: int | None = 16,
    length_col: str = "n_chars",
) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs (the verifiable baseline X2).

    Semantics: pairs with equal ``block_cols`` (e.g. lang), length within
    ``length_window``, and Jaccard >= threshold; (id_a < id_b, jaccard).

    Scale design: the length window is turned into an *equi-join* — side A
    explodes to its length bucket ±1 (bucket width = window), side B keeps
    its own bucket; |Δlen| <= window implies bucket distance <= 1, and each
    qualifying pair meets on exactly one bucket key, so no dedup pass is
    needed. This makes the candidate join a shuffled hash join on
    (block, bucket) instead of a quadratic theta-join. Two more prunes run
    before the set intersection: the exact length window, and the size
    bound |A|,|B| ratio >= t implied by Jaccard >= t.
    """
    bucket_w = length_window if length_window is not None else 1 << 30
    base = df.select(
        F.col(id_col),
        *(F.col(c) for c in (block_cols or [])),
        F.col(length_col),
        F.floor(F.col(length_col) / F.lit(bucket_w)).cast("long").alias("_bkt"),
        F.array_distinct(tokens_expr(text_col)).alias("tok_set"),
    ).withColumn("_ntok", F.size(F.col("tok_set")))
    a = base.select(
        "*", F.explode(F.array(F.col("_bkt") - 1, F.col("_bkt"), F.col("_bkt") + 1)).alias("_jbkt")
    ).drop("_bkt").alias("a")
    b = base.withColumnRenamed("_bkt", "_jbkt").alias("b")
    cond = (F.col("a._jbkt") == F.col("b._jbkt")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in block_cols or []:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    if length_window is not None:
        cond = cond & (
            F.abs(F.col(f"a.{length_col}") - F.col(f"b.{length_col}")) <= F.lit(length_window)
        )
    # size-ratio prune: jaccard >= t  =>  min(|A|,|B|)/max(|A|,|B|) >= t
    tl = F.lit(threshold)
    cond = cond & (
        F.least(F.col("a._ntok"), F.col("b._ntok"))
        >= tl * F.greatest(F.col("a._ntok"), F.col("b._ntok"))
    )
    inter = F.size(F.array_intersect(F.col("a.tok_set"), F.col("b.tok_set")))
    # |A ∪ B| = |A| + |B| - |A ∩ B| — avoids materializing the union array
    union = F.col("a._ntok") + F.col("b._ntok") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tl)
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components by iterative min-label propagation — the
    collapse step of near-dup dedup (every doc in a duplicate cluster maps
    to the cluster's min id).

    ``pairs`` has (id_a, id_b) edges; ``nodes`` lists all ids (singletons
    become their own component). Each iteration joins labels across edges
    and keeps the min; converges in O(cluster diameter) rounds — near-dup
    clusters are shallow (diameter ~2-4), so a handful of shuffles total.
    Labels are checkpointed per round via localCheckpoint to keep the plan
    from growing unboundedly (lineage blow-up is the classic failure mode
    of iterative DataFrame algorithms).
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("component"))
    for _ in range(max_iterations):
        # candidate label for each node: min over neighbors' labels
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias(id_col), "component")


def simhash_signatures(df: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document from token hashes.

    Shape chosen for codegen: explode token hashes to rows, compute all 64
    per-bit +1/-1 votes as plain aggregate columns (one whole-stage-codegen
    hash aggregate), then OR the sign bits back into one long. The naive
    alternative — 64 ``aggregate()`` higher-order lambdas per row — runs
    interpreted and is ~10x slower.
    """
    keep_cols = df.columns
    exploded = df.select(
        *keep_cols, F.explode_outer(tokens_expr(text_col)).alias("_tok")
    ).withColumn("_h", F.xxhash64(F.col("_tok")))

    def mask(i: int):
        return F.lit(1 << i) if i < 63 else F.lit(-(1 << 63))

    votes = [
        F.sum(
            F.when(F.col("_h").isNull(), 0)
            .when(F.col("_h").bitwiseAND(mask(i)) != 0, 1)
            .otherwise(-1)
        ).alias(f"_v{i}")
        for i in range(bits)
    ]
    agg = exploded.groupBy(*keep_cols).agg(*votes)
    acc = None
    for i in range(bits):
        bit = F.when(F.col(f"_v{i}") > 0, mask(i).cast("long")).otherwise(F.lit(0).cast("long"))
        acc = bit if acc is None else acc.bitwiseOR(bit)
    return agg.select(*keep_cols, acc.alias("simhash"))


def simhash_near_dup_pairs(
    sig_df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= k, using the standard
    block-permutation trick: split the 64-bit signature into (k+1) blocks;
    any pair within distance k agrees exactly on >=1 block -> join per block
    on block equality, then verify true Hamming distance with bit_count."""
    nblocks = max_hamming + 1
    width = 64 // nblocks
    blocks = sig_df.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("blkval"),
                    )
                    for i in range(nblocks)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.blk", "bb.blkval")
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.blkval") == F.col("b.blkval"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .distinct()
    )
