"""Round-14 optimization equivalence pins.

Each restructured operator gets a test that pins the EXACT identity the
optimization relies on, so a future change that breaks the equivalence
fails here rather than at the driver's oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_poor_main_pipeline_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def _string_bucket_candidates(sigs, num_bands, rows_per_band, max_bucket_size=500):
    """The round-13 reference implementation: comma-joined slice STRINGS
    as band keys (what the packed-bigint representation replaced)."""

    def bk(b):
        return F.concat_ws(
            ",",
            *[
                F.col("minhash")[b * rows_per_band + r].cast("string")
                for r in range(rows_per_band)
            ],
        )

    bands = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[bk(b) for b in range(num_bands)])).alias(
            "band", "bucket"
        ),
    )
    w = Window.partitionBy("band", "bucket")
    bands = (
        bands.withColumn("_bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    return (
        a.join(b, cond)
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def test_packed_band_keys_reproduce_string_slice_candidates(spark):
    """Key identity of the packed representation: two mod-p signature
    values (each <= 2^31 - 1) packed as v1*2^31 + v2 collide exactly when
    the value pairs are equal, so the packed-bigint band keys must yield
    the IDENTICAL candidate set as the raw slice strings — no hash, no
    tolerance."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = dedup.minhash_signatures(
        d, num_hashes=60, shingle_k=1, id_cols=["doc_id"], token_hash="poly"
    ).localCheckpoint(eager=False)
    packed = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_candidates(
            sigs, num_bands=10, rows_per_band=6, distinct=True, bucket_hash=False
        ).collect()
    }
    ref = {
        (r.id_a, r.id_b)
        for r in _string_bucket_candidates(sigs, 10, 6).collect()
    }
    assert packed == ref
    assert len(packed) > 0  # non-vacuous: the fixture has near-dup pairs


def test_packing_is_injective_at_the_boundary(spark):
    """p = 2^31 - 1 is the largest value a signature slot can carry (the
    no-shingle init vector); the packed word must still separate (p, 0)
    from (p-1, 2^31-1)-style neighbors. Pure arithmetic pin."""
    p = dedup.POLY_P
    pairs = [(p, 0), (p - 1, p), (p, p), (0, p), (1, 0), (0, 1)]
    packed = {v1 * (1 << 31) + v2 for v1, v2 in pairs}
    assert len(packed) == len(pairs)
    assert all(0 <= v1 * (1 << 31) + v2 < (1 << 62) for v1, v2 in pairs)
