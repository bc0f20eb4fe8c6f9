"""Wave 15: native session windows, VARIANT, Python UDTF chunking."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.registry_ext14 import (
    q_session_window_native,
    q_udtf_chunk_documents,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_session_window_matches_gap_islands(spark):
    """Native session_window must produce exactly the gap-island
    sessionization: same per-user session count and event conservation."""
    ev = load_table(spark, SF, "events")
    n_total = ev.count()
    out = q_session_window_native(spark, SF).collect()
    assert sum(r.n_events for r in out) == n_total
    per_user = {}
    for r in out:
        per_user[r.user_id] = per_user.get(r.user_id, 0) + 1
    # cross-check against the island count computed with lag()
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    islands = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev").isNull()
                | (F.unix_micros("ts") - F.unix_micros("prev") >= 30 * 60 * 1_000_000),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"))
        .collect()
    )
    assert {r.user_id: r.n_sessions for r in islands} == per_user


def test_udtf_chunks_cover_all_tokens_with_overlap(spark):
    """Every document's chunks must cover all its tokens: stride-16
    windows of size 32 mean consecutive chunks overlap by 16 tokens and
    token positions 0..n-1 all fall in some chunk."""
    d = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok")
    )
    n_tok = {r.doc_id: r.n_tok for r in d.collect()}
    chunks = q_udtf_chunk_documents(spark, SF).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {k for k, v in n_tok.items() if v > 0}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        covered = 16 * (len(rows) - 1) + rows[-1].n_tokens
        assert covered == n_tok[doc_id], (
            f"doc {doc_id}: chunks cover {covered} of {n_tok[doc_id]} tokens"
        )
        assert all(r.n_tokens == 32 for r in rows[:-1])


def test_variant_typed_extraction_null_safe(spark):
    """try_variant_get returns NULL (not an error) on malformed JSON and
    wrong-type paths — the ingestion-robustness property VARIANT buys."""
    df = spark.createDataFrame(
        [("ok", '{"k": 5}'), ("bad", "not json at all"), ("wrongtype", '{"k": "txt"}')],
        "tag string, props string",
    )
    out = df.select(
        "tag",
        F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "bigint").alias("k"),
    ).collect()
    got = {r.tag: r.k for r in out}
    assert got == {"ok": 5, "bad": None, "wrongtype": None}
