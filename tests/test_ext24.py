"""Wave 25: KMV sketch, E-S weighted sampling, Hilbert layout,
streaming top-k."""

import duckdb

from etl_poor_main_pipeline_spark.registry_ext24 import (
    _ES_K,
    _STREAM_TOPK,
    _hilbert_sql,
    q_kmv_distinct_sketch,
    q_streaming_topk_users,
    q_weighted_sample_es,
)

SF = "/root/testdata/sf0.001"


def test_kmv_estimate_tracks_exact(spark):
    rows = q_kmv_distinct_sketch(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.est_distinct > 0
        if r.n_exact < 64:
            # sub-k groups report hash-distinct count (collisions aside)
            assert r.est_distinct <= r.n_exact
        else:
            # k=64 -> ~12.5% standard error; 40% is a generous pin that
            # still catches a broken estimator
            assert abs(r.est_distinct - r.n_exact) / r.n_exact < 0.40


def test_weighted_sample_is_deterministic_and_weight_biased(spark):
    a = [r.doc_id for r in q_weighted_sample_es(spark, SF).collect()]
    b = [r.doc_id for r in q_weighted_sample_es(spark, SF).collect()]
    assert a == b and len(a) == _ES_K
    # E-S keys favor heavy docs: the sample's mean weight beats the corpus mean
    from etl_poor_main_pipeline_spark.sources.read import load_table

    d = load_table(spark, SF, "documents").select("doc_id", "n_chars").toPandas()
    sample_mean = d[d.doc_id.isin(a)].n_chars.mean()
    assert sample_mean > d.n_chars.mean()


def test_hilbert_is_a_bijection_with_unit_steps():
    """Exhaustive check on the 16x16 grid (4-bit curve): every cell gets
    a distinct index 0..255 and consecutive indices are Manhattan-
    adjacent — the defining Hilbert properties, which Morton lacks."""
    con = duckdb.connect()
    sql = _hilbert_sql(
        "(SELECT x, y FROM (SELECT unnest(range(16)) AS x), (SELECT unnest(range(16)) AS y))",
        "x",
        "y",
        "x, y",
        bits=4,
    )
    # columns: x, y, hx, hy, hd — the index is the last column
    cells = {r[4]: (r[0], r[1]) for r in con.execute(sql).fetchall()}
    assert sorted(cells) == list(range(256))  # bijection onto 0..255
    for d in range(255):
        (x1, y1), (x2, y2) = cells[d], cells[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # unit-step locality


def test_streaming_topk_ranks_within_windows(spark):
    rows = q_streaming_topk_users(spark, SF).collect()
    assert rows
    by_w = {}
    for r in rows:
        by_w.setdefault(r.window_start, []).append(r)
    for w, rs in by_w.items():
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _STREAM_TOPK
        counts = [r.n_events for r in rs]
        assert counts == sorted(counts, reverse=True)
