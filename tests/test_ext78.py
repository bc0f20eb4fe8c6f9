"""Wave 79: perceptual-hash banding, silence segments, batch ledger."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext78 import (
    _LEDGER_FAIL_MOD,
    _PH_MAX_HAM,
    _SIL_THRESH_MILLI,
    q_audio_silence_segments,
    q_batch_ledger_watermark,
    q_phash_grid_dedup,
)
from etl_poor_main_pipeline_spark.registry_ext31 import q_audio_pcm_energy
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_phash_pairs_verified_against_direct_hash(spark):
    rows = q_phash_grid_dedup(spark, SF).collect()
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    hashes = {}
    for d in docs:
        if len(d.text) < 64:
            continue
        px = [ord(c) for c in d.text[:64]]
        mu = sum(px) / 64.0
        h = sum((1 << i) for i, p in enumerate(px) if p > mu)
        hashes[d.doc_id] = h
    for r in rows:
        assert r.id_a < r.id_b
        ham = bin(hashes[r.id_a] ^ hashes[r.id_b]).count("1")
        assert ham == r.hamming
        assert ham <= _PH_MAX_HAM
    # completeness: banding may only ADD candidates beyond threshold,
    # never lose a pair within it (pigeonhole guarantee)
    found = {(r.id_a, r.id_b) for r in rows}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(hashes[a] ^ hashes[b]).count("1") <= _PH_MAX_HAM:
                assert (a, b) in found


def test_silence_segments_are_maximal_quiet_runs(spark):
    segs = q_audio_silence_segments(spark, SF).collect()
    rms = {
        (r.media_id, r.window_idx): r.rms_milli
        for r in q_audio_pcm_energy(spark, SF).collect()
    }
    assert segs
    for s in segs:
        assert s.n_windows == s.seg_end - s.seg_start + 1
        for w in range(s.seg_start, s.seg_end + 1):
            assert rms[(s.media_id, w)] < _SIL_THRESH_MILLI
        # maximality: the windows flanking the segment are loud or absent
        for w in (s.seg_start - 1, s.seg_end + 1):
            if (s.media_id, w) in rms:
                assert rms[(s.media_id, w)] >= _SIL_THRESH_MILLI


def test_ledger_watermark_below_first_hole(spark):
    rows = q_batch_ledger_watermark(spark, SF).collect()
    assert rows
    holes = sorted(r.hole_batch for r in rows)
    wm = rows[0].safe_watermark
    assert wm == holes[0] - 1
    for r in rows:
        assert r.hole_batch % _LEDGER_FAIL_MOD == 3
        assert r.n_processed + len(holes) == r.n_batches


def test_wave79_plans_are_scale_safe(spark):
    for fn in (q_phash_grid_dedup, q_batch_ledger_watermark):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
