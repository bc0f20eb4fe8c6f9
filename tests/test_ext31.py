"""Wave 32: real PCM decode kernel (windowed RMS energy)."""

import math

from etl_poor_main_pipeline_spark.registry_ext31 import (
    _PCM_WINDOW,
    q_audio_pcm_energy,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_pcm_energy_matches_python_reference(spark):
    rows = q_audio_pcm_energy(spark, SF).collect()
    assert rows
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents").where("doc_id < 40").collect()
    }
    # windows are contiguous per media and full except possibly the last
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rs in by_media.items():
        assert [r.window_idx for r in rs] == list(range(len(rs)))
        assert all(r.n_samples == _PCM_WINDOW for r in rs[:-1])
        # python reference decode of the first window
        b = texts[mid].encode("utf-8")
        samples = [
            int.from_bytes(b[2 * k : 2 * k + 2], "little", signed=True)
            for k in range(min(_PCM_WINDOW, len(b) // 2))
        ]
        if samples:
            expect = math.floor(
                1000.0 * math.sqrt(sum(s * s for s in samples) / len(samples)) + 0.5
            )
            assert rs[0].rms_milli == expect
