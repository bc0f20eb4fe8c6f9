"""Wave 30: last-touch attribution, time-to-convert percentiles."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.registry_ext29 import (
    _ATTR_WINDOW_H,
    q_attribution_last_touch,
    q_funnel_time_to_convert,
)
from etl_poor_main_pipeline_spark.sources.read import read_events

SF = "/root/testdata/sf0.001"


def test_attribution_covers_every_purchase_once(spark):
    rows = q_attribution_last_touch(spark, SF).collect()
    n_purchases = (
        read_events(spark, SF).where(F.col("event_type") == "purchase").count()
    )
    assert len(rows) == n_purchases  # one row per purchase, always
    ids = [r.purchase_id for r in rows]
    assert len(ids) == len(set(ids))
    attributed = [r for r in rows if r.click_id is not None]
    assert attributed  # fixture has click->purchase sequences
    for r in attributed:
        assert 0 <= r.latency_sec <= _ATTR_WINDOW_H * 3600
    # unattributed rows are explicit, not dropped
    assert all(r.latency_sec is None for r in rows if r.click_id is None)


def test_time_to_convert_percentiles_are_ordered(spark):
    row = q_funnel_time_to_convert(spark, SF).head()
    assert row.n_converters > 0
    assert 0 <= row.p25_sec <= row.p50_sec <= row.p75_sec
