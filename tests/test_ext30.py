"""Wave 31: CEP sequence matching, character entropy."""

import math

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.registry_ext30 import (
    q_char_entropy_score,
    q_sequence_pattern_match,
)
from etl_poor_main_pipeline_spark.sources.read import read_events

SF = "/root/testdata/sf0.001"


def test_sequence_matches_are_consecutive_triples(spark):
    rows = q_sequence_pattern_match(spark, SF).collect()
    assert rows  # the 5-type event mix produces some v->c->p runs
    assert all(r.n_matches >= 1 for r in rows)
    # cross-check one user by replaying their ordered stream in python
    u = rows[0].user_id
    seq = [
        r.event_type
        for r in read_events(spark, SF)
        .where(F.col("user_id") == u)
        .orderBy("ts", "event_id")
        .collect()
    ]
    expected = sum(
        1
        for i in range(len(seq) - 2)
        if seq[i : i + 3] == ["view", "click", "purchase"]
    )
    assert rows[0].n_matches == expected


def test_entropy_is_bounded_by_alphabet(spark):
    rows = q_char_entropy_score(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.entropy_micro >= 0
        # ~30-word vocab over [a-z ] chars: log2(27) bits is a hard cap
        assert r.entropy_micro <= math.log2(64) * 1_000_000
    # word-salad text is neither constant (0) nor uniform-random
    avg = sum(r.entropy_micro for r in rows) / len(rows)
    assert 1_000_000 < avg < 5_000_000  # plausible natural-text band
