"""Small-input execution posture.

Adaptive query execution earns its keep when shuffles are big enough that
runtime statistics change the plan (skew splitting, partition coalescing,
join-strategy switches). When the ENTIRE scanned corpus is smaller than a
single executor's working memory, every AQE query stage is an extra driver
round-trip (materialize -> re-plan -> submit) on top of a ~0.15 s/job
scheduling floor, and a 32-wide shuffle fan-out is pure task overhead —
measured on the bench corpus (17 MB at sf0.1) the posture below cuts the
11-query headline subset from 20.2 s to 13.0 s (-35%) with identical
results, and no query in the 472-query registry regresses (per-query A/B in
RATIO.md).

The posture is derived from INPUT SIZE, not hand-picked per query, so the
same code self-selects the cluster posture at scale: above the threshold it
is a no-op — AQE stays on (skew joins, coalescing, runtime join demotion
are load-bearing at 100 TB) and the session's shuffle fan-out stands.

Usage (bench.py, tools/scaling.py):

    with small_input_posture(spark, sf_dir):
        df = fn(spark, sf_dir)
        df.count()

The context manager restores the prior confs on exit, so a caller that
mixes scales (tools/scaling.py at x1/x4/x16) re-derives per corpus.
"""

from __future__ import annotations

import glob
import math
import os
from contextlib import contextmanager
from typing import Iterator

# One comfortable executor working set: below this, runtime re-planning
# cannot change any decision a static plan + broadcast hints gets right.
SMALL_INPUT_THRESHOLD_BYTES = 256 << 20

# Target bytes of (compressed parquet) input per shuffle task in the small
# posture; mirrors AQE's own advisory-size coalescing, decided statically.
_BYTES_PER_SHUFFLE_TASK = 2 << 20

_MIN_PARTITIONS = 8


def corpus_bytes(sf_dir: str) -> int:
    """Total on-disk size of the corpus' parquet files (0 if unreadable)."""
    total = 0
    for p in glob.glob(os.path.join(sf_dir, "**", "*.parquet"), recursive=True):
        try:
            total += os.stat(p).st_size
        except OSError:
            pass
    return total


def small_input_shuffle_partitions(nbytes: int) -> int:
    return max(_MIN_PARTITIONS, math.ceil(nbytes / _BYTES_PER_SHUFFLE_TASK))


@contextmanager
def small_input_posture(
    spark,
    sf_dir: str,
    threshold_bytes: int = SMALL_INPUT_THRESHOLD_BYTES,
) -> Iterator[bool]:
    """Disable AQE and right-size the shuffle fan-out while the corpus under
    ``sf_dir`` is below ``threshold_bytes``; no-op (yields False) otherwise.
    """
    nbytes = corpus_bytes(sf_dir)
    if nbytes <= 0 or nbytes >= threshold_bytes:
        yield False
        return
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(min(int(prev_sp), small_input_shuffle_partitions(nbytes))),
        )
        yield True
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
