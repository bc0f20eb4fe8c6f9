"""E4 orchestration artifact: the medallion DAG chains the three layers
through the SAME per-layer entry points (pipelines.__main__) in
dependency order — bronze -> silver(US,CA) -> gold (README.md:143-172)."""

import pytest
from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.orchestration import (
    run_medallion,
    topological_layers,
)
from etl_poor_main_pipeline_spark.orchestration.run_dag import Task, medallion_dag


def test_dag_shape_and_topology():
    tasks = medallion_dag("/tmp/lake", "2026-01-01")
    layers = topological_layers(tasks)
    assert layers == [["bronze"], ["silver_CA", "silver_US"], ["gold"]]
    # every task's argv targets the runnable-module layer it names
    assert tasks["gold"].argv[0] == "gold"
    assert tasks["silver_US"].argv[-1] == "US"


def test_topology_rejects_cycles():
    tasks = {
        "a": Task("a", ("bronze",), upstream=("b",)),
        "b": Task("b", ("gold",), upstream=("a",)),
    }
    with pytest.raises(ValueError, match="cycle"):
        topological_layers(tasks)


def test_failed_task_skips_dependents():
    calls = []

    def failing_runner(argv):
        calls.append(argv[0])
        return 1 if argv[0] == "silver" else 0

    with pytest.raises(RuntimeError, match="silver_CA exited 1"):
        run_medallion("/tmp/lake", "2026-01-01", runner=failing_runner)
    assert "gold" not in calls  # dependents skipped after failure


def test_run_medallion_end_to_end(spark, lake, monkeypatch):
    """Drive the full chain through the real argv entry points (offline
    bronze fetch), then assert the gold lake table exists with the
    region stamp — the same observable the reference's DAG produces."""
    monkeypatch.delenv("ETL_API_FETCH", raising=False)
    order = run_medallion(lake, "2026-01-01")
    assert order == ["bronze", "silver_CA", "silver_US", "gold"]

    gold_df = spark.read.parquet(f"{lake}/dashboard/north_america_weather")
    assert gold_df.count() > 0
    assert gold_df.filter(F.col("region") != "North America").count() == 0
    assert set(gold_df.select("country").distinct().toPandas()["country"]) <= {"US", "CA"}
