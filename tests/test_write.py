import os

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.pipelines.schemas import WORLD_WEATHER_SCHEMA
from etl_poor_main_pipeline_spark.sinks.write import register_table, write_partition_overwrite
from etl_poor_main_pipeline_spark.table import TableRef

T = TableRef("analytics", "world_weather")


def _mini(spark, date_id, n=3, marker="v1"):
    return spark.createDataFrame(
        [(f"c{i}", marker, date_id) for i in range(n)], ["city", "weather", "date_id"]
    )


def test_partition_overwrite_replaces_only_target(spark, lake):
    # W1: delete-and-insert must leave sibling partitions intact
    write_partition_overwrite(_mini(spark, "2026-01-01"), T, lake)
    write_partition_overwrite(_mini(spark, "2026-01-02"), T, lake)
    write_partition_overwrite(_mini(spark, "2026-01-01", n=5, marker="v2"), T, lake)

    df = spark.read.parquet(T.path(lake))
    day1 = df.filter(F.col("date_id") == "2026-01-01")
    day2 = df.filter(F.col("date_id") == "2026-01-02")
    assert day1.count() == 5  # replaced
    assert day1.filter(F.col("weather") == "v1").count() == 0
    assert day2.count() == 3  # untouched sibling
    assert day2.filter(F.col("weather") == "v1").count() == 3


def test_rerun_is_idempotent(spark, lake):
    # the reference's core guarantee: daily rerun does not duplicate
    for _ in range(2):
        write_partition_overwrite(_mini(spark, "2026-01-01"), T, lake)
    assert spark.read.parquet(T.path(lake)).count() == 3


def test_empty_input_guard_skips_write(spark, lake):
    # W2 (utils/duckdb_utils.py:144-146)
    empty = _mini(spark, "2026-01-01").filter(F.lit(False))
    assert write_partition_overwrite(empty, T, lake) is False
    assert not os.path.exists(T.path(lake))


def test_single_file_layout_policy(spark, lake):
    # W5: one data file per partition dir when the policy is on
    write_partition_overwrite(_mini(spark, "2026-01-01", n=10), T, lake, single_file=True)
    part_dir = os.path.join(T.path(lake), "date_id=2026-01-01")
    files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    assert len(files) == 1


def test_schema_enforced_on_write(spark, lake):
    rows = [
        (
            "city",
            "US",
            "21.5",  # string -> DOUBLE cast on write
            20.0,
            60,
            1013,
            "clear",
            800,
            3.2,
            "2026-01-01T00:00:00",
            "2026-01-01",
        )
    ]
    df = spark.createDataFrame(rows, list(WORLD_WEATHER_SCHEMA))
    write_partition_overwrite(df, T, lake, schema=WORLD_WEATHER_SCHEMA)
    out = spark.read.parquet(T.path(lake))
    assert dict(out.dtypes)["temperature"] == "double"
    assert out.head().temperature == 21.5


def test_register_table_idempotent(spark, lake):
    # W4: catalog registration twice must not fail
    write_partition_overwrite(_mini(spark, "2026-01-01"), T, lake)
    register_table(spark, T, lake)
    register_table(spark, T, lake)
    assert spark.sql(f"SELECT count(*) c FROM {T.qualified_name}").head().c == 3
    spark.sql(f"DROP TABLE IF EXISTS {T.qualified_name}")


def test_register_table_add_partition_o1(spark, lake):
    """Per-run ALTER TABLE ADD IF NOT EXISTS PARTITION (the reference's
    duckdb_utils.py:264-280 shape, O(1) per run): the new partition must
    be queryable WITHOUT a full MSCK discovery pass, and re-registering
    the same partition must be a no-op."""
    write_partition_overwrite(_mini(spark, "2026-01-01"), T, lake)
    register_table(spark, T, lake, partition_value="2026-01-01")
    assert spark.sql(f"SELECT count(*) c FROM {T.qualified_name}").head().c == 3
    # a second day's write registers only its own partition
    write_partition_overwrite(_mini(spark, "2026-01-02", n=2), T, lake)
    register_table(spark, T, lake, partition_value="2026-01-02")
    register_table(spark, T, lake, partition_value="2026-01-02")  # idempotent
    parts = [r[0] for r in spark.sql(f"SHOW PARTITIONS {T.qualified_name}").collect()]
    assert sorted(parts) == ["date_id=2026-01-01", "date_id=2026-01-02"]
    assert spark.sql(f"SELECT count(*) c FROM {T.qualified_name}").head().c == 5
    spark.sql(f"DROP TABLE IF EXISTS {T.qualified_name}")


def test_write_observe_quality_metrics(spark, tmp_path):
    """observe() metrics are collected during the write itself — row and
    per-column null counts come back without a second scan."""
    from pyspark.sql import functions as F

    from etl_poor_main_pipeline_spark.sinks.write import write_partition_overwrite
    from etl_poor_main_pipeline_spark.table import TableRef

    ref = TableRef("analytics", "obs_metrics", partition_col="date_id")
    df = spark.createDataFrame(
        [(1, None, "2026-01-01"), (2, 5.0, "2026-01-01"), (3, None, "2026-01-02")],
        ["id", "v", "date_id"],
    )
    metrics = write_partition_overwrite(df, ref, str(tmp_path), quality_cols=["v", "id"])
    assert metrics == {"n_rows": 3, "n_null_v": 2, "n_null_id": 0}
    assert spark.read.parquet(ref.path(str(tmp_path))).count() == 3
