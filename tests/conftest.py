from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from etl_poor_main_pipeline_spark.session import get_spark

    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark = get_spark(
        app_name="tests",
        master="local[8]",
        extra_confs={"spark.sql.warehouse.dir": wh},
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture()
def lake(tmp_path):
    return str(tmp_path / "lake")


def make_weather_rows(date_id: str, countries=("US", "CA", "GB")):
    """Weather-shaped fixture rows (FIXTURES.md §2): every CASE branch,
    boundary values 0/10/20, NULL temperature, and duplicates."""
    rows = []
    temps = [-5.0, 0.0, 9.9, 10.0, 19.9, 20.0, 25.0, None]
    for country in countries:
        for i, t in enumerate(temps):
            rows.append(
                {
                    "city": f"{country}_city_{i}",
                    "country": country,
                    "temperature": t,
                    "feels_like": (t - 2.0) if t is not None else None,
                    "humidity": 50 + i,
                    "pressure": 1000 + i,
                    "weather": "clear sky",
                    "weather_code": 800,
                    "wind_speed": 3.5,
                    "timestamp": f"{date_id}T12:00:00",
                    "date_id": date_id,
                }
            )
    # duplicate row (U1 must preserve; dedup tests rely on it)
    rows.append(dict(rows[0]))
    return rows


@pytest.fixture()
def bronze_df(spark):
    from etl_poor_main_pipeline_spark.pipelines.schemas import WORLD_WEATHER_SCHEMA
    from etl_poor_main_pipeline_spark.schema import enforce_schema, schema_from_dict

    rows = make_weather_rows("2026-01-01")
    df = spark.createDataFrame(rows, schema=schema_from_dict(WORLD_WEATHER_SCHEMA))
    return enforce_schema(df, WORLD_WEATHER_SCHEMA)
