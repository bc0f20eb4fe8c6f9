"""Spark-4-native custom Python data source for the REST ingestion
(S3/S4, reference analytics__world_weather.py:46-95), exposing the API
fan-out as a first-class reader:

    register_weather_source(spark)
    df = (spark.read.format("weather_api")
          .option("cities", "Toronto,London,...")
          .option("citiesPerPartition", "10")
          .load())                      # -> (city string, raw string)

Scale design: ``partitions()`` chunks the key list, and each chunk
fetches inside its own executor task — the same distribution story as
``api.fetch_distributed`` but surfaced through ``spark.read`` so the
ingestion composes with everything a DataFrame source does (schema
projection, downstream Catalyst optimization, checkpointed retries by
partition). Failed keys are dropped silently, matching reference
semantics. The fetch callable resolves executor-side from a
``module:attr`` option string (no closure pickling); default is the
deterministic offline payload, so nothing contacts a live service
unless explicitly configured.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .api import offline_fetch


class _CityPartition(InputPartition):
    def __init__(self, cities: Sequence[str]):
        self.cities = list(cities)


def _resolve_fetch(spec: str):
    if not spec:
        return offline_fetch
    mod, _, attr = spec.partition(":")
    return getattr(importlib.import_module(mod), attr)


class WeatherApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.cities = [c.strip() for c in options.get("cities", "").split(",") if c.strip()]
        self.per_partition = int(options.get("citiesPerPartition", "10"))
        self.fetch_spec = options.get("fetch", "")

    def partitions(self) -> list[InputPartition]:
        chunks = [
            _CityPartition(self.cities[i : i + self.per_partition])
            for i in range(0, len(self.cities), self.per_partition)
        ]
        return chunks or [_CityPartition([])]

    def read(self, partition: _CityPartition) -> Iterator[tuple]:
        fetch = _resolve_fetch(self.fetch_spec)
        for city in partition.cities:
            try:
                raw = fetch(city)
            except Exception:
                continue  # reference drops failed fetches silently
            if raw:
                yield (city, raw)


class WeatherApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_api"

    def schema(self) -> str:
        return "city string, raw string"

    def reader(self, schema) -> WeatherApiReader:
        return WeatherApiReader(self.options)


def register_weather_source(spark) -> None:
    """Idempotent registration of the ``weather_api`` format."""
    spark.dataSource.register(WeatherApiDataSource)
