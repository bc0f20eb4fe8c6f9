"""Env-driven engine configuration.

Mirrors the reference's dotenv-based config surface (utils/config.py:25-77,
.env.example:1-15) without any proprietary endpoints: everything is a plain
environment variable with a local-friendly default, so the full test suite
runs against the local filesystem with zero external services.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclass(frozen=True)
class EngineConfig:
    """All knobs in one place.

    lake_root     root URI for lake tables ((database, table) -> path, the
                  analogue of utils/config.py:14-28 ``get_s3_path``). Local
                  dir by default; any Hadoop-FS URI (s3a://, hdfs://) works.
    testdata_dir  driver-generated parquet corpus (TESTDATA.md).
    cpus          local parallelism for the default session.
    shuffle_partitions
                  spark.sql.shuffle.partitions. On a real cluster size this
                  to ~2-3x total cores or rely on AQE coalescing; 32 locally.
    jdbc_url      serving-layer JDBC URL (gold). Empty -> JDBC sink disabled;
                  tests use sqlite-free in-memory stand-ins instead.
    """

    lake_root: str = field(default_factory=lambda: _env("ENGINE_LAKE_ROOT", "/tmp/engine_lake"))
    testdata_dir: str = field(
        default_factory=lambda: _env("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    cpus: int = field(default_factory=lambda: int(_env("SPARK_GRAFT_CPUS", "32")))
    shuffle_partitions: int = field(
        default_factory=lambda: int(_env("ENGINE_SHUFFLE_PARTITIONS", "32"))
    )
    jdbc_url: str = field(default_factory=lambda: _env("ENGINE_JDBC_URL", ""))
    jdbc_schema: str = field(default_factory=lambda: _env("ENGINE_JDBC_SCHEMA", "dashboard"))


def load_config() -> EngineConfig:
    return EngineConfig()
