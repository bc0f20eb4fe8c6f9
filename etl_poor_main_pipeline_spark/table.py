"""Partitioned-table identity & path resolution.

The reference's single data abstraction is the partitioned table:
``(database, table)`` -> ``s3://{bucket}/{database}/{table}`` with Hive-style
``date_id=YYYY-MM-DD`` partition directories (utils/config.py:14-28
``get_s3_path``; layout at utils/duckdb_utils.py:152-154). This module is
that identity, generalized to any Hadoop-FS root.
"""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_PARTITION_COL = "date_id"


@dataclass(frozen=True)
class TableRef:
    database: str
    table: str
    partition_col: str = DEFAULT_PARTITION_COL

    def path(self, lake_root: str) -> str:
        return f"{lake_root.rstrip('/')}/{self.database}/{self.table}"

    def partition_path(self, lake_root: str, partition_value: str) -> str:
        """Direct partition dir — the analogue of the reference interpolating
        ``date_id={d}`` into the scan path (analytics__us_weather.py:51)."""
        return f"{self.path(lake_root)}/{self.partition_col}={partition_value}"

    @property
    def qualified_name(self) -> str:
        return f"{self.database}.{self.table}"
