"""Schema system: SQL-type-dict -> StructType + cast enforcement.

The reference declares table schemas as ``{column: "VARCHAR"|"DOUBLE"|
"INTEGER"}`` dicts and enforces them on write by inserting through a typed
temp table (utils/duckdb_utils.py:176-186, implicit cast). The Spark-native
equivalent: map the dict to a StructType and enforce with explicit casts —
``df.select(col(c).cast(t))`` — which Catalyst folds into the plan for free.

Unknown type strings fall back to string, matching the reference's Glue
mapping default (utils/duckdb_utils.py:228-229).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reference SQL type -> Spark type (SURVEY §1.2 table)
_SQL_TO_SPARK: dict[str, T.DataType] = {
    "VARCHAR": T.StringType(),
    "STRING": T.StringType(),
    "TEXT": T.StringType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT": T.FloatType(),
    "REAL": T.DoubleType(),
    "INTEGER": T.IntegerType(),
    "INT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "SMALLINT": T.ShortType(),
    "BOOLEAN": T.BooleanType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(),
    "BINARY": T.BinaryType(),
    "BLOB": T.BinaryType(),
}


def sql_type_to_spark(sql_type: str) -> T.DataType:
    """Map a reference-style SQL type name to a Spark type.

    Anything unrecognized degrades to string — the reference's Glue writer
    does the same (utils/duckdb_utils.py:228-229).
    """
    key = sql_type.strip().upper()
    if key.startswith("DECIMAL") or key.startswith("NUMERIC"):
        inner = key[key.find("(") + 1 : key.find(")")] if "(" in key else "10,0"
        prec, _, scale = inner.partition(",")
        return T.DecimalType(int(prec or 10), int(scale or 0))
    if key.startswith("ARRAY<") and key.endswith(">"):
        return T.ArrayType(sql_type_to_spark(key[6:-1]))
    return _SQL_TO_SPARK.get(key, T.StringType())


def schema_from_dict(schema: dict[str, str]) -> T.StructType:
    """``{"city": "VARCHAR", "temperature": "DOUBLE"}`` -> StructType."""
    return T.StructType(
        [T.StructField(name, sql_type_to_spark(t), nullable=True) for name, t in schema.items()]
    )


def enforce_schema(df: DataFrame, schema: dict[str, str]) -> DataFrame:
    """Project + cast ``df`` to exactly the declared columns/types (P5).

    Uses ``try_cast``: malformed values become NULL instead of failing the
    job (documented divergence from DuckDB's erroring INSERT SELECT,
    SURVEY §7.5), and the behavior is independent of the session's ANSI
    mode — Spark 4 defaults to ANSI, where a plain cast would throw.
    """
    return df.select(
        [F.col(name).try_cast(sql_type_to_spark(t)).alias(name) for name, t in schema.items()]
    )
