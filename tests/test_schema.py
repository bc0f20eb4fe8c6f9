from pyspark.sql import types as T

from etl_poor_main_pipeline_spark.schema import (
    enforce_schema,
    schema_from_dict,
    sql_type_to_spark,
)


def test_reference_type_mapping():
    # the three types the reference ever declares (SURVEY §1.2)
    assert sql_type_to_spark("VARCHAR") == T.StringType()
    assert sql_type_to_spark("DOUBLE") == T.DoubleType()
    assert sql_type_to_spark("INTEGER") == T.IntegerType()


def test_unknown_type_falls_back_to_string():
    # matches the reference's Glue default (utils/duckdb_utils.py:228-229)
    assert sql_type_to_spark("GEOMETRY") == T.StringType()


def test_decimal_and_array_types():
    assert sql_type_to_spark("DECIMAL(18,2)") == T.DecimalType(18, 2)
    assert sql_type_to_spark("ARRAY<FLOAT>") == T.ArrayType(T.FloatType())


def test_schema_from_dict_order_preserved():
    st = schema_from_dict({"a": "VARCHAR", "b": "DOUBLE"})
    assert [f.name for f in st.fields] == ["a", "b"]
    assert all(f.nullable for f in st.fields)


def test_enforce_schema_casts_and_projects(spark):
    df = spark.createDataFrame([("1", "2.5", "x", "extra")], ["i", "d", "s", "dropme"])
    out = enforce_schema(df, {"i": "INTEGER", "d": "DOUBLE", "s": "VARCHAR"})
    assert out.columns == ["i", "d", "s"]
    row = out.head()
    assert row.i == 1 and row.d == 2.5 and row.s == "x"


def test_enforce_schema_bad_cast_yields_null(spark):
    # Spark cast -> NULL on failure (documented divergence, SURVEY §7.5)
    df = spark.createDataFrame([("not_a_number",)], ["i"])
    out = enforce_schema(df, {"i": "INTEGER"})
    assert out.head().i is None
