"""etl_poor_main_pipeline_spark — a PySpark-native analytics/ETL engine.

A ground-up rebuild of the capabilities of the reference repo
``mbilalnust/ETL-poor-main-pipeline`` (medallion lakehouse: bronze API
ingest -> silver SQL transforms -> gold serving load), re-expressed
idiomatically on the Spark DataFrame/SQL stack, plus the LLM-data-pipeline
operator tier (dedup, similarity search, multimodal columns, text analysis)
designed for 100 TB scale.

Layout
------
- ``config``    env-driven configuration  (ref: utils/config.py)
- ``session``   SparkSession factory      (ref: utils/duckdb_utils.py:9-59)
- ``schema``    SQL-type-dict -> StructType + cast enforcement
                (ref: utils/duckdb_utils.py:176-186)
- ``table``     (database, table) -> path resolution, partition spec
                (ref: utils/config.py:14-28)
- ``sources``   partition-pruned parquet scans, pandas handoff, REST API
                source with JSON flatten (ref: src/bronze/.../analytics__world_weather.py)
- ``operators`` relational core + dedup/similarity/text/multimodal [EXT]
- ``functions`` reusable column expressions (text stats, vector math)
- ``sinks``     partition delete-and-insert writer, JDBC delete+append
                (ref: utils/duckdb_utils.py:61-190, utils/postgres_utils.py)
- ``pipelines`` bronze/silver/gold jobs recreated end-to-end
- ``streaming`` Structured Streaming variants of the event operators
- ``plans``     explain/plan-inspection helpers for the 100 TB posture
"""

__version__ = "0.1.0"
