"""Lake sinks: idempotent partition delete-and-insert + layout policy.

Reference behavior being recreated (W1/W2/W4/W5):
- W1 delete-and-insert partition overwrite (utils/duckdb_utils.py:61-190,
  README.md:17,27): the reference lists+deletes S3 objects under
  ``date_id={d}`` and the Glue partition, then COPYs new parquet. Spark-
  native: ``mode("overwrite").partitionBy(...)`` with
  ``partitionOverwriteMode=dynamic`` — only the partitions present in the
  incoming DataFrame are replaced, sibling partitions untouched. One conf,
  no hand-rolled S3 deletes, safe under concurrent daily runs.
- W2 empty-input guard (utils/duckdb_utils.py:144-146): skip the write when
  the DataFrame is empty, identical short-circuit.
- W4 catalog registration (utils/duckdb_utils.py:192-284): idempotent
  database/table creation against the session catalog (Glue via the
  catalog impl in a real deployment); ``MSCK``-equivalent partition sync.
- W5 single-file-per-partition (utils/duckdb_utils.py:154,186): preserved
  as an *opt-in* policy knob — correct for 30-row reference partitions,
  an anti-pattern at 100 TB (SURVEY §7.5), hence default off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import enforce_schema
from ..table import TableRef


def write_partition_overwrite(
    df: DataFrame,
    ref: TableRef,
    lake_root: str,
    schema: dict[str, str] | None = None,
    single_file: bool = False,
    quality_cols: list[str] | None = None,
) -> bool | dict:
    """W1+W2+W5: schema-enforced dynamic partition overwrite.

    Returns False when the empty-input guard short-circuited, True when a
    write happened — mirrors the reference's skip-log behavior.

    ``quality_cols`` turns on write-time data-quality metrics via
    ``df.observe`` — row count plus a null count per listed column,
    collected DURING the write (no second pass over the data, unlike a
    post-write validation query; at 100 TB a revalidation scan is a real
    cost). When set, returns the metrics dict instead of True.
    """
    if df.isEmpty():
        return False
    out = enforce_schema(df, schema) if schema else df
    observation = None
    if quality_cols:
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        observation = Observation()
        out = out.observe(
            observation,
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
                for c in quality_cols
            ],
        )
    if single_file:
        # reference layout parity: exactly one file per partition. Fine for
        # small daily partitions; never use at scale.
        out = out.repartition(1)
    # per-write option, NOT session conf: setting the session-wide
    # partitionOverwriteMode would silently turn every later plain
    # mode('overwrite') partitioned write in the same session dynamic
    # (ADVICE r1) — scope the delete-and-insert semantics to this write
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(ref.partition_col)
        .parquet(ref.path(lake_root))
    )
    if observation is not None:
        return observation.get
    return True


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles once at write time so every
    later join/aggregate on ``bucket_cols`` between co-bucketed tables
    needs NO exchange — the 100 TB answer for repeatedly-joined fact
    tables (pay the shuffle once, reuse forever). Sorting within buckets
    additionally removes the sort from sort-merge joins.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def register_table(
    spark: SparkSession,
    ref: TableRef,
    lake_root: str,
    partition_value: str | None = None,
) -> None:
    """W4 idempotent catalog registration: CREATE DATABASE/TABLE IF NOT
    EXISTS over the external location, then partition registration.

    Against a Glue-backed catalog this issues the same idempotent calls the
    reference makes with boto3 (duckdb_utils.py:198-207,216-262); locally it
    lands in the Derby/in-memory catalog. Failures warn-and-continue like
    the reference (:281-282).

    ``partition_value``: when the caller knows which partition this run
    wrote (the reference always does — it registers the run's ``date_id``,
    duckdb_utils.py:264-280), issue ``ALTER TABLE ... ADD IF NOT EXISTS
    PARTITION`` for just that value: O(1) catalog work per run. Without
    it, fall back to ``MSCK REPAIR TABLE`` full discovery — equivalent
    locally but O(all partitions) per run, which at years of daily
    partitions x thousands of tables is real catalog load at scale.
    """
    try:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {ref.database}")
        # external partitioned tables need an explicit column list — infer
        # it from the data files (the write path already enforced types)
        schema = spark.read.parquet(ref.path(lake_root)).schema
        cols_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {ref.qualified_name} ({cols_ddl}) "
            f"USING PARQUET PARTITIONED BY ({ref.partition_col}) "
            f"LOCATION '{ref.path(lake_root)}'"
        )
        if partition_value is not None:
            safe = str(partition_value).replace("'", "''")
            spark.sql(
                f"ALTER TABLE {ref.qualified_name} ADD IF NOT EXISTS "
                f"PARTITION ({ref.partition_col}='{safe}')"
            )
        else:
            spark.sql(f"MSCK REPAIR TABLE {ref.qualified_name}")
    except Exception as exc:  # warn-and-continue, ref duckdb_utils.py:281-282
        import warnings

        warnings.warn(f"catalog registration failed for {ref.qualified_name}: {exc}")


def write_zordered(
    df: DataFrame,
    path: str,
    zcol: str,
    num_files: int = 64,
    mode: str = "overwrite",
) -> None:
    """Z-order layout write: range-partition on a precomputed z-value
    column (``registry_ext19._z_expr`` builds the Morton interleave as a
    portable SQL expression) and sort within partitions, so every output
    file covers a tight hyper-rectangle in ALL interleaved dimensions —
    footer min/max then prunes most files for a predicate on ANY of them.
    One range exchange (sampled boundaries, skew-tolerant); the sort is
    per-partition, never global."""
    (
        df.repartitionByRange(num_files, zcol)
        .sortWithinPartitions(zcol)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction (the maintenance half of W5): rewrite a
    parquet directory into ceil(total_bytes / target) files and swap
    atomically (write to a sibling temp dir, then rename). Streaming and
    per-run appends leave thousands of KB-sized files; at 100 TB the
    NameNode/listing and per-file open costs dominate reads until
    compaction runs. Returns the new file count.

    Local-FS rename semantics; on object stores the swap step is the
    table format's job (Iceberg/Delta rewrite actions) — this utility is
    the layout math plus the idempotent swap protocol. Stale
    __compact_tmp/__compact_old dirs from a prior crashed run are removed
    up front so a rerun always succeeds. The swap itself is two renames,
    so a crash in the window between them leaves the dataset only at
    __compact_old (data is never lost, but readers see a missing path
    until rerun or manual rename-back) — a single-rename atomic swap
    needs renameat2(RENAME_EXCHANGE)/object-store commit, which is the
    table format's job."""
    import math
    import os
    import shutil

    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    # idempotence: clear leftovers from a prior failed run before writing.
    # A leftover __compact_old means the prior run crashed mid-swap with the
    # dataset path missing — restore it first rather than deleting data.
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)
    for leftover in (tmp, old):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def expire_partitions(
    path: str,
    partition_col: str,
    cutoff_value: str,
    dry_run: bool = False,
) -> list[str]:
    """Retention maintenance (the VACUUM-adjacent half of W5): delete
    partition directories whose ``{partition_col}={value}`` is lexically
    below ``cutoff_value`` (ISO dates compare correctly as strings).
    Returns the partition values removed (or that WOULD be removed with
    ``dry_run=True`` — run that first in production).

    At 100 TB retention is a metadata operation: whole partition
    directories drop without scanning a row, which is why time-partitioned
    layout (W1) is the prerequisite for cheap TTL. Object-store nuance:
    on S3 this is a prefix delete + catalog DROP PARTITION; table formats
    (Iceberg/Delta) do it transactionally — this utility is the
    local-FS/dev twin with the same selection rule."""
    import os
    import shutil

    removed = []
    prefix = f"{partition_col}="
    if not os.path.isdir(path):
        return removed
    for name in sorted(os.listdir(path)):
        if not name.startswith(prefix):
            continue
        value = name[len(prefix):]
        if value < cutoff_value:
            removed.append(value)
            if not dry_run:
                shutil.rmtree(os.path.join(path, name))
    return removed
