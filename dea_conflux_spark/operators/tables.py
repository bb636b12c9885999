"""Table-layout operators: idempotent partition overwrite and bucketed
co-located joins.

* ``overwrite_partitions`` — the Iceberg ``overwritePartitions()``
  equivalent on plain parquet: dynamic partition-overwrite mode replaces
  exactly the partitions present in the incoming frame and leaves the
  rest untouched, so re-running a day's drill is idempotent
  (SURVEY.md §4 O12; reference re-write-by-name io.py:146-243).
* ``write_bucketed`` / bucketed tables — pre-shuffling a fact table into
  hash buckets on its join key lets later equi-joins run with NO
  exchange on that side (SURVEY.md guide: bucketing) — the batch
  analogue of co-partitioned Iceberg writes for the observations table.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame


def overwrite_partitions(df: DataFrame, path: str, partition_cols) -> None:
    """Replace only the partitions present in ``df`` under ``path``."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (df.write.mode("overwrite").partitionBy(*partition_cols)
         .parquet(path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_bucketed(df: DataFrame, table: str, key,
                   n_buckets: int = 8) -> None:
    """Persist ``df`` as a bucketed managed table on ``key`` (a column
    name or list of column names).  Later equi-joins / cogroups on
    exactly these keys read the table Exchange-free."""
    keys = [key] if isinstance(key, str) else list(key)
    spark = df.sparkSession
    # a previously dropped-but-not-vacuumed managed table leaves its
    # location behind, which saveAsTable refuses to reuse — clear both
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    (df.write.mode("overwrite").bucketBy(n_buckets, *keys).sortBy(*keys)
     .format("parquet").saveAsTable(table))
