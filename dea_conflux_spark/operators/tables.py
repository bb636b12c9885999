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

import os
import re
import shutil

from pyspark.sql import DataFrame

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


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
    # plain unqualified identifiers only: the stale-location cleanup below
    # resolves a filesystem path, so a qualified ('db.tbl') or path-like
    # ('../x') name must never reach the string-built rmtree
    if not _IDENT.match(table):
        raise ValueError(
            f"write_bucketed requires a plain unqualified table "
            f"identifier, got {table!r}")
    # a previously dropped-but-not-vacuumed managed table leaves its
    # location behind, which saveAsTable refuses to reuse — clear both.
    # Resolve the actual location from the catalog when the table exists;
    # otherwise fall back to the default-database layout under the local
    # warehouse dir (non-local warehouses: nothing to vacuum locally).
    loc = None
    if spark.catalog.tableExists(table):
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
            if r["col_name"] == "Location":
                loc = r["data_type"]
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if loc is None:
        wh = spark.conf.get("spark.sql.warehouse.dir")
        loc = f"{wh}/{table}"
    if loc.startswith("file:"):
        loc = loc.removeprefix("file:")
    if os.path.isabs(loc):
        shutil.rmtree(loc, ignore_errors=True)
    (df.write.mode("overwrite").bucketBy(n_buckets, *keys).sortBy(*keys)
     .format("parquet").saveAsTable(table))
