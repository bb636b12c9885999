"""Partition-overwrite idempotence and bucketed no-shuffle joins."""

import numpy as np
from pyspark.sql import functions as F

from dea_conflux_spark.operators import tables


def test_overwrite_partitions_idempotent(spark, tmp_path):
    path = str(tmp_path / "obs")
    df1 = spark.createDataFrame(
        [("a", "d1", 1.0), ("b", "d1", 2.0), ("c", "d2", 3.0)],
        "poly_id string, day string, v double")
    tables.overwrite_partitions(df1, path, ["day"])
    # rewrite d1 only, with different values; d2 must survive untouched
    df2 = spark.createDataFrame(
        [("a", "d1", 10.0)], "poly_id string, day string, v double")
    tables.overwrite_partitions(df2, path, ["day"])
    out = spark.read.parquet(path).toPandas()
    assert sorted(out[out.day == "d1"]["v"]) == [10.0]
    assert sorted(out[out.day == "d2"]["v"]) == [3.0]
    # re-running the same write converges (idempotence)
    tables.overwrite_partitions(df2, path, ["day"])
    out2 = spark.read.parquet(path)
    assert out2.count() == 2


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import shutil
    spark.sql("DROP TABLE IF EXISTS obs_bucketed")
    spark.sql("DROP TABLE IF EXISTS dim_bucketed")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("obs_bucketed", "dim_bucketed"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    obs = spark.range(1000).select(
        (F.col("id") % 50).alias("k"), F.rand(1).alias("v"))
    dim = spark.range(50).select(F.col("id").alias("k"),
                                 F.lit("x").alias("name"))
    tables.write_bucketed(obs, "obs_bucketed", "k", 8)
    tables.write_bucketed(dim, "dim_bucketed", "k", 8)
    a = spark.table("obs_bucketed")
    b = spark.table("dim_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert j.count() == 1000
        assert "Exchange" not in plan, plan[:2000]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_write_bucketed_rejects_unsafe_table_names(spark):
    import pytest

    df = spark.range(3).select(F.col("id").alias("k"))
    for bad in ("db.tbl", "../x", "x y", "x;drop"):
        with pytest.raises(ValueError, match="identifier"):
            tables.write_bucketed(df, bad, "k", 2)


def test_write_bucketed_vacuums_catalog_resolved_location(spark):
    """Rewriting an existing bucketed table resolves the stale location
    from the catalog (not a string-built warehouse path) and succeeds."""
    df1 = spark.range(10).select((F.col("id") % 3).alias("k"))
    tables.write_bucketed(df1, "tbl_rewrite_loc", "k", 2)
    df2 = spark.range(4).select((F.col("id") % 2).alias("k"))
    tables.write_bucketed(df2, "tbl_rewrite_loc", "k", 2)
    assert spark.table("tbl_rewrite_loc").count() == 4
